"""Public rasterizer API.

``rasterize(gaussians, camera, ...)`` returns rgb/depth/alpha images and is
differentiable w.r.t. Gaussian parameters and the camera pose (pass the pose
through ``camera.with_delta(tau)`` and differentiate w.r.t. ``tau`` — this
replaces the reference's external ``diff_gaussian_rasterization_pose`` CUDA
kernel, SURVEY.md §2.3).

``render`` mirrors the reference renderer-wrapper contract
(/root/reference/gaussian_splatting/gaussian_renderer/__init__.py:18-104):
returns a dict with render/depth/alpha/radii plus binning diagnostics, and an
optional ``means2d_offset`` input whose gradient provides the screen-space
positional gradients used by densification (the reference harvests these via
retain_grad on a dummy tensor).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from flax import struct

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from . import binning as binning_lib
from . import blend as blend_lib
from .preprocess import preprocess


@struct.dataclass
class RasterizerConfig:
    """Static rasterizer capacities (hashable; safe as a jit static arg)."""

    tile_size: int = struct.field(pytree_node=False, default=16)
    max_pairs: int = struct.field(pytree_node=False, default=1 << 20)
    max_per_tile: int = struct.field(pytree_node=False, default=1024)
    # materialized pair-stream capacity for the Pallas stream path (0 =
    # max_pairs). Sizes the per-iteration assembly, NOT the sort capacity.
    max_render: int = struct.field(pytree_node=False, default=0)
    fast_k: int = struct.field(pytree_node=False, default=8)
    chunk: int = struct.field(pytree_node=False, default=64)
    pallas_chunk: int = struct.field(pytree_node=False, default=256)
    backend: str = struct.field(pytree_node=False, default="auto")
    scale_modifier: float = struct.field(pytree_node=False, default=1.0)
    # drop (gaussian, tile) pairs whose max alpha over the tile is below
    # the blend kernels' 1/255 gate — exact images (up to fp summation
    # order), ~20-40% fewer live pairs (binning._emit_pair_keys)
    tile_cull: bool = struct.field(pytree_node=False, default=True)
    # pallas backend layout: True = stream-v2 DMA windows (uncapped,
    # fastest); False = legacy pregathered (T, cap) windows — the fallback
    # for runtime faults tied to the stream kernels' manual DMA under the
    # tunneled runtime (r4 accuracy-crash triage, KNOWN_ISSUES.md)
    use_stream: bool = struct.field(pytree_node=False, default=True)


class RenderOutput(NamedTuple):
    color: jnp.ndarray        # (H, W, 3)
    depth: jnp.ndarray        # (H, W)
    alpha: jnp.ndarray        # (H, W)
    radii: jnp.ndarray        # (P,) int32
    visibility: jnp.ndarray   # (P,) bool (radii > 0)
    num_rendered: jnp.ndarray  # () int32
    overflow: jnp.ndarray     # () bool — pair-capacity overflow
    tile_overflow: Optional[jnp.ndarray] = None  # () bool — per-tile trunc.
    n_touched: Optional[jnp.ndarray] = None  # (P,) int32 (opt-in)
    max_tile_count: Optional[jnp.ndarray] = None  # () int32 true max count
    #   (pre-clip): right-sizes max_per_tile; logged by training/localization


def compute_bins(
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
):
    """Preprocess + bin only (no blending). Use with ``rasterize(bins=...)``
    to amortize binning across nearby camera poses — e.g. the pose-refinement
    inner loop, where the pose moves by ~1e-3 per Adam step and the tile
    lists are effectively static (an optimization the reference's
    per-iteration CUDA sort cannot express).

    Returns ``StreamBins`` for the pallas backend (the fast stream layout,
    see binning.py) and the legacy ``Binning`` index matrix otherwise."""
    ts = config.tile_size
    grid_x = -(-camera.width // ts)
    grid_y = -(-camera.height // ts)
    prep = preprocess(gaussians, camera, tile_size=ts,
                      scale_modifier=config.scale_modifier)
    if (_blend_mode(config.backend) in ("pallas", "pallas_interpret")
            and config.use_stream):
        return binning_lib.bin_stream(
            prep, grid_x, grid_y, config.max_pairs,
            config.max_render or config.max_pairs,
            fast_k=max(config.fast_k, 1), align=config.pallas_chunk,
            tile_size=ts, tile_cull=config.tile_cull,
        )
    return binning_lib.bin_gaussians(
        prep, grid_x, grid_y, config.max_pairs, config.max_per_tile,
        fast_k=config.fast_k, tile_size=ts, tile_cull=config.tile_cull,
    )


def rasterize(
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    bg: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    bins: Optional[binning_lib.Binning] = None,
    return_n_touched: bool = False,
) -> RenderOutput:
    """``return_n_touched`` adds the MonoGS-style per-Gaussian contributed-
    pixel counts (reference pose rasterizer's 5th output, SURVEY.md §2.3) —
    an extra pass over the bins, so off by default in the hot loop."""
    ts = config.tile_size
    grid_x = -(-camera.width // ts)
    grid_y = -(-camera.height // ts)
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)

    prep = preprocess(
        gaussians, camera, tile_size=ts,
        scale_modifier=config.scale_modifier, colors_precomp=colors_precomp,
    )
    means2d = prep.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    mode = _blend_mode(config.backend)
    # n_touched needs the (T, cap) id matrix; otherwise the pallas backend
    # takes the stream layout (row-gathers only, scatter-free backward)
    want_stream = (mode in ("pallas", "pallas_interpret")
                   and config.use_stream and not return_n_touched)
    is_stream_bins = isinstance(bins, binning_lib.StreamBins)
    use_stream = want_stream and (bins is None or is_stream_bins)
    if bins is None or (is_stream_bins and not use_stream):
        if use_stream:
            bins = binning_lib.bin_stream(
                prep, grid_x, grid_y, config.max_pairs,
                config.max_render or config.max_pairs,
                fast_k=max(config.fast_k, 1), align=config.pallas_chunk,
                tile_size=ts, tile_cull=config.tile_cull,
            )
        else:
            bins = binning_lib.bin_gaussians(
                prep, grid_x, grid_y, config.max_pairs, config.max_per_tile,
                fast_k=config.fast_k, tile_size=ts,
                tile_cull=config.tile_cull,
            )

    if use_stream:
        from . import stream_blend
        pack = jnp.stack(
            [means2d[:, 0], means2d[:, 1],
             prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
             prep.opacity, prep.valid.astype(jnp.float32),
             jnp.zeros_like(prep.opacity),
             prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2], prep.depths],
            axis=1)                                       # (P, 12)
        out = stream_blend.blend_stream_pallas(
            pack, bins, grid_x, ts, max(config.fast_k, 1),
            chunk=config.pallas_chunk,
            interpret=(mode == "pallas_interpret"),
        )
    elif mode in ("pallas", "pallas_interpret"):
        from . import pallas_blend
        out = pallas_blend.blend_tiles_pallas(
            bins.tile_gid, bins.tile_counts, means2d, prep.conic, prep.rgb,
            prep.opacity, prep.depths, grid_x, grid_y, ts,
            chunk=config.pallas_chunk, interpret=(mode == "pallas_interpret"),
        )
    else:
        out = blend_lib.blend_tiles(
            bins.tile_gid, bins.tile_mask, means2d, prep.conic, prep.rgb,
            prep.opacity, prep.depths, grid_x, grid_y, ts, chunk=config.chunk,
        )

    t_final = jnp.exp(out.log_t)                        # (T, npix)
    color_tiles = out.color + t_final[..., None] * bg[None, None, :]
    w, h = camera.width, camera.height
    color = blend_lib.tiles_to_image(color_tiles, grid_x, grid_y, ts, w, h)
    depth = blend_lib.tiles_to_image(out.depth, grid_x, grid_y, ts, w, h)
    alpha = blend_lib.tiles_to_image(1.0 - t_final, grid_x, grid_y, ts, w, h)

    n_touched = None
    if return_n_touched:
        n_touched = blend_lib.count_touched(
            bins.tile_gid, bins.tile_mask, means2d, prep.conic, prep.opacity,
            gaussians.xyz.shape[0], grid_x, grid_y, ts, chunk=config.chunk)

    return RenderOutput(
        color=color,
        depth=depth,
        alpha=alpha,
        radii=prep.radii,
        visibility=prep.radii > 0,
        num_rendered=bins.num_rendered,
        overflow=bins.overflow,
        tile_overflow=bins.tile_overflow,
        n_touched=n_touched,
        max_tile_count=bins.max_tile_count,
    )


def stream_regime_guard(
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig,
    log_fn=print,
) -> RasterizerConfig:
    """Auto-route around the stream kernels' known-bad regime.

    KNOWN_ISSUES.md #1: under the tunneled TPU runtime the stream blend
    kernels deterministically fault on scenes where EVERY tile is
    single-chunk (max per-tile count <= pallas_chunk, many empty tiles —
    the r4 accuracy-scene regime), while being stable on every
    multi-chunk workload (the 640x480 bench, pose refinement, the full
    suite). Until the runtime fault is root-caused, probe the regime
    host-side from one representative camera and fall back to the legacy
    pregathered kernels automatically — correctness must not depend on a
    user knowing to pass --no-stream (VERDICT r4 #2).

    Costs one compute_bins compile+dispatch for the probe camera; cached
    by the persistent compile cache across runs.
    """
    import os

    if os.environ.get("GSL_NO_STREAM_GUARD"):
        return config        # debug escape hatch: force the stream kernels
    if not config.use_stream or _blend_mode(config.backend) != "pallas":
        return config
    import jax

    bins = jax.jit(
        lambda g, c: compute_bins(g, c, config).max_tile_count
    )(gaussians, camera)
    mtc = int(bins)
    if mtc <= config.pallas_chunk:
        log_fn(
            f"stream-regime guard: all tiles single-chunk (max tile count "
            f"{mtc} <= chunk {config.pallas_chunk}) — routing to the "
            "legacy pregathered kernels (KNOWN_ISSUES.md #1)")
        return config.replace(use_stream=False)
    return config


def _blend_mode(backend: str) -> str:
    if backend in ("pallas", "pallas_interpret", "jnp"):
        return backend
    # auto: pallas on TPU, jnp elsewhere
    import jax

    try:
        return "pallas" if jax.default_backend() == "tpu" else "jnp"
    except Exception:  # pragma: no cover
        return "jnp"


def render(
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    bg: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    return_n_touched: bool = False,
) -> dict:
    """Reference-style render dict (gaussian_renderer/__init__.py:18-104)."""
    out = rasterize(gaussians, camera, config, bg, means2d_offset,
                    return_n_touched=return_n_touched)
    d = {
        "render": out.color,
        "depth": out.depth,
        "alpha": out.alpha,
        "radii": out.radii,
        "visibility_filter": out.visibility,
        "num_rendered": out.num_rendered,
        "overflow": out.overflow,
        "tile_overflow": out.tile_overflow,
    }
    if return_n_touched:
        d["n_touched"] = out.n_touched
    return d
