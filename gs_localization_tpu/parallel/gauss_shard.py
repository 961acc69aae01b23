"""Gaussian-axis sharded rendering and training (SURVEY.md §2.9, "TP" row).

The map's P Gaussians — parameters AND optimizer state — are sharded across
a ``gauss`` mesh axis, so scene capacity scales with the number of chips
(the reference is hard-capped by one GPU's HBM; its only answer to large
scenes is camera subsetting, gs/7scenes_gs_full_dslam.py:250-277).

Design (owner-computes + compact gather):

- **preprocess is fully local** to each shard: projection, EWA covariance,
  culling, SH→RGB run on P/n Gaussians per chip with zero communication —
  this is where the parameter bytes are big (59 floats/Gaussian at SH deg 3).
- **one all-gather of the compact screen-space splats** (means2d, conic,
  rgb, opacity, depth ≈ 10 floats/Gaussian) rides ICI; binning + blending
  then run on the gathered set. Gathering post-preprocess instead of the raw
  parameters cuts the collective bytes ~6x and skips dead/culled work.
- **backward needs no collective**: each chip re-uses its *own* copy of the
  blended loss's cotangent w.r.t. the gathered splats, slices out the rows
  it owns, and backprops them through its local preprocess (owner-computes;
  the cotangent is replicated because the blend inputs are). This is exact —
  validated against the single-device rasterizer in tests/test_parallel.py.

Compose with the ``data`` axis for multi-camera training: a 2-D
``('data', 'gauss')`` mesh shards cameras along rows and the map along
columns; per-shard gradients are ``pmean`` over 'data' only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..mapping import losses
from ..mapping.train import TRAINABLE
from ..raster import RasterizerConfig
from ..raster import binning as binning_lib
from ..raster import blend as blend_lib
from ..raster.preprocess import Preprocessed, preprocess

# Preprocessed splits into differentiable float fields (what the blend's
# gradient flows through) and integer/bool side outputs (culling + binning
# metadata, no cotangent).
_FLOATS = ("depths", "means2d", "conic", "rgb", "opacity")
_INTS = ("radii", "rect", "tiles_touched", "valid")


def _gather_prep(prep: Preprocessed, axis: str) -> Preprocessed:
    return Preprocessed(*[
        jax.lax.all_gather(getattr(prep, f), axis, tiled=True)
        for f in Preprocessed._fields
    ])


def _gather_tree(tree, axis: str):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, axis, tiled=True), tree)


def _blend_full(prep_full: Preprocessed, camera: Camera,
                config: RasterizerConfig, bg: jnp.ndarray):
    """Bin + blend a full gathered splat set; returns (color, depth, alpha)
    images plus binning diagnostics. Runs identically on every chip of the
    gauss axis (pixels replicated)."""
    ts = config.tile_size
    grid_x = -(-camera.width // ts)
    grid_y = -(-camera.height // ts)
    bins = binning_lib.bin_gaussians(
        prep_full, grid_x, grid_y, config.max_pairs, config.max_per_tile,
        fast_k=config.fast_k, tile_size=ts, tile_cull=config.tile_cull,
    )
    out = blend_lib.blend_tiles(
        bins.tile_gid, bins.tile_mask, prep_full.means2d, prep_full.conic,
        prep_full.rgb, prep_full.opacity, prep_full.depths,
        grid_x, grid_y, ts, chunk=config.chunk,
    )
    t_final = jnp.exp(out.log_t)
    color_tiles = out.color + t_final[..., None] * bg[None, None, :]
    w, h = camera.width, camera.height
    color = blend_lib.tiles_to_image(color_tiles, grid_x, grid_y, ts, w, h)
    depth = blend_lib.tiles_to_image(out.depth, grid_x, grid_y, ts, w, h)
    alpha = blend_lib.tiles_to_image(1.0 - t_final, grid_x, grid_y, ts, w, h)
    return color, depth, alpha, bins


def rasterize_gauss_sharded(
    mesh: Mesh,
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    bg: Optional[jnp.ndarray] = None,
    axis: Optional[str] = None,
):
    """Forward render with the Gaussian axis sharded over ``mesh``.

    ``gaussians`` capacity must divide the mesh size. Returns
    ``(color, depth, alpha, radii)`` — radii are per-Gaussian (full length,
    sharded over the mesh in device memory).
    """
    axis = axis or mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    cap = gaussians.capacity
    assert cap % n_dev == 0, (cap, n_dev)
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)

    ts = config.tile_size

    def device_fn(g_local: GaussianParams, cam: Camera, bg_: jnp.ndarray):
        prep = preprocess(g_local, cam, tile_size=ts,
                          scale_modifier=config.scale_modifier)
        prep_full = _gather_prep(prep, axis)
        color, depth, alpha, _ = _blend_full(prep_full, cam, config, bg_)
        return color, depth, alpha, prep.radii

    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(axis)),
        check_vma=False,
    )
    return fn(gaussians, camera, bg)


def gauss_sharded_loss_and_grads(
    mesh: Mesh,
    gaussians: GaussianParams,
    cameras: Camera,           # batched over 'data' axis (leading dim)
    gt_images: jnp.ndarray,    # (B, H, W, 3)
    config: RasterizerConfig = RasterizerConfig(),
    lambda_dssim: float = 0.2,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
):
    """Training loss + gradients on a 2-D ('data', 'gauss') mesh.

    Cameras shard over 'data'; Gaussian parameters (and therefore the
    returned gradients, and any optimizer state the caller keeps) shard over
    'gauss'. The backward is owner-computes: the blend's cotangent w.r.t.
    the gathered splats is computed on every chip (it is replicated along
    'gauss' because the blend inputs are), each chip slices out its own
    rows, and backprops through its local preprocess — zero backward
    collectives on the gauss axis; a single pmean on 'data'.
    """
    axes = dict(mesh.shape)
    n_gauss = axes[gauss_axis]
    cap = gaussians.capacity
    assert cap % n_gauss == 0, (cap, n_gauss)
    ts = config.tile_size

    trainable = {k: getattr(gaussians, k) for k in TRAINABLE}
    sh_degree, max_sh = gaussians.sh_degree, gaussians.max_sh_degree

    def device_fn(tr_local, live_local, cams_local, imgs_local):
        shard_idx = jax.lax.axis_index(gauss_axis)
        p_local = live_local.shape[0]

        def one_camera(cam, img):
            def prep_fn(tr):
                g = GaussianParams(
                    xyz=tr["xyz"], features_dc=tr["features_dc"],
                    features_rest=tr["features_rest"], scaling=tr["scaling"],
                    rotation=tr["rotation"], opacity=tr["opacity"],
                    live=live_local, sh_degree=sh_degree,
                    max_sh_degree=max_sh,
                )
                prep = preprocess(g, cam, tile_size=ts,
                                  scale_modifier=config.scale_modifier)
                floats = {f: getattr(prep, f) for f in _FLOATS}
                ints = {f: getattr(prep, f) for f in _INTS}
                return floats, ints  # ints are has_aux (no cotangent)

            floats_local, vjp_prep, ints_local = jax.vjp(
                prep_fn, tr_local, has_aux=True)
            floats_full = _gather_tree(floats_local, gauss_axis)
            ints_full = _gather_tree(ints_local, gauss_axis)

            def blend_loss(floats):
                pf = Preprocessed(**floats, **ints_full)
                color, _, _, _ = _blend_full(
                    pf, cam, config, jnp.zeros((3,), jnp.float32))
                loss, _ = losses.training_loss(
                    color, img, lambda_dssim=lambda_dssim)
                return loss

            loss, vjp_blend = jax.vjp(blend_loss, floats_full)
            (cot_full,) = vjp_blend(jnp.ones((), jnp.float32))
            # owner-computes: slice this chip's rows of the (replicated)
            # cotangent, push through the local preprocess only.
            cot_local = {
                f: jax.lax.dynamic_slice_in_dim(
                    cot_full[f], shard_idx * p_local, p_local, 0)
                for f in _FLOATS
            }
            (grads,) = vjp_prep(cot_local)
            return loss, grads

        loss, grads = jax.vmap(one_camera)(cams_local, imgs_local)
        loss = jnp.mean(loss)
        grads = jax.tree_util.tree_map(lambda g: jnp.mean(g, 0), grads)
        loss = jax.lax.pmean(loss, data_axis)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, data_axis), grads)
        return loss, grads

    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(gauss_axis), P(gauss_axis), P(data_axis), P(data_axis)),
        out_specs=(P(), P(gauss_axis)),
        check_vma=False,
    )
    return fn(trainable, gaussians.live, cameras, gt_images)


def make_mesh_2d(n_data: int, n_gauss: int,
                 names=("data", "gauss")) -> Mesh:
    devs = np.asarray(jax.devices()[: n_data * n_gauss])
    return Mesh(devs.reshape(n_data, n_gauss), names)
