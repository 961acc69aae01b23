"""Pose-mode rendering: per-pair projection with zero per-iteration gather.

The pose-refinement inner loop (SURVEY.md §3.2) renders the same Gaussian
set ~50 times while the pose moves by ~1e-3 per step. The standard path
re-gathers per-Gaussian screen-space rows into per-tile lists every
iteration; on TPU that assembly dominated the r2 step cost (r3's stream
layout shrank it — benchmarks/ROOFLINE_r03.log — but pose mode still wins
by skipping per-iteration binning AND assembly entirely: 28.9 vs 8.0
Mpix/s fwd+bwd on v5e).

Pose mode restructures the loop:

  per rebin  : preprocess + binning at the current pose, then ONE gather of
               pose-INDEPENDENT params per pair — xyz, cov3d (6), opacity,
               rgb (rgb frozen at the rebin view direction: the pose moves
               ~1e-3 within a rebin window, so the SH view-dependence
               change is O(1e-3) and vanishes at convergence where the
               reference evaluates it exactly). Two layouts: the UNCAPPED
               aligned pair stream (``StreamPairPack`` — the product path
               on TPU, stream_blend DMA windows, per-tile lists never
               truncated) and the legacy capped (T, 16, cap) window matrix
               (``PairPack`` — the jnp twin off-TPU).
  per iter   : project each pair ELEMENTWISE under the current pose (the
               exact forward.cu:74-256 math — view transform, EWA Jacobian
               with 1.3 tan-fov clamp, +0.3 low-pass, conic, pixel coords,
               near cull) and feed the pregathered blend kernel. No gather;
               the backward is elementwise + a 6-dim reduction — no
               scatter-add (Gaussian params are frozen constants here).

Row layouts match pallas_blend: geom = [x, y, a, b, c, opa, valid, pad],
rgbd = [r, g, b, depth].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from . import binning as binning_lib
from . import blend as blend_lib
from .preprocess import build_cov3d, preprocess
from .rasterize import RasterizerConfig


class PairPack(NamedTuple):
    params: jnp.ndarray      # (T, 16, cap) pose-independent per-pair rows
    counts: jnp.ndarray      # (T,) int32
    overflow: jnp.ndarray    # () bool


class StreamPairPack(NamedTuple):
    """Pose-independent params laid out as an ALIGNED pair stream.

    The legacy ``PairPack`` gathers into a truncating (T, 16, cap) window
    matrix — the layout whose cap crashed the r3 bench at 100k-Gaussian
    scale (BENCH_r03.json). This pack reuses the stream-v2 binning
    (binning.bin_stream): per-tile lists are NEVER truncated (no
    max_per_tile); the only capacities are the slow-pair pool and the
    materialized stream, both surfaced via ``overflow``. Per iteration the
    params project elementwise (``_project_stream``) into blend-layout
    stream rows consumed by the DMA-window kernels
    (stream_blend.blend_stream_direct) — zero gathers in the loop, and the
    backward chains the stream cotangent through the elementwise
    projection straight to the 6-dim camera tangent.

    Rows (16, MR_AL+chunk): 0..2 xyz, 3..8 cov3d (upper triangle), 9
    opacity, 10 valid, 11..13 rgb (frozen at the rebin view dir), 14..15
    pad. Dead positions (alignment gaps / truncated tail) are all-zero.
    """

    params: jnp.ndarray       # (16, MR_AL+chunk) transposed stream rows
    tstart: jnp.ndarray       # (num_tiles,) int32 aligned tile starts
    walk_counts: jnp.ndarray  # (num_tiles,) int32
    kept_al: jnp.ndarray      # () int32 live aligned-stream length
    overflow: jnp.ndarray     # () bool

# param rows
_PX, _PY, _PZ = 0, 1, 2
_C00, _C01, _C02, _C11, _C12, _C22 = 3, 4, 5, 6, 7, 8
_POPA, _PVALID, _PR, _PG, _PB = 9, 10, 11, 12, 13


def build_pair_pack(
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig,
) -> PairPack:
    """Preprocess + bin at the given pose, gather params per pair (once)."""
    ts = config.tile_size
    grid_x = -(-camera.width // ts)
    grid_y = -(-camera.height // ts)
    prep = preprocess(gaussians, camera, tile_size=ts,
                      scale_modifier=config.scale_modifier)
    bins = binning_lib.bin_gaussians(
        prep, grid_x, grid_y, config.max_pairs, config.max_per_tile,
        fast_k=config.fast_k, tile_size=ts, tile_cull=config.tile_cull)
    cov3d = build_cov3d(gaussians.get_scaling, gaussians.get_rotation,
                        config.scale_modifier)
    zeros = jnp.zeros_like(prep.opacity)
    pack = jnp.stack(
        [gaussians.xyz[:, 0], gaussians.xyz[:, 1], gaussians.xyz[:, 2],
         cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2],
         cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2],
         prep.opacity, prep.valid.astype(jnp.float32),
         prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
         zeros, zeros], axis=1)                        # (P, 16)
    pairs = jnp.swapaxes(pack[bins.tile_gid], 1, 2)    # (T, 16, cap)
    return PairPack(params=jax.lax.stop_gradient(pairs),
                    counts=bins.tile_counts,
                    overflow=bins.overflow | bins.tile_overflow)


def _project_core(camera: Camera, x, y, z, c00, c01, c02, c11, c12, c22,
                  prep_valid, near_cull: float = 0.2):
    """Elementwise per-pair projection under the current pose.

    Exact per-Gaussian preprocess math (preprocess.py:80-149) applied to
    arrays of any shape, differentiable w.r.t. the camera only. Returns
    (px, py, conic_a, conic_b, conic_c, valid_f, view_z).
    """
    w2c = camera.w2c
    fx, fy = camera.fx, camera.fy
    width, height = camera.width, camera.height
    R, t = w2c[:3, :3], w2c[:3, 3]
    vx = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    vy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    vz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]

    # clip projection through full_proj (row-major application as in
    # preprocess: p_hom = xyz @ FP[:3,:3].T + FP[:3,3])
    FP = camera.full_proj
    hx = FP[0, 0] * x + FP[0, 1] * y + FP[0, 2] * z + FP[0, 3]
    hy = FP[1, 0] * x + FP[1, 1] * y + FP[1, 2] * z + FP[1, 3]
    hw = FP[3, 0] * x + FP[3, 1] * y + FP[3, 2] * z + FP[3, 3]
    inv_w = 1.0 / (hw + 1e-7)
    px = ((hx * inv_w + 1.0) * width - 1.0) * 0.5
    py = ((hy * inv_w + 1.0) * height - 1.0) * 0.5

    # cov3d rows -> camera frame: Vc = R C R^T, needed entries only
    def rowmul(i):
        # (R C)_i* rows
        m0 = R[i, 0] * c00 + R[i, 1] * c01 + R[i, 2] * c02
        m1 = R[i, 0] * c01 + R[i, 1] * c11 + R[i, 2] * c12
        m2 = R[i, 0] * c02 + R[i, 1] * c12 + R[i, 2] * c22
        return m0, m1, m2

    r0 = rowmul(0)
    r1 = rowmul(1)
    r2 = rowmul(2)

    def dot(row, j):
        return row[0] * R[j, 0] + row[1] * R[j, 1] + row[2] * R[j, 2]

    v00 = dot(r0, 0)
    v01 = dot(r0, 1)
    v02 = dot(r0, 2)
    v11 = dot(r1, 1)
    v12 = dot(r1, 2)
    v22 = dot(r2, 2)

    z_safe = jnp.where(jnp.abs(vz) < 1e-6, 1e-6, vz)
    lim_x = 1.3 * camera.tan_fovx
    lim_y = 1.3 * camera.tan_fovy
    tx = jnp.clip(vx / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(vy / z_safe, -lim_y, lim_y) * z_safe
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    a = j00 * j00 * v00 + 2.0 * j00 * j02 * v02 + j02 * j02 * v22 + 0.3
    b = j00 * j11 * v01 + j00 * j12 * v02 + j02 * j11 * v12 \
        + j02 * j12 * v22
    c = j11 * j11 * v11 + 2.0 * j11 * j12 * v12 + j12 * j12 * v22 + 0.3

    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv_det = 1.0 / det_safe
    valid = (prep_valid > 0.5) & (vz > near_cull) & (jnp.abs(det) > 1e-12)
    return (px, py, c * inv_det, -b * inv_det, a * inv_det,
            valid.astype(jnp.float32), vz)


def _project_pairs(params: jnp.ndarray, camera: Camera,
                   near_cull: float = 0.2
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(T, 16, cap) params + pose -> (geom (T,8,cap), rgbd (T,4,cap))."""
    px, py, ia, ib, ic, validf, vz = _project_core(
        camera, params[:, _PX], params[:, _PY], params[:, _PZ],
        params[:, _C00], params[:, _C01], params[:, _C02],
        params[:, _C11], params[:, _C12], params[:, _C22],
        params[:, _PVALID], near_cull)
    geom = jnp.stack(
        [px, py, ia, ib, ic, params[:, _POPA], validf,
         jnp.zeros_like(px)], axis=1)
    rgbd = jnp.stack(
        [params[:, _PR], params[:, _PG], params[:, _PB], vz], axis=1)
    return geom, rgbd


def _project_stream(params: jnp.ndarray, camera: Camera,
                    near_cull: float = 0.2) -> jnp.ndarray:
    """(16, N) stream params + pose -> (16, N) blend-layout stream rows.

    Output rows match stream_blend: [x, y, a, b, c, opa, valid, pad,
    r, g, b, depth, 0, 0, 0, 0]. Dead positions (all-zero params) project
    to valid == 0 (their cov2d determinant is 0), so the blend gates them.
    """
    px, py, ia, ib, ic, validf, vz = _project_core(
        camera, params[_PX], params[_PY], params[_PZ],
        params[_C00], params[_C01], params[_C02],
        params[_C11], params[_C12], params[_C22],
        params[_PVALID], near_cull)
    zero = jnp.zeros_like(px)
    return jnp.stack(
        [px, py, ia, ib, ic, params[_POPA], validf, zero,
         params[_PR], params[_PG], params[_PB], vz,
         zero, zero, zero, zero], axis=0)


def build_stream_pair_pack(
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig,
) -> StreamPairPack:
    """Preprocess + stream-bin at the given pose, gather params ONCE into
    the aligned pair stream (see StreamPairPack). No per-tile cap."""
    ts = config.tile_size
    grid_x = -(-camera.width // ts)
    grid_y = -(-camera.height // ts)
    chunk = config.pallas_chunk
    prep = preprocess(gaussians, camera, tile_size=ts,
                      scale_modifier=config.scale_modifier)
    sbins = binning_lib.bin_stream(
        prep, grid_x, grid_y, config.max_pairs,
        config.max_render or config.max_pairs,
        fast_k=max(config.fast_k, 1), align=chunk,
        tile_size=ts, tile_cull=config.tile_cull)
    cov3d = build_cov3d(gaussians.get_scaling, gaussians.get_rotation,
                        config.scale_modifier)
    pack = jnp.stack(
        [gaussians.xyz[:, 0], gaussians.xyz[:, 1], gaussians.xyz[:, 2],
         cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2],
         cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2],
         prep.opacity, prep.valid.astype(jnp.float32),
         prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2]], axis=1)  # (P, 14)
    pack = jnp.concatenate(
        [pack, jnp.zeros((pack.shape[0], 2), pack.dtype)], axis=1)  # (P, 16)
    # dead row P: zero params -> det == 0 -> gated out of the blend
    pack_pad = jnp.concatenate(
        [pack, jnp.zeros((1, 16), pack.dtype)], axis=0)
    stream = pack_pad[sbins.gid_of_pos]                   # (MR_AL, 16)
    mr_al = stream.shape[0]
    stream_t = jnp.concatenate(
        [jnp.swapaxes(stream, 0, 1),
         jnp.zeros((16, chunk), pack.dtype)], axis=1)     # (16, MR_AL+chunk)
    return StreamPairPack(
        params=jax.lax.stop_gradient(stream_t),
        tstart=sbins.tstart,
        walk_counts=sbins.walk_counts,
        kept_al=sbins.kept_al,
        overflow=sbins.overflow | sbins.tile_overflow,
    )


def render_pose_mode(
    pack: PairPack,
    camera: Camera,
    config: RasterizerConfig,
    bg: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (color (H,W,3), depth (H,W), alpha (H,W)) at the given pose.

    Accepts either a ``StreamPairPack`` (uncapped stream layout, Pallas
    DMA-window kernels — the product default on TPU) or the legacy capped
    ``PairPack`` (pregathered windows; also the jnp-twin path on CPU).
    """
    ts = config.tile_size
    grid_x = -(-camera.width // ts)
    grid_y = -(-camera.height // ts)
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    mode = backend or config.backend
    if mode == "auto":
        mode = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if isinstance(pack, StreamPairPack):
        from .stream_blend import blend_stream_direct

        assert mode in ("pallas", "pallas_interpret"), (
            "StreamPairPack requires the pallas stream kernels "
            "(use pallas_interpret off-TPU)")
        stream_t = _project_stream(pack.params, camera)
        out = blend_stream_direct(
            stream_t, pack.tstart, pack.walk_counts, pack.kept_al,
            grid_x, ts, chunk=config.pallas_chunk,
            interpret=(mode == "pallas_interpret"))
    elif mode in ("pallas", "pallas_interpret"):
        from .pallas_blend import blend_pregathered_pallas

        geom, rgbd = _project_pairs(pack.params, camera)
        out = blend_pregathered_pallas(
            pack.counts, geom, rgbd, grid_x, ts,
            chunk=config.pallas_chunk,
            interpret=(mode == "pallas_interpret"))
    else:
        geom, rgbd = _project_pairs(pack.params, camera)
        out = blend_lib.blend_tiles_pregathered(
            geom, rgbd, pack.counts, grid_x, grid_y, ts, chunk=config.chunk)
    t_final = jnp.exp(out.log_t)
    color_tiles = out.color + t_final[..., None] * bg[None, None, :]
    w, h = camera.width, camera.height
    color = blend_lib.tiles_to_image(color_tiles, grid_x, grid_y, ts, w, h)
    depth = blend_lib.tiles_to_image(out.depth, grid_x, grid_y, ts, w, h)
    alpha = blend_lib.tiles_to_image(1.0 - t_final, grid_x, grid_y, ts, w, h)
    return color, depth, alpha
