"""Per-tile alpha compositing as cumulative-transmittance linear algebra.

The reference blends sequentially per pixel (one CUDA thread each,
forward.cu:263-379). A scalar sequential loop would waste the TPU's vector
units, so the recurrence is re-expressed in closed form per chunk of G
front-to-back Gaussians:

    T_incl(i)  = T_in * prod_{j<=i} (1 - alpha_j)          (monotone in i)
    applied(i) = T_incl(i) >= 1e-4                         (saturation cutoff)
    w_i        = alpha_i * T_incl(i) / (1 - alpha_i)       (= alpha_i * T_before)
    color      = sum_i w_i * rgb_i        -> one (pixels x G) @ (G x 3) matmul
    depth      = sum_i w_i * depth_i

computed in log space (cumsum of log1p(-alpha)) for stability. Because T is
monotone non-increasing, the reference's sticky per-pixel ``done`` flag
(forward.cu:349-354) is exactly the mask ``T_incl >= 1e-4`` — no sequential
state needed beyond the per-chunk carry of log T.

This module is pure jnp (runs anywhere, reverse-differentiable through
lax.scan). The Pallas TPU kernel in ``pallas_blend.py`` implements the same
math with per-tile early exit; this version doubles as its correctness oracle
and as the CPU fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .constants import ALPHA_MAX, ALPHA_MIN, LOG_T_EPS  # noqa: F401
# (shared with binning's per-tile opacity cull — raster/constants.py)


class TileBlendOut(NamedTuple):
    color: jnp.ndarray     # (num_tiles, ts*ts, 3)
    depth: jnp.ndarray     # (num_tiles, ts*ts)
    log_t: jnp.ndarray     # (num_tiles, ts*ts) final log transmittance


def tile_pixel_coords(grid_x: int, grid_y: int, tile_size: int) -> jnp.ndarray:
    """(num_tiles, ts*ts, 2) pixel-center coordinates (x, y) per tile."""
    t = jnp.arange(grid_x * grid_y)
    ox = (t % grid_x) * tile_size
    oy = (t // grid_x) * tile_size
    ii = jnp.arange(tile_size * tile_size)
    lx = ii % tile_size
    ly = ii // tile_size
    x = ox[:, None] + lx[None, :]
    y = oy[:, None] + ly[None, :]
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def compute_alpha(
    xy: jnp.ndarray,      # (..., 2) gaussian centers (pixels)
    conic: jnp.ndarray,   # (..., 3)
    opacity: jnp.ndarray,  # (...,)
    pix: jnp.ndarray,     # (..., 2) pixel coords (broadcastable)
) -> jnp.ndarray:
    """Reference alpha (forward.cu:334-346): zero where power>0 or < 1/255."""
    dx = xy[..., 0] - pix[..., 0]
    dy = xy[..., 1] - pix[..., 1]
    power = (
        -0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy)
        - conic[..., 1] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    return jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)


def blend_tiles(
    tile_gid: jnp.ndarray,    # (num_tiles, max_per_tile) int32
    tile_mask: jnp.ndarray,   # (num_tiles, max_per_tile) bool
    means2d: jnp.ndarray,     # (P, 2)
    conic: jnp.ndarray,       # (P, 3)
    rgb: jnp.ndarray,         # (P, 3)
    opacity: jnp.ndarray,     # (P,)
    depths: jnp.ndarray,      # (P,)
    grid_x: int,
    grid_y: int,
    tile_size: int,
    chunk: int = 64,
    pix: jnp.ndarray = None,
) -> TileBlendOut:
    """``pix`` overrides the per-tile pixel coordinates — used by the
    tile-sharded path where rows are a local slice of the global grid."""
    num_tiles, max_per_tile = tile_gid.shape
    assert max_per_tile % chunk == 0, (max_per_tile, chunk)
    n_chunks = max_per_tile // chunk
    npix = tile_size * tile_size
    if pix is None:
        pix = tile_pixel_coords(grid_x, grid_y, tile_size)  # (T, npix, 2)

    gid_c = tile_gid.reshape(num_tiles, n_chunks, chunk).swapaxes(0, 1)
    mask_c = tile_mask.reshape(num_tiles, n_chunks, chunk).swapaxes(0, 1)

    def step(carry, inp):
        # Two log-T carries: ``log_t_full`` accumulates EVERY alpha and is the
        # monotone saturation test (once below log(1e-4) it stays below —
        # this reproduces the reference's sticky per-pixel ``done`` flag,
        # forward.cu:349-354, across chunk boundaries). ``log_t`` accumulates
        # only *applied* alphas and is the actual final transmittance.
        # Wherever applied is true the two carries coincide, so using
        # ``clog`` (full) for the weights is exact.
        log_t_full, log_t, color, depth_acc = carry
        gid, mask = inp                                   # (T, G)
        xy = means2d[gid]                                 # (T, G, 2)
        con = conic[gid]
        opa = jnp.where(mask, opacity[gid], 0.0)
        col = rgb[gid]                                    # (T, G, 3)
        dep = depths[gid]

        alpha = compute_alpha(
            xy[:, :, None, :], con[:, :, None, :], opa[:, :, None], pix[:, None, :, :]
        )                                                 # (T, G, npix)
        la = jnp.log1p(-alpha)
        clog = log_t_full[:, None, :] + jnp.cumsum(la, axis=1)  # T_incl, log space
        applied = clog >= LOG_T_EPS
        w = jnp.where(applied, alpha * jnp.exp(clog - la), 0.0)
        color = color + jnp.einsum(
            "tgp,tgc->tpc", w, col, preferred_element_type=jnp.float32
        )
        depth_acc = depth_acc + jnp.sum(w * dep[:, :, None], axis=1)
        log_t_full = log_t_full + jnp.sum(la, axis=1)
        log_t = log_t + jnp.sum(jnp.where(applied, la, 0.0), axis=1)
        return (log_t_full, log_t, color, depth_acc), None

    init = (
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix, 3), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
    )
    (_, log_t, color, depth_acc), _ = jax.lax.scan(step, init, (gid_c, mask_c))
    return TileBlendOut(color=color, depth=depth_acc, log_t=log_t)


def blend_tiles_pregathered(
    geom: jnp.ndarray,        # (num_tiles, 8, cap): x,y,a,b,c,opa,valid,pad
    rgbd: jnp.ndarray,        # (num_tiles, 4, cap): r,g,b,depth
    counts: jnp.ndarray,      # (num_tiles,)
    grid_x: int,
    grid_y: int,
    tile_size: int,
    chunk: int = 64,
) -> TileBlendOut:
    """jnp twin of the pregathered Pallas core (pose-mode path): same math
    as ``blend_tiles`` but over per-PAIR struct-of-rows arrays, no gather."""
    num_tiles, _, cap = geom.shape
    assert cap % chunk == 0, (cap, chunk)
    n_chunks = cap // chunk
    npix = tile_size * tile_size
    pix = tile_pixel_coords(grid_x, grid_y, tile_size)   # (T, npix, 2)
    lane = jnp.arange(cap)
    in_count = lane[None, :] < counts[:, None]           # (T, cap)

    g_c = geom.reshape(num_tiles, 8, n_chunks, chunk).transpose(2, 0, 1, 3)
    r_c = rgbd.reshape(num_tiles, 4, n_chunks, chunk).transpose(2, 0, 1, 3)
    m_c = in_count.reshape(num_tiles, n_chunks, chunk).swapaxes(0, 1)

    def step(carry, inp):
        log_t_full, log_t, color, depth_acc = carry
        g, r, mask = inp                                  # (T,8,G),(T,4,G)
        xy = jnp.stack([g[:, 0], g[:, 1]], -1)            # (T, G, 2)
        con = jnp.stack([g[:, 2], g[:, 3], g[:, 4]], -1)
        opa = jnp.where(mask & (g[:, 6] > 0.5), g[:, 5], 0.0)
        col = jnp.moveaxis(r[:, 0:3], 1, 2)               # (T, G, 3)
        dep = r[:, 3]                                     # (T, G)
        alpha = compute_alpha(
            xy[:, :, None, :], con[:, :, None, :], opa[:, :, None],
            pix[:, None, :, :])
        la = jnp.log1p(-alpha)
        clog = log_t_full[:, None, :] + jnp.cumsum(la, axis=1)
        applied = clog >= LOG_T_EPS
        w = jnp.where(applied, alpha * jnp.exp(clog - la), 0.0)
        color = color + jnp.einsum(
            "tgp,tgc->tpc", w, col, preferred_element_type=jnp.float32)
        depth_acc = depth_acc + jnp.sum(w * dep[:, :, None], axis=1)
        log_t_full = log_t_full + jnp.sum(la, axis=1)
        log_t = log_t + jnp.sum(jnp.where(applied, la, 0.0), axis=1)
        return (log_t_full, log_t, color, depth_acc), None

    init = (
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
        jnp.zeros((num_tiles, npix, 3), jnp.float32),
        jnp.zeros((num_tiles, npix), jnp.float32),
    )
    (_, log_t, color, depth_acc), _ = jax.lax.scan(step, init,
                                                   (g_c, r_c, m_c))
    return TileBlendOut(color=color, depth=depth_acc, log_t=log_t)


def count_touched(
    tile_gid: jnp.ndarray,    # (num_tiles, max_per_tile) int32
    tile_mask: jnp.ndarray,   # (num_tiles, max_per_tile) bool
    means2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    num_gaussians: int,
    grid_x: int,
    grid_y: int,
    tile_size: int,
    chunk: int = 64,
) -> jnp.ndarray:
    """Per-Gaussian count of pixels it contributed to (``n_touched``).

    Mirrors the MonoGS pose rasterizer's fifth output
    (/root/reference/gs_localization/pipelines/tools/__init__.py:130,152):
    a pixel is "touched" when the Gaussian passed the alpha test (>=1/255,
    power<=0) and the pixel was not yet saturated (T >= 1e-4). Used by
    SLAM-style keyframing/pruning policies; diagnostic-path only, so it is
    a separate pass over the same bins rather than baggage in the hot blend.
    """
    num_tiles, max_per_tile = tile_gid.shape
    assert max_per_tile % chunk == 0
    n_chunks = max_per_tile // chunk
    npix = tile_size * tile_size
    pix = tile_pixel_coords(grid_x, grid_y, tile_size)

    gid_c = tile_gid.reshape(num_tiles, n_chunks, chunk).swapaxes(0, 1)
    mask_c = tile_mask.reshape(num_tiles, n_chunks, chunk).swapaxes(0, 1)

    def step(carry, inp):
        log_t_full, touched = carry
        gid, mask = inp
        xy = means2d[gid]
        con = conic[gid]
        opa = jnp.where(mask, opacity[gid], 0.0)
        alpha = compute_alpha(
            xy[:, :, None, :], con[:, :, None, :], opa[:, :, None],
            pix[:, None, :, :])
        la = jnp.log1p(-alpha)
        clog = log_t_full[:, None, :] + jnp.cumsum(la, axis=1)
        hit = (alpha > 0.0) & (clog >= LOG_T_EPS)          # (T, G, npix)
        counts = jnp.sum(hit, axis=-1).astype(jnp.int32)   # (T, G)
        touched = touched.at[gid.reshape(-1)].add(
            jnp.where(mask, counts, 0).reshape(-1), mode="drop")
        log_t_full = log_t_full + jnp.sum(la, axis=1)
        return (log_t_full, touched), None

    init = (jnp.zeros((num_tiles, npix), jnp.float32),
            jnp.zeros((num_gaussians,), jnp.int32))
    (_, touched), _ = jax.lax.scan(step, init, (gid_c, mask_c))
    return touched


def tiles_to_image(
    tiles: jnp.ndarray, grid_x: int, grid_y: int, tile_size: int,
    width: int, height: int,
) -> jnp.ndarray:
    """(num_tiles, ts*ts, C?) -> (H, W, C?) cropping tile padding."""
    chan = tiles.shape[2:] if tiles.ndim > 2 else ()
    img = tiles.reshape((grid_y, grid_x, tile_size, tile_size) + chan)
    img = jnp.moveaxis(img, 2, 1).reshape(
        (grid_y * tile_size, grid_x * tile_size) + chan
    )
    return img[:height, :width]
