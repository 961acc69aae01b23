"""Pallas TPU tile-blend kernels (forward + analytic backward, custom_vjp).

Same math as ``blend.py`` (the jnp oracle), reorganized for the TPU:

- one grid step per 16x16 tile; the tile's Gaussian list (already gathered to
  a dense (8, cap)/(4, cap) struct-of-rows layout with the pair axis on
  lanes) is DMA'd to VMEM by the BlockSpec pipeline.
- the front-to-back recurrence runs as chunks of G Gaussians: the in-chunk
  inclusive prefix sum of log(1-alpha) is one (npix, G) @ (G, G) triangular
  matmul (MXU), the color/depth accumulation is one (4, G) x (npix, G)
  contraction per chunk (MXU).
- per-tile **early exit**: a while_loop stops as soon as every pixel is
  saturated (max log T < log 1e-4) or the list is exhausted — the analog of
  the reference's block-vote break (forward.cu:312-314) without warp votes.
- the backward kernel re-walks the list back-to-front (reference
  backward.cu:399-581) with a reverse suffix-sum matmul instead of atomics;
  per-Gaussian gradients leave the kernel per-pair. (These pregathered
  kernels serve the pose-mode path, whose params are constants per rebin;
  the standard training path uses the DMA-stream kernels in
  stream_blend.py, which reduce per-pair grads in slot order instead of
  scatter-adding.)

Everything is f32; counts ride scalar prefetch (SMEM) so index math can
happen before the body runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend import ALPHA_MAX, ALPHA_MIN, LOG_T_EPS, TileBlendOut

# geom rows
_GX, _GY, _GA, _GB, _GC, _GOPA, _GVALID = 0, 1, 2, 3, 4, 5, 6
_GEOM_ROWS = 8
_RGBD_ROWS = 4


def _pixel_coords(tile_id, grid_x: int, ts: int, npix: int):
    """(npix, 1) pixel-center x and y for this tile."""
    ox = (tile_id % grid_x) * ts
    oy = (tile_id // grid_x) * ts
    ii = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px = (ox + ii % ts).astype(jnp.float32)
    py = (oy + ii // ts).astype(jnp.float32)
    return px, py


def _chunk_alpha(geom_ref, i, sl, px, py, count, k, chunk: int):
    """Gated alpha for one chunk: (npix, G) plus raw/clamp gate info."""
    x = geom_ref[i, _GX : _GX + 1, sl]          # (1, G)
    y = geom_ref[i, _GY : _GY + 1, sl]
    ca = geom_ref[i, _GA : _GA + 1, sl]
    cb = geom_ref[i, _GB : _GB + 1, sl]
    cc = geom_ref[i, _GC : _GC + 1, sl]
    opa = geom_ref[i, _GOPA : _GOPA + 1, sl]
    vld = geom_ref[i, _GVALID : _GVALID + 1, sl]

    dx = x - px                                  # (npix, G)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(jnp.minimum(power, 0.0))
    araw = opa * expp
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + k * chunk
    gate = (
        (power <= 0.0)
        & (araw >= ALPHA_MIN)
        & (vld > 0.5)
        & (lane < count)
    )
    alpha = jnp.where(gate, jnp.minimum(ALPHA_MAX, araw), 0.0)
    unclamped = gate & (araw < ALPHA_MAX)
    return alpha, araw, expp, gate, unclamped, (dx, dy, ca, cb, cc)


def _fwd_kernel(counts_ref, geom_ref, rgbd_ref, accum_ref, logt_ref,
                resid_ref,
                *, grid_x: int, ts: int, cap: int, chunk: int, tpb: int):
    npix = ts * ts

    # inclusive-prefix matrix: tri[r, c] = 1 iff r <= c
    r_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (r_i <= c_i).astype(jnp.float32)

    # tpb tiles per grid step: a 1200-step grid of (1, 12, cap) blocks pays
    # ~1200x the fixed per-step pipeline cost and DMAs tiny blocks; grouping
    # amortizes both (v5e bench shape: fwd 7.7 -> 1.8 ms, fwd+bwd 11.7 ->
    # 6.4 ms at tpb=8 — benchmarks/kernel_probe.py, ROOFLINE_r03.log).
    for i in range(tpb):
        t = pl.program_id(0) * tpb + i
        count = counts_ref[t]
        n_chunks = pl.cdiv(count, chunk)
        px, py = _pixel_coords(t, grid_x, ts, npix)

        def cond(state):
            k, log_full, _, _ = state
            return (k < n_chunks) & (jnp.max(log_full) >= LOG_T_EPS)

        def body(state):
            k, log_full, log_app, acc = state
            sl = pl.ds(k * chunk, chunk)
            alpha, _, _, _, _, _ = _chunk_alpha(
                geom_ref, i, sl, px, py, count, k, chunk)
            la = jnp.log(1.0 - alpha)
            clog = log_full + jnp.dot(la, tri,
                                      preferred_element_type=jnp.float32)
            applied = clog >= LOG_T_EPS
            w = jnp.where(applied, alpha * jnp.exp(clog - la), 0.0)
            rgbd = rgbd_ref[i, :, sl]                            # (4, G)
            acc = acc + jax.lax.dot_general(
                rgbd, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # (4, npix)
            log_full = log_full + jnp.sum(la, axis=1, keepdims=True)
            log_app = log_app + jnp.sum(
                jnp.where(applied, la, 0.0), axis=1, keepdims=True
            )
            return k + 1, log_full, log_app, acc

        init = (
            jnp.int32(0),
            jnp.zeros((npix, 1), jnp.float32),
            jnp.zeros((npix, 1), jnp.float32),
            jnp.zeros((4, npix), jnp.float32),
        )
        k_stop, log_full, log_app, acc = jax.lax.while_loop(cond, body, init)
        accum_ref[i] = acc
        logt_ref[i] = log_app
        # residuals for the backward pass: the all-alphas log T where the
        # sweep stopped (channel 0) and k_stop broadcast as f32 (channel 1)
        # — saves bwd from re-walking the forward. (Scalar SMEM outputs need
        # aligned blocks on real TPU, so the scalar rides a VMEM lane.)
        resid_ref[i] = jnp.concatenate(
            [log_full, jnp.full((ts * ts, 1), k_stop.astype(jnp.float32))],
            -1)


def _bwd_kernel(counts_ref, geom_ref, rgbd_ref, gacc_ref,
                glogt_ref, resid_ref, dgeom_ref, drgbd_ref,
                *, grid_x: int, ts: int, cap: int, chunk: int, tpb: int):
    npix = ts * ts

    r_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (r_i <= c_i).astype(jnp.float32)       # inclusive prefix
    tri_after = (r_i > c_i).astype(jnp.float32)  # strict suffix (k' > i)

    for i in range(tpb):
        t = pl.program_id(0) * tpb + i
        count = counts_ref[t]
        px, py = _pixel_coords(t, grid_x, ts, npix)

        dgeom_ref[i] = jnp.zeros((_GEOM_ROWS, cap), jnp.float32)
        drgbd_ref[i] = jnp.zeros((_RGBD_ROWS, cap), jnp.float32)

        # forward-sweep endpoint comes precomputed from the forward kernel's
        # residual output (ch 0 = final all-alphas log T, ch 1 = k_stop);
        # the reverse sweep reconstructs each chunk's starting log T by
        # subtracting the chunk's own sum(la) while walking backward — Mosaic
        # disallows dynamic lane-indexed stores, and this is cheaper anyway.
        k_stop = resid_ref[i, 0, 1].astype(jnp.int32)
        log_full_end = resid_ref[i, :, 0:1]

        # ---- reverse sweep accumulating gradients -------------------------
        gacc = gacc_ref[i]                       # (4, npix)
        glogt = glogt_ref[i]                     # (npix, 1)

        def condB(state):
            j, _ = state
            return j < k_stop

        def bodyB(state):
            j, carry = state
            k = k_stop - 1 - j

            def compute(carry):
                s_carry, log_full_end = carry
                sl = pl.ds(pl.multiple_of(k * chunk, chunk), chunk)
                alpha, araw, expp, gate, unclamped, geo = _chunk_alpha(
                    geom_ref, i, sl, px, py, count, k, chunk
                )
                dx, dy, ca, cb, cc = geo
                la = jnp.log(1.0 - alpha)
                la_sum = jnp.sum(la, axis=1, keepdims=True)
                log_full0 = log_full_end - la_sum
                clog = log_full0 + jnp.dot(
                    la, tri, preferred_element_type=jnp.float32
                )
                applied = clog >= LOG_T_EPS
                w = jnp.where(applied, alpha * jnp.exp(clog - la), 0.0)

                rgbd = rgbd_ref[i, :, sl]        # (4, G)
                # dL/dw (npix, G) and dL/drgbd (4, G)
                wbar = jax.lax.dot_general(
                    gacc, rgbd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                # (npix, G)
                drgbd = jax.lax.dot_general(
                    gacc, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                # (4, G)
                drgbd_ref[i, :, sl] = drgbd

                m = wbar * w                     # (npix, G)
                suffix = jnp.dot(m, tri_after,
                                 preferred_element_type=jnp.float32)
                labar = suffix + s_carry + jnp.where(applied, glogt, 0.0)
                t_prev = jnp.exp(clog - la)
                abar = (
                    jnp.where(applied, wbar * t_prev, 0.0)
                    - labar / (1.0 - alpha)
                )
                dpow = jnp.where(unclamped, abar * araw, 0.0)
                dopa = jnp.where(unclamped, abar * expp, 0.0)
                dgeom_ref[i, _GX : _GX + 1, sl] = jnp.sum(
                    dpow * -(ca * dx + cb * dy), axis=0, keepdims=True
                )
                dgeom_ref[i, _GY : _GY + 1, sl] = jnp.sum(
                    dpow * -(cc * dy + cb * dx), axis=0, keepdims=True
                )
                dgeom_ref[i, _GA : _GA + 1, sl] = jnp.sum(
                    dpow * (-0.5 * dx * dx), axis=0, keepdims=True
                )
                dgeom_ref[i, _GB : _GB + 1, sl] = jnp.sum(
                    dpow * (-dx * dy), axis=0, keepdims=True
                )
                dgeom_ref[i, _GC : _GC + 1, sl] = jnp.sum(
                    dpow * (-0.5 * dy * dy), axis=0, keepdims=True
                )
                dgeom_ref[i, _GOPA : _GOPA + 1, sl] = jnp.sum(
                    dopa, axis=0, keepdims=True
                )
                return (s_carry + jnp.sum(m, axis=1, keepdims=True),
                        log_full0)

            return j + 1, jax.lax.cond(k >= 0, compute, lambda c: c, carry)

        # dynamic bound: walk exactly the chunks the forward visited
        # (k_stop), not the full capacity — tiles far below capacity skip
        # the dead tail
        jax.lax.while_loop(
            condB, bodyB,
            (jnp.int32(0),
             (jnp.zeros((npix, 1), jnp.float32), log_full_end)),
        )


def _pick_tpb(num_tiles: int, cap: int) -> int:
    """Largest tiles-per-step in {8..1} dividing num_tiles with the geom
    block under ~1 MB (double-buffered DMA stays well inside VMEM)."""
    for tpb in (8, 6, 5, 4, 3, 2):
        if num_tiles % tpb == 0 and tpb * _GEOM_ROWS * cap * 4 <= 1 << 20:
            return tpb
    return 1


@functools.lru_cache(maxsize=32)
def _make_core_calls(num_tiles: int, grid_x: int, ts: int, cap: int,
                     chunk: int, interpret: bool):
    """Raw (fwd_call, bwd_call) pallas_call pair — shared by the local
    custom_vjp below and the stream assembly in stream_blend.py."""
    npix = ts * ts
    tpb = _pick_tpb(num_tiles, cap)
    fwd_kernel = functools.partial(
        _fwd_kernel, grid_x=grid_x, ts=ts, cap=cap, chunk=chunk, tpb=tpb
    )
    bwd_kernel = functools.partial(
        _bwd_kernel, grid_x=grid_x, ts=ts, cap=cap, chunk=chunk, tpb=tpb
    )

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles // tpb,),
            in_specs=[
                pl.BlockSpec((tpb, _GEOM_ROWS, cap), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, _RGBD_ROWS, cap), lambda t, c: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tpb, 4, npix), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 1), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 2), lambda t, c: (t, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 4, npix), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, npix, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, npix, 2), jnp.float32),
        ],
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles // tpb,),
            in_specs=[
                pl.BlockSpec((tpb, _GEOM_ROWS, cap), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, _RGBD_ROWS, cap), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, 4, npix), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 1), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 2), lambda t, c: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tpb, _GEOM_ROWS, cap), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((tpb, _RGBD_ROWS, cap), lambda t, c: (t, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, _GEOM_ROWS, cap), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, _RGBD_ROWS, cap), jnp.float32),
        ],
        interpret=interpret,
    )
    return fwd_call, bwd_call


@functools.lru_cache(maxsize=32)
def _make_core(num_tiles: int, grid_x: int, ts: int, cap: int, chunk: int,
               interpret: bool):
    fwd_call, bwd_call = _make_core_calls(num_tiles, grid_x, ts, cap, chunk,
                                          interpret)

    @jax.custom_vjp
    def core(counts, geom, rgbd):
        accum, logt, _ = fwd_call(counts, geom, rgbd)
        return accum, logt

    def core_fwd(counts, geom, rgbd):
        accum, logt, resid = fwd_call(counts, geom, rgbd)
        return (accum, logt), (counts, geom, rgbd, resid)

    def core_bwd(res, cotangents):
        counts, geom, rgbd, resid = res
        gacc, glogt = cotangents
        dgeom, drgbd = bwd_call(counts, geom, rgbd, gacc, glogt, resid)
        return (np.zeros(counts.shape, jax.dtypes.float0), dgeom, drgbd)

    core.defvjp(core_fwd, core_bwd)
    return core


def blend_tiles_pallas(
    tile_gid: jnp.ndarray,     # (num_tiles, cap) int32
    tile_counts: jnp.ndarray,  # (num_tiles,) int32
    means2d: jnp.ndarray,      # (P, 2)
    conic: jnp.ndarray,        # (P, 3)
    rgb: jnp.ndarray,          # (P, 3)
    opacity: jnp.ndarray,      # (P,)
    depths: jnp.ndarray,       # (P,)
    grid_x: int,
    grid_y: int,
    tile_size: int,
    chunk: int = 256,
    interpret: bool = False,
) -> TileBlendOut:
    num_tiles, cap = tile_gid.shape
    chunk = min(chunk, cap)
    assert cap % chunk == 0, (cap, chunk)
    npix = tile_size * tile_size

    # ONE packed row gather (12 scalar gathers are ~12x the HBM trips), then
    # a transpose to the struct-of-rows layout the kernel wants (pair axis on
    # lanes). Per-pair validity is handled in-kernel via lane < count.
    ones = jnp.ones_like(opacity)
    pack = jnp.stack(
        [
            means2d[:, 0], means2d[:, 1],
            conic[:, 0], conic[:, 1], conic[:, 2],
            opacity, ones, jnp.zeros_like(opacity),
            rgb[:, 0], rgb[:, 1], rgb[:, 2], depths,
        ],
        axis=1,
    )                                            # (P, 12)
    gathered = jnp.swapaxes(pack[tile_gid], 1, 2)  # (T, 12, cap)
    geom = gathered[:, :_GEOM_ROWS, :]
    rgbd = gathered[:, _GEOM_ROWS:, :]
    return blend_pregathered_pallas(tile_counts, geom, rgbd, grid_x,
                                    tile_size, chunk, interpret)


def blend_pregathered_pallas(
    tile_counts: jnp.ndarray,  # (num_tiles,) int32
    geom: jnp.ndarray,         # (num_tiles, 8, cap)
    rgbd: jnp.ndarray,         # (num_tiles, 4, cap)
    grid_x: int,
    tile_size: int,
    chunk: int = 256,
    interpret: bool = False,
) -> TileBlendOut:
    """Kernel entry for already-gathered per-pair rows (pose-mode path —
    the per-iteration gather/scatter around the kernel is the dominant cost
    of the refinement loop, so pose mode gathers pose-independent params
    once per rebin and feeds this directly)."""
    num_tiles, _, cap = geom.shape
    chunk = min(chunk, cap)
    core = _make_core(num_tiles, grid_x, tile_size, cap, chunk, interpret)
    accum, logt = core(tile_counts, geom, rgbd)
    color = jnp.moveaxis(accum[:, 0:3, :], 1, 2)  # (T, npix, 3)
    depth = accum[:, 3, :]
    return TileBlendOut(color=color, depth=depth, log_t=logt[:, :, 0])
