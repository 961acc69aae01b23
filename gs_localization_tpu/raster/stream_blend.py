"""Stream blend: per-tile windows DMA'd straight from the pair stream.

The r2 layout materialized (T, cap, 12) windows with XLA gathers and undid
them with more gathers in the backward; measured on v5e those run at
~20-30 ns/row (BENCH_MICRO_r03.json), which made assembly — not the
kernels — the dominant cost of every rasterize step (63% unattributed in
VERDICT r2). This version removes every window-sized XLA op:

forward   pack (P, 12) --[gid_of_pos]--> stream rows (MR, 12) -> transpose
          (12, MR+chunk); the Pallas kernel walks each tile's positions
          [tstart, tstart+walk_count) by double-buffered DMA from HBM —
          traffic scales with TRUE pair count, and tiles are never
          truncated (no max_per_tile).
backward  the kernel DMA-writes per-pair grads (12, chunk) back into a
          (12, MR+chunk) stream at the same positions (zero-filling
          early-exited chunks); outside, one transpose + one row gather by
          ``pos_by_slot`` puts grads in slot order where fast slots reduce
          by reshape-sum, slow slots by one cumsum over contiguous per-rank
          segments, and one unique-index scatter maps rank -> original id.

Inter-tile write ordering: a tile's final partial chunk writes (gated)
zeros into the next tile's head positions; every tile waits its write DMAs
before the grid advances, and the next tile rewrites those positions —
sequential TPU grid order makes the overwrite well-defined.

Row layout (matches pallas_blend): 0 x, 1 y, 2..4 conic a b c, 5 opacity,
6 valid, 7 pad, 8..10 rgb, 11 depth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import StreamBins
from .blend import ALPHA_MAX, ALPHA_MIN, LOG_T_EPS, TileBlendOut

_ROWS = 12          # semantic rows
_RPAD = 16          # stream rows padded: DMA slices need sublane % 8 == 0


def _pick_tpb(num_tiles: int) -> int:
    for tpb in (8, 6, 5, 4, 3, 2):
        if num_tiles % tpb == 0:
            return tpb
    return 1


def _pixel_coords(tile_id, grid_x: int, ts: int, npix: int):
    ox = (tile_id % grid_x) * ts
    oy = (tile_id // grid_x) * ts
    ii = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px = (ox + ii % ts).astype(jnp.float32)
    py = (oy + ii // ts).astype(jnp.float32)
    return px, py


def _buf_alpha(g, px, py, count, k, chunk: int):
    """Gated alpha from a (12, chunk) VMEM window chunk."""
    x, y = g[0:1], g[1:2]
    ca, cb, cc = g[2:3], g[3:4], g[4:5]
    opa, vld = g[5:6], g[6:7]
    dx = x - px
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


def _fwd_kernel(tstart_ref, wcount_ref, stream_ref,
                accum_ref, logt_ref, resid_ref,
                buf, sem,
                *, grid_x: int, ts: int, chunk: int, tpb: int, mrpad: int):
    npix = ts * ts
    r_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (r_i <= c_i).astype(jnp.float32)

    for i in range(tpb):
        t = pl.program_id(0) * tpb + i
        # clamp so a corrupt bin table can never drive DMA out of bounds
        start = jnp.clip(tstart_ref[t], 0, mrpad - chunk)
        count = jnp.clip(wcount_ref[t], 0, mrpad - chunk - start)
        n_chunks = pl.cdiv(count, chunk)
        px, py = _pixel_coords(t, grid_x, ts, npix)

        def rdma(k, slot):
            off = pl.multiple_of(start + k * chunk, chunk)
            return pltpu.make_async_copy(
                stream_ref.at[:, pl.ds(off, chunk)],
                buf.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            rdma(0, 0).start()

        def cond(state):
            k, log_full, _, _ = state
            return (k < n_chunks) & (jnp.max(log_full) >= LOG_T_EPS)

        def body(state):
            k, log_full, log_app, acc = state
            slot = jax.lax.rem(k, 2)
            rdma(k, slot).wait()

            @pl.when(k + 1 < n_chunks)
            def _():
                rdma(k + 1, jax.lax.rem(k + 1, 2)).start()

            g = buf[slot]                                 # (12, chunk)
            alpha, _, _, _, _, _ = _buf_alpha(g, px, py, count, k, chunk)
            la = jnp.log(1.0 - alpha)
            clog = log_full + jnp.dot(la, tri,
                                      preferred_element_type=jnp.float32)
            applied = clog >= LOG_T_EPS
            w = jnp.where(applied, alpha * jnp.exp(clog - la), 0.0)
            rgbd = g[8:12]                                # (4, chunk)
            acc = acc + jax.lax.dot_general(
                rgbd, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            log_full = log_full + jnp.sum(la, axis=1, keepdims=True)
            log_app = log_app + jnp.sum(
                jnp.where(applied, la, 0.0), axis=1, keepdims=True)
            return k + 1, log_full, log_app, acc

        init = (
            jnp.int32(0),
            jnp.zeros((npix, 1), jnp.float32),
            jnp.zeros((npix, 1), jnp.float32),
            jnp.zeros((4, npix), jnp.float32),
        )
        k_stop, log_full, log_app, acc = jax.lax.while_loop(cond, body, init)

        # an early exit leaves DMA k_stop in flight (issued by body k_stop-1)
        @pl.when(k_stop < n_chunks)
        def _():
            rdma(k_stop, jax.lax.rem(k_stop, 2)).wait()

        accum_ref[i] = acc
        logt_ref[i] = log_app
        resid_ref[i] = jnp.concatenate(
            [log_full, jnp.full((npix, 1), k_stop.astype(jnp.float32))], -1)


def _bwd_kernel(tstart_ref, wcount_ref, stream_ref, gacc_ref, glogt_ref,
                resid_ref, dstream_ref,
                rbuf, rsem, wbuf, wsem, zbuf, zsem,
                *, grid_x: int, ts: int, chunk: int, tpb: int, mrpad: int):
    npix = ts * ts
    r_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (r_i <= c_i).astype(jnp.float32)
    tri_after = (r_i > c_i).astype(jnp.float32)

    zbuf[:] = jnp.zeros((_RPAD, chunk), jnp.float32)
    wbuf[:] = jnp.zeros((2, _RPAD, chunk), jnp.float32)

    for i in range(tpb):
        t = pl.program_id(0) * tpb + i
        # clamp so a corrupt bin table can never drive DMA out of bounds
        start = jnp.clip(tstart_ref[t], 0, mrpad - chunk)
        count = jnp.clip(wcount_ref[t], 0, mrpad - chunk - start)
        n_chunks = pl.cdiv(count, chunk)
        px, py = _pixel_coords(t, grid_x, ts, npix)
        k_stop = jnp.clip(resid_ref[i, 0, 1].astype(jnp.int32), 0, n_chunks)
        log_full_end0 = resid_ref[i, :, 0:1]
        gacc = gacc_ref[i]
        glogt = glogt_ref[i]

        def rdma(k, slot):
            off = pl.multiple_of(start + k * chunk, chunk)
            return pltpu.make_async_copy(
                stream_ref.at[:, pl.ds(off, chunk)],
                rbuf.at[slot], rsem.at[slot])

        def wdma(k, slot):
            off = pl.multiple_of(start + k * chunk, chunk)
            return pltpu.make_async_copy(
                wbuf.at[slot],
                dstream_ref.at[:, pl.ds(off, chunk)],
                wsem.at[slot])

        # ---- zero-fill chunks the forward never visited (w == 0 there) ---
        def zfill(jj, _):
            k = n_chunks - 1 - jj
            off = pl.multiple_of(start + k * chunk, chunk)
            d = pltpu.make_async_copy(
                zbuf, dstream_ref.at[:, pl.ds(off, chunk)],
                zsem)
            d.start()
            d.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks - k_stop, zfill, 0)

        # ---- reverse walk k = k_stop-1 .. 0 ------------------------------
        @pl.when(k_stop > 0)
        def _():
            rdma(k_stop - 1, jax.lax.rem(k_stop - 1, 2)).start()

        def body(j, carry):
            s_carry, log_full_end = carry
            k = k_stop - 1 - j
            slot = jax.lax.rem(k, 2)
            rdma(k, slot).wait()

            @pl.when(k - 1 >= 0)
            def _():
                rdma(k - 1, jax.lax.rem(k - 1, 2)).start()

            g = rbuf[slot]
            alpha, araw, expp, gate, unclamped, geo = _buf_alpha(
                g, px, py, count, k, chunk)
            dx, dy, ca, cb, cc = geo
            la = jnp.log(1.0 - alpha)
            la_sum = jnp.sum(la, axis=1, keepdims=True)
            log_full0 = log_full_end - la_sum
            clog = log_full0 + jnp.dot(la, tri,
                                       preferred_element_type=jnp.float32)
            applied = clog >= LOG_T_EPS
            w = jnp.where(applied, alpha * jnp.exp(clog - la), 0.0)

            rgbd = g[8:12]
            wbar = jax.lax.dot_general(
                gacc, rgbd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (npix, G)
            drgbd = jax.lax.dot_general(
                gacc, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (4, G)

            m = wbar * w
            suffix = jnp.dot(m, tri_after,
                             preferred_element_type=jnp.float32)
            labar = suffix + s_carry + jnp.where(applied, glogt, 0.0)
            t_prev = jnp.exp(clog - la)
            abar = (jnp.where(applied, wbar * t_prev, 0.0)
                    - labar / (1.0 - alpha))
            dpow = jnp.where(unclamped, abar * araw, 0.0)
            dopa = jnp.where(unclamped, abar * expp, 0.0)

            # wait the write issued 2 iterations ago on this slot before
            # overwriting the buffer
            @pl.when(j >= 2)
            def _():
                wdma(k + 2, slot).wait()

            wbuf[slot, 0:1] = jnp.sum(dpow * -(ca * dx + cb * dy), axis=0,
                                      keepdims=True)
            wbuf[slot, 1:2] = jnp.sum(dpow * -(cc * dy + cb * dx), axis=0,
                                      keepdims=True)
            wbuf[slot, 2:3] = jnp.sum(dpow * (-0.5 * dx * dx), axis=0,
                                      keepdims=True)
            wbuf[slot, 3:4] = jnp.sum(dpow * (-dx * dy), axis=0,
                                      keepdims=True)
            wbuf[slot, 4:5] = jnp.sum(dpow * (-0.5 * dy * dy), axis=0,
                                      keepdims=True)
            wbuf[slot, 5:6] = jnp.sum(dopa, axis=0, keepdims=True)
            wbuf[slot, 6:8] = jnp.zeros((2, chunk), jnp.float32)
            wbuf[slot, 8:12] = drgbd
            wdma(k, slot).start()

            return (s_carry + jnp.sum(m, axis=1, keepdims=True), log_full0)

        jax.lax.fori_loop(
            0, k_stop, body,
            (jnp.zeros((npix, 1), jnp.float32), log_full_end0))

        # drain this tile's outstanding writes before the next tile may
        # overwrite the shared boundary positions
        @pl.when(k_stop >= 2)
        def _():
            wdma(1, 1).wait()

        @pl.when(k_stop >= 1)
        def _():
            wdma(0, 0).wait()


@functools.lru_cache(maxsize=32)
def _make_stream_calls(num_tiles: int, grid_x: int, ts: int, chunk: int,
                       mrpad: int, interpret: bool):
    npix = ts * ts
    tpb = _pick_tpb(num_tiles)
    fwd_kernel = functools.partial(
        _fwd_kernel, grid_x=grid_x, ts=ts, chunk=chunk, tpb=tpb, mrpad=mrpad)
    bwd_kernel = functools.partial(
        _bwd_kernel, grid_x=grid_x, ts=ts, chunk=chunk, tpb=tpb, mrpad=mrpad)

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles // tpb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((tpb, 4, npix), lambda t, a, b: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 1), lambda t, a, b: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 2), lambda t, a, b: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, _RPAD, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
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
            num_scalar_prefetch=2,
            grid=(num_tiles // tpb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tpb, 4, npix), lambda t, a, b: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 1), lambda t, a, b: (t, 0, 0)),
                pl.BlockSpec((tpb, npix, 2), lambda t, a, b: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, _RPAD, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, _RPAD, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((_RPAD, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_RPAD, mrpad), jnp.float32),
        interpret=interpret,
    )
    return fwd_call, bwd_call


@functools.lru_cache(maxsize=32)
def _make_stream_core(num_tiles: int, grid_x: int, ts: int, chunk: int,
                      fast_k: int, p: int, mr_al: int, s_slots: int,
                      interpret: bool):
    mrpad = mr_al + chunk
    fwd_call, bwd_call = _make_stream_calls(num_tiles, grid_x, ts, chunk,
                                            mrpad, interpret)

    def assemble(pack, gid_of_pos):
        # dead row P: zero params -> gated out of the blend entirely
        pack_pad = jnp.concatenate(
            [pack, jnp.zeros((1, _ROWS), pack.dtype)], axis=0)
        stream = pack_pad[gid_of_pos]                     # (MR_AL, 12) rows
        stream_t = jnp.concatenate(
            [jnp.swapaxes(stream, 0, 1),
             jnp.zeros((_RPAD - _ROWS, mr_al), pack.dtype)], axis=0)
        stream_t = jnp.concatenate(
            [stream_t, jnp.zeros((_RPAD, chunk), pack.dtype)], axis=1)
        return stream_t                                   # (16, MR_AL+chunk)

    @jax.custom_vjp
    def core(pack, gid_of_pos, pos_by_slot, slow_starts, order,
             tstart, wcount, kept_al):
        stream_t = assemble(pack, gid_of_pos)
        accum, logt, _ = fwd_call(tstart, wcount, stream_t)
        accum, _ = jax.lax.optimization_barrier((accum, stream_t))
        return accum, logt

    def core_fwd(pack, gid_of_pos, pos_by_slot, slow_starts, order,
                 tstart, wcount, kept_al):
        stream_t = assemble(pack, gid_of_pos)
        accum, logt, resid = fwd_call(tstart, wcount, stream_t)
        accum, stream_t = jax.lax.optimization_barrier((accum, stream_t))
        res = (stream_t, resid, pos_by_slot, slow_starts, order,
               tstart, wcount, kept_al)
        return (accum, logt), res

    def core_bwd(res, cotangents):
        (stream_t, resid, pos_by_slot, slow_starts, order,
         tstart, wcount, kept_al) = res
        gacc, glogt = cotangents
        dstream_t = bwd_call(tstart, wcount, stream_t, gacc, glogt, resid)
        # keep stream_t live past the call: the kernel DMA-reads it while
        # DMA-writing the ANY-space output; XLA aliasing the dead input
        # buffer as that output faults the TPU (r4 accuracy-crash triage)
        dstream_t, _ = jax.lax.optimization_barrier((dstream_t, stream_t))
        drows = jnp.swapaxes(dstream_t[:_ROWS], 0, 1)     # (MR_AL+chunk, 12)
        pos_ok = jnp.arange(mrpad, dtype=jnp.int32) < kept_al
        drows = jnp.where(pos_ok[:, None], drows, 0.0)
        dslot = drows[pos_by_slot]                        # (S, 12) rows
        nfast = p * fast_k
        dranked = dslot[:nfast].reshape(p, fast_k, _ROWS).sum(axis=1)
        dslow = dslot[nfast:]
        mp = dslow.shape[0]
        cum = jnp.concatenate(
            [jnp.zeros((1, _ROWS), dslow.dtype),
             jnp.cumsum(dslow, axis=0)], axis=0)
        sb = jnp.clip(slow_starts, 0, mp)
        dranked = dranked + cum[sb[1:]] - cum[sb[:-1]]
        dpack = jnp.zeros((p, _ROWS), dranked.dtype).at[order].set(
            dranked, unique_indices=True)
        z = lambda shape: np.zeros(shape, jax.dtypes.float0)
        return (dpack, z((mr_al,)), z((s_slots,)), z(slow_starts.shape),
                z(order.shape), z((num_tiles,)), z((num_tiles,)), z(()))

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.lru_cache(maxsize=32)
def _make_stream_direct_core(num_tiles: int, grid_x: int, ts: int,
                             chunk: int, mrpad: int, interpret: bool):
    """custom_vjp over a PRE-ASSEMBLED stream (16, mrpad).

    The Gaussian-path core above reduces the per-pair grad stream back to
    per-Gaussian rows (slot reduction). Pose mode doesn't need that: the
    stream rows are produced by an elementwise projection of pose-
    independent params (pose_mode._project_stream), so the cotangent of the
    stream itself is enough — JAX chains it through the projection to the
    6-dim camera tangent with no scatter/gather at all.
    """
    fwd_call, bwd_call = _make_stream_calls(num_tiles, grid_x, ts, chunk,
                                            mrpad, interpret)

    @jax.custom_vjp
    def core(stream_t, tstart, wcount, kept_al):
        accum, logt, _ = fwd_call(tstart, wcount, stream_t)
        accum, _ = jax.lax.optimization_barrier((accum, stream_t))
        return accum, logt

    def core_fwd(stream_t, tstart, wcount, kept_al):
        accum, logt, resid = fwd_call(tstart, wcount, stream_t)
        accum, stream_t = jax.lax.optimization_barrier((accum, stream_t))
        return (accum, logt), (stream_t, resid, tstart, wcount, kept_al)

    def core_bwd(res, cotangents):
        stream_t, resid, tstart, wcount, kept_al = res
        gacc, glogt = cotangents
        dstream_t = bwd_call(tstart, wcount, stream_t, gacc, glogt, resid)
        # liveness barrier: see the Gaussian-path core_bwd note
        dstream_t, _ = jax.lax.optimization_barrier((dstream_t, stream_t))
        # positions past the live aligned stream are never DMA-written by
        # the backward kernel (uninitialized HBM) — mask before the
        # projection VJP reads them
        pos_ok = jnp.arange(mrpad, dtype=jnp.int32) < kept_al
        dstream_t = jnp.where(pos_ok[None, :], dstream_t, 0.0)
        z = lambda shape: np.zeros(shape, jax.dtypes.float0)
        return (dstream_t, z((num_tiles,)), z((num_tiles,)), z(()))

    core.defvjp(core_fwd, core_bwd)
    return core


def blend_stream_direct(
    stream_t: jnp.ndarray,    # (16, MR_AL+chunk) pre-assembled stream rows
    tstart: jnp.ndarray,      # (num_tiles,) aligned tile starts
    walk_counts: jnp.ndarray,  # (num_tiles,)
    kept_al: jnp.ndarray,     # () live aligned-stream length
    grid_x: int,
    tile_size: int,
    chunk: int = 256,
    interpret: bool = False,
) -> TileBlendOut:
    """Blend a pre-assembled pair stream; grads flow to the stream rows.

    Requires the stream's alignment to equal ``chunk`` (bin_stream
    align=chunk): the backward writes whole chunks at aligned offsets, so
    chunk-aligned windows guarantee every live position is written.
    """
    num_tiles = tstart.shape[0]
    mrpad = stream_t.shape[1]
    core = _make_stream_direct_core(num_tiles, grid_x, tile_size, chunk,
                                    mrpad, interpret)
    accum, logt = core(stream_t, tstart, walk_counts, kept_al)
    color = jnp.moveaxis(accum[:, 0:3, :], 1, 2)          # (T, npix, 3)
    depth = accum[:, 3, :]
    return TileBlendOut(color=color, depth=depth, log_t=logt[:, :, 0])


def blend_stream_pallas(
    pack: jnp.ndarray,        # (P, 12) per-Gaussian rows (original order)
    sbins: StreamBins,
    grid_x: int,
    tile_size: int,
    fast_k: int,
    chunk: int = 256,
    interpret: bool = False,
) -> TileBlendOut:
    num_tiles = sbins.tstart.shape[0]
    p = pack.shape[0]
    mr_al = sbins.gid_of_pos.shape[0]
    s_slots = sbins.pos_by_slot.shape[0]
    core = _make_stream_core(num_tiles, grid_x, tile_size, chunk,
                             fast_k, p, mr_al, s_slots, interpret)
    accum, logt = core(
        pack, sbins.gid_of_pos, sbins.pos_by_slot, sbins.slow_starts,
        sbins.order, sbins.tstart, sbins.walk_counts, sbins.kept_al,
    )
    color = jnp.moveaxis(accum[:, 0:3, :], 1, 2)          # (T, npix, 3)
    depth = accum[:, 3, :]
    return TileBlendOut(color=color, depth=depth, log_t=logt[:, :, 0])
