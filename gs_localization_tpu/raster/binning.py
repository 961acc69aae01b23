"""Tile binning: depth-ordered per-tile Gaussian lists at static capacity.

The reference does this with dynamic allocation + a device-wide 64-bit CUB
radix sort over (tileID << 32 | float_bits(depth)) keys and a host sync for
``num_rendered`` (rasterizer_impl.cu:70-138, 278-309). The TPU-native design
removes the 64-bit sort, the host sync, and — after profiling v5e — every
slow XLA op on the pair path (1M-query searchsorted >100 ms, lax.cummax
~700 ms, per-pair row gathers ~10x a sort):

1. argsort Gaussians by **bitcast-int32** view depth (positive IEEE floats
   order correctly as ints; float sorts are slower).
2. **offset-major pair expansion**: Gaussian s emits its k-th covered tile
   for k < fast_k directly into a dense (P, fast_k) matrix — pure
   vectorized arithmetic on the (already gathered) rects, no ownership
   map at all. The rare Gaussians covering > fast_k tiles go through a
   small scatter + associative-scan(max) ownership path of static capacity
   ``max_pairs_slow``.
3. pairs sort once by a **packed int32 key** ``tile * R + depth_rank``
   (R = next pow2 >= P). One single-operand int32 sort; the depth rank
   rides in the key so no stable 2-operand sort is needed and the original
   Gaussian id is recovered with one gather.
4. per-tile [start, count) via a 1201-query searchsorted on the key
   boundaries, then a padded (num_tiles, max_per_tile) index matrix.

All shapes static; overflow (slow-path capacity) is reported as a scalar,
and truncation drops the farthest pairs of the largest Gaussians only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import Preprocessed

# numpy scalar, NOT jnp: a module-level jnp constant initializes the JAX
# backend at import time, which breaks multi-host bring-up (the runtime
# must call jax.distributed.initialize before any backend touch —
# parallel/runtime.py)
INT32_MAX = np.int32(2**31 - 1)

# every blend kernel zeroes contributions with alpha < ALPHA_MIN, so
# dropping (gaussian, tile) pairs whose MAX alpha over the tile is below
# it leaves the rendered images exact (identical up to fp summation order:
# removing zero-contribution pairs shifts chunk boundaries, ~1e-7).
from .constants import ALPHA_MIN as _ALPHA_MIN


def _tile_qmin(mx, my, ca, cb, cc, tx, ty, tile_size: int):
    """Exact min of the conic quadratic q(d) = a dx^2 + 2b dxdy + c dy^2
    over tile (tx, ty)'s pixel-center box, elementwise.

    The kernels evaluate alpha = opa * exp(-q/2) at integer pixel coords
    [tx*ts, tx*ts+ts-1] x [ty*ts, ...]; q is convex (PD conic), so its box
    minimum is 0 if the mean lies inside, else attained on one of the four
    edges, each a 1-D quadratic minimized in closed form with clamping.
    Tighter than the lambda_min ball bound exactly where it matters —
    anisotropic splats whose rect is mostly empty corners.
    """
    xlo = tx * tile_size - mx
    xhi = xlo + (tile_size - 1)
    ylo = ty * tile_size - my
    yhi = ylo + (tile_size - 1)
    inside = (xlo <= 0) & (0 <= xhi) & (ylo <= 0) & (0 <= yhi)
    a_s = jnp.maximum(ca, 1e-12)
    c_s = jnp.maximum(cc, 1e-12)

    def edge_x(e):
        ys = jnp.clip(-cb * e / c_s, ylo, yhi)
        return ca * e * e + 2.0 * cb * e * ys + cc * ys * ys

    def edge_y(e):
        xs = jnp.clip(-cb * e / a_s, xlo, xhi)
        return ca * xs * xs + 2.0 * cb * xs * e + cc * e * e

    q = jnp.minimum(jnp.minimum(edge_x(xlo), edge_x(xhi)),
                    jnp.minimum(edge_y(ylo), edge_y(yhi)))
    return jnp.where(inside, 0.0, q)


def _cull_table(prep: Preprocessed) -> jnp.ndarray:
    """(P, 10) float32 per-Gaussian row for ONE packed binning gather:
    [x0, y0, x1, y1, mx, my, conic a, b, c, qmax] where qmax is the cull
    threshold: a tile survives iff qmin(tile) <= qmax, i.e. max alpha in
    the tile >= ALPHA_MIN. Rect/start values stay exact in f32 (< 2^24).
    """
    op = prep.opacity
    qmax = jnp.where(op > _ALPHA_MIN, 2.0 * jnp.log(op * 255.0),
                     jnp.float32(-1.0))
    return jnp.concatenate(
        [prep.rect.astype(jnp.float32),
         prep.means2d,
         prep.conic,
         qmax[:, None]], axis=1)


class Binning(NamedTuple):
    tile_gid: jnp.ndarray     # (num_tiles, max_per_tile) int32 gaussian ids
    tile_mask: jnp.ndarray    # (num_tiles, max_per_tile) bool
    tile_counts: jnp.ndarray  # (num_tiles,) int32 (clipped to max_per_tile)
    num_rendered: jnp.ndarray  # () int32 total pairs (pre-cap)
    overflow: jnp.ndarray     # () bool — slow-path pair capacity exceeded
    tile_overflow: jnp.ndarray  # () bool — some tile's true count exceeded
    #                               max_per_tile (its farthest pairs were
    #                               silently dropped from tile_gid)
    max_tile_count: jnp.ndarray  # () int32 — max true per-tile count (pre-
    #                               clip): right-sizes max_per_tile per scene


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class StreamBins(NamedTuple):
    """Depth-rank pair stream (the fast layout for the Pallas blend).

    v5e profiling (benchmarks/micro_binning.py, BENCH_MICRO_r03.json): XLA
    row gathers cost ~20-30 ns/row and scatter-adds ~90 ms at 600k rows, so
    the per-iteration path must not contain ANY capacity-sized XLA
    gather/scatter. This layout gets there:

    - ONE 2-operand sort (packed key, slot) orders the pairs; the inverse
      permutation comes from a cheap unique-index scatter (~3.7 ms at 500k,
      vs ~10-20 ms for a second sort).
    - only the first ``max_render`` positions are materialized
      (``gid_of_pos``); the blend kernel DMAs its per-tile windows straight
      from the assembled stream in HBM (stream_blend.py), so nothing of
      window size (T, cap) is ever built in XLA.
    - the backward reduction runs in slot order: fast slots reduce by
      reshape-sum, slow slots by one cumsum over contiguous per-rank
      segments, and rank -> original id is one unique-index scatter.
    - per-tile lists are NEVER truncated (no max_per_tile): tiles walk their
      true counts; the only capacities are the slow-pair pool (``overflow``)
      and the materialized stream (``tile_overflow`` = stream truncated).

    All ids below are depth RANKS (positions in the depth sort); ``order``
    maps rank -> original Gaussian index.
    """

    order: jnp.ndarray        # (P,) int32 depth order (rank -> orig id)
    rank_of_pos: jnp.ndarray  # (MR,) int32 depth rank per sorted position
    gid_of_pos: jnp.ndarray   # (MR_AL,) int32 original Gaussian id per
    #   ALIGNED position (gaps/truncated tail = dead row P)
    pos_by_slot: jnp.ndarray  # (S,) int32 aligned position per pair slot
    #   (MR_AL = none); slots: fast = rank*fast_k + k, slow = P*fast_k + idx
    slow_starts: jnp.ndarray  # (P + 1,) int32 slow-path segment bounds/rank
    tstart: jnp.ndarray       # (num_tiles,) int32 ALIGNED tile start
    walk_counts: jnp.ndarray  # (num_tiles,) int32 materialized count per tile
    tile_counts: jnp.ndarray  # (num_tiles,) int32 true counts (uncapped)
    kept: jnp.ndarray         # () int32 pairs actually materialized
    kept_al: jnp.ndarray      # () int32 aligned-stream length in use
    num_rendered: jnp.ndarray   # () int32 total emitted pairs
    overflow: jnp.ndarray       # () bool — slow-path pair capacity exceeded
    tile_overflow: jnp.ndarray  # () bool — stream truncated (kept would
    #                               exceed max_render)
    max_tile_count: jnp.ndarray  # () int32


def _emit_pair_keys(prep: Preprocessed, order: jnp.ndarray, grid_x: int,
                    grid_y: int, rank_size: int, max_pairs: int,
                    fast_k: int, tile_size: int, tile_cull: bool):
    """Shared pair-key emission for both binning layouts.

    Returns (keys, starts, total_slow, touched_s): packed int32 keys
    ``tile * rank_size + depth_rank`` (sentinel = dead/culled), the
    slow-path segment bounds, the true slow-pair count, and per-rank
    rect tile counts. ``tile_cull`` drops pairs whose max alpha over the
    tile is < ALPHA_MIN (exact w.r.t. the blend kernels' gate; typically
    20-40% of rect pairs are empty corner tiles). Capacity consumption
    (``starts``/``total_slow``) stays rect-based — the cull shrinks the
    LIVE pair count (kept stream, per-tile walks), not the static pools.
    """
    p = prep.depths.shape[0]
    num_tiles = grid_x * grid_y
    ctab = _cull_table(prep)[order]          # ONE packed row gather (P, 10)
    # defensive clamp: a rect can never legitimately touch more than the
    # whole grid; garbage here would overflow the cumsums below and turn
    # into out-of-bounds DMA offsets in the stream kernels
    touched_s = jnp.clip(prep.tiles_touched[order], 0, num_tiles)
    x0 = ctab[:, 0].astype(jnp.int32)
    y0 = ctab[:, 1].astype(jnp.int32)
    w_s = jnp.maximum(ctab[:, 2].astype(jnp.int32) - x0, 1)
    sentinel = jnp.int32(num_tiles * rank_size)

    if fast_k > 0:
        k_idx = jnp.arange(fast_k, dtype=jnp.int32)[None, :]
        tile_x = x0[:, None] + k_idx % w_s[:, None]
        tile_y = y0[:, None] + k_idx // w_s[:, None]
        tile_fast = tile_y * grid_x + tile_x
        is_fast = touched_s <= fast_k
        ok_fast = is_fast[:, None] & (k_idx < touched_s[:, None])
        ok_fast = ok_fast & (tile_fast >= 0) & (tile_fast < num_tiles)
        if tile_cull:
            qf = _tile_qmin(ctab[:, 4:5], ctab[:, 5:6], ctab[:, 6:7],
                            ctab[:, 7:8], ctab[:, 8:9],
                            tile_x.astype(jnp.float32),
                            tile_y.astype(jnp.float32), tile_size)
            ok_fast = ok_fast & (qf <= ctab[:, 9:10])
        rank = jnp.arange(p, dtype=jnp.int32)[:, None]
        key_fast = jnp.where(ok_fast, tile_fast * rank_size + rank, sentinel)
    else:
        is_fast = jnp.zeros((p,), bool)
        key_fast = jnp.zeros((0,), jnp.int32)

    touched_slow = jnp.where(is_fast, 0, touched_s)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(touched_slow, dtype=jnp.int32)]
    )
    total_slow = starts[-1]
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_ok = pair_idx < jnp.minimum(total_slow, max_pairs)
    mark = jnp.zeros((max_pairs,), jnp.int32).at[starts[:p]].max(
        jnp.arange(p, dtype=jnp.int32), mode="drop"
    )
    gsrt = jax.lax.associative_scan(jnp.maximum, mark)
    # starts fit f32 exactly below 2^24; the packed-gather win (~4x vs
    # per-field gathers on v5e) requires one dtype
    assert max_pairs < 2**24, "slow pool too large for the f32-packed table"
    table = jnp.concatenate(
        [ctab[:, 0:2], w_s.astype(jnp.float32)[:, None],
         starts[:p].astype(jnp.float32)[:, None], ctab[:, 4:10]], axis=1)
    rows = table[gsrt]                       # ONE packed row gather (MP, 10)
    local = pair_idx - rows[:, 3].astype(jnp.int32)
    w_g = rows[:, 2].astype(jnp.int32)
    tx = rows[:, 0].astype(jnp.int32) + local % w_g
    ty = rows[:, 1].astype(jnp.int32) + local // w_g
    tile_slow = ty * grid_x + tx
    ok_slow = pair_ok & (tile_slow >= 0) & (tile_slow < num_tiles)
    if tile_cull:
        qs = _tile_qmin(rows[:, 4], rows[:, 5], rows[:, 6], rows[:, 7],
                        rows[:, 8], tx.astype(jnp.float32),
                        ty.astype(jnp.float32), tile_size)
        ok_slow = ok_slow & (qs <= rows[:, 9])
    key_slow = jnp.where(ok_slow, tile_slow * rank_size + gsrt, sentinel)
    keys = (jnp.concatenate([key_fast.reshape(-1), key_slow])
            if fast_k > 0 else key_slow)
    return keys, starts, total_slow, touched_s


def bin_stream(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    max_render: int,
    fast_k: int = 1,
    align: int = 256,
    tile_size: int = 16,
    tile_cull: bool = True,
) -> StreamBins:
    """Depth-sorted tile binning as a pair stream (see StreamBins).

    Same pair semantics as ``bin_gaussians`` (identical packed keys and
    sort), reorganized so the per-iteration downstream work contains no
    capacity-sized gathers.
    """
    assert fast_k >= 1, "stream binning requires a fast path"
    p = prep.depths.shape[0]
    num_tiles = grid_x * grid_y
    rank_size = _next_pow2(max(p, 2))
    assert (num_tiles + 1) * rank_size < 2**31

    depth_key = jnp.where(
        prep.valid,
        jax.lax.bitcast_convert_type(prep.depths, jnp.int32),
        INT32_MAX,
    )
    order = jnp.argsort(depth_key).astype(jnp.int32)
    keys, starts, total_slow, touched_s = _emit_pair_keys(
        prep, order, grid_x, grid_y, rank_size, max_pairs, fast_k,
        tile_size, tile_cull)
    s = keys.shape[0]
    mr = min((max_render // align) * align, (s // align) * align)
    mr_al = mr + num_tiles * align        # aligned stream capacity
    slots = jnp.arange(s, dtype=jnp.int32)
    keys_sorted, slot_of_pos = jax.lax.sort((keys, slots))

    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) * rank_size
    bounds = jnp.searchsorted(keys_sorted, boundaries, side="left").astype(
        jnp.int32
    )
    kept_true = bounds[-1]                 # first sentinel position
    kept = jnp.minimum(kept_true, mr)
    tstart_pos = bounds[:-1]
    tcount = bounds[1:] - bounds[:-1]

    # Aligned layout: tile t's pairs live at [astart[t], astart[t]+count)
    # with astart a multiple of ``align`` — Mosaic DMA lane offsets must be
    # provably 128-aligned, and aligned windows never overlap across tiles.
    acount = ((tcount + align - 1) // align) * align
    astart_all = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(acount, dtype=jnp.int32)])
    kept_al = jnp.minimum(astart_all[-1], mr_al)
    astart = jnp.minimum(astart_all[:-1], mr_al)
    walk_counts = jnp.minimum(tcount, jnp.maximum(mr_al - astart, 0))

    rank_mr = jnp.minimum(keys_sorted[:mr] & (rank_size - 1), p - 1)
    gid_mr = order[rank_mr]                              # (MR,) element gather
    # per-position shift into the aligned layout: shift[t] = astart - tstart
    # is constant per tile and non-decreasing, so a scatter of the per-tile
    # value at each tile's first position + a running max broadcasts it
    # (an mr-element gather of shift[tile_of_pos] would cost ~4 ms)
    shift = astart_all[:-1] - tstart_pos                 # (T,) >= 0
    pos_iota = jnp.arange(mr, dtype=jnp.int32)
    heads = jnp.zeros((mr,), jnp.int32).at[
        jnp.minimum(tstart_pos, jnp.int32(max(mr - 1, 0)))
    ].max(shift, mode="drop")
    shift_of_pos = jax.lax.associative_scan(jnp.maximum, heads)
    ap_of_pos = pos_iota + shift_of_pos                  # aligned position
    pos_live = pos_iota < kept

    # aligned stream contents: original Gaussian id per aligned position;
    # gaps and the truncated tail point at the dead row P (zero params)
    gid_of_apos = jnp.full((mr_al,), p, jnp.int32).at[
        jnp.where(pos_live, ap_of_pos, mr_al)
    ].set(gid_mr, mode="drop", unique_indices=True)
    # inverse map for the backward reduction: slot -> aligned position;
    # unmapped slots point at mr_al (a zero row of the padded grad stream)
    ap_by_slot = jnp.full((s,), mr_al, jnp.int32).at[
        jnp.where(pos_live, slot_of_pos[:mr], s)
    ].set(ap_of_pos, mode="drop", unique_indices=True)

    num_rendered = jnp.sum(touched_s, dtype=jnp.int32)
    max_tile_count = jnp.max(tcount)
    return StreamBins(
        order=order,
        rank_of_pos=rank_mr,
        gid_of_pos=gid_of_apos,
        pos_by_slot=ap_by_slot,
        slow_starts=starts,
        tstart=astart,
        walk_counts=walk_counts,
        tile_counts=tcount,
        kept=kept,
        kept_al=kept_al,
        num_rendered=num_rendered,
        overflow=total_slow > max_pairs,
        tile_overflow=kept_true > mr,
        max_tile_count=max_tile_count,
    )


def bin_gaussians(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    max_per_tile: int,
    fast_k: int = 8,
    tile_size: int = 16,
    tile_cull: bool = True,
) -> Binning:
    p = prep.depths.shape[0]
    num_tiles = grid_x * grid_y
    rank_size = _next_pow2(max(p, 2))
    # packed-key capacity check: (num_tiles+1) * rank_size must fit in int32
    assert (num_tiles + 1) * rank_size < 2**31, (
        f"packed sort key overflow: {num_tiles} tiles x {rank_size} rank "
        "slots — reduce P per shard or use a larger tile size")

    # ---- 1. global depth order (invalid sink to the back) -----------
    depth_key = jnp.where(
        prep.valid,
        jax.lax.bitcast_convert_type(prep.depths, jnp.int32),
        INT32_MAX,
    )
    order = jnp.argsort(depth_key).astype(jnp.int32)     # stable

    # ---- 2. pair-key emission (fast offset-major + slow scan path,
    #          per-tile opacity cull) ---------------------------------
    keys, starts, total_slow, touched_s = _emit_pair_keys(
        prep, order, grid_x, grid_y, rank_size, max_pairs, fast_k,
        tile_size, tile_cull)

    # ---- 3. one packed int32 sort -----------------------------------
    keys_sorted = jax.lax.sort(keys)

    # ---- 4. per-tile ranges -> padded index matrix ------------------
    boundaries = (
        jnp.arange(num_tiles + 1, dtype=jnp.int32) * rank_size
    )
    bounds = jnp.searchsorted(keys_sorted, boundaries, side="left").astype(
        jnp.int32
    )
    tstart = bounds[:-1]
    tcount = bounds[1:] - bounds[:-1]
    kidx = jnp.arange(max_per_tile, dtype=jnp.int32)
    flat_idx = jnp.clip(tstart[:, None] + kidx[None, :], 0, keys.shape[0] - 1)
    tile_mask = kidx[None, :] < jnp.minimum(tcount, max_per_tile)[:, None]
    rank_mat = jnp.take(keys_sorted, flat_idx, axis=0) & (rank_size - 1)
    tile_gid = jnp.take(order, jnp.minimum(rank_mat, p - 1), axis=0)

    num_rendered = jnp.sum(touched_s, dtype=jnp.int32)
    max_tile_count = jnp.max(tcount)
    return Binning(
        tile_gid=tile_gid,
        tile_mask=tile_mask,
        tile_counts=jnp.minimum(tcount, max_per_tile),
        num_rendered=num_rendered,
        overflow=total_slow > max_pairs,
        tile_overflow=max_tile_count > max_per_tile,
        max_tile_count=max_tile_count,
    )
