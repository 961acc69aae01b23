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

from .preprocess import Preprocessed

INT32_MAX = jnp.int32(2**31 - 1)


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

    v5e profiling (benchmarks/micro_binning.py): 1-D *element* gathers cost
    ~7.5 ns/index while multi-column *row* gathers cost ~1.8 ns/row, and the
    XLA transpose-of-gather scatter-add in the blend backward costs ~20 ms at
    1.2 M pairs. This layout eliminates every element gather and the
    backward scatter: the pair order comes out of ONE 2-operand sort
    (key, slot), the inverse permutation out of a second cheap sort, and the
    backward reduction runs in slot order — a reshape-sum over the fast
    slots plus a cumsum over the contiguous slow-path segments.

    All ids below are depth RANKS (positions in the depth sort); ``order``
    maps rank -> original Gaussian index.
    """

    order: jnp.ndarray        # (P,) int32 depth order (rank -> orig id)
    rank_of_pos: jnp.ndarray  # (N,) int32 depth rank per sorted position
    pos_by_slot: jnp.ndarray  # (N,) int32 sorted position per pair slot
    #   slots: fast = rank * fast_k + k, slow = P * fast_k + pair_idx
    winslot: jnp.ndarray      # (N,) int32 tile*cap + lane per position
    win_valid: jnp.ndarray    # (N,) bool: position materialized in a window
    slow_starts: jnp.ndarray  # (P + 1,) int32 slow-path segment bounds/rank
    tstart: jnp.ndarray       # (num_tiles,) int32 position of tile start
    tile_counts: jnp.ndarray  # (num_tiles,) int32 true counts (uncapped)
    num_rendered: jnp.ndarray   # () int32
    overflow: jnp.ndarray       # () bool — slow-path pair capacity exceeded
    tile_overflow: jnp.ndarray  # () bool — some tile truncated at the cap
    max_tile_count: jnp.ndarray  # () int32


def bin_stream(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    max_per_tile: int,
    fast_k: int = 4,
) -> StreamBins:
    """Depth-sorted tile binning as a pair stream (see StreamBins).

    Same semantics as ``bin_gaussians`` (identical packed keys and sort),
    reorganized so downstream work is row gathers only.
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
    rect_s = prep.rect[order]                            # row gather (P, 4)
    touched_s = prep.tiles_touched[order]
    w_s = jnp.maximum(rect_s[:, 2] - rect_s[:, 0], 1)

    sentinel = jnp.int32(num_tiles * rank_size)
    k_idx = jnp.arange(fast_k, dtype=jnp.int32)[None, :]
    tile_x = rect_s[:, 0:1] + k_idx % w_s[:, None]
    tile_y = rect_s[:, 1:2] + k_idx // w_s[:, None]
    tile_fast = tile_y * grid_x + tile_x
    is_fast = touched_s <= fast_k
    ok_fast = is_fast[:, None] & (k_idx < touched_s[:, None])
    rank = jnp.arange(p, dtype=jnp.int32)[:, None]
    key_fast = jnp.where(ok_fast, tile_fast * rank_size + rank, sentinel)

    touched_slow = jnp.where(is_fast, 0, touched_s)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(touched_slow, dtype=jnp.int32)]
    )
    total_slow = starts[-1]
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_ok = pair_idx < jnp.minimum(total_slow, max_pairs)
    mark = jnp.zeros((max_pairs,), jnp.int32).at[starts[:p]].max(
        jnp.arange(p, dtype=jnp.int32), mode="drop"
    )
    gsrt = jax.lax.associative_scan(jnp.maximum, mark)
    table = jnp.stack([rect_s[:, 0], rect_s[:, 1], w_s, starts[:p]], axis=1)
    rows = table[gsrt]                                   # row gather (MP, 4)
    local = pair_idx - rows[:, 3]
    w_g = rows[:, 2]
    tx = rows[:, 0] + local % w_g
    ty = rows[:, 1] + local // w_g
    key_slow = jnp.where(
        pair_ok, (ty * grid_x + tx) * rank_size + gsrt, sentinel
    )

    keys = jnp.concatenate([key_fast.reshape(-1), key_slow])
    n = keys.shape[0]
    slots = jnp.arange(n, dtype=jnp.int32)
    keys_sorted, slot_of_pos = jax.lax.sort((keys, slots))
    # inverse permutation: second sort is ~10x cheaper than a scatter here
    _, pos_by_slot = jax.lax.sort((slot_of_pos, slots))

    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) * rank_size
    bounds = jnp.searchsorted(keys_sorted, boundaries, side="left").astype(
        jnp.int32
    )
    tstart = bounds[:-1]
    tcount = bounds[1:] - bounds[:-1]

    rank_of_pos = keys_sorted & (rank_size - 1)
    tile_of_pos = keys_sorted // rank_size               # non-decreasing
    # lane within tile via segment-base scan (a tstart[tile_of_pos] element
    # gather would cost ~7.5 ms at 1M positions)
    changed = jnp.concatenate(
        [jnp.ones((1,), bool), tile_of_pos[1:] != tile_of_pos[:-1]]
    )
    seg_base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(changed, slots, 0)
    )
    lane = slots - seg_base
    win_valid = (tile_of_pos < num_tiles) & (lane < max_per_tile)
    winslot = jnp.where(win_valid, tile_of_pos * max_per_tile + lane, 0)

    num_rendered = jnp.sum(touched_s, dtype=jnp.int32)
    max_tile_count = jnp.max(tcount)
    return StreamBins(
        order=order,
        rank_of_pos=jnp.minimum(rank_of_pos, p - 1),
        pos_by_slot=pos_by_slot,
        winslot=winslot,
        win_valid=win_valid,
        slow_starts=starts,
        tstart=tstart,
        tile_counts=tcount,
        num_rendered=num_rendered,
        overflow=total_slow > max_pairs,
        tile_overflow=max_tile_count > max_per_tile,
        max_tile_count=max_tile_count,
    )


def bin_gaussians(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    max_per_tile: int,
    fast_k: int = 8,
) -> Binning:
    p = prep.depths.shape[0]
    num_tiles = grid_x * grid_y
    rank_size = _next_pow2(max(p, 2))
    # packed-key capacity check: (num_tiles+1) * rank_size must fit in int32
    assert (num_tiles + 1) * rank_size < 2**31, (
        f"packed sort key overflow: {num_tiles} tiles x {rank_size} rank "
        "slots — reduce P per shard or use a larger tile size")
    max_pairs_slow = max_pairs

    # ---- 1. global depth order (invalid sink to the back) -----------
    depth_key = jnp.where(
        prep.valid,
        jax.lax.bitcast_convert_type(prep.depths, jnp.int32),
        INT32_MAX,
    )
    order = jnp.argsort(depth_key).astype(jnp.int32)     # stable
    rect_s = prep.rect[order]                            # (P, 4)
    touched_s = prep.tiles_touched[order]
    w_s = jnp.maximum(rect_s[:, 2] - rect_s[:, 0], 1)

    # ---- 2a. fast path: offset-major expansion ----------------------
    # fast_k == 0 disables it (pure scan path — better when mean pair
    # multiplicity is high and P*fast_k would exceed the true pair count)
    sentinel = jnp.int32(num_tiles * rank_size)
    if fast_k > 0:
        k_idx = jnp.arange(fast_k, dtype=jnp.int32)[None, :]      # (1, K)
        tile_x = rect_s[:, 0:1] + k_idx % w_s[:, None]
        tile_y = rect_s[:, 1:2] + k_idx // w_s[:, None]
        tile_fast = tile_y * grid_x + tile_x                       # (P, K)
        is_fast = touched_s <= fast_k
        ok_fast = is_fast[:, None] & (k_idx < touched_s[:, None])
        rank = jnp.arange(p, dtype=jnp.int32)[:, None]
        key_fast = jnp.where(ok_fast, tile_fast * rank_size + rank, sentinel)
    else:
        is_fast = jnp.zeros((p,), bool)
        key_fast = jnp.zeros((0,), jnp.int32)

    # ---- 2b. slow path: scan-based expansion for big rects ----------
    touched_slow = jnp.where(is_fast, 0, touched_s)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(touched_slow, dtype=jnp.int32)]
    )
    total_slow = starts[-1]
    pair_idx = jnp.arange(max_pairs_slow, dtype=jnp.int32)
    pair_ok = pair_idx < jnp.minimum(total_slow, max_pairs_slow)
    mark = jnp.zeros((max_pairs_slow,), jnp.int32).at[starts[:p]].max(
        jnp.arange(p, dtype=jnp.int32), mode="drop"
    )
    gsrt = jax.lax.associative_scan(jnp.maximum, mark)
    # ONE packed row gather for the per-pair expansion data (separate
    # per-field gathers cost ~4x on v5e)
    table = jnp.stack([rect_s[:, 0], rect_s[:, 1], w_s, starts[:p]], axis=1)
    rows = table[gsrt]                                  # (MP, 4)
    local = pair_idx - rows[:, 3]
    w_g = rows[:, 2]
    tx = rows[:, 0] + local % w_g
    ty = rows[:, 1] + local // w_g
    key_slow = jnp.where(
        pair_ok, (ty * grid_x + tx) * rank_size + gsrt, sentinel
    )

    # ---- 3. one packed int32 sort -----------------------------------
    keys = (jnp.concatenate([key_fast.reshape(-1), key_slow])
            if fast_k > 0 else key_slow)
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
        overflow=total_slow > max_pairs_slow,
        tile_overflow=max_tile_count > max_per_tile,
        max_tile_count=max_tile_count,
    )
