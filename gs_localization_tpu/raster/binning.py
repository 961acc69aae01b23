"""Tile binning: depth-ordered per-tile Gaussian lists at static capacity.

The reference does this with dynamic allocation + a device-wide 64-bit CUB
radix sort over (tileID << 32 | float_bits(depth)) keys and a host sync for
``num_rendered`` (rasterizer_impl.cu:70-138, 278-309). The TPU-native design
removes the 64-bit sort, the host sync, and every slow XLA op on the
pair-expansion path (measured on v5e):

1. argsort Gaussians by **bitcast-int32** view depth (float sorts are slower
   on TPU; positive IEEE floats order correctly as ints).
2. expand (Gaussian x tile) pairs in depth order. The pair -> Gaussian
   ownership map is a scatter of P start marks + an associative-scan
   running max — O(MP log MP) elementwise, replacing a 1M-query
   searchsorted that costs >100 ms on TPU.
3. per-Gaussian expansion data rides ONE packed (P, 5) int32 row gather.
4. one stable int32 sort of pairs by tile id; stability preserves depth
   order within tiles, so a 32-bit key suffices.
5. per-tile [start, count) via small-query searchsorted, then a padded
   (num_tiles, max_per_tile) index matrix for the blend stage.

All shapes are static (``max_pairs``, ``max_per_tile`` are config); overflow
is reported as a scalar, and truncation drops the farthest pairs (depth-
ordered expansion makes truncation graceful).
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
    overflow: jnp.ndarray     # () bool — pair capacity exceeded


def bin_gaussians(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    max_per_tile: int,
) -> Binning:
    p = prep.depths.shape[0]
    num_tiles = grid_x * grid_y

    # ---- 1. global depth order (invalid sink to the back) -----------
    depth_key = jnp.where(
        prep.valid,
        jax.lax.bitcast_convert_type(prep.depths, jnp.int32),
        INT32_MAX,
    )
    order = jnp.argsort(depth_key).astype(jnp.int32)     # stable
    touched_s = prep.tiles_touched[order]

    # ---- 2. pair expansion in depth order ---------------------------
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(touched_s, dtype=jnp.int32)]
    )                                                    # (P+1,)
    total = starts[-1]
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_valid = pair_idx < jnp.minimum(total, max_pairs)

    # pair -> sorted-gaussian ownership: scatter each gaussian's start slot
    # with its index (max-combine resolves empty-range collisions to the
    # last, i.e. the non-empty, gaussian), then running-max over pair slots.
    mark = jnp.zeros((max_pairs,), jnp.int32).at[starts[:p]].max(
        jnp.arange(p, dtype=jnp.int32), mode="drop"
    )
    # NOTE: lax.cummax lowers to a 715ms serial loop on v5e for 2M elements;
    # associative_scan's log-depth expansion is ~100x faster in-context.
    gsrt = jax.lax.associative_scan(jnp.maximum, mark)

    # packed per-gaussian expansion table, gathered once per pair:
    # [x0, y0, rect_w, start, original_gid]
    rect_s = prep.rect[order]
    table = jnp.stack(
        [
            rect_s[:, 0],
            rect_s[:, 1],
            jnp.maximum(rect_s[:, 2] - rect_s[:, 0], 1),
            starts[:p],
            order,
        ],
        axis=1,
    )                                                    # (P, 5) int32
    rows = table[gsrt]                                   # (MP, 5)
    local = pair_idx - rows[:, 3]
    tile_x = rows[:, 0] + local % rows[:, 2]
    tile_y = rows[:, 1] + local // rows[:, 2]
    tile = tile_y * grid_x + tile_x
    tile = jnp.where(pair_valid, tile, num_tiles)        # sentinel sorts last
    gid = rows[:, 4]

    # ---- 3. stable 32-bit sort by tile ------------------------------
    tile_sorted, gid_sorted = jax.lax.sort(
        (tile, gid), num_keys=1, is_stable=True
    )

    # ---- 4. per-tile ranges -> padded index matrix ------------------
    tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    tstart = bounds[:-1]                                  # (num_tiles,)
    tcount = bounds[1:] - bounds[:-1]
    kidx = jnp.arange(max_per_tile, dtype=jnp.int32)
    flat_idx = tstart[:, None] + kidx[None, :]
    tile_mask = kidx[None, :] < jnp.minimum(tcount, max_per_tile)[:, None]
    flat_idx = jnp.clip(flat_idx, 0, max_pairs - 1)
    tile_gid = jnp.take(gid_sorted, flat_idx, axis=0)

    return Binning(
        tile_gid=tile_gid,
        tile_mask=tile_mask,
        tile_counts=jnp.minimum(tcount, max_per_tile),
        num_rendered=total,
        overflow=total > max_pairs,
    )
