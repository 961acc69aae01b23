"""Tile binning: depth-ordered per-tile Gaussian lists at static capacity.

The reference does this with dynamic allocation + a device-wide 64-bit CUB
radix sort over (tileID << 32 | float_bits(depth)) keys and a host sync for
``num_rendered`` (rasterizer_impl.cu:70-138, 278-309). The TPU-native design
removes both the 64-bit sort and the host sync:

1. argsort Gaussians by view depth once (stable).
2. expand (Gaussian x tile) pairs *in depth order* with the searchsorted
   trick: pair slot j belongs to sorted-Gaussian ``searchsorted(starts, j)``;
   its tile comes from the Gaussian's tile rect and the slot's local rank.
   No scatter needed — everything is a gather.
3. one stable **int32** sort of pairs by tile id. Stability preserves depth
   order within each tile, so a single 32-bit key replaces the 64-bit
   (tile, depth) key.
4. per-tile [start, count) via searchsorted, then a padded
   (num_tiles, max_per_tile) index matrix for the blend stage.

All shapes are static (``max_pairs``, ``max_per_tile`` are config); overflow
is reported as a scalar you can debug-check, and truncation drops the
farthest pairs (depth-ordered expansion makes truncation graceful).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed


class Binning(NamedTuple):
    tile_gid: jnp.ndarray     # (num_tiles, max_per_tile) int32 gaussian ids
    tile_mask: jnp.ndarray    # (num_tiles, max_per_tile) bool
    tile_counts: jnp.ndarray  # (num_tiles,) int32 (pre-truncation counts, clipped)
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
    depth_key = jnp.where(prep.valid, prep.depths, jnp.inf)
    order = jnp.argsort(depth_key)                       # stable
    rect_s = prep.rect[order]                            # (P, 4)
    touched_s = prep.tiles_touched[order]

    # ---- 2. pair expansion in depth order ---------------------------
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(touched_s, dtype=jnp.int32)]
    )                                                    # (P+1,)
    total = starts[-1]
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_valid = pair_idx < jnp.minimum(total, max_pairs)
    # sorted-gaussian index owning each pair slot
    gsrt = jnp.searchsorted(starts, pair_idx, side="right").astype(jnp.int32) - 1
    gsrt = jnp.clip(gsrt, 0, p - 1)
    local = pair_idx - starts[gsrt]
    w = jnp.maximum(rect_s[gsrt, 2] - rect_s[gsrt, 0], 1)
    tile_x = rect_s[gsrt, 0] + local % w
    tile_y = rect_s[gsrt, 1] + local // w
    tile = tile_y * grid_x + tile_x
    tile = jnp.where(pair_valid, tile, num_tiles)        # sentinel sorts last

    # ---- 3. stable 32-bit sort by tile ------------------------------
    gid = order[gsrt].astype(jnp.int32)
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
