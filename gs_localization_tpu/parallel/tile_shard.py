"""Tile-sharded rendering: the spatial/"SP" parallel axis (SURVEY.md §2.9).

One frame's tile grid is split across devices: preprocess + binning run
replicated (they are P-bound, cheap relative to blending), each device
blends only its slice of tile rows, and per-Gaussian gradients from the
blend are psum'd over the tile axis in the backward — exactly the
"pixel/tile sharding" row of the §2.9 table. The forward needs no
collectives at all (each device owns its pixels); the psum appears only in
the VJP, which XLA inserts automatically for the replicated-in /
sharded-out shard_map.

Use when a single frame is large (megapixel images / millions of Gaussians)
— for many small frames prefer the data-parallel axis (parallel/dp.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..raster import RasterizerConfig
from ..raster import binning as binning_lib
from ..raster import blend as blend_lib
from ..raster.preprocess import preprocess
from ..raster.rasterize import RenderOutput, _blend_mode


def rasterize_tile_sharded(
    mesh: Mesh,
    gaussians: GaussianParams,
    camera: Camera,
    config: RasterizerConfig = RasterizerConfig(),
    bg: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Single-frame render with tiles sharded over ``mesh`` axis 0.

    Differentiable w.r.t. Gaussian parameters and the camera; gradients are
    correct global sums (psum over the tile axis happens in the VJP).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    ts = config.tile_size
    grid_x = -(-camera.width // ts)
    grid_y = -(-camera.height // ts)
    num_tiles = grid_x * grid_y
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    assert num_tiles % n_dev == 0, (
        f"tile rows {num_tiles} must divide over {n_dev} devices — pad the "
        f"image height to a multiple of {ts * n_dev}")

    prep = preprocess(gaussians, camera, tile_size=ts,
                      scale_modifier=config.scale_modifier)
    bins = binning_lib.bin_gaussians(
        prep, grid_x, grid_y, config.max_pairs, config.max_per_tile,
        tile_size=ts, tile_cull=config.tile_cull)

    pix = blend_lib.tile_pixel_coords(grid_x, grid_y, ts)  # global coords

    def device_fn(tile_gid, tile_mask, pix_local, means2d, conic, rgb,
                  opacity, depths):
        out = blend_lib.blend_tiles(
            tile_gid, tile_mask, means2d, conic, rgb, opacity, depths,
            grid_x, grid_y, ts, chunk=config.chunk, pix=pix_local,
        )
        return out.color, out.depth, out.log_t

    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    color_t, depth_t, log_t = fn(
        bins.tile_gid, bins.tile_mask, pix, prep.means2d, prep.conic,
        prep.rgb, prep.opacity, prep.depths,
    )

    t_final = jnp.exp(log_t)
    color_tiles = color_t + t_final[..., None] * bg[None, None, :]
    w, h = camera.width, camera.height
    color = blend_lib.tiles_to_image(color_tiles, grid_x, grid_y, ts, w, h)
    depth = blend_lib.tiles_to_image(depth_t, grid_x, grid_y, ts, w, h)
    alpha = blend_lib.tiles_to_image(1.0 - t_final, grid_x, grid_y, ts, w, h)
    return RenderOutput(
        color=color, depth=depth, alpha=alpha,
        radii=prep.radii, visibility=prep.radii > 0,
        num_rendered=bins.num_rendered, overflow=bins.overflow,
        tile_overflow=bins.tile_overflow,
    )
