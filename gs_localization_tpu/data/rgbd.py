"""RGB-D back-projection: point clouds from image + depth.

The SLAM-style Gaussian model in the reference initializes/extends the map
by back-projecting RGB-D frames through open3d
(/root/reference/gs_localization/pipelines/tools/gaussian_model.py:107-203:
create_pcd_from_image_and_depth with downsampling and adaptive point size).
Native jnp equivalent — used both for map init without SfM points and for
incremental SLAM-style extension.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera


def backproject_rgbd(
    camera: Camera,
    rgb: jnp.ndarray,             # (H, W, 3)
    depth: jnp.ndarray,           # (H, W) meters, 0/neg = invalid
    stride: int = 4,              # downsample factor (reference downsamples)
    depth_max: float = 10.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (points (N,3) world, colors (N,3), mean_spacing (N,)).

    ``mean_spacing`` approximates the surface sample spacing at each point
    (depth * stride / f) — the adaptive 'point size' the reference derives
    for initial Gaussian scales.
    """
    h, w = depth.shape
    ys = jnp.arange(0, h, stride)
    xs = jnp.arange(0, w, stride)
    d = depth[ys][:, xs]
    c = rgb[ys][:, xs]
    u = xs[None, :].astype(jnp.float32)
    v = ys[:, None].astype(jnp.float32)
    x_cam = (u - camera.cx) / camera.fx * d
    y_cam = (v - camera.cy) / camera.fy * d
    pts_cam = jnp.stack([x_cam, y_cam, d], axis=-1).reshape(-1, 3)
    valid = ((d > 1e-3) & (d < depth_max)).reshape(-1)

    R = camera.R_w2c
    t = camera.t_w2c
    pts_world = (pts_cam - t) @ R          # R^T (p - t)
    spacing = (d * stride / camera.fx).reshape(-1)

    pts = np.asarray(pts_world)[np.asarray(valid)]
    cols = np.asarray(c.reshape(-1, 3))[np.asarray(valid)]
    sp = np.asarray(spacing)[np.asarray(valid)]
    return pts, cols, sp


def gaussians_from_rgbd(
    camera: Camera, rgb, depth, stride: int = 4, sh_degree: int = 3,
    capacity: Optional[int] = None, point_size: float = 1.0,
):
    """GaussianParams initialized from one RGB-D frame (SLAM-style init):
    scales from the local sample spacing instead of k-NN."""
    from ..core.gaussians import GaussianParams

    pts, cols, sp = backproject_rgbd(camera, jnp.asarray(rgb),
                                     jnp.asarray(depth), stride)
    mean_sq = (sp * point_size) ** 2
    return GaussianParams.from_pcd(
        pts, cols, sh_degree=sh_degree, capacity=capacity,
        mean_sq_dist=mean_sq,
    )
