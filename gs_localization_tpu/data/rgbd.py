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


def extend_gaussians_from_rgbd(
    gaussians,
    camera: Camera,
    rgb,
    depth,
    stride: int = 8,
    point_size: float = 1.0,
):
    """SLAM-style incremental map extension (reference extend_from_pcd_seq,
    tools/gaussian_model.py:204+): back-project a new RGB-D keyframe and
    write the new Gaussians into free capacity slots (fixed-capacity scatter,
    same mechanism as densification). Returns (params, num_added)."""
    import jax

    from ..core.gaussians import GaussianParams, inverse_sigmoid
    from ..core import sh as sh_lib

    pts, cols, sp = backproject_rgbd(camera, jnp.asarray(rgb),
                                     jnp.asarray(depth), stride)
    n_new = pts.shape[0]
    cap = gaussians.capacity
    free = ~gaussians.live
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    num_free = jnp.sum(free.astype(jnp.int32))
    slot_of_rank = jnp.full((max(n_new, cap),), cap, jnp.int32).at[
        jnp.where(free, free_rank, max(n_new, cap))
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    ranks = jnp.arange(n_new)
    fits = ranks < num_free
    target = jnp.where(fits, slot_of_rank[jnp.minimum(ranks, cap - 1)], cap)

    scales = jnp.log(jnp.maximum(jnp.asarray(sp) * point_size, 1e-7))
    k1 = gaussians.features_rest.shape[1]
    new = gaussians.replace(
        xyz=gaussians.xyz.at[target].set(jnp.asarray(pts), mode="drop"),
        features_dc=gaussians.features_dc.at[target].set(
            sh_lib.rgb_to_sh_dc(jnp.asarray(cols))[:, None, :], mode="drop"),
        features_rest=gaussians.features_rest.at[target].set(
            jnp.zeros((n_new, k1, 3)), mode="drop"),
        scaling=gaussians.scaling.at[target].set(
            jnp.tile(scales[:, None], (1, 3)), mode="drop"),
        rotation=gaussians.rotation.at[target].set(
            jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n_new, 1)), mode="drop"),
        opacity=gaussians.opacity.at[target].set(
            jnp.full((n_new, 1), inverse_sigmoid(jnp.float32(0.1))),
            mode="drop"),
        live=gaussians.live.at[target].set(True, mode="drop"),
    )
    return new, jnp.sum(fits.astype(jnp.int32))


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
