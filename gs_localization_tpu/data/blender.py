"""Blender / NeRF-synthetic scene reader (transforms_{train,test}.json).

Mirrors readNerfSyntheticInfo
(/root/reference/gaussian_splatting/scene/dataset_readers_batch.py:216-292):
c2w matrices with the OpenGL->COLMAP flip (negate Y/Z columns), fov from
``camera_angle_x``, white-background RGBA handling left to the image loader,
and a random point-cloud init when no points are provided.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..core.camera import Camera, fov2focal
from .scene import CameraInfo, SceneInfo, compute_scene_extent


def _read_split(path: str, json_name: str, width: int, height: int,
                ) -> List[CameraInfo]:
    import jax.numpy as jnp

    with open(os.path.join(path, json_name)) as f:
        meta = json.load(f)
    fovx = float(meta["camera_angle_x"])
    fx = fov2focal(fovx, width)
    infos = []
    for i, frame in enumerate(meta["frames"]):
        c2w = np.array(frame["transform_matrix"], np.float64)
        # OpenGL camera (-Z forward, +Y up) -> COLMAP-style (+Z forward)
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        cam = Camera(
            w2c=jnp.asarray(w2c, jnp.float32),
            fx=jnp.float32(fx), fy=jnp.float32(fx),
            cx=jnp.float32(width / 2), cy=jnp.float32(height / 2),
            width=width, height=height,
        )
        name = frame["file_path"]
        img_path = os.path.join(path, name + ".png") \
            if not name.endswith(".png") else os.path.join(path, name)
        infos.append(CameraInfo(uid=i, name=os.path.basename(name),
                                camera=cam, image_path=img_path))
    return infos


def load_blender_scene(
    path: str, width: int = 800, height: int = 800,
    num_init_points: int = 100_000, seed: int = 0,
) -> SceneInfo:
    train = _read_split(path, "transforms_train.json", width, height)
    test = []
    if os.path.exists(os.path.join(path, "transforms_test.json")):
        test = _read_split(path, "transforms_test.json", width, height)
        for j, t in enumerate(test):
            t.uid = len(train) + j

    centers = np.stack([np.asarray(c.camera.campos) for c in train])
    extent = compute_scene_extent(centers)

    # random init cloud in the NeRF-synthetic [-1.3, 1.3]^3 box
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.3, 1.3, (num_init_points, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (num_init_points, 3)).astype(np.float32)
    return SceneInfo(train_cameras=train, test_cameras=test,
                     points=pts, colors=cols, extent=extent)
