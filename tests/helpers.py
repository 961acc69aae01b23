"""Shared test fixtures: random synthetic Gaussian scenes and cameras."""

import numpy as np
import jax.numpy as jnp

from gs_localization_tpu.core.camera import Camera
from gs_localization_tpu.core.gaussians import GaussianParams
from gs_localization_tpu.core import sh as sh_lib


def random_scene(
    rng: np.random.Generator,
    n: int = 128,
    sh_degree: int = 2,
    capacity: int | None = None,
    spread: float = 1.0,
    z_range=(2.0, 6.0),
    scale_range=(-3.5, -2.0),
) -> GaussianParams:
    """Random Gaussians in front of a canonical camera at the origin (+z)."""
    xyz = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(*z_range, n),
        ],
        axis=1,
    ).astype(np.float32)
    k = sh_lib.num_sh_coeffs(sh_degree)
    fdc = sh_lib.rgb_to_sh_dc(rng.uniform(0.05, 0.95, (n, 3))).astype(np.float32)[:, None, :]
    frest = (0.1 * rng.standard_normal((n, k - 1, 3))).astype(np.float32)
    scaling = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    rotation = rng.standard_normal((n, 4)).astype(np.float32)
    rotation /= np.linalg.norm(rotation, axis=1, keepdims=True)
    opacity = rng.uniform(-1.0, 3.0, (n, 1)).astype(np.float32)
    return GaussianParams.from_arrays(
        xyz=xyz,
        features_dc=fdc,
        features_rest=frest,
        scaling=scaling,
        rotation=rotation,
        opacity=opacity,
        sh_degree=sh_degree,
        capacity=capacity,
    )


def make_camera(width=64, height=48, fov=1.0, R=None, t=None) -> Camera:
    if R is None:
        R = np.eye(3, dtype=np.float32)
    if t is None:
        t = np.zeros(3, dtype=np.float32)
    fx = width / (2.0 * np.tan(fov / 2.0))
    fy = fx
    return Camera.from_rt(R, t, fx, fy, width, height)
