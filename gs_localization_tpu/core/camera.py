"""Camera model and projective math.

Conventions match the reference exactly (so trained maps / poses interop):

- ``w2c`` is the 4x4 world-to-camera matrix in standard math convention
  (camera = w2c @ [x;1]). The reference stores the same transform transposed
  for its column-major CUDA kernels
  (/root/reference/gaussian_splatting/utils/graphics_utils.py:31-49); we keep
  the untransposed form and it is numerically identical math.
- OpenGL-style projection with z_sign=+1 and z in [0,1], znear=0.01, zfar=100
  by default (graphics_utils.py:70-114, principal-point-aware variant
  getProjectionMatrix2:94-114).
- NDC -> pixel: ((v+1)*S - 1)/2 (cuda_rasterizer/auxiliary.h:41-44).

``Camera`` is a frozen flax struct => a pytree, so it can be vmapped /
sharded / passed through jit without re-tracing per instance (W/H/static
fields are hashable aux data).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import se3


def w2c_from_rt(R_c2w: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build a 4x4 w2c from the reference's (R, T) storage.

    The reference stores ``R`` as the camera-to-world rotation and ``t`` as the
    world-to-camera translation (getWorld2View2: Rt[:3,:3] = R.T, Rt[:3,3] = t).
    """
    top = jnp.concatenate(
        [jnp.swapaxes(R_c2w, -1, -2), t[..., :, None]], axis=-1
    )
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def w2c_from_quat_t(qvec_wxyz: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """COLMAP-style pose (qw qx qy qz, t) -> 4x4 w2c."""
    R = quat_to_rotmat(qvec_wxyz)  # this IS the w2c rotation in COLMAP
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion (not necessarily unit) -> (..., 3, 3)."""
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / jnp.maximum(n, 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation -> wxyz unit quaternion (numpy, host-side)."""
    m = np.asarray(R, dtype=np.float64)
    tr = np.trace(m)
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        q = np.array(
            [0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
             (m[1, 0] - m[0, 1]) / s]
        )
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = math.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        q = np.array(
            [(m[2, 1] - m[1, 2]) / s, 0.25 * s, (m[0, 1] + m[1, 0]) / s,
             (m[0, 2] + m[2, 0]) / s]
        )
    elif m[1, 1] > m[2, 2]:
        s = math.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        q = np.array(
            [(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s, 0.25 * s,
             (m[1, 2] + m[2, 1]) / s]
        )
    else:
        s = math.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        q = np.array(
            [(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
             (m[1, 2] + m[2, 1]) / s, 0.25 * s]
        )
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q.astype(np.float64)


def projection_matrix(
    fx, fy, cx, cy, width: int, height: int, znear: float = 0.01, zfar: float = 100.0
) -> jnp.ndarray:
    """Principal-point-aware GL projection (z in [0,1], z_sign +1).

    Matches getProjectionMatrix2 (graphics_utils.py:94-114); with cx=W/2,
    cy=H/2 it reduces to the symmetric getProjectionMatrix.
    """
    fx = jnp.asarray(fx, jnp.float32)
    fy = jnp.asarray(fy, jnp.float32)
    cx = jnp.asarray(cx, jnp.float32)
    cy = jnp.asarray(cy, jnp.float32)
    left = znear / fx * (((2 * cx - width) / width - 1.0) * width / 2.0)
    right = znear / fx * (((2 * cx - width) / width + 1.0) * width / 2.0)
    top = znear / fy * (((2 * cy - height) / height + 1.0) * height / 2.0)
    bottom = znear / fy * (((2 * cy - height) / height - 1.0) * height / 2.0)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack(
        [2.0 * znear / (right - left), zero, (right + left) / (right - left), zero],
        axis=-1,
    )
    row1 = jnp.stack(
        [zero, 2.0 * znear / (top - bottom), (top + bottom) / (top - bottom), zero],
        axis=-1,
    )
    row2 = jnp.stack(
        [zero, zero, one * (zfar / (zfar - znear)), one * (-(zfar * znear) / (zfar - znear))],
        axis=-1,
    )
    row3 = jnp.stack([zero, zero, one, zero], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


@struct.dataclass
class Camera:
    """Pinhole camera. Pytree of arrays + static (W, H).

    Attributes:
      w2c: (4,4) world-to-camera.
      fx, fy, cx, cy: intrinsics in pixels (scalars, traced).
      width, height: static ints.
      znear, zfar: static floats.
    """

    w2c: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @classmethod
    def from_rt(
        cls, R_c2w, t, fx, fy, width: int, height: int,
        cx: Optional[float] = None, cy: Optional[float] = None, **kw
    ) -> "Camera":
        if cx is None:
            cx = width / 2.0
        if cy is None:
            cy = height / 2.0
        return cls(
            w2c=w2c_from_rt(jnp.asarray(R_c2w, jnp.float32), jnp.asarray(t, jnp.float32)),
            fx=jnp.asarray(fx, jnp.float32),
            fy=jnp.asarray(fy, jnp.float32),
            cx=jnp.asarray(cx, jnp.float32),
            cy=jnp.asarray(cy, jnp.float32),
            width=int(width),
            height=int(height),
            **kw,
        )

    @classmethod
    def from_fov(cls, R_c2w, t, fovx: float, fovy: float, width: int, height: int, **kw):
        return cls.from_rt(
            R_c2w, t, fov2focal(fovx, width), fov2focal(fovy, height), width, height, **kw
        )

    # -- derived quantities ------------------------------------------------
    @property
    def tan_fovx(self) -> jnp.ndarray:
        return self.width / (2.0 * self.fx)

    @property
    def tan_fovy(self) -> jnp.ndarray:
        return self.height / (2.0 * self.fy)

    @property
    def projection(self) -> jnp.ndarray:
        return projection_matrix(
            self.fx, self.fy, self.cx, self.cy, self.width, self.height,
            self.znear, self.zfar,
        )

    @property
    def full_proj(self) -> jnp.ndarray:
        # full f32: this matrix feeds every projection; bf16 here moves
        # points by ~0.1% of scene scale (core/se3.py _mm note)
        return jnp.matmul(self.projection, self.w2c,
                          precision=jax.lax.Precision.HIGHEST)

    @property
    def R_w2c(self) -> jnp.ndarray:
        return self.w2c[..., :3, :3]

    @property
    def t_w2c(self) -> jnp.ndarray:
        return self.w2c[..., :3, 3]

    @property
    def campos(self) -> jnp.ndarray:
        """Camera center in world coordinates: -R^T t."""
        return -jnp.einsum("...ji,...j->...i", self.R_w2c, self.t_w2c,
                           precision=jax.lax.Precision.HIGHEST)

    def with_delta(self, tau: jnp.ndarray) -> "Camera":
        """Apply an SE(3) tangent delta: w2c' = exp(tau) @ w2c (differentiable)."""
        return self.replace(w2c=se3.apply_delta(tau, self.w2c))

    def with_pose(self, R_c2w, t) -> "Camera":
        return self.replace(w2c=w2c_from_rt(jnp.asarray(R_c2w, jnp.float32),
                                            jnp.asarray(t, jnp.float32)))
