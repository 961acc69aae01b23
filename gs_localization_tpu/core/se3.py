"""SE(3) / SO(3) Lie-group helpers.

Semantics match the reference pose-refinement math
(/root/reference/gs_localization/pipelines/tools/pose_utils.py:41-122): Rodrigues
exponential with a small-angle Taylor branch, left Jacobian ``V``, and the
retraction ``T_w2c <- exp(tau) @ T_w2c`` with tau = [rho, theta].

Everything is pure jnp, differentiable, and vmappable (no data-dependent Python
control flow; the small-angle branch is a ``jnp.where``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-5


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-f32 matrix product for pose math.

    TPU matmuls default to bf16 inputs (~1e-3 relative); the SE(3)
    retraction runs ~50 times SEQUENTIALLY per refinement, so default
    precision random-walks the pose by ~0.5-1.5 DEGREES — the r4 accuracy
    harness measured exactly that as a refined-rotation floor. These are
    3x3/4x4 products; HIGHEST costs nothing.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _safe_angle(theta: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (angle, is_small). Angle is clamped away from 0 for safe division;
    the small branch uses Taylor series so the clamp never leaks into outputs."""
    sq = jnp.sum(theta * theta, axis=-1)
    is_small = sq < _SMALL * _SMALL
    angle = jnp.sqrt(jnp.where(is_small, 1.0, sq))
    return angle, is_small


def so3_exp(theta: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix (Rodrigues)."""
    W = skew(theta)
    W2 = _mm(W, W)
    angle, is_small = _safe_angle(theta)
    a = angle[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    sin_term = jnp.where(is_small[..., None, None], 1.0, jnp.sin(a) / a)
    cos_term = jnp.where(is_small[..., None, None], 0.5, (1.0 - jnp.cos(a)) / (a * a))
    return eye + sin_term * W + cos_term * W2


def so3_left_jacobian(theta: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V(theta): translation part of SE(3) exp is V @ rho."""
    W = skew(theta)
    W2 = _mm(W, W)
    angle, is_small = _safe_angle(theta)
    a = angle[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    c1 = jnp.where(is_small[..., None, None], 0.5, (1.0 - jnp.cos(a)) / (a * a))
    c2 = jnp.where(
        is_small[..., None, None], 1.0 / 6.0, (a - jnp.sin(a)) / (a * a * a)
    )
    return eye + c1 * W + c2 * W2


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist [rho(3), theta(3)] -> (..., 4, 4) homogeneous transform."""
    rho = tau[..., :3]
    theta = tau[..., 3:]
    R = so3_exp(theta)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(theta), rho,
                   precision=jax.lax.Precision.HIGHEST)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=tau.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def apply_delta(tau: jnp.ndarray, w2c: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction: w2c' = exp(tau) @ w2c (broadcasting)."""
    return _mm(se3_exp(tau), w2c)


def rotation_geodesic_error_deg(R_est: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Rotation error arccos((tr(R_gt^T R) - 1)/2) in degrees.

    Matches /root/reference/gs_localization/pipelines/tools/eval_utils.py.
    """
    # trace(A^T B) == sum(A * B): elementwise, so no matmul precision
    # hazard (arccos near 1 turns a 3e-4 bf16 trace error into ~1.4 deg)
    tr = jnp.sum(R_gt * R_est, axis=(-2, -1))
    cosv = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cosv))
