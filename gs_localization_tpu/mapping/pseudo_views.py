"""Pseudo-camera synthesis for few-shot training.

The reference generates extra camera poses when fewer than ~200 train views
exist (/root/reference/gaussian_splatting/utils/pose_utils.py:5-92 via
scene_batch.py:83-94): order the train cameras into a short tour
(assignment-based ordering), then interpolate poses between consecutive
cameras with cosine spacing — linear translation + quaternion slerp.
Training renders these views and applies a Pearson-depth consistency loss
(SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..core.camera import Camera, rotmat_to_quat, quat_to_rotmat


def _tour_order(centers: np.ndarray) -> np.ndarray:
    """Short path through camera centers (greedy nearest neighbor — the
    reference uses an assignment solver; greedy gives an equivalent tour for
    this purpose)."""
    n = centers.shape[0]
    d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    order = [0]
    used = {0}
    for _ in range(n - 1):
        last = order[-1]
        nxt = min((j for j in range(n) if j not in used), key=lambda j: d[last, j])
        order.append(nxt)
        used.add(nxt)
    return np.array(order)


def _slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    if np.dot(q0, q1) < 0:
        q1 = -q1
    dot = np.clip(np.dot(q0, q1), -1.0, 1.0)
    if dot > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(dot)
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def generate_pseudo_poses(
    cameras: List[Camera], n_per_edge: int = 3,
) -> List[Camera]:
    """Interpolated cameras along a tour of the given train cameras."""
    if len(cameras) < 2:
        return []
    w2cs = [np.asarray(c.w2c) for c in cameras]
    centers = np.stack([np.asarray(c.campos) for c in cameras])
    order = _tour_order(centers)
    out: List[Camera] = []
    base = cameras[0]
    for a, b in zip(order[:-1], order[1:]):
        Ra, ta = w2cs[a][:3, :3], w2cs[a][:3, 3]
        Rb, tb = w2cs[b][:3, :3], w2cs[b][:3, 3]
        qa, qb = rotmat_to_quat(Ra), rotmat_to_quat(Rb)
        for k in range(1, n_per_edge + 1):
            # cosine-spaced interpolation parameter (denser near endpoints)
            u = k / (n_per_edge + 1)
            t = 0.5 * (1 - np.cos(np.pi * u))
            q = _slerp(qa, qb, t)
            import jax.numpy as jnp

            R = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
            w2c = np.eye(4, dtype=np.float32)
            w2c[:3, :3] = R
            w2c[:3, 3] = (1 - t) * ta + t * tb
            out.append(base.replace(w2c=jnp.asarray(w2c)))
    return out
