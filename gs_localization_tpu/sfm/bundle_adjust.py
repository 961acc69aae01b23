"""Bundle adjustment: matrix-free Levenberg-Marquardt in JAX.

The reference delegates joint pose+structure refinement to COLMAP's C++
ceres solver inside ``pycolmap.incremental_mapping``
(/root/reference/hloc/reconstruction.py:186-229). This is the TPU-native
replacement: an inexact-LM solver ("Bundle Adjustment in the Large" style)
where the normal equations (JtJ + lambda I) delta = -Jt r are solved by
conjugate gradient using only Jacobian-vector products — jvp for J, vjp for
Jt — so the sparse Jacobian is never materialized. Every step is a fixed
sequence of dense vectorized ops (projections over all observations at
once), which XLA fuses; there is no per-camera or per-point host loop.

Parameterization: SE(3) tangent deltas around the current poses (retraction
``exp(tau) @ w2c0``, same convention as the pose-refinement loop,
core/se3.py) and additive deltas on points. Gauge freedom is fixed by
masking the tangents of ``fixed_cams``. Robustness via IRLS Huber weights
recomputed each outer iteration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import se3_exp


class BAProblem(NamedTuple):
    w2c0: jnp.ndarray      # (C, 4, 4) current world->cam poses
    K: jnp.ndarray         # (C, 3, 3) intrinsics
    points0: jnp.ndarray   # (T, 3) current points
    cam_idx: jnp.ndarray   # (E,) int32
    pt_idx: jnp.ndarray    # (E,) int32
    uv: jnp.ndarray        # (E, 2) observed pixels
    weight: jnp.ndarray    # (E,) observation weights (0 = ignore)
    fixed_cams: jnp.ndarray  # (C,) bool — gauge-fixed cameras (tau pinned 0)


class BAResult(NamedTuple):
    w2c: jnp.ndarray       # (C, 4, 4)
    points: jnp.ndarray    # (T, 3)
    cost0: jnp.ndarray     # () initial robust cost
    cost: jnp.ndarray      # () final robust cost
    num_iters: jnp.ndarray  # () LM iterations accepted


def _project(w2c, K, X, cam_idx, pt_idx):
    """Pixel projections of point pt_idx[e] into camera cam_idx[e]. (E, 2)."""
    Rt = w2c[cam_idx]                               # (E, 4, 4)
    Xc = jnp.einsum("eij,ej->ei", Rt[:, :3, :3], X[pt_idx]) + Rt[:, :3, 3]
    z = jnp.maximum(Xc[:, 2], 1e-6)
    Ke = K[cam_idx]
    u = Ke[:, 0, 0] * Xc[:, 0] / z + Ke[:, 0, 2]
    v = Ke[:, 1, 1] * Xc[:, 1] / z + Ke[:, 1, 2]
    return jnp.stack([u, v], -1)


def _apply_tau(tau, w2c0, fixed):
    tau = jnp.where(fixed[:, None], 0.0, tau)
    return jax.vmap(lambda t, m: se3_exp(t) @ m)(tau, w2c0)


def bundle_adjust(
    problem: BAProblem,
    iters: int = 15,
    cg_iters: int = 40,
    huber_px: float = 4.0,
    lm_lambda0: float = 1e-3,
) -> BAResult:
    """Run ``iters`` LM steps. Fully jittable (fixed iteration counts)."""
    w2c0 = jnp.asarray(problem.w2c0, jnp.float32)
    K = jnp.asarray(problem.K, jnp.float32)
    X0 = jnp.asarray(problem.points0, jnp.float32)
    cam_idx = jnp.asarray(problem.cam_idx, jnp.int32)
    pt_idx = jnp.asarray(problem.pt_idx, jnp.int32)
    uv = jnp.asarray(problem.uv, jnp.float32)
    w_obs = jnp.asarray(problem.weight, jnp.float32)
    fixed = jnp.asarray(problem.fixed_cams, bool)

    def residuals(params, irls_w):
        # re-linearize around the *base* state; params are global deltas
        w2c = _apply_tau(params["tau"], w2c0, fixed)
        X = X0 + params["dx"]
        pred = _project(w2c, K, X, cam_idx, pt_idx)
        return (pred - uv) * irls_w[:, None]

    def robust_cost_and_weights(params):
        """Huber IRLS: weights sqrt(min(1, huber/|r|)), cost in px^2 units."""
        w2c = _apply_tau(params["tau"], w2c0, fixed)
        X = X0 + params["dx"]
        pred = _project(w2c, K, X, cam_idx, pt_idx)
        r2 = jnp.sum((pred - uv) ** 2, -1)
        rn = jnp.sqrt(r2 + 1e-12)
        hub = jnp.where(rn <= huber_px, r2, huber_px * (2 * rn - huber_px))
        cost = jnp.sum(w_obs * hub)
        irls = w_obs * jnp.sqrt(jnp.minimum(1.0, huber_px / rn))
        return cost, irls

    zero = {"tau": jnp.zeros((w2c0.shape[0], 6), jnp.float32),
            "dx": jnp.zeros_like(X0)}
    cost0, _ = robust_cost_and_weights(zero)

    def lm_step(carry, _):
        params, lam, cost, accepted = carry
        _, irls = robust_cost_and_weights(params)

        r = residuals(params, irls)
        # matrix-free normal equations via jvp/vjp
        _, vjp_fn = jax.vjp(lambda p: residuals(p, irls), params)
        (jtr,) = vjp_fn(r)

        def matvec(v):
            _, jv = jax.jvp(lambda p: residuals(p, irls), (params,), (v,))
            (jtjv,) = vjp_fn(jv)
            return jax.tree_util.tree_map(
                lambda a, b: a + lam * b, jtjv, v)

        neg_jtr = jax.tree_util.tree_map(jnp.negative, jtr)
        delta, _ = jax.scipy.sparse.linalg.cg(
            matvec, neg_jtr, maxiter=cg_iters)

        trial = jax.tree_util.tree_map(lambda a, b: a + b, params, delta)
        new_cost, _ = robust_cost_and_weights(trial)
        accept = new_cost < cost
        params = jax.tree_util.tree_map(
            lambda t, p: jnp.where(accept, t, p), trial, params)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        return (params, lam, cost, accepted + accept.astype(jnp.int32)), None

    init = (zero, jnp.float32(lm_lambda0), cost0, jnp.int32(0))
    (params, _, cost, n_acc), _ = jax.lax.scan(
        lm_step, init, None, length=iters)

    w2c = _apply_tau(params["tau"], w2c0, fixed)
    return BAResult(w2c=w2c, points=X0 + params["dx"], cost0=cost0,
                    cost=cost, num_iters=n_acc)


def bundle_adjust_np(
    w2c: np.ndarray, K: np.ndarray, points: np.ndarray,
    cam_idx: np.ndarray, pt_idx: np.ndarray, uv: np.ndarray,
    weight: Optional[np.ndarray] = None,
    fixed_cams: Optional[np.ndarray] = None,
    **kw,
):
    """Host-friendly wrapper: numpy in, numpy out (jits the solver once per
    observation-count bucket; the incremental mapper pads to buckets)."""
    e = len(cam_idx)
    if weight is None:
        weight = np.ones(e, np.float32)
    if fixed_cams is None:
        fixed_cams = np.zeros(len(w2c), bool)
        fixed_cams[0] = True
    prob = BAProblem(
        w2c0=jnp.asarray(w2c, jnp.float32), K=jnp.asarray(K, jnp.float32),
        points0=jnp.asarray(points, jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(uv, jnp.float32),
        weight=jnp.asarray(weight, jnp.float32),
        fixed_cams=jnp.asarray(fixed_cams),
    )
    res = _ba_jitted(
        kw.get("iters", 15), kw.get("cg_iters", 40),
        kw.get("huber_px", 4.0), kw.get("lm_lambda0", 1e-3))(prob)
    return (np.asarray(res.w2c), np.asarray(res.points),
            float(res.cost0), float(res.cost))


@functools.lru_cache(maxsize=8)
def _ba_jitted(iters, cg_iters, huber_px, lm_lambda0):
    return jax.jit(lambda p: bundle_adjust(
        p, iters=iters, cg_iters=cg_iters, huber_px=huber_px,
        lm_lambda0=lm_lambda0))
