"""Incremental SfM (unknown poses) + bundle adjustment tests."""

import numpy as np
import pytest

from gs_localization_tpu.core.se3 import se3_exp
from gs_localization_tpu.sfm.bundle_adjust import bundle_adjust_np
from gs_localization_tpu.sfm.evaluate import umeyama_alignment
from gs_localization_tpu.sfm.incremental import (
    decompose_essential, essential_ransac, incremental_mapping,
)


def _project(w2c, X, K):
    Xc = X @ w2c[:3, :3].T + w2c[:3, 3]
    return np.stack([K[0, 0] * Xc[:, 0] / Xc[:, 2] + K[0, 2],
                     K[1, 1] * Xc[:, 1] / Xc[:, 2] + K[1, 2]], 1), Xc[:, 2]


def _synthetic_scene(rng, n_cams=8, n_pts=300, noise_px=0.4,
                     outlier_frac=0.05, W=640, H=480):
    """Cameras on an arc looking at a point cloud; pairwise matches with
    noise + a fraction of wrong-association outliers."""
    K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]])
    X = np.stack([rng.uniform(-2.5, 2.5, n_pts), rng.uniform(-1.8, 1.8, n_pts),
                  rng.uniform(5.0, 9.0, n_pts)], 1)
    w2c = np.tile(np.eye(4), (n_cams, 1, 1))
    for c in range(n_cams):
        ang = (c - n_cams / 2) * 0.08
        Ry = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        w2c[c, :3, :3] = Ry
        w2c[c, :3, 3] = np.array([-0.6 * c + 2.0, 0.05 * c, 0.05 * c])

    kps, vis_ids = [], []
    for c in range(n_cams):
        uv, z = _project(w2c[c], X, K)
        ok = (z > 0.2) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        ids = np.nonzero(ok)[0]
        kp = uv[ids] + noise_px * rng.standard_normal((len(ids), 2))
        kps.append(kp.astype(np.float64))
        vis_ids.append(ids)

    matches = {}
    for i in range(n_cams):
        for j in range(i + 1, min(i + 4, n_cams)):
            common, ia, ja = np.intersect1d(
                vis_ids[i], vis_ids[j], return_indices=True)
            if len(common) < 8:
                continue
            m = np.stack([ia, ja], 1)
            # corrupt a fraction with wrong kp indices (outlier matches)
            n_out = int(outlier_frac * len(m))
            if n_out:
                rows = rng.choice(len(m), n_out, replace=False)
                m[rows, 1] = rng.integers(0, len(vis_ids[j]), n_out)
            matches[(i, j)] = m
    return X, w2c, K, kps, matches


class TestTwoView:
    def test_essential_ransac_and_decompose(self, rng):
        X, w2c, K, kps, _ = _synthetic_scene(rng, n_cams=2, outlier_frac=0.2)
        uv1, _ = _project(w2c[0], X, K)
        uv2, _ = _project(w2c[1], X, K)
        xy1 = (uv1 - K[:2, 2]) / np.diag(K)[:2]
        xy2 = (uv2 - K[:2, 2]) / np.diag(K)[:2]
        # 20% outliers
        m = len(xy1)
        n_out = m // 5
        xy2_c = xy2.copy()
        xy2_c[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
        E, inl = essential_ransac(xy1, xy2_c, seed=1)
        assert inl[n_out:].mean() > 0.95      # inliers kept
        assert inl[:n_out].mean() < 0.1       # outliers rejected
        R, t = decompose_essential(E, xy1[inl], xy2_c[inl])
        # relative pose: w2c2 @ inv(w2c1)
        rel = w2c[1] @ np.linalg.inv(w2c[0])
        cos = np.clip((np.trace(rel[:3, :3].T @ R) - 1) / 2, -1, 1)
        assert np.degrees(np.arccos(cos)) < 0.5
        t_gt = rel[:3, 3] / np.linalg.norm(rel[:3, 3])
        assert np.dot(t_gt, t / np.linalg.norm(t)) > 0.999


class TestBundleAdjust:
    def test_ba_reduces_cost_and_error(self, rng):
        X, w2c_gt, K, kps, _ = _synthetic_scene(rng, n_cams=5, n_pts=150,
                                                noise_px=0.3)
        n_cams, n_pts = 5, len(X)
        cam_idx = np.repeat(np.arange(n_cams), n_pts)
        pt_idx = np.tile(np.arange(n_pts), n_cams)
        uv = np.concatenate([_project(w2c_gt[c], X, K)[0]
                             for c in range(n_cams)])
        uv += 0.3 * rng.standard_normal(uv.shape)
        import jax
        import jax.numpy as jnp
        taus = jnp.asarray(0.015 * rng.standard_normal((n_cams, 6)),
                           jnp.float32)
        w2c0 = np.asarray(jax.vmap(se3_exp)(taus)) @ w2c_gt
        w2c0[0] = w2c_gt[0]
        X0 = X + 0.04 * rng.standard_normal(X.shape)
        Ks = np.tile(K[None], (n_cams, 1, 1))
        w2c_ba, X_ba, c0, c1 = bundle_adjust_np(
            w2c0, Ks, X0, cam_idx, pt_idx, uv, iters=20)
        assert c1 < 0.02 * c0
        for c in range(n_cams):
            cos = np.clip((np.trace(w2c_ba[c, :3, :3]
                                    @ w2c_gt[c, :3, :3].T) - 1) / 2, -1, 1)
            assert np.degrees(np.arccos(cos)) < 0.15, c


class TestIncrementalMapping:
    def test_full_reconstruction(self, rng):
        X, w2c_gt, K, kps, matches = _synthetic_scene(
            rng, n_cams=8, n_pts=300, noise_px=0.4, outlier_frac=0.05)
        rec = incremental_mapping(kps, matches, K, seed=2)
        assert rec.registered.sum() >= 7, rec.registered

        # align estimated camera centers to gt (free similarity gauge)
        reg = np.nonzero(rec.registered)[0]
        c_est = np.stack([-rec.w2c[c, :3, :3].T @ rec.w2c[c, :3, 3]
                          for c in reg])
        c_gt = np.stack([-w2c_gt[c, :3, :3].T @ w2c_gt[c, :3, 3]
                         for c in reg])
        s, R, t = umeyama_alignment(c_est, c_gt)
        resid = s * c_est @ R.T + t - c_gt
        scene_scale = np.linalg.norm(c_gt - c_gt.mean(0), axis=1).max()
        assert np.linalg.norm(resid, axis=1).max() < 0.02 * scene_scale

        # rotations: R_gt ~ R_est @ R_align^T (aligned frame)
        for c in reg:
            R_al = rec.w2c[c, :3, :3] @ R.T
            cos = np.clip((np.trace(R_al @ w2c_gt[c, :3, :3].T) - 1) / 2,
                          -1, 1)
            assert np.degrees(np.arccos(cos)) < 1.0, c

        # structure: valid points close to gt after the same alignment
        assert rec.valid.sum() > 150
