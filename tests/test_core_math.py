"""Unit tests for SE(3), SH, camera math, and k-NN."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gs_localization_tpu.core import se3, sh
from gs_localization_tpu.core.camera import (
    Camera, projection_matrix, quat_to_rotmat, rotmat_to_quat, w2c_from_rt,
)
from gs_localization_tpu.ops.knn import mean_knn_sq_dist


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        for _ in range(10):
            theta = rng.standard_normal(3).astype(np.float32)
            R = np.asarray(se3.so3_exp(jnp.asarray(theta)))
            R_ref = Rotation.from_rotvec(theta).as_matrix()
            np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_small_angle(self):
        theta = jnp.array([1e-7, -2e-7, 1e-7])
        R = se3.so3_exp(theta)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        # gradient is finite at zero
        g = jax.jacobian(se3.so3_exp)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_se3_exp_inverse(self, rng):
        tau = 0.3 * rng.standard_normal(6).astype(np.float32)
        T = np.asarray(se3.se3_exp(jnp.asarray(tau)))
        T_inv = np.asarray(se3.se3_exp(jnp.asarray(-tau)))
        np.testing.assert_allclose(T @ T_inv, np.eye(4), atol=1e-5)

    def test_rotation_error(self, rng):
        theta = rng.standard_normal(3)
        theta = theta / np.linalg.norm(theta) * 0.17  # ~9.74 deg
        R = Rotation.from_rotvec(theta).as_matrix()
        err = se3.rotation_geodesic_error_deg(jnp.asarray(R), jnp.eye(3))
        np.testing.assert_allclose(float(err), np.degrees(0.17), atol=1e-3)


class TestSH:
    def test_dc_only(self, rng):
        coeff = rng.standard_normal((5, 1, 3)).astype(np.float32)
        dirs = rng.standard_normal((5, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        out = sh.eval_sh(jnp.asarray(coeff), jnp.asarray(dirs), 0)
        np.testing.assert_allclose(np.asarray(out), sh.SH_C0 * coeff[:, 0], atol=1e-6)

    def test_rgb_roundtrip(self, rng):
        rgb = rng.uniform(0, 1, (7, 3)).astype(np.float32)
        dc = sh.rgb_to_sh_dc(jnp.asarray(rgb))
        back = sh.sh_dc_to_rgb(dc)
        np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-6)

    def test_degree3_rotation_invariant_radiance(self, rng):
        # total radiance integrated over directions should not depend on the
        # coordinate frame: check eval at dirs vs rotated coeffs is consistent
        # for the l=0 band (higher bands checked via finite sampling symmetry)
        coeff = np.zeros((1, 16, 3), np.float32)
        coeff[0, 0] = 1.0
        dirs = rng.standard_normal((100, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        out = sh.eval_sh(jnp.asarray(coeff), jnp.asarray(dirs, jnp.float32), 3)
        np.testing.assert_allclose(np.asarray(out), sh.SH_C0, atol=1e-6)


class TestCamera:
    def test_projection_center(self):
        cam = Camera.from_rt(np.eye(3), np.zeros(3), 100.0, 100.0, 64, 48)
        # point on optical axis at depth 5 projects to principal point
        p = jnp.array([0.0, 0.0, 5.0, 1.0])
        clip = cam.full_proj @ p
        ndc = clip[:3] / clip[3]
        px = ((ndc[0] + 1) * 64 - 1) * 0.5
        py = ((ndc[1] + 1) * 48 - 1) * 0.5
        np.testing.assert_allclose(float(px), (64 - 1) * 0.5 + 0.0, atol=2.0)
        np.testing.assert_allclose(float(py), (48 - 1) * 0.5 + 0.0, atol=2.0)

    def test_projection_focal(self):
        w, h, fx, fy = 64, 48, 80.0, 90.0
        cam = Camera.from_rt(np.eye(3), np.zeros(3), fx, fy, w, h)
        # pinhole: pixel = f * x/z + cx  (up to the -0.5 pixel-center offset)
        x, y, z = 0.3, -0.2, 4.0
        clip = cam.full_proj @ jnp.array([x, y, z, 1.0])
        ndc = np.asarray(clip[:3] / clip[3])
        px = ((ndc[0] + 1) * w - 1) * 0.5
        py = ((ndc[1] + 1) * h - 1) * 0.5
        np.testing.assert_allclose(px, fx * x / z + w / 2 - 0.5, atol=1e-3)
        np.testing.assert_allclose(py, fy * y / z + h / 2 - 0.5, atol=1e-3)

    def test_depth_mapping(self):
        cam = Camera.from_rt(np.eye(3), np.zeros(3), 100.0, 100.0, 64, 48)
        P = np.asarray(cam.projection)
        # z in [0,1]: znear -> 0, zfar -> 1
        for z, expect in [(cam.znear, 0.0), (cam.zfar, 1.0)]:
            clip = P @ np.array([0, 0, z, 1.0])
            np.testing.assert_allclose(clip[2] / clip[3], expect, atol=1e-4)

    def test_campos(self, rng):
        R = Rotation.random(random_state=3).as_matrix()
        t = rng.standard_normal(3)
        cam = Camera.from_rt(R, t, 100.0, 100.0, 64, 48)
        # reference: camera_center = inv(w2c)[:3, 3]
        c = np.linalg.inv(np.asarray(cam.w2c))[:3, 3]
        np.testing.assert_allclose(np.asarray(cam.campos), c, atol=1e-5)

    def test_with_delta_zero_is_identity(self, rng):
        R = Rotation.random(random_state=4).as_matrix()
        t = rng.standard_normal(3)
        cam = Camera.from_rt(R, t, 100.0, 100.0, 64, 48)
        cam2 = cam.with_delta(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(cam2.w2c), np.asarray(cam.w2c), atol=1e-6)

    def test_quat_roundtrip(self, rng):
        for i in range(8):
            R = Rotation.random(random_state=i).as_matrix()
            q = rotmat_to_quat(R)
            R2 = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
            np.testing.assert_allclose(R2, R, atol=1e-5)


class TestKNN:
    def test_matches_bruteforce(self, rng):
        pts = rng.standard_normal((300, 3)).astype(np.float32)
        out = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), k=3, chunk=128))
        d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expect = np.sort(d2, axis=1)[:, :3].mean(axis=1)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)
