"""Checkpoint/resume, pseudo-view synthesis, and preset configs."""

import numpy as np
import jax.numpy as jnp

from gs_localization_tpu.mapping import MapTrainConfig, init_training, train_step
from gs_localization_tpu.mapping.checkpoint import (
    restore_checkpoint, save_checkpoint,
)
from gs_localization_tpu.mapping.pseudo_views import generate_pseudo_poses
from gs_localization_tpu.pipelines import presets
from gs_localization_tpu.raster import RasterizerConfig

from helpers import random_scene, make_camera

CFG = RasterizerConfig(max_pairs=1 << 13, max_per_tile=64, chunk=32,
                       backend="jnp")


class TestCheckpoint:
    def test_roundtrip_resume(self, rng, tmp_path):
        g = random_scene(rng, n=50, sh_degree=1, capacity=64)
        cfg = MapTrainConfig()
        state = init_training(g, cfg)
        cam = make_camera(32, 32)
        gt = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
        for _ in range(3):
            state, _ = train_step(state, cam, gt, cfg, CFG)

        path = str(tmp_path / "ckpt.msgpack")
        save_checkpoint(path, state)

        template = init_training(random_scene(np.random.default_rng(5), n=50,
                                              sh_degree=1, capacity=64), cfg)
        restored = restore_checkpoint(path, template)
        assert int(restored.step) == 3
        np.testing.assert_allclose(np.asarray(restored.gaussians.xyz),
                                   np.asarray(state.gaussians.xyz))
        # training continues identically from the restored state
        s1, a1 = train_step(state, cam, gt, cfg, CFG)
        s2, a2 = train_step(restored, cam, gt, cfg, CFG)
        np.testing.assert_allclose(float(a1["total"]), float(a2["total"]),
                                   rtol=1e-6)


class TestPseudoViews:
    def test_interpolated_poses(self, rng):
        cams = []
        for i in range(4):
            t = np.array([i * 0.5, 0.0, 0.0], np.float32)
            cams.append(make_camera(32, 32).with_pose(np.eye(3), t))
        pseudo = generate_pseudo_poses(cams, n_per_edge=2)
        assert len(pseudo) == 6
        for c in pseudo:
            w2c = np.asarray(c.w2c)
            # valid rigid transform
            np.testing.assert_allclose(w2c[:3, :3] @ w2c[:3, :3].T, np.eye(3),
                                       atol=1e-5)
            assert -0.1 <= w2c[0, 3] <= 1.6


class TestPresets:
    def test_reference_budgets(self):
        t7 = presets.seven_scenes_tracking()
        assert (t7.num_iters, t7.lr, t7.convergence) == (50, 1e-3, 1e-4)
        assert not t7.monocular and t7.alpha == 0.99
        tc = presets.cambridge_tracking()
        assert (tc.num_iters, tc.lr, tc.convergence) == (20, 1e-4, 1e-3)
        assert tc.monocular
        assert presets.cambridge_training().sh_degree == 1
        assert presets.seven_scenes_training().iterations == 30_000
