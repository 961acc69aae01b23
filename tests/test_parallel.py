"""Multi-device (8 virtual CPU) sharding tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.core.camera import Camera
from gs_localization_tpu.loc import TrackingConfig
from gs_localization_tpu.parallel import (
    dp_train_grads, make_mesh, shard_queries_refine,
)
from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.mapping.train import TRAINABLE

from helpers import random_scene, make_camera

CFG = RasterizerConfig(
    tile_size=16, max_pairs=1 << 13, max_per_tile=64, chunk=32, backend="jnp"
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
class TestDP:
    def test_dp_grads_match_single_device(self, rng):
        g = random_scene(rng, n=100, sh_degree=1)
        base = make_camera(32, 32)
        taus = jnp.asarray(0.02 * rng.standard_normal((8, 6)), jnp.float32)
        cams = jax.vmap(base.with_delta)(taus)
        imgs = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)

        mesh = make_mesh(8)
        loss_dp, grads_dp = jax.jit(
            lambda g_, c, i: dp_train_grads(mesh, g_, c, i, CFG)
        )(g, cams, imgs)

        # single-device reference: mean over the batch
        from gs_localization_tpu.mapping import losses

        def loss_one(tr, cam, img):
            gg = g.replace(**tr)
            out = rasterize(gg, cam, CFG)
            return losses.training_loss(out.color, img)[0]

        tr = {k: getattr(g, k) for k in TRAINABLE}
        losses_ref, grads_ref = jax.vmap(
            lambda cam, img: jax.value_and_grad(loss_one)(tr, cam, img)
        )(cams, imgs)
        loss_ref = jnp.mean(losses_ref)
        grads_ref = jax.tree_util.tree_map(
            lambda a: jnp.mean(a, axis=0), grads_ref)

        np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
        for k in TRAINABLE:
            np.testing.assert_allclose(
                np.asarray(grads_dp[k]), np.asarray(grads_ref[k]),
                atol=1e-5, rtol=1e-4, err_msg=k)

    def test_query_sharded_localization(self, rng):
        g = random_scene(rng, n=200, sh_degree=1, spread=1.5,
                         scale_range=(-3.0, -1.8))
        cam_gt = make_camera(48, 32)
        target = rasterize(g, cam_gt, CFG)
        taus = jnp.asarray(0.01 * rng.standard_normal((8, 6)), jnp.float32)
        cams = jax.vmap(cam_gt.with_delta)(taus)
        imgs = jnp.tile(target.color[None], (8, 1, 1, 1))
        deps = jnp.tile(target.depth[None], (8, 1, 1))
        masks = jnp.ones((8, 32, 48), bool)
        mesh = make_mesh(8)
        tcfg = TrackingConfig(num_iters=25, lr=2e-3)
        res = shard_queries_refine(mesh, g, cams, imgs, masks, tcfg, CFG,
                                   gt_depths=deps)
        assert res.w2c.shape == (8, 4, 4)
        # parity with the unsharded vmap path — sharding must not change math
        from gs_localization_tpu.loc import refine_poses_batch
        ref = refine_poses_batch(g, cams, imgs, masks, tcfg, CFG,
                                 gt_depths=deps)
        np.testing.assert_allclose(np.asarray(res.w2c), np.asarray(ref.w2c),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(res.num_iters),
                                      np.asarray(ref.num_iters))


@needs_8
class TestTileShard:
    def test_forward_and_grads_match_unsharded(self, rng):
        from gs_localization_tpu.parallel.tile_shard import rasterize_tile_sharded

        g = random_scene(rng, n=150, sh_degree=1)
        # 64x128 image -> 4x8=32 tiles, divisible by 8 devices
        cam = make_camera(128, 64)
        mesh = make_mesh(8)
        cfg = CFG

        out_s = jax.jit(
            lambda g_: rasterize_tile_sharded(mesh, g_, cam, cfg)
        )(g)
        out_r = rasterize(g, cam, cfg)
        np.testing.assert_allclose(np.asarray(out_s.color),
                                   np.asarray(out_r.color), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_s.depth),
                                   np.asarray(out_r.depth), atol=1e-4)

        def loss_sharded(g_, tau):
            out = rasterize_tile_sharded(mesh, g_, cam.with_delta(tau), cfg)
            return jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)

        def loss_ref(g_, tau):
            out = rasterize(g_, cam.with_delta(tau), cfg)
            return jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)

        tau0 = jnp.zeros(6)
        gs_, ts_ = jax.grad(loss_sharded, argnums=(0, 1), allow_int=True)(g, tau0)
        gr_, tr_ = jax.grad(loss_ref, argnums=(0, 1), allow_int=True)(g, tau0)
        np.testing.assert_allclose(np.asarray(ts_), np.asarray(tr_),
                                   rtol=1e-4, atol=1e-4)
        for name in ["xyz", "scaling", "opacity", "features_dc"]:
            np.testing.assert_allclose(
                np.asarray(getattr(gs_, name)), np.asarray(getattr(gr_, name)),
                atol=1e-4, rtol=1e-3, err_msg=name)


@needs_8
class TestGaussShard:
    def test_forward_matches_unsharded(self, rng):
        from gs_localization_tpu.parallel.gauss_shard import (
            rasterize_gauss_sharded,
        )

        g = random_scene(rng, n=160, sh_degree=1)  # 160 = 8 * 20
        cam = make_camera(48, 32)
        mesh = make_mesh(8, axis="gauss")
        color, depth, alpha, radii = jax.jit(
            lambda g_: rasterize_gauss_sharded(mesh, g_, cam, CFG)
        )(g)
        ref = rasterize(g, cam, CFG)
        np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(radii),
                                      np.asarray(ref.radii))

    def test_train_grads_match_single_device(self, rng):
        from gs_localization_tpu.mapping import losses
        from gs_localization_tpu.parallel.gauss_shard import (
            gauss_sharded_loss_and_grads, make_mesh_2d,
        )

        g = random_scene(rng, n=120, sh_degree=1)  # 120 = 2 shards * 60
        base = make_camera(32, 32)
        taus = jnp.asarray(0.02 * rng.standard_normal((4, 6)), jnp.float32)
        cams = jax.vmap(base.with_delta)(taus)
        imgs = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32)

        mesh = make_mesh_2d(4, 2)  # ('data', 'gauss')
        loss_s, grads_s = jax.jit(
            lambda g_, c, i: gauss_sharded_loss_and_grads(mesh, g_, c, i, CFG)
        )(g, cams, imgs)

        def loss_one(tr, cam, img):
            gg = g.replace(**tr)
            out = rasterize(gg, cam, CFG)
            return losses.training_loss(out.color, img)[0]

        tr = {k: getattr(g, k) for k in TRAINABLE}
        losses_ref, grads_ref = jax.vmap(
            lambda cam, img: jax.value_and_grad(loss_one)(tr, cam, img)
        )(cams, imgs)
        loss_ref = jnp.mean(losses_ref)
        grads_ref = jax.tree_util.tree_map(
            lambda a: jnp.mean(a, axis=0), grads_ref)

        np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
        for k in TRAINABLE:
            np.testing.assert_allclose(
                np.asarray(grads_s[k]), np.asarray(grads_ref[k]),
                atol=1e-5, rtol=1e-4, err_msg=k)
