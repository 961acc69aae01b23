"""Stream pose-mode (pose_mode.StreamPairPack + stream_blend direct core).

VERDICT r3 #3: the product localization path must not run on the legacy
capped (T, 16, cap) pair pack — these tests pin the uncapped stream layout:
forward parity vs the full rasterizer, camera-gradient parity vs the jnp
twin, immunity to max_per_tile (the capacity whose truncation crashed the
r3 bench), and end-to-end pose recovery through refine_pose.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.loc.refine import (
    TrackingConfig, refine_pose, refine_poses_batch)
from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.raster.pose_mode import (
    StreamPairPack, build_pair_pack, build_stream_pair_pack,
    render_pose_mode)
from helpers import make_camera, random_scene

CFG = RasterizerConfig(max_pairs=1 << 14, max_per_tile=256,
                       max_render=1 << 14, backend="pallas_interpret",
                       pallas_chunk=128)


@pytest.fixture(scope="module")
def scene():
    g = random_scene(np.random.default_rng(0), 500)
    cam = make_camera(96, 64, fov=1.0)
    return g, cam


def test_forward_matches_rasterize(scene):
    g, cam = scene
    pack = build_stream_pair_pack(g, cam, CFG)
    assert isinstance(pack, StreamPairPack)
    assert not bool(pack.overflow)
    c, d, a = render_pose_mode(pack, cam, CFG)
    out = rasterize(g, cam, CFG)
    np.testing.assert_allclose(c, out.color, atol=1e-5)
    np.testing.assert_allclose(d, out.depth, atol=1e-5)
    np.testing.assert_allclose(a, out.alpha, atol=1e-5)


def test_camera_grads_match_legacy_twin(scene):
    g, cam = scene
    spack = build_stream_pair_pack(g, cam, CFG)
    lcfg = CFG.replace(backend="jnp")
    lpack = build_pair_pack(g, cam, lcfg)

    def loss(tau, pack, cfg):
        c, d, a = render_pose_mode(pack, cam.with_delta(tau), cfg)
        return jnp.sum(c) + 0.1 * jnp.sum(d) + 0.01 * jnp.sum(a)

    g_s = jax.grad(loss)(jnp.zeros(6), spack, CFG)
    g_l = jax.grad(loss)(jnp.zeros(6), lpack, lcfg)
    np.testing.assert_allclose(g_s, g_l, rtol=2e-4, atol=1e-3)


def test_no_per_tile_cap(scene):
    """max_per_tile is irrelevant to the stream pack: a config whose cap
    would truncate the legacy pack (the r3 bench crash) renders exactly."""
    g, cam = scene
    tiny_cap = CFG.replace(max_per_tile=8)
    lpack = build_pair_pack(g, cam, tiny_cap.replace(backend="jnp"))
    assert bool(lpack.overflow), "cap=8 should truncate the legacy pack"
    spack = build_stream_pair_pack(g, cam, tiny_cap)
    assert not bool(spack.overflow)
    c, _, _ = render_pose_mode(spack, cam, tiny_cap)
    out = rasterize(g, cam, CFG)
    np.testing.assert_allclose(c, out.color, atol=1e-5)


def test_refine_recovers_pose_and_batches(scene):
    g, cam = scene
    out = rasterize(g, cam, CFG)
    mask = jnp.ones(out.color.shape[:2], bool)
    tau = jnp.asarray([0.01, -0.008, 0.012, 0.02, -0.015, 0.01])
    cam_bad = cam.with_delta(tau)
    tcfg = TrackingConfig(num_iters=40, lr=5e-3, convergence=0.0,
                          rebin_every=10, pose_mode=True)
    res = refine_pose(g, cam_bad, out.color, mask, tcfg, CFG,
                      gt_depth=out.depth)
    err0 = float(jnp.linalg.norm(cam_bad.w2c - cam.w2c))
    err1 = float(jnp.linalg.norm(res.w2c - cam.w2c))
    assert err1 < 0.3 * err0, (err0, err1)
    assert not bool(res.overflow)

    cams = jax.tree_util.tree_map(lambda *x: jnp.stack(x), cam_bad, cam_bad)
    res_b = refine_poses_batch(
        g, cams, jnp.stack([out.color] * 2), jnp.stack([mask] * 2),
        tcfg, CFG, gt_depths=jnp.stack([out.depth] * 2))
    np.testing.assert_allclose(res_b.w2c[0], res.w2c, atol=1e-5)


def test_overflow_flag_on_stream_truncation(scene):
    """Stream capacity (max_render) is still honest: a too-small stream
    sets overflow so the pipeline growth loop can grow it."""
    g, cam = scene
    small = CFG.replace(max_render=512, max_pairs=1 << 14)
    spack = build_stream_pair_pack(g, cam, small)
    assert bool(spack.overflow)
