"""Pallas blend kernel (interpret mode on CPU) vs the jnp blend path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.raster import RasterizerConfig, rasterize
from helpers import random_scene, make_camera

CFG_JNP = RasterizerConfig(
    tile_size=16, max_pairs=1 << 15, max_per_tile=256, chunk=32, backend="jnp"
)
CFG_PL = CFG_JNP.replace(backend="pallas_interpret", pallas_chunk=64)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    return random_scene(rng, n=150, sh_degree=2), make_camera(64, 48)


def test_forward_matches_jnp(scene):
    g, cam = scene
    bg = jnp.array([0.15, 0.25, 0.35])
    a = rasterize(g, cam, CFG_JNP, bg=bg)
    b = rasterize(g, cam, CFG_PL, bg=bg)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha),
                               atol=2e-5, rtol=2e-5)


def test_forward_early_exit_saturated(scene):
    # saturated stack still matches (exercises the while_loop early exit)
    rng = np.random.default_rng(5)
    n = 128
    xyz = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    xyz[:, 2] += np.arange(n) * 0.02
    from gs_localization_tpu.core.gaussians import GaussianParams
    from gs_localization_tpu.core import sh as sh_lib
    opacity = np.full((n, 1), 5.0, np.float32)
    opacity[10:] = rng.uniform(-3, 1, (n - 10, 1))
    g = GaussianParams.from_arrays(
        xyz=xyz,
        features_dc=sh_lib.rgb_to_sh_dc(
            rng.uniform(0, 1, (n, 3)).astype(np.float32))[:, None, :],
        features_rest=np.zeros((n, 3, 3), np.float32),
        scaling=np.full((n, 3), -1.2, np.float32),
        rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        opacity=opacity,
        sh_degree=1,
    )
    cam = make_camera(32, 32)
    a = rasterize(g, cam, CFG_JNP)
    b = rasterize(g, cam, CFG_PL)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=2e-5)


def test_gradients_match_jnp(scene):
    g, cam = scene
    bg = jnp.array([0.1, 0.2, 0.3])

    def loss(g_, cfg):
        out = rasterize(g_, cam, cfg, bg=bg)
        return (jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)
                + 0.05 * jnp.sum(out.alpha**2))

    ga = jax.grad(lambda g_: loss(g_, CFG_JNP), allow_int=True)(g)
    gb = jax.grad(lambda g_: loss(g_, CFG_PL), allow_int=True)(g)
    for name in ["xyz", "features_dc", "features_rest", "scaling", "rotation",
                 "opacity"]:
        a, b = np.asarray(getattr(ga, name)), np.asarray(getattr(gb, name))
        np.testing.assert_allclose(
            b, a, atol=5e-3, rtol=1e-2, err_msg=f"grad mismatch: {name}")


def test_pose_gradients_match_jnp(scene):
    g, cam = scene

    def loss(tau, cfg):
        out = rasterize(g, cam.with_delta(tau), cfg)
        return jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)

    tau0 = jnp.zeros(6)
    ga = np.asarray(jax.grad(lambda t: loss(t, CFG_JNP))(tau0))
    gb = np.asarray(jax.grad(lambda t: loss(t, CFG_PL))(tau0))
    np.testing.assert_allclose(gb, ga, rtol=1e-3, atol=1e-3)
