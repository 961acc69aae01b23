"""Per-tile opacity culling (binning._emit_pair_keys tile_cull).

A (gaussian, tile) pair whose maximum alpha over the tile's pixel box is
below the blend kernels' 1/255 gate contributes exactly zero, so dropping
it must leave images and gradients unchanged (up to fp summation order)
while cutting the live pair count — the r4 lever on every pair-sized cost
(stream length, per-tile walks, blend time).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.raster.rasterize import compute_bins
from gs_localization_tpu.raster.binning import _tile_qmin
from helpers import make_camera, random_scene

CFG_ON = RasterizerConfig(backend="jnp", max_pairs=1 << 15,
                          max_per_tile=512, chunk=32, tile_cull=True)
CFG_OFF = CFG_ON.replace(tile_cull=False)


@pytest.fixture(scope="module", params=[(-3.5, -2.0), (-2.5, -1.2)],
                ids=["small-splats", "big-aniso"])
def scene(request):
    g = random_scene(np.random.default_rng(3), 400,
                     scale_range=request.param)
    return g, make_camera(96, 64)


def test_images_exact_and_pairs_reduced(scene):
    g, cam = scene
    on, off = rasterize(g, cam, CFG_ON), rasterize(g, cam, CFG_OFF)
    np.testing.assert_allclose(on.color, off.color, atol=1e-5)
    np.testing.assert_allclose(on.depth, off.depth, atol=1e-4)
    np.testing.assert_allclose(on.alpha, off.alpha, atol=1e-5)
    scfg = CFG_ON.replace(backend="pallas_interpret", pallas_chunk=64)
    b_on = compute_bins(g, cam, scfg)
    b_off = compute_bins(g, cam, scfg.replace(tile_cull=False))
    assert int(b_on.kept) < int(b_off.kept) * 0.95, (
        int(b_on.kept), int(b_off.kept))
    assert int(b_on.max_tile_count) <= int(b_off.max_tile_count)


def test_gradients_exact(scene):
    g, cam = scene

    def loss(gg, tau, cfg):
        out = rasterize(gg, cam.with_delta(tau), cfg)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.alpha))

    g1 = jax.grad(loss, argnums=(0, 1), allow_int=True)(
        g, jnp.zeros(6), CFG_ON)
    g2 = jax.grad(loss, argnums=(0, 1), allow_int=True)(
        g, jnp.zeros(6), CFG_OFF)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        if hasattr(a, "dtype") and np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_qmin_box_math():
    """Closed-form box minimum vs brute force over a pixel grid."""
    rng = np.random.default_rng(0)
    ts = 16
    for _ in range(200):
        # random PD conic
        l1, l2 = rng.uniform(0.001, 0.5, 2)
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        C = R @ np.diag([l1, l2]) @ R.T
        mx, my = rng.uniform(-40, 60, 2)
        tx, ty = 0, 0
        q = float(_tile_qmin(jnp.float32(mx), jnp.float32(my),
                             jnp.float32(C[0, 0]), jnp.float32(C[0, 1]),
                             jnp.float32(C[1, 1]), jnp.float32(tx),
                             jnp.float32(ty), ts))
        xs, ys = np.meshgrid(np.arange(ts) - mx, np.arange(ts) - my)
        qb = (C[0, 0] * xs ** 2 + 2 * C[0, 1] * xs * ys
              + C[1, 1] * ys ** 2).min()
        # closed form minimizes over the CONTINUOUS box -> lower bound of
        # the discrete-grid min (conservative: never culls a live pair)
        assert q <= qb + 1e-3, (q, qb, mx, my)


def test_low_opacity_gaussian_fully_culled():
    """opacity <= 1/255 contributes nowhere; every pair drops."""
    g = random_scene(np.random.default_rng(1), 64)
    g = g.replace(opacity=jnp.full_like(g.opacity, -7.0))  # sigmoid ~ 1e-3?
    # sigmoid(-7) ~ 9e-4 < 1/255 ~ 3.9e-3
    cam = make_camera(64, 48)
    scfg = CFG_ON.replace(backend="pallas_interpret", pallas_chunk=64)
    bins = compute_bins(g, cam, scfg)
    assert int(bins.kept) == 0
    out = rasterize(g, cam, CFG_ON)
    assert float(jnp.abs(out.color).max()) == 0.0
