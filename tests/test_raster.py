"""Tile rasterizer correctness: forward parity vs sequential oracle, gradient
checks (Gaussian params + camera pose), and binning invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.core import se3
from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.raster.binning import bin_gaussians
from gs_localization_tpu.raster.oracle import render_oracle
from gs_localization_tpu.raster.preprocess import preprocess

from helpers import random_scene, make_camera

CFG = RasterizerConfig(
    tile_size=16, max_pairs=1 << 15, max_per_tile=256, chunk=32, backend="jnp"
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    return random_scene(rng, n=200, sh_degree=2), make_camera(64, 48)


class TestForwardParity:
    def test_color_depth_alpha_match_oracle(self, scene):
        g, cam = scene
        bg = jnp.array([0.2, 0.3, 0.4])
        out = rasterize(g, cam, CFG, bg=bg)
        ref = render_oracle(g, cam, bg=bg, tile_size=16)
        np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                                   atol=1e-5, rtol=1e-5)

    def test_nonuniform_image_size(self):
        # W/H not multiples of tile size exercise tile cropping
        rng = np.random.default_rng(1)
        g = random_scene(rng, n=100)
        cam = make_camera(50, 37)
        out = rasterize(g, cam, CFG)
        ref = render_oracle(g, cam, tile_size=16)
        assert out.color.shape == (37, 50, 3)
        np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                                   atol=1e-5, rtol=1e-5)

    def test_dead_slots_ignored(self):
        rng = np.random.default_rng(2)
        g_dense = random_scene(rng, n=64)
        rng = np.random.default_rng(2)
        g_padded = random_scene(rng, n=64, capacity=128)
        cam = make_camera(48, 32)
        a = rasterize(g_dense, cam, CFG)
        b = rasterize(g_padded, cam, CFG)
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                                   atol=1e-6)

    def test_saturation_cutoff(self):
        # stack many opaque gaussians at the same spot: alpha should saturate
        # and the far ones contribute nothing (T < 1e-4 cutoff)
        n = 64
        xyz = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
        xyz[:, 2] += np.arange(n) * 0.01
        from gs_localization_tpu.core.gaussians import GaussianParams
        from gs_localization_tpu.core import sh as sh_lib
        g = GaussianParams.from_arrays(
            xyz=xyz,
            features_dc=sh_lib.rgb_to_sh_dc(
                np.full((n, 3), 0.8, np.float32))[:, None, :],
            features_rest=np.zeros((n, 3, 3), np.float32),
            scaling=np.full((n, 3), -1.5, np.float32),
            rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
            opacity=np.full((n, 1), 4.0, np.float32),
            sh_degree=1,
        )
        cam = make_camera(32, 32)
        out = rasterize(g, cam, CFG)
        ref = render_oracle(g, cam, tile_size=16)
        np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                                   atol=1e-5)
        center_alpha = float(out.alpha[16, 16])
        assert center_alpha > 0.999

    def test_sticky_saturation_across_chunks(self):
        # opaque gaussians saturate T in chunk 0; near-transparent ones in
        # later chunks must stay excluded (reference sticky `done` flag,
        # forward.cu:349-354) even though their own alpha would pass the test
        n = 96
        xyz = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
        xyz[:, 2] += np.arange(n) * 0.01
        opacity = np.full((n, 1), 6.0, np.float32)     # ~opaque front
        opacity[8:] = -2.0                             # tiny alpha tail
        from gs_localization_tpu.core.gaussians import GaussianParams
        from gs_localization_tpu.core import sh as sh_lib
        colors = np.zeros((n, 3), np.float32)
        colors[:8] = 0.9
        colors[8:] = [1.0, 0.0, 0.0]                   # would tint red if leaked
        g = GaussianParams.from_arrays(
            xyz=xyz,
            features_dc=sh_lib.rgb_to_sh_dc(colors)[:, None, :],
            features_rest=np.zeros((n, 3, 3), np.float32),
            scaling=np.full((n, 3), -1.0, np.float32),
            rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
            opacity=opacity,
            sh_degree=1,
        )
        cam = make_camera(32, 32)
        cfg_small_chunk = CFG.replace(chunk=16)        # force chunk crossings
        out = rasterize(g, cam, cfg_small_chunk)
        ref = render_oracle(g, cam, tile_size=16)
        np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                                   atol=1e-5)


class TestBinning:
    def test_counts_and_order(self, scene):
        g, cam = scene
        prep = preprocess(g, cam, tile_size=16)
        gx, gy = 4, 3
        bins = bin_gaussians(prep, gx, gy, CFG.max_pairs, CFG.max_per_tile)
        assert not bool(bins.overflow)
        total = int(jnp.sum(jnp.where(prep.valid, prep.tiles_touched, 0)))
        assert int(bins.num_rendered) == total
        # per-tile lists are depth sorted
        depths = np.asarray(prep.depths)
        gid = np.asarray(bins.tile_gid)
        cnt = np.asarray(bins.tile_counts)
        for t in range(gx * gy):
            d = depths[gid[t, : cnt[t]]]
            assert np.all(np.diff(d) >= 0)

    def test_overflow_flag(self, scene):
        # overflow only concerns the slow path (rect > fast_k tiles); force
        # everything slow with fast_k=0-like setting (fast_k=1 puts every
        # multi-tile gaussian on the slow path)
        g, cam = scene
        prep = preprocess(g, cam, tile_size=16)
        bins = bin_gaussians(prep, 4, 3, max_pairs=4, max_per_tile=4,
                             fast_k=1)
        assert bool(bins.overflow)

    def test_tile_overflow_detects_truncation(self, scene):
        # When a tile's true pair count exceeds max_per_tile, pairs are
        # silently dropped from tile_gid — tile_overflow must flag it even
        # though the pair-capacity `overflow` flag stays False (VERDICT r1
        # weak #2: the old flag could not detect this condition).
        g, cam = scene
        prep = preprocess(g, cam, tile_size=16)
        full = bin_gaussians(prep, 4, 3, max_pairs=1 << 15, max_per_tile=256)
        assert not bool(full.tile_overflow)
        peak = int(full.max_tile_count)
        assert peak > 2
        trunc = bin_gaussians(prep, 4, 3, max_pairs=1 << 15,
                              max_per_tile=peak - 1)
        assert not bool(trunc.overflow)          # pair capacity is fine...
        assert bool(trunc.tile_overflow)         # ...but a tile truncated
        assert int(trunc.max_tile_count) == peak  # true count still reported
        # and the flag rides through the public rasterize() output
        # (max_per_tile must stay chunk-aligned for the blend kernel)
        cap = max(32, (peak - 1) // 32 * 32)
        out = rasterize(g, cam, CFG.replace(max_per_tile=cap, chunk=32))
        assert bool(out.tile_overflow)

    def test_fast_k_variants_agree(self, scene):
        g, cam = scene
        prep = preprocess(g, cam, tile_size=16)
        a = bin_gaussians(prep, 4, 3, max_pairs=1 << 15, max_per_tile=256,
                          fast_k=1)
        b = bin_gaussians(prep, 4, 3, max_pairs=1 << 15, max_per_tile=256,
                          fast_k=16)
        np.testing.assert_array_equal(np.asarray(a.tile_counts),
                                      np.asarray(b.tile_counts))
        np.testing.assert_array_equal(np.asarray(a.tile_gid * a.tile_mask),
                                      np.asarray(b.tile_gid * b.tile_mask))


class TestGradients:
    def _loss(self, backend):
        cfg = CFG.replace(backend=backend)

        def loss_fn(g, cam, tau):
            out = rasterize(g, cam.with_delta(tau), cfg,
                            bg=jnp.array([0.1, 0.1, 0.1]))
            return (jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)
                    + 0.05 * jnp.sum(out.alpha**2))

        return loss_fn

    def test_param_grads_match_oracle(self, scene):
        g, cam = scene

        def loss_tile(g_):
            out = rasterize(g_, cam, CFG, bg=jnp.array([0.1, 0.1, 0.1]))
            return jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)

        def loss_oracle(g_):
            out = render_oracle(g_, cam, bg=jnp.array([0.1, 0.1, 0.1]),
                                tile_size=16)
            return jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)

        gt = jax.grad(loss_tile, allow_int=True)(g)
        go = jax.grad(loss_oracle, allow_int=True)(g)
        for name in ["xyz", "features_dc", "features_rest", "scaling",
                     "rotation", "opacity"]:
            a, b = np.asarray(getattr(gt, name)), np.asarray(getattr(go, name))
            np.testing.assert_allclose(
                a, b, atol=5e-3, rtol=1e-2,
                err_msg=f"grad mismatch for {name}")

    def test_pose_grad_matches_oracle(self, scene):
        """Pose gradients through the tiled path vs the independent
        sequential oracle (this is the diff_gaussian_rasterization_pose
        replacement, SURVEY.md §2.3)."""
        g, cam = scene
        loss_tile = self._loss("jnp")

        def loss_oracle(tau):
            out = render_oracle(g, cam.with_delta(tau),
                                bg=jnp.array([0.1, 0.1, 0.1]), tile_size=16)
            return (jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)
                    + 0.05 * jnp.sum(out.alpha**2))

        tau0 = jnp.zeros(6)
        gt = np.asarray(jax.grad(loss_tile, argnums=2)(g, cam, tau0))
        go = np.asarray(jax.grad(loss_oracle)(tau0))
        assert np.all(np.isfinite(gt))
        np.testing.assert_allclose(gt, go, rtol=1e-4, atol=1e-3)

    def test_pose_grad_finite_difference_directional(self, scene):
        """Directional FD sanity check (f32 limits exact per-component FD)."""
        g, cam = scene
        loss_fn = self._loss("jnp")
        tau0 = jnp.zeros(6)
        grad = np.asarray(jax.grad(loss_fn, argnums=2)(g, cam, tau0))
        v = grad / np.linalg.norm(grad)
        eps = 1e-3
        lp = float(loss_fn(g, cam, jnp.asarray(eps * v, jnp.float32)))
        lm = float(loss_fn(g, cam, jnp.asarray(-eps * v, jnp.float32)))
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(float(grad @ v), fd, rtol=5e-2)

    def test_means2d_offset_grad(self, scene):
        """Screen-space positional gradient hook used by densification."""
        g, cam = scene
        zero = jnp.zeros((g.capacity, 2))

        def loss_fn(off):
            out = rasterize(g, cam, CFG, means2d_offset=off)
            return jnp.sum(out.color**2)

        grad = np.asarray(jax.grad(loss_fn)(zero))
        assert np.all(np.isfinite(grad))
        vis = np.asarray(rasterize(g, cam, CFG).visibility)
        assert np.abs(grad[vis]).sum() > 0
