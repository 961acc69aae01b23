"""StreamBins layout (binning.bin_stream + stream_blend) vs the jnp oracle.

The generic pallas parity tests (test_pallas_blend.py) already route through
the stream path; these cases target its specific machinery: the slow-path
segment reduction (fast_k=1 forces most pairs through the scan path), window
truncation semantics, and bins reuse across calls (the refine-loop pattern).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.raster.rasterize import compute_bins
from gs_localization_tpu.raster import binning as binning_lib
from gs_localization_tpu.raster.preprocess import preprocess
from helpers import random_scene, make_camera

CFG_JNP = RasterizerConfig(
    tile_size=16, max_pairs=1 << 15, max_per_tile=256, chunk=32, backend="jnp"
)
# fast_k=1: every Gaussian whose rect covers >1 tile takes the slow
# (scan-segment) path — the fast path degenerates to single-tile rects
CFG_PL = CFG_JNP.replace(backend="pallas_interpret", pallas_chunk=64,
                         fast_k=1)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    # big scales -> rects spanning many tiles -> slow-path heavy
    g = random_scene(rng, n=120, sh_degree=1, scale_range=(-2.5, -1.2))
    return g, make_camera(64, 48)


def test_slow_path_forward_and_grads(scene):
    g, cam = scene
    bg = jnp.array([0.2, 0.1, 0.4])

    def loss(g_, cfg):
        out = rasterize(g_, cam, cfg, bg=bg)
        return (jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)
                + 0.05 * jnp.sum(out.alpha**2))

    a = rasterize(g, cam, CFG_JNP, bg=bg)
    b = rasterize(g, cam, CFG_PL, bg=bg)
    assert int(b.num_rendered) == int(a.num_rendered)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=3e-5, rtol=3e-5)
    ga = jax.grad(lambda g_: loss(g_, CFG_JNP), allow_int=True)(g)
    gb = jax.grad(lambda g_: loss(g_, CFG_PL), allow_int=True)(g)
    for name in ["xyz", "features_dc", "scaling", "rotation", "opacity"]:
        np.testing.assert_allclose(
            np.asarray(getattr(gb, name)), np.asarray(getattr(ga, name)),
            atol=5e-3, rtol=1e-2, err_msg=f"grad mismatch: {name}")


def test_stream_never_truncates_tiles(scene):
    # v2 semantics: tiles walk their TRUE counts (no max_per_tile); a tiny
    # legacy cap truncates, the stream must still match the FULL render,
    # and the only stream capacity is max_render (flagged when exceeded)
    g, cam = scene
    prep = preprocess(g, cam, tile_size=16)
    legacy_small = binning_lib.bin_gaussians(prep, 4, 3, max_pairs=1 << 15,
                                             max_per_tile=32, fast_k=1)
    assert bool(legacy_small.tile_overflow)  # the scene overfills cap 32
    cfg_stream = CFG_PL.replace(max_per_tile=32, pallas_chunk=32)
    cfg_full_jnp = CFG_JNP.replace(max_per_tile=1024, chunk=32)
    a = rasterize(g, cam, cfg_full_jnp)      # untruncated reference
    b = rasterize(g, cam, cfg_stream)
    assert not bool(b.tile_overflow)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=3e-5, rtol=3e-5)
    # max_render caps the materialized stream and is flagged when exceeded
    sb = binning_lib.bin_stream(prep, 4, 3, max_pairs=1 << 15,
                                max_render=64, fast_k=1, align=32)
    assert bool(sb.tile_overflow)
    assert int(sb.kept) == 64


def test_bins_reuse_across_poses(scene):
    # refine-loop pattern: bins built once, rasterize called at a nearby pose
    g, cam = scene
    bins = compute_bins(g, cam, CFG_PL)
    assert isinstance(bins, binning_lib.StreamBins)
    tau = jnp.array([1e-3, -2e-3, 1e-3, 2e-3, -1e-3, 1e-3])

    def loss(t, cfg, bb):
        out = rasterize(g, cam.with_delta(t), cfg, bins=bb)
        return jnp.sum(out.color**2) + 0.1 * jnp.sum(out.depth**2)

    bins_jnp = compute_bins(g, cam, CFG_JNP)
    la, ga = jax.value_and_grad(lambda t: loss(t, CFG_JNP, bins_jnp))(tau)
    lb, gb = jax.value_and_grad(lambda t: loss(t, CFG_PL, bins))(tau)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-3, atol=1e-3)


def test_stream_matches_gid_matrix_layout(scene):
    # the stream's implied per-tile lists equal the legacy id matrix
    g, cam = scene
    prep = preprocess(g, cam, tile_size=16)
    legacy = binning_lib.bin_gaussians(prep, 4, 3, max_pairs=1 << 15,
                                       max_per_tile=256, fast_k=1)
    sb = binning_lib.bin_stream(prep, 4, 3, max_pairs=1 << 15,
                                max_render=1 << 15, fast_k=1, align=32)
    np.testing.assert_array_equal(
        np.asarray(jnp.minimum(sb.tile_counts, 256)),
        np.asarray(legacy.tile_counts))
    gid_of_apos = np.asarray(sb.gid_of_pos)
    mr_al = gid_of_apos.shape[0]
    p_dead = g.xyz.shape[0]
    astart = np.asarray(sb.tstart)
    cnt = np.asarray(sb.walk_counts)
    gid_legacy = np.asarray(legacy.tile_gid)
    for t in range(12):
        assert astart[t] % 32 == 0
        seg = gid_of_apos[astart[t]: astart[t] + cnt[t]]
        n_cmp = min(cnt[t], 256)
        np.testing.assert_array_equal(seg[:n_cmp], gid_legacy[t, :n_cmp])
        # alignment gap after the segment is dead rows
        gap_end = astart[t] + ((cnt[t] + 31) // 32) * 32
        assert (gid_of_apos[astart[t] + cnt[t]: gap_end] == p_dead).all()
    # pos_by_slot maps each materialized pair to a unique aligned position;
    # all other slots point at the zero sentinel (= mr_al)
    kept = int(sb.kept)
    pos_by_slot = np.asarray(sb.pos_by_slot)
    real = pos_by_slot[pos_by_slot != mr_al]
    assert len(real) == kept and len(set(real.tolist())) == kept
    assert (gid_of_apos[real] != p_dead).all()
