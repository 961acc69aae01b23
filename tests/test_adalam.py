"""AdaLAM filter unit tests: synthetic similarity-transform inliers vs
uniform outliers, the scale/orientation gates, and the registry dispatch.

(ADVICE r2: the module previously shipped without tests and its gates were
unreachable because no extractor exported scales/orientations.)
"""

import numpy as np
import pytest

from gs_localization_tpu.sfm.adalam import (
    AdalamConfig, adalam_filter, _similarity_from_pairs)
from gs_localization_tpu.sfm.features import Features


W, H = 640, 480


def _synthetic(rng, n_in=120, n_out=80, noise=0.5):
    """Inliers follow one global similarity transform; outliers are random.

    Returns kpts0, kpts1, matches0, scores, inlier_mask.
    """
    p0_in = rng.uniform([40, 40], [W - 40, H - 40], (n_in, 2))
    ang, s = 0.15, 1.1
    R = s * np.array([[np.cos(ang), -np.sin(ang)],
                      [np.sin(ang), np.cos(ang)]])
    t = np.array([12.0, -8.0])
    p1_in = p0_in @ R.T + t + rng.normal(0, noise, (n_in, 2))
    p0_out = rng.uniform(0, [W, H], (n_out, 2))
    p1_out = rng.uniform(0, [W, H], (n_out, 2))
    kpts0 = np.concatenate([p0_in, p0_out])
    kpts1 = np.concatenate([p1_in, p1_out])
    n = n_in + n_out
    matches0 = np.arange(n)
    scores = rng.uniform(0.3, 1.0, n)
    inlier = np.zeros(n, bool)
    inlier[:n_in] = True
    return kpts0, kpts1, matches0, scores, inlier


class TestAdalamFilter:
    @pytest.fixture()
    def rng(self):
        return np.random.default_rng(0)

    def test_keeps_inliers_rejects_outliers(self, rng):
        kpts0, kpts1, m0, sc, inlier = _synthetic(rng)
        out = adalam_filter(kpts0, kpts1, m0, sc, (W, H), (W, H))
        kept = out >= 0
        # recall: most true inliers survive; precision: random outliers die
        assert kept[inlier].mean() > 0.7, kept[inlier].mean()
        assert kept[~inlier].mean() < 0.1, kept[~inlier].mean()

    def test_rejects_all_on_pure_outliers(self, rng):
        n = 150
        kpts0 = rng.uniform(0, [W, H], (n, 2))
        kpts1 = rng.uniform(0, [W, H], (n, 2))
        out = adalam_filter(kpts0, kpts1, np.arange(n),
                            rng.uniform(0.3, 1.0, n), (W, H), (W, H))
        assert (out >= 0).mean() < 0.05

    def test_degenerate_hypotheses_masked(self):
        # coincident image0 samples must not produce accepted hypotheses
        a, b, bad = _similarity_from_pairs(
            np.zeros((4, 2)), np.zeros((4, 2)),
            np.zeros((4, 2)), np.ones((4, 2)))
        assert bad.all()
        np.testing.assert_allclose(np.abs(a), 1.0)

    def test_orientation_gate_prunes_rotated_outliers(self, rng):
        """Matches violating the seed's orientation delta get dropped from
        neighborhoods when oris are provided (the previously-dead gate)."""
        kpts0, kpts1, m0, sc, inlier = _synthetic(rng, n_in=100, n_out=60)
        n = len(m0)
        # inliers share the transform's rotation (0.15 rad ~ 8.6 deg);
        # outliers get random orientation deltas far outside the 30 deg gate
        oris0 = np.zeros(n)
        oris1 = np.where(inlier, 8.6, rng.uniform(90.0, 270.0, n))
        scales0 = np.ones(n)
        scales1 = np.where(inlier, 1.1, rng.uniform(3.0, 8.0, n))
        out_gated = adalam_filter(
            kpts0, kpts1, m0, sc, (W, H), (W, H),
            scales0=scales0, scales1=scales1, oris0=oris0, oris1=oris1)
        kept = out_gated >= 0
        assert kept[inlier].mean() > 0.7
        assert kept[~inlier].sum() == 0       # gates kill every outlier

    def test_registry_dispatch(self, rng):
        from gs_localization_tpu.sfm.registry import get_matcher

        matcher = get_matcher("adalam")
        kpts0, kpts1, m0, sc, inlier = _synthetic(rng, n_in=60, n_out=20)
        # descriptors: matched pairs share a (noisy) random unit vector
        d = rng.standard_normal((len(m0), 32))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d1 = d + 0.05 * rng.standard_normal(d.shape)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        f0 = Features(keypoints=kpts0, scores=np.ones(len(m0)),
                      descriptors=d)
        f1 = Features(keypoints=kpts1, scores=np.ones(len(m0)),
                      descriptors=d1)
        res = matcher(f0, f1, (W, H), (W, H))
        kept = np.asarray(res.matches0) >= 0
        assert kept[inlier].mean() > 0.5
        assert kept[~inlier].mean() < 0.2


def test_sift_exports_scales_orientations():
    """SIFT features now carry the geometry the AdaLAM gates need."""
    import jax.numpy as jnp

    from gs_localization_tpu.sfm.sift import extract_sift

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (96, 128)).astype(np.float32)
    f = extract_sift(jnp.asarray(img), num_keypoints=64)
    assert f.scales is not None and f.scales.shape == (64,)
    assert f.orientations is not None and f.orientations.shape == (64,)
    valid = np.asarray(f.scores) > 0
    assert np.all(np.asarray(f.scales)[valid] > 0)
    o = np.asarray(f.orientations)[valid]
    assert np.all((o >= -np.pi) & (o <= np.pi))
