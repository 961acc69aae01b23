"""Native DoG+rootSIFT: detection, invariance, and matching tests."""

import numpy as np
import jax.numpy as jnp

from gs_localization_tpu.sfm.sift import extract_sift
from gs_localization_tpu.sfm.matching import match_mutual_nn


def _textured_image(rng, h=96, w=128, n_blobs=40):
    img = np.zeros((h, w), np.float32)
    ys = rng.uniform(10, h - 10, n_blobs)
    xs = rng.uniform(10, w - 10, n_blobs)
    amp = rng.uniform(0.4, 1.0, n_blobs)
    sig = rng.uniform(1.5, 4.0, n_blobs)
    yy, xx = np.mgrid[0:h, 0:w]
    for y0, x0, a, s in zip(ys, xs, amp, sig):
        img += a * np.exp(-((yy - y0) ** 2 + (xx - x0) ** 2) / (2 * s * s))
    return np.clip(img / img.max(), 0, 1).astype(np.float32)


class TestSIFT:
    def test_detects_blobs_and_unit_descriptors(self, rng):
        img = _textured_image(rng)
        f = extract_sift(jnp.asarray(img), num_keypoints=128)
        sc = np.asarray(f.scores)
        de = np.asarray(f.descriptors)
        live = sc > 0
        assert live.sum() >= 20
        np.testing.assert_allclose(np.linalg.norm(de[live], axis=1), 1.0,
                                   atol=1e-3)
        assert np.all(de[live] >= 0)   # rootsift is nonnegative

    def test_shift_matching(self, rng):
        img = _textured_image(rng)
        dy, dx = 6, 9
        shifted = np.roll(np.roll(img, dy, 0), dx, 1)
        f0 = extract_sift(jnp.asarray(img), num_keypoints=128)
        f1 = extract_sift(jnp.asarray(shifted), num_keypoints=128)
        m = match_mutual_nn(f0.descriptors, f1.descriptors,
                            f0.scores > 0, f1.scores > 0, ratio_thresh=0.95)
        mi = np.asarray(m.matches0)
        kp0 = np.asarray(f0.keypoints)
        kp1 = np.asarray(f1.keypoints)
        ok = mi >= 0
        assert ok.sum() >= 10
        d = kp1[mi[ok]] - kp0[ok]
        # majority of matches should agree with the true shift
        good = (np.abs(d[:, 0] - dx) < 1.5) & (np.abs(d[:, 1] - dy) < 1.5)
        assert good.mean() > 0.6, (good.mean(), d[:8])

    def test_rotation_tolerance(self, rng):
        """Descriptors of a 90-deg rotated image still match mutually.

        Needs locally-distinctive texture (symmetric blobs all look alike to
        a rotation-invariant descriptor), so use blurred random noise."""
        from scipy.ndimage import gaussian_filter

        noise = rng.standard_normal((96, 96)).astype(np.float32)
        img = gaussian_filter(noise, 2.5)
        img = ((img - img.min()) / (img.max() - img.min())).astype(np.float32)
        rot = np.rot90(img).copy()
        f0 = extract_sift(jnp.asarray(img), num_keypoints=96)
        f1 = extract_sift(jnp.asarray(rot), num_keypoints=96)
        m = match_mutual_nn(f0.descriptors, f1.descriptors,
                            f0.scores > 0, f1.scores > 0, ratio_thresh=0.95)
        mi = np.asarray(m.matches0)
        ok = mi >= 0
        assert ok.sum() >= 8
        # rot90: (x, y) -> (y, W-1-x) for counterclockwise numpy rot90
        kp0 = np.asarray(f0.keypoints)[ok]
        kp1 = np.asarray(f1.keypoints)[np.asarray(mi)[ok]]
        pred = np.stack([kp0[:, 1], 96 - 1 - kp0[:, 0]], 1)
        err = np.linalg.norm(kp1 - pred, axis=1)
        assert (err < 2.5).mean() > 0.5, err[:10]
