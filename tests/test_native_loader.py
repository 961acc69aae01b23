"""Native C++ threaded image loader: decode parity and prefetch semantics."""

import os

import numpy as np
import pytest

from gs_localization_tpu.data.native_loader import (
    KIND_DEPTH16, KIND_RGB, NativeLoader, PrefetchingSceneLoader,
)

pytestmark = pytest.mark.skipif(
    not NativeLoader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    Image.fromarray(rgb).save(d / "a.png")
    Image.fromarray(rgb).save(d / "a.jpg", quality=95)
    dep = rng.uniform(500, 5000, (48, 64)).astype(np.uint16)
    dep[0, 0] = 65535
    Image.fromarray(dep.astype(np.int32), mode="I").convert("I;16").save(
        d / "a_depth.png")
    return d, rgb, dep


class TestNativeLoader:
    def test_png_rgb_exact(self, images):
        d, rgb, _ = images
        L = NativeLoader(2)
        L.submit(7, str(d / "a.png"), KIND_RGB)
        tag, arr = L.fetch()
        L.close()
        assert tag == 7
        np.testing.assert_allclose(arr * 255, rgb, atol=1e-3)

    def test_depth16(self, images):
        d, _, dep = images
        L = NativeLoader(1)
        L.submit(0, str(d / "a_depth.png"), KIND_DEPTH16)
        _, arr = L.fetch()
        L.close()
        assert arr.shape == (48, 64)
        assert arr[0, 0] == 0.0  # 65535 sentinel
        expect = dep.astype(np.float32) / 1000.0
        expect[0, 0] = 0.0
        np.testing.assert_allclose(arr, expect, atol=1e-3)

    def test_jpeg_matches_pil(self, images):
        from PIL import Image

        d, _, _ = images
        pil = np.asarray(Image.open(d / "a.jpg").convert("RGB"), np.float32)
        L = NativeLoader(1)
        L.submit(0, str(d / "a.jpg"), KIND_RGB)
        _, arr = L.fetch()
        L.close()
        np.testing.assert_allclose(arr * 255, pil, atol=1e-3)

    def test_missing_file_raises(self, images):
        d, _, _ = images
        L = NativeLoader(1)
        L.submit(0, str(d / "nope.png"), KIND_RGB)
        with pytest.raises(IOError):
            L.fetch()
        L.close()

    def test_prefetching_scene_loader(self, images):
        d, rgb, dep = images
        pl = PrefetchingSceneLoader(n_threads=2)
        pl.request(0, str(d / "a.png"), str(d / "a_depth.png"))
        pl.request(1, str(d / "a.jpg"))
        img0, dep0 = pl.get(0)
        img1, dep1 = pl.get(1)
        assert img0.shape == (48, 64, 3) and dep0.shape == (48, 64)
        assert dep1 is None
        # cached second read
        img0b, _ = pl.get(0)
        np.testing.assert_array_equal(img0, img0b)
