"""Dataset prepare stages (Cambridge / LLFF / 360) on synthetic layouts."""

import os

import numpy as np
import pytest

from gs_localization_tpu.data.colmap import (
    ColmapCamera, ColmapImage, write_colmap_model_text,
)
from gs_localization_tpu.data.prepare import (
    load_llff_scene, prepare_360, prepare_cambridge, prepare_llff,
    rescale_camera,
)


def _write_png(path, w=64, h=36, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(path)


def _cam(cid=1, w=128, h=72, model="SIMPLE_RADIAL"):
    params = {"SIMPLE_RADIAL": [100.0, 64.0, 36.0, 0.01],
              "PINHOLE": [100.0, 100.0, 64.0, 36.0]}[model]
    return ColmapCamera(cid, model, w, h, np.asarray(params, np.float64))


def _img(iid, name, cid=1):
    q = np.array([1.0, 0, 0, 0])
    t = np.array([0.1 * iid, 0.0, 0.5])
    return ColmapImage(iid, q, t, cid, name,
                       np.zeros((0, 2)), np.zeros((0,), np.int64))


class TestCambridge:
    @pytest.fixture()
    def layout(self, tmp_path):
        scene = tmp_path / "KingsCollege"
        for seq in ("seq1", "seq4"):
            (scene / seq).mkdir(parents=True)
        names_train = ["seq1/frame00001.png", "seq1/frame00002.png"]
        names_test = ["seq4/frame00001.png"]
        for n in names_train + names_test:
            _write_png(scene / n)
        with open(scene / "dataset_train.txt", "w") as f:
            f.write("Visual Landmark Dataset\nImageFile, Camera Position\n\n")
            for n in names_train:
                f.write(f"{n} 0 0 0 1 0 0 0\n")
        with open(scene / "dataset_test.txt", "w") as f:
            for n in names_test:
                f.write(f"{n} 0 0 0 1 0 0 0\n")
        cams = {1: _cam(w=1920, h=1080, model="PINHOLE")}
        imgs = {i + 1: _img(i + 1, n)
                for i, n in enumerate(names_train)}
        (scene / "model_train").mkdir()
        write_colmap_model_text(str(scene / "model_train"), cams, imgs, {})
        # depth files for the additional tree
        extra = tmp_path / "additional" / "train"
        extra.mkdir(parents=True)
        for n in names_train:
            flat = n.replace("/", "_").replace(".png", ".depth.tiff")
            _write_png(extra / flat)
        return scene, extra

    def test_prepare(self, layout):
        scene, extra = layout
        train, test = prepare_cambridge(str(scene), depth_dir=str(extra),
                                        size=(256, 144))
        assert train == ["seq1_frame00001.png", "seq1_frame00002.png"]
        assert test == ["seq4_frame00001.png"]
        from PIL import Image

        with Image.open(scene / "images_full" / train[0]) as im:
            assert im.size == (256, 144)
        assert (scene / "train_images_full" / train[0]).exists()
        assert (scene / "images_full" / test[0]).exists()
        assert not (scene / "train_images_full" / test[0]).exists()
        assert (scene / "depths_full" /
                "seq1_frame00001.depth.tiff").exists()
        # model flattened + rescaled to the resize resolution
        from gs_localization_tpu.data.colmap import read_colmap_model

        cams, imgs, _ = read_colmap_model(str(scene / "sparse/0"))
        assert all("/" not in im.name for im in imgs.values())
        c = next(iter(cams.values()))
        assert (c.width, c.height) == (256, 144)
        np.testing.assert_allclose(c.fx, 100.0 * 256 / 1920)
        # loads through the run_scene cambridge path
        from gs_localization_tpu.data.scene import load_colmap_scene

        sc = load_colmap_scene(
            str(scene / "sparse/0"),
            images_dir=str(scene / "images_full"),
            train_list=train, test_list=test)
        assert len(sc.train_cameras) == 2


class TestLlff360:
    @pytest.fixture()
    def layout(self, tmp_path):
        scene = tmp_path / "fern"
        (scene / "sparse/0").mkdir(parents=True)
        (scene / "images_4").mkdir()
        names = [f"img{i:03d}.png" for i in range(20)]
        for i, n in enumerate(names):
            _write_png(scene / "images_4" / n, seed=i)
        cams = {1: _cam(w=256, h=144, model="SIMPLE_RADIAL")}
        imgs = {i + 1: _img(i + 1, n) for i, n in enumerate(names)}
        write_colmap_model_text(str(scene / "sparse/0"), cams, imgs, {})
        return scene

    def test_llff_split(self, layout):
        train, test = prepare_llff(str(layout))
        # hold 10, residue 4 -> images 4 and 14 train
        assert train == ["img004.png", "img014.png"]
        assert len(test) == 18
        tri = layout / "train_views" / "triangulated"
        assert (tri / "list_train.txt").exists()
        assert (layout / "train_views" / "train_images" /
                "img004.png").exists()
        sc = load_llff_scene(str(layout))
        assert len(sc.train_cameras) == 2 and len(sc.test_cameras) == 18
        # cameras rescaled to the images_4 resolution (64x36 here)
        c = sc.train_cameras[0].camera
        assert (int(c.width), int(c.height)) == (64, 36)

    def test_360_split(self, layout):
        train, test = prepare_360(str(layout))
        assert train == [f"img{i:03d}.png" for i in (3, 8, 13, 18)]
        assert len(test) == 16


def test_rescale_camera_models():
    c = rescale_camera(_cam(model="SIMPLE_RADIAL"), 64, 36)
    assert c.model == "SIMPLE_PINHOLE"
    np.testing.assert_allclose(c.params, [50.0, 32.0, 18.0])
    c2 = rescale_camera(_cam(model="PINHOLE"), 64, 36)
    assert c2.model == "PINHOLE"
    np.testing.assert_allclose(c2.params, [50.0, 50.0, 32.0, 18.0])
