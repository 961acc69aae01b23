"""Data interop: PLY roundtrip, COLMAP text/binary roundtrip, scene assembly."""

import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.data import (
    ColmapCamera, ColmapImage, ColmapPoint3D,
    compute_scene_extent, load_colmap_scene, load_gaussian_ply,
    read_colmap_model, save_gaussian_ply, write_colmap_model_text,
)
from gs_localization_tpu.data.colmap import (
    read_cameras_binary, read_images_binary, read_points3d_binary,
)
from gs_localization_tpu.raster import RasterizerConfig, rasterize

from helpers import random_scene, make_camera


class TestPLY:
    def test_roundtrip(self, rng, tmp_path):
        g = random_scene(rng, n=50, sh_degree=2, capacity=80)
        path = str(tmp_path / "map.ply")
        save_gaussian_ply(path, g)
        g2 = load_gaussian_ply(path)
        live = np.asarray(g.live)
        np.testing.assert_allclose(np.asarray(g2.xyz), np.asarray(g.xyz)[live])
        np.testing.assert_allclose(np.asarray(g2.features_dc),
                                   np.asarray(g.features_dc)[live])
        np.testing.assert_allclose(np.asarray(g2.features_rest),
                                   np.asarray(g.features_rest)[live])
        np.testing.assert_allclose(np.asarray(g2.scaling),
                                   np.asarray(g.scaling)[live])
        np.testing.assert_allclose(np.asarray(g2.rotation),
                                   np.asarray(g.rotation)[live])
        np.testing.assert_allclose(np.asarray(g2.opacity),
                                   np.asarray(g.opacity)[live])
        assert g2.max_sh_degree == 2

    def test_roundtrip_renders_identically(self, rng, tmp_path):
        g = random_scene(rng, n=64, sh_degree=1)
        path = str(tmp_path / "m.ply")
        save_gaussian_ply(path, g)
        g2 = load_gaussian_ply(path, active_sh_degree=g.sh_degree)
        cam = make_camera(48, 32)
        cfg = RasterizerConfig(max_pairs=1 << 13, max_per_tile=64, chunk=32,
                               backend="jnp")
        a = rasterize(g, cam, cfg)
        b = rasterize(g2, cam, cfg)
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                                   atol=1e-6)

    def test_field_layout_is_reference_convention(self, rng, tmp_path):
        """The exact property names/order the reference writes
        (gaussian_model.py:177-208) — interop contract."""
        g = random_scene(rng, n=4, sh_degree=3)
        path = str(tmp_path / "layout.ply")
        save_gaussian_ply(path, g)
        header = open(path, "rb").read().split(b"end_header")[0].decode()
        props = [l.split()[-1] for l in header.splitlines()
                 if l.startswith("property")]
        expect = (
            ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
            + [f"f_rest_{i}" for i in range(45)]
            + ["opacity", "scale_0", "scale_1", "scale_2",
               "rot_0", "rot_1", "rot_2", "rot_3"]
        )
        assert props == expect


def _toy_model():
    cams = {1: ColmapCamera(1, "PINHOLE", 64, 48,
                            np.array([60.0, 61.0, 32.0, 24.0]))}
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0])
    images = {
        1: ColmapImage(1, q, np.array([0.1, -0.2, 1.0]), 1, "im1.png",
                       np.array([[1.0, 2.0], [3.0, 4.0]]),
                       np.array([7, -1], np.int64)),
        2: ColmapImage(2, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "im2.png",
                       np.zeros((0, 2)), np.zeros((0,), np.int64)),
    }
    pts = {7: ColmapPoint3D(7, np.array([0.5, 0.25, 2.0]),
                            np.array([255, 128, 0], np.uint8), 0.75,
                            np.array([1]), np.array([0]))}
    return cams, images, pts


class TestColmap:
    def test_text_roundtrip(self, tmp_path):
        cams, images, pts = _toy_model()
        p = str(tmp_path / "model")
        write_colmap_model_text(p, cams, images, pts)
        c2, i2, p2 = read_colmap_model(p)
        assert c2[1].model == "PINHOLE"
        np.testing.assert_allclose(c2[1].params, cams[1].params)
        np.testing.assert_allclose(i2[1].qvec, images[1].qvec)
        np.testing.assert_allclose(i2[1].tvec, images[1].tvec)
        np.testing.assert_allclose(i2[1].xys, images[1].xys)
        np.testing.assert_array_equal(i2[1].point3d_ids, images[1].point3d_ids)
        np.testing.assert_allclose(p2[7].xyz, pts[7].xyz)
        assert i2[1].name == "im1.png"

    def test_binary_read(self, tmp_path):
        # write minimal .bin files per the COLMAP spec and read them back
        p = tmp_path
        with open(p / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
            f.write(struct.pack("<dddd", 60.0, 61.0, 32.0, 24.0))
        with open(p / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<idddddddi", 1, 1, 0, 0, 0, 0.1, -0.2, 1.0, 1))
            f.write(b"im1.png\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, 7))
        with open(p / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<QdddBBBd", 7, 0.5, 0.25, 2.0, 255, 128, 0, 0.75))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
        cams = read_cameras_binary(str(p / "cameras.bin"))
        imgs = read_images_binary(str(p / "images.bin"))
        pts = read_points3d_binary(str(p / "points3D.bin"))
        assert cams[1].fx == 60.0 and cams[1].cy == 24.0
        assert imgs[1].name == "im1.png"
        np.testing.assert_allclose(imgs[1].tvec, [0.1, -0.2, 1.0])
        np.testing.assert_allclose(pts[7].xyz, [0.5, 0.25, 2.0])


class TestScene:
    def test_load_scene_and_split(self, tmp_path):
        cams, images, pts = _toy_model()
        # add more images for a split
        for i in range(3, 11):
            images[i] = ColmapImage(
                i, np.array([1.0, 0, 0, 0]),
                np.array([0.0, 0.0, float(i)]), 1, f"im{i}.png",
                np.zeros((0, 2)), np.zeros((0,), np.int64))
        p = str(tmp_path / "model")
        write_colmap_model_text(p, cams, images, pts)
        scene = load_colmap_scene(p, eval_split=True, llffhold=5)
        assert len(scene.test_cameras) == 2
        assert len(scene.train_cameras) == 8
        assert scene.points.shape == (1, 3)
        assert scene.extent > 0
        # w2c conversion: COLMAP q/t == our w2c directly
        all_cams = scene.train_cameras + scene.test_cameras
        info = [c for c in all_cams if c.name == "im1.png"][0]
        np.testing.assert_allclose(
            np.asarray(info.camera.w2c[:3, 3]), [0.1, -0.2, 1.0], atol=1e-6)

    def test_explicit_lists(self, tmp_path):
        cams, images, pts = _toy_model()
        p = str(tmp_path / "model")
        write_colmap_model_text(p, cams, images, pts)
        scene = load_colmap_scene(p, train_list=["im1.png"],
                                  test_list=["im2.png"])
        assert [c.name for c in scene.train_cameras] == ["im1.png"]
        assert [c.name for c in scene.test_cameras] == ["im2.png"]

    def test_extent(self):
        centers = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [2, 2, 0.0]])
        e = compute_scene_extent(centers)
        np.testing.assert_allclose(e, 1.1 * np.sqrt(2), rtol=1e-6)
