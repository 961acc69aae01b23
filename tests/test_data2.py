"""Blender reader, 7-Scenes prep, covisibility pairs, COLMAP db, RGB-D."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.data.blender import load_blender_scene
from gs_localization_tpu.data.colmap import ColmapImage
from gs_localization_tpu.data.colmap_db import (
    ColmapDatabase, images_from_pair_id, pair_id_from_images,
)
from gs_localization_tpu.data.rgbd import backproject_rgbd, gaussians_from_rgbd
from gs_localization_tpu.data.seven_scenes import (
    flat_name, prepare_scene, seq_dir_from_split_line,
)
from gs_localization_tpu.sfm.pairs import (
    pairs_exhaustive, pairs_from_covisibility, pairs_from_poses,
    pairs_sequential,
)

from helpers import make_camera


class TestBlender:
    def test_load(self, tmp_path):
        frames = []
        for i in range(4):
            c2w = np.eye(4)
            c2w[0, 3] = i * 0.5
            frames.append({"file_path": f"./train/r_{i}",
                           "transform_matrix": c2w.tolist()})
        meta = {"camera_angle_x": 0.8, "frames": frames}
        (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
        scene = load_blender_scene(str(tmp_path), width=100, height=100,
                                   num_init_points=50)
        assert len(scene.train_cameras) == 4
        cam = scene.train_cameras[2].camera
        # OpenGL flip: identity c2w with x-offset -> campos = (1.0, 0, 0)
        np.testing.assert_allclose(np.asarray(cam.campos), [1.0, 0, 0],
                                   atol=1e-5)
        assert scene.points.shape == (50, 3)


class TestSevenScenes:
    def test_naming(self):
        assert seq_dir_from_split_line("sequence3\n") == "seq-03"
        assert seq_dir_from_split_line("sequence12") == "seq-12"
        assert flat_name("seq-01", "frame-000123.color.png") == \
            "seq-01-frame-000123-color.png"

    def test_prepare_scene(self, tmp_path):
        scene = tmp_path / "chess"
        for seq, n in [("seq-01", 3), ("seq-02", 2)]:
            d = scene / seq
            d.mkdir(parents=True)
            for i in range(n):
                (d / f"frame-{i:06d}.color.png").write_bytes(b"x")
                (d / f"frame-{i:06d}.depth.png").write_bytes(b"y")
        (scene / "TrainSplit.txt").write_text("sequence1\n")
        (scene / "TestSplit.txt").write_text("sequence2\n")
        train, test = prepare_scene(str(scene))
        assert len(train) == 3 and len(test) == 2
        assert os.path.islink(scene / "images_full" /
                              "seq-01-frame-000000-color.png")
        assert os.path.islink(scene / "depths_full" /
                              "seq-01-frame-000000-depth.png")
        assert (scene / "train_full.txt").read_text().splitlines() == train


class TestPairs:
    def test_covisibility(self):
        def im(i, pts):
            return ColmapImage(i, np.array([1, 0, 0, 0.0]), np.zeros(3), 1,
                               f"im{i}", np.zeros((len(pts), 2)),
                               np.array(pts, np.int64))
        images = {1: im(1, [10, 11, 12]), 2: im(2, [11, 12, 13]),
                  3: im(3, [13, 14, -1]), 4: im(4, [99])}
        pairs = pairs_from_covisibility(images, top_k=1)
        assert ("im1", "im2") in pairs      # share 2 points
        assert ("im2", "im1") in pairs
        assert not any(a == "im4" for a, b in pairs)

    def test_from_poses(self):
        # cameras on a line looking +z, plus one rotated 90 deg (gated out)
        def im(i, center, r=None):
            r = np.eye(3) if r is None else r
            t = -r @ np.asarray(center, np.float64)
            from gs_localization_tpu.core.camera import rotmat_to_quat
            q = np.asarray(rotmat_to_quat(r))
            return ColmapImage(i, q, t, 1, f"im{i}", np.zeros((0, 2)),
                               np.zeros((0,), np.int64))
        ry90 = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float64)
        images = {1: im(1, [0, 0, 0]), 2: im(2, [1, 0, 0]),
                  3: im(3, [5, 0, 0]), 4: im(4, [0.5, 0, 0], ry90)}
        pairs = pairs_from_poses(images, num_matched=1)
        # nearest same-axis neighbor wins; the rotated camera never pairs
        assert ("im1", "im2") in pairs
        assert ("im2", "im1") in pairs
        assert ("im3", "im2") in pairs
        assert not any("im4" in p for pair in pairs for p in pair)
        # with a large rotation threshold im4 becomes im1's nearest
        loose = pairs_from_poses(images, num_matched=1,
                                 rotation_threshold=180.0)
        assert ("im1", "im4") in loose

    def test_exhaustive_and_sequential(self):
        names = ["a", "b", "c", "d"]
        assert len(pairs_exhaustive(names)) == 6
        seq = pairs_sequential(names, window=2)
        assert ("a", "b") in seq and ("a", "c") in seq
        assert ("a", "d") not in seq


class TestColmapDB:
    def test_roundtrip(self, tmp_path):
        db = ColmapDatabase(str(tmp_path / "db.db"))
        cam = db.add_camera("PINHOLE", 64, 48, np.array([60, 61, 32, 24.0]))
        i1 = db.add_image("a.png", cam)
        i2 = db.add_image("b.png", cam)
        kp = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
        db.add_keypoints(i1, kp)
        m = np.array([[0, 1], [1, 0]], np.uint32)
        db.add_matches(i2, i1, m)  # reversed ids exercise the swap
        db.commit()
        np.testing.assert_allclose(db.read_keypoints(i1), kp)
        back = db.read_matches(i2, i1)
        np.testing.assert_array_equal(back, m)
        a, b = images_from_pair_id(pair_id_from_images(i2, i1))
        assert (a, b) == (min(i1, i2), max(i1, i2))
        db.close()


class TestRGBD:
    def test_backprojection_reprojects(self, rng):
        cam = make_camera(64, 48, fov=1.0)
        depth = np.full((48, 64), 3.0, np.float32)
        rgb = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        pts, cols, sp = backproject_rgbd(cam, jnp.asarray(rgb),
                                         jnp.asarray(depth), stride=4)
        assert len(pts) == (48 // 4) * (64 // 4)
        # all points at z=3 in camera frame (camera at origin, identity)
        np.testing.assert_allclose(pts[:, 2], 3.0, atol=1e-5)
        np.testing.assert_allclose(sp, 3.0 * 4 / float(cam.fx), atol=1e-5)

    def test_gaussians_from_rgbd(self, rng):
        cam = make_camera(32, 24, fov=1.0)
        depth = np.full((24, 32), 2.0, np.float32)
        depth[:4] = 0.0  # invalid band
        rgb = rng.uniform(0, 1, (24, 32, 3)).astype(np.float32)
        g = gaussians_from_rgbd(cam, rgb, depth, stride=4, sh_degree=1)
        assert int(g.num_live) == (24 // 4 - 1) * (32 // 4)
        assert np.isfinite(np.asarray(g.scaling[g.live])).all()

    def test_extend_gaussians(self, rng):
        from gs_localization_tpu.data.rgbd import extend_gaussians_from_rgbd
        from helpers import random_scene
        g = random_scene(rng, n=30, capacity=128)
        cam = make_camera(32, 24, fov=1.0)
        depth = np.full((24, 32), 2.5, np.float32)
        rgb = rng.uniform(0, 1, (24, 32, 3)).astype(np.float32)
        g2, added = extend_gaussians_from_rgbd(g, cam, rgb, depth, stride=8)
        assert int(added) == (24 // 8) * (32 // 8)
        assert int(g2.num_live) == 30 + int(added)
        # originals untouched
        np.testing.assert_allclose(np.asarray(g2.xyz[:30]),
                                   np.asarray(g.xyz[:30]))
