"""Smoke tests for sfm/viz.py (image-output checks, headless Agg).

Mirrors the affordances of reference hloc/visualization.py + utils/viz.py +
utils/viz_3d.py: every public entry point must produce a non-trivial PNG.
"""

import numpy as np
import pytest

from gs_localization_tpu.data.colmap import (
    ColmapCamera, ColmapImage, ColmapPoint3D)
from gs_localization_tpu.sfm import viz


@pytest.fixture()
def tiny_model():
    rng = np.random.default_rng(0)
    cams = {1: ColmapCamera(1, "PINHOLE", 64, 48,
                            np.array([60.0, 60.0, 32.0, 24.0]))}
    pts = {}
    xyz = rng.uniform([-1, -1, 3], [1, 1, 6], (30, 3))
    for j in range(30):
        pts[j] = ColmapPoint3D(j, xyz[j], np.array([200, 100, 50]),
                               0.5, np.array([1, 2]), np.array([j, j]))
    images = {}
    for i, name in [(1, "a.png"), (2, "b.png")]:
        t = np.array([0.1 * i, 0.0, 0.0])
        xys = (xyz[:, :2] / xyz[:, 2:3]) * 60.0 + np.array([32.0, 24.0])
        p3ids = np.arange(30)
        p3ids = np.where(np.arange(30) % 3 == 0, -1, p3ids)  # some invisible
        images[i] = ColmapImage(i, np.array([1.0, 0, 0, 0]), t, 1, name,
                                xys, p3ids)
    return cams, images, pts


def _img(h=48, w=64):
    return np.random.default_rng(1).uniform(0, 1, (h, w, 3)).astype(
        np.float32)


def _check_png(path):
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 800


def test_plot_images_keypoints_matches(tmp_path):
    kp0 = np.random.default_rng(0).uniform(0, 40, (25, 2))
    kp1 = kp0 + 2.0
    fig, axes = viz.plot_images([_img(), _img()], titles=["q", "d"])
    viz.plot_keypoints(axes, [kp0, kp1], colors="lime")
    viz.plot_matches(fig, axes[0], axes[1], kp0, kp1,
                     color=viz.error_colormap(np.linspace(0, 1, 25)))
    viz.add_text(axes[0], "hello")
    out = tmp_path / "m.png"
    viz.save_plot(fig, out)
    _check_png(out)


def test_error_colormap_endpoints():
    c = viz.error_colormap(np.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(c[0], [1, 0, 0], atol=1e-6)   # red
    np.testing.assert_allclose(c[1], [1, 1, 0], atol=1e-6)   # yellow
    np.testing.assert_allclose(c[2], [0, 1, 0], atol=1e-6)   # green


@pytest.mark.parametrize("mode", ["visibility", "track_length", "depth"])
def test_visualize_sfm_2d_modes(tiny_model, tmp_path, mode):
    image_of = {"a.png": _img(), "b.png": _img()}
    figs = viz.visualize_sfm_2d(tiny_model, image_of, color_by=mode,
                                selected=["a.png"])
    assert len(figs) == 1
    out = tmp_path / f"{mode}.png"
    viz.save_plot(figs[0], out)
    _check_png(out)


def test_visualize_loc(tmp_path):
    kp = np.random.default_rng(2).uniform(0, 40, (30, 2))
    inl = np.arange(30) % 2 == 0
    fig = viz.visualize_loc(_img(), _img(), kp, kp + 1.0, inliers=inl,
                            query_name="q.png", db_name="t.png")
    out = tmp_path / "loc.png"
    viz.save_plot(fig, out)
    _check_png(out)


def test_reconstruction_3d(tiny_model, tmp_path):
    fig, ax = viz.init_figure_3d(height=4.0)
    viz.plot_reconstruction_3d(ax, tiny_model, min_track_length=1)
    out = tmp_path / "rec3d.png"
    viz.save_plot(fig, out)
    _check_png(out)


def test_gaussian_map_3d(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from helpers import random_scene

    g = random_scene(np.random.default_rng(0), n=200, sh_degree=1)
    fig, ax = viz.init_figure_3d(height=4.0)
    viz.plot_gaussian_map_3d(ax, g, max_points=100)
    out = tmp_path / "map3d.png"
    viz.save_plot(fig, out)
    _check_png(out)
