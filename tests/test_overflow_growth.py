"""Binning-capacity overflow must be surfaced and auto-grown, not silent.

VERDICT r2 #4 "done" criterion: a too-small cap triggers growth (or a loud
error) in train_map and localize instead of silently truncating tiles.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.core.camera import Camera
from gs_localization_tpu.loc.refine import TrackingConfig, refine_pose
from gs_localization_tpu.pipelines.localize import (
    LocalizePipelineConfig, QuerySpec, localize_queries)
from gs_localization_tpu.raster import RasterizerConfig, rasterize

import sys

sys.path.insert(0, "tests")
from helpers import make_camera, random_scene  # noqa: E402

W, H = 80, 60
# a dense cluster in front of the camera => every tile's true count is ~n
DENSE = dict(n=96, sh_degree=1, spread=0.3, z_range=(3.0, 3.5),
             scale_range=(-1.2, -1.0))
TINY_CAP = RasterizerConfig(max_pairs=1 << 14, max_per_tile=16, chunk=16,
                            backend="jnp")


@pytest.fixture(scope="module")
def dense_scene():
    rng = np.random.default_rng(5)
    g = random_scene(rng, **DENSE)
    cam = make_camera(W, H, fov=1.0)
    return g, cam


def test_rasterize_reports_tile_overflow(dense_scene):
    g, cam = dense_scene
    out = rasterize(g, cam, TINY_CAP)
    assert bool(out.tile_overflow)
    assert int(out.max_tile_count) > TINY_CAP.max_per_tile


def test_refine_pose_surfaces_overflow(dense_scene):
    g, cam = dense_scene
    target = rasterize(g, cam, TINY_CAP)
    res = refine_pose(
        g, cam, target.color, jnp.ones((H, W), bool),
        TrackingConfig(num_iters=2, convergence=0.0), TINY_CAP,
        gt_depth=target.depth)
    assert bool(res.overflow)
    # pose-mode path must surface it too
    res_pm = refine_pose(
        g, cam, target.color, jnp.ones((H, W), bool),
        TrackingConfig(num_iters=2, convergence=0.0, pose_mode=True),
        TINY_CAP, gt_depth=target.depth)
    assert bool(res_pm.overflow)


def test_localize_grows_capacity(dense_scene):
    g, cam = dense_scene
    target = rasterize(
        g, cam, RasterizerConfig(max_pairs=1 << 15, max_per_tile=256,
                                 chunk=32, backend="jnp"))
    q = QuerySpec(name="q0", camera=cam,
                  image=np.asarray(target.color),
                  depth=np.asarray(target.depth),
                  gt_w2c=np.asarray(cam.w2c))
    logs = []
    cfg = LocalizePipelineConfig(
        batch_size=1,
        tracking=TrackingConfig(num_iters=2, convergence=0.0),
        use_keypoint_mask=False, max_capacity_growths=5)
    results, _ = localize_queries(g, [q], cfg, TINY_CAP,
                                  log_fn=logs.append)
    assert "q0" in results
    # assert on the growth event itself, not the exact log wording: the
    # loop logs one "binning overflow: growing ..." line per doubling
    assert any(m.startswith("binning overflow: growing") for m in logs), logs


def test_localize_fails_loudly_when_growth_disabled(dense_scene):
    g, cam = dense_scene
    q = QuerySpec(name="q0", camera=cam,
                  image=np.zeros((H, W, 3), np.float32),
                  depth=np.zeros((H, W), np.float32))
    cfg = LocalizePipelineConfig(
        batch_size=1,
        tracking=TrackingConfig(num_iters=2, convergence=0.0),
        use_keypoint_mask=False, max_capacity_growths=0)
    with pytest.raises(RuntimeError, match="overflow"):
        localize_queries(g, [q], cfg, TINY_CAP, log_fn=lambda m: None)


def test_train_map_grows_tile_capacity(dense_scene, tmp_path):
    from gs_localization_tpu.data.scene import CameraInfo, SceneInfo
    from gs_localization_tpu.pipelines.train_map import (
        TrainPipelineConfig, train_map)

    g, cam = dense_scene
    img = np.asarray(rasterize(
        g, cam, RasterizerConfig(max_pairs=1 << 15, max_per_tile=256,
                                 chunk=32, backend="jnp")).color)
    rng = np.random.default_rng(0)
    pts = np.asarray(g.xyz)[np.asarray(g.live)]
    scene = SceneInfo(
        train_cameras=[CameraInfo(uid=0, name="v0", camera=cam)],
        test_cameras=[], points=pts,
        colors=rng.uniform(0, 1, (len(pts), 3)).astype(np.float32),
        extent=2.0)
    logs = []
    cfg = TrainPipelineConfig(
        iterations=12, sh_degree=1, test_iterations=(), save_iterations=())
    train_map(scene, str(tmp_path), cfg, raster_cfg=TINY_CAP,
              log_fn=logs.append,
              image_loader=lambda info: (img, None))
    assert any("binning overflow" in m for m in logs), logs