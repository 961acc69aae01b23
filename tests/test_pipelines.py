"""End-to-end pipeline integration: train a tiny map on synthetic views,
save/load the PLY, and localize perturbed queries against it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.core import se3
from gs_localization_tpu.data.scene import CameraInfo, SceneInfo
from gs_localization_tpu.loc import TrackingConfig
from gs_localization_tpu.mapping import MapTrainConfig
from gs_localization_tpu.pipelines import (
    LocalizePipelineConfig, TrainPipelineConfig, localize_queries,
    render_and_eval, train_map,
)
from gs_localization_tpu.pipelines.localize import QuerySpec, load_map
from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.utils import load_config

from helpers import random_scene, make_camera

CFG = RasterizerConfig(
    tile_size=16, max_pairs=1 << 14, max_per_tile=128, chunk=32, backend="jnp"
)


@pytest.fixture(scope="module")
def synthetic_world():
    """A ground-truth Gaussian scene + a ring of cameras rendering it."""
    rng = np.random.default_rng(9)
    world = random_scene(rng, n=250, sh_degree=1, spread=1.2,
                         z_range=(2.5, 5.0), scale_range=(-2.6, -1.8))
    cams = []
    for i in range(12):
        tau = jnp.asarray(np.concatenate([
            0.25 * rng.standard_normal(3), 0.08 * rng.standard_normal(3),
        ]).astype(np.float32))
        cams.append(make_camera(64, 48, fov=1.1).with_delta(tau))
    renders = [rasterize(world, c, CFG) for c in cams]
    return world, cams, renders


def _scene_info(world, cams, renders, rng):
    # init point cloud: subsample the true means with noisy colors
    pts = np.asarray(world.xyz[world.live])
    cols = np.clip(
        0.28209479177387814 * np.asarray(world.features_dc[world.live])[:, 0]
        + 0.5, 0, 1)
    keep = rng.random(len(pts)) < 0.8
    infos = [
        CameraInfo(uid=i, name=f"cam{i}.png", camera=c)
        for i, c in enumerate(cams)
    ]
    images = {i: np.asarray(r.color) for i, r in enumerate(renders)}
    depths = {i: np.asarray(r.depth) for i, r in enumerate(renders)}

    def loader(info):
        return images[info.uid], depths[info.uid]

    return SceneInfo(
        train_cameras=infos[:10], test_cameras=infos[10:],
        points=pts[keep], colors=cols[keep], extent=2.0,
    ), loader


class TestTrainPipeline:
    def test_train_save_localize(self, synthetic_world, tmp_path):
        world, cams, renders = synthetic_world
        rng = np.random.default_rng(0)
        scene, loader = _scene_info(world, cams, renders, rng)

        tcfg = TrainPipelineConfig(
            iterations=250, sh_degree=1, capacity_multiplier=2.0,
            densify_from=50, densify_until=200, densification_interval=60,
            opacity_reset_interval=10_000,  # off
            sh_up_interval=100,
            test_iterations=(250,), save_iterations=(250,), log_every=100,
        )
        logs = []
        g = train_map(scene, str(tmp_path), tcfg,
                      map_cfg=MapTrainConfig(spatial_scale=2.0),
                      raster_cfg=CFG, image_loader=loader,
                      log_fn=logs.append)
        assert any("saved map" in l for l in logs)

        # reload the saved PLY and check render quality on a train view
        g2 = load_map(str(tmp_path / "gs_map/iteration_250/point_cloud.ply"))
        out = rasterize(g2, cams[0], CFG)
        from gs_localization_tpu.mapping.losses import psnr
        val = float(psnr(out.color, renders[0].color))
        assert val > 14.0, val

        # eval pipeline runs
        metrics = render_and_eval(
            g2, scene.test_cameras, str(tmp_path / "eval"), CFG,
            image_loader=lambda info: loader(info), log_fn=logs.append)
        assert "psnr" in metrics

        # localize two perturbed queries against the TRUE world map
        queries = []
        for i in range(2):
            tau = jnp.asarray([0.01, -0.008, 0.006, 0.008, -0.01, 0.006])
            cam0 = cams[i].with_delta(tau)
            queries.append(QuerySpec(
                name=f"q{i}", camera=cam0,
                image=np.asarray(renders[i].color),
                depth=np.asarray(renders[i].depth),
                gt_w2c=np.asarray(cams[i].w2c),
            ))
        lcfg = LocalizePipelineConfig(
            batch_size=2,
            tracking=TrackingConfig(num_iters=100, lr=2e-3, convergence=1e-5),
            use_keypoint_mask=False,
        )
        results, metrics = localize_queries(world, queries, lcfg, CFG,
                                            log_fn=logs.append)
        assert metrics is not None
        assert metrics["median_trans_m"] < 0.01
        assert metrics["median_rot_deg"] < 0.6


class TestConfig:
    def test_inherit_chain(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "Training:\n  lr: 0.1\n  iters: 10\nDataset:\n  type: base\n")
        (tmp_path / "child.yaml").write_text(
            "inherit_from: base.yaml\nTraining:\n  lr: 0.2\n")
        cfg = load_config(str(tmp_path / "child.yaml"))
        assert cfg["Training"]["lr"] == 0.2
        assert cfg["Training"]["iters"] == 10
        assert cfg["Dataset"]["type"] == "base"


class TestPseudoViewTraining:
    def test_fewshot_pseudo_view_loss_applies(self, synthetic_world, tmp_path):
        world, cams, renders = synthetic_world
        rng = np.random.default_rng(2)
        scene, loader = _scene_info(world, cams, renders, rng)
        tcfg = TrainPipelineConfig(
            iterations=45, sh_degree=1, capacity_multiplier=1.5,
            densify_from=10_000, densify_until=0, opacity_reset_interval=10_000,
            sh_up_interval=1_000, test_iterations=(), save_iterations=(),
            log_every=1000, fewshot_threshold=200,
            sample_pseudo_interval=5, start_sample_pseudo=10,
            end_sample_pseudo=1_000, pseudo_per_edge=1,
        )
        calls = []

        def fake_depth(img):
            calls.append(1)
            return np.full(img.shape[:2], 3.0, np.float32)

        train_map(scene, None, tcfg,
                  map_cfg=MapTrainConfig(spatial_scale=2.0),
                  raster_cfg=CFG, image_loader=loader,
                  depth_estimator=fake_depth, log_fn=lambda s: None)
        assert len(calls) >= 5  # estimator actually sampled


class TestTooLargeSubsetting:
    def test_camera_subset_and_swap(self, synthetic_world, tmp_path):
        world, cams, renders = synthetic_world
        rng = np.random.default_rng(3)
        scene, loader = _scene_info(world, cams, renders, rng)
        tcfg = TrainPipelineConfig(
            iterations=40, sh_degree=1, capacity_multiplier=1.5,
            densify_from=10_000, densify_until=0,   # densify off
            opacity_reset_interval=10_000, sh_up_interval=100,
            test_iterations=(), save_iterations=(), log_every=1000,
            max_cameras=4, camera_swap_iteration=20,
        )
        logs = []
        train_map(scene, None, tcfg, map_cfg=MapTrainConfig(spatial_scale=2.0),
                  raster_cfg=CFG, image_loader=loader, log_fn=logs.append)
        assert any("too-large scene: training on 4/10" in l for l in logs)
        assert any("swapped to a fresh 4-camera subset" in l for l in logs)
