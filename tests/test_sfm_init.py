"""Native SfM-init pipeline end-to-end on synthetic renders:
features -> match -> known-pose triangulation -> retrieval+PnP query init."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.pipelines.sfm_init import (
    SfmInitConfig, build_point_model, localize_query_pnp,
)
from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.sfm.evaluate import pose_errors

from helpers import random_scene, make_camera

CFG = RasterizerConfig(max_pairs=1 << 15, max_per_tile=256, chunk=32,
                       backend="jnp")


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(21)
    # many small, opaque gaussians -> textured renders Harris can latch onto
    g = random_scene(rng, n=900, sh_degree=1, spread=1.6,
                     z_range=(3.0, 6.0), scale_range=(-4.2, -3.2))
    views = []
    for i in range(6):
        tau = np.zeros(6, np.float32)
        tau[:3] = 0.08 * rng.standard_normal(3)
        tau[3:] = 0.02 * rng.standard_normal(3)
        views.append(make_camera(160, 120, fov=1.0).with_delta(jnp.asarray(tau)))
    renders = [np.asarray(rasterize(g, c, CFG).color) for c in views]
    depths = [np.asarray(rasterize(g, c, CFG).depth) for c in views]
    return g, views, renders, depths


def test_build_and_localize(world):
    g, views, renders, depths = world
    cfg = SfmInitConfig(num_keypoints=512, match_window=5, retrieval_k=4,
                        max_reproj_px=3.0, pnp_max_error_px=8.0,
                        depth_correct=False)
    logs = []
    mapped = build_point_model(renders[:5], views[:5], cfg,
                               log_fn=logs.append)
    assert int(mapped.valid.sum()) > 40, logs

    # triangulated points should reproject into view 0 with small error
    # (validated inside triangulate); sanity: points near the gaussian cloud
    pts = mapped.points[mapped.valid]
    assert np.median(pts[:, 2]) == pytest.approx(4.5, abs=1.5)

    # localize the held-out 6th view
    cam_q = views[5]
    K = np.array([[float(cam_q.fx), 0, float(cam_q.cx)],
                  [0, float(cam_q.fy), float(cam_q.cy)], [0, 0, 1.0]])
    qvec, tvec, info = localize_query_pnp(renders[5], K, mapped, views[:5],
                                          cfg)
    from gs_localization_tpu.core.camera import quat_to_rotmat
    R_est = np.asarray(quat_to_rotmat(jnp.asarray(qvec, jnp.float32)))
    gt = np.asarray(cam_q.w2c)
    et, er = pose_errors(R_est, tvec, gt[:3, :3], gt[:3, 3])
    if info["method"] == "pnp":
        assert et < 0.15, (et, info)
        assert er < 4.0, (er, info)
    else:
        # fallback still returns a plausible nearby train pose
        assert et < 1.0


def test_depth_correction_path(world):
    g, views, renders, depths = world
    cfg = SfmInitConfig(num_keypoints=256, match_window=4, retrieval_k=3,
                        max_reproj_px=3.0, depth_correct=True)
    mapped = build_point_model(renders[:4], views[:4], cfg,
                               depth_maps=depths[:4], log_fn=lambda s: None)
    # corrected points must lie on the rendered depth surface
    assert int(mapped.valid.sum()) > 10
