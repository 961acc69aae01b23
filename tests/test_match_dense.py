"""Dense-match aggregation (sfm/match_dense.py) + LoFTR-only SfM e2e.

Mirrors the reference's match_dense.py semantics: cell quantization,
score-weighted fine-bin voting, n-to-1 dedup, fixed-keypoint NN assignment,
top-k truncation with re-assignment — then the full dense path through
track building, known-pose triangulation, and dense PnP localization.
"""

import numpy as np
import pytest

from gs_localization_tpu.sfm.match_dense import (
    aggregate_dense_matches, assign_to_fixed, matches_to_matches0, quantize,
    unique_matches,
)

from helpers import make_camera


class TestQuantize:
    def test_pitch_grid(self):
        # reference to_cpts: round((kp+0.5)/ps)*ps - 0.5
        k = np.array([[0.1, 0.2], [3.9, 4.2], [4.4, 4.6]])
        c = quantize(k, 4.0)
        np.testing.assert_allclose(c[0], [-0.5, -0.5])
        np.testing.assert_allclose(c[1], [3.5, 3.5])
        np.testing.assert_allclose(c[2], [3.5, 3.5])

    def test_zero_pitch_identity(self):
        k = np.array([[1.23, 4.56]])
        np.testing.assert_allclose(quantize(k, 0.0), k)


class TestAssignFixed:
    def test_nn_with_radius(self):
        ref = np.array([[0.0, 0.0], [10.0, 0.0]])
        k = np.array([[0.4, 0.0], [10.0, 1.6], [5.0, 5.0]])
        ids = assign_to_fixed(k, ref, max_error=2.0)
        assert ids.tolist() == [0, 1, -1]

    def test_empty(self):
        assert assign_to_fixed(np.zeros((0, 2)), np.zeros((3, 2)), 1.0).size \
            == 0
        assert (assign_to_fixed(np.zeros((2, 2)), np.zeros((0, 2)), 1.0)
                == -1).all()


class TestUniqueMatches:
    def test_n_to_1_keeps_best(self):
        # two edges into keypoint 5 on side 1: the higher score survives
        ids0 = np.array([0, 1, 2])
        ids1 = np.array([5, 5, 6])
        sc = np.array([0.9, 0.4, 0.7])
        m, s = unique_matches(ids0, ids1, sc)
        assert m.tolist() == [[0, 5], [2, 6]]
        np.testing.assert_allclose(s, [0.9, 0.7])

    def test_invalid_dropped(self):
        m, s = unique_matches(np.array([-1, 0]), np.array([1, -1]),
                              np.array([1.0, 1.0]))
        assert len(m) == 0


class TestAggregate:
    def test_shared_keypoints_across_pairs(self):
        # the same physical point seen in 3 images; pair (a,b) and (b,c)
        # endpoints in b land in one cell -> ONE shared keypoint in b
        dense = {
            ("a", "b"): (np.array([[10.0, 10.0]]), np.array([[20.2, 20.1]]),
                         np.array([0.9])),
            ("b", "c"): (np.array([[20.3, 20.4]]), np.array([[30.0, 30.0]]),
                         np.array([0.8])),
        }
        kps, scores, matches = aggregate_dense_matches(
            dense, max_error=1.0, cell_size=1.0)
        assert len(kps["b"]) == 1          # merged into one cell
        assert len(kps["a"]) == 1 and len(kps["c"]) == 1
        m_ab, _ = matches[("a", "b")]
        m_bc, _ = matches[("b", "c")]
        assert m_ab[0, 1] == m_bc[0, 0]    # same keypoint id in b

    def test_fine_bin_vote_wins(self):
        # two endpoints in one cell (pitch 8), different fine bins (pitch 2):
        # the higher-score one fixes the final position
        dense = {
            ("a", "b"): (
                np.array([[4.0, 4.0], [6.0, 6.0]]),
                np.array([[0.0, 0.0], [50.0, 50.0]]),
                np.array([0.3, 0.9]),
            ),
        }
        kps, scores, _ = aggregate_dense_matches(
            dense, max_error=2.0, cell_size=8.0)
        assert len(kps["a"]) == 1
        # winning fine bin is the quantize(6.0, 2) = 5.5 cell
        np.testing.assert_allclose(kps["a"][0], quantize(
            np.array([[6.0, 6.0]]), 2.0)[0])

    def test_fixed_keypoints_not_extended(self):
        fixed = {"q": np.array([[5.0, 5.0]], np.float32)}
        dense = {
            ("q", "b"): (np.array([[5.3, 5.1], [40.0, 40.0]]),
                         np.array([[1.0, 1.0], [2.0, 2.0]]),
                         np.array([0.9, 0.8])),
        }
        kps, _, matches = aggregate_dense_matches(
            dense, max_error=1.0, cell_size=1.0, fixed_keypoints=fixed)
        np.testing.assert_allclose(kps["q"], fixed["q"])   # unchanged
        m, _ = matches[("q", "b")]
        assert len(m) == 1 and m[0, 0] == 0   # far endpoint unassigned

    def test_max_kps_truncates_and_reassigns(self):
        # 3 distinct cells in image a with distinct vote scores; keep top-2
        dense = {
            ("a", "b"): (
                np.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]]),
                np.array([[0.0, 5.0], [10.0, 5.0], [20.0, 5.0]]),
                np.array([0.9, 0.5, 0.7]),
            ),
        }
        kps, scores, matches = aggregate_dense_matches(
            dense, max_error=1.0, cell_size=1.0, max_kps=2)
        assert len(kps["a"]) == 2
        assert scores["a"][0] >= scores["a"][1]
        m, _ = matches[("a", "b")]
        assert len(m) == 2                 # dropped keypoint's match gone
        # matches reference kept keypoints only
        assert set(m[:, 0].tolist()) <= {0, 1}

    def test_matches0_layout(self):
        m = np.array([[0, 3], [2, 1]])
        s = np.array([0.5, 0.25], np.float32)
        m0, s0 = matches_to_matches0(m, s, num_kpts0=4)
        assert m0.tolist() == [3, -1, 1, -1]
        assert s0[0] == np.float16(0.5) and s0[1] == 0


class TestDenseSfmE2E:
    """LoFTR-shaped dense path: synthetic dense matches from known geometry
    -> aggregation -> tracks -> triangulation -> dense PnP localization
    (VERDICT item 6 'done' criterion)."""

    def _scene(self, rng, n_pts=60, n_cams=4):
        pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                        rng.uniform(4, 6, n_pts)], 1)
        cams = []
        for i in range(n_cams):
            t = np.array([0.3 * i - 0.45, 0.0, 0.0])
            cams.append(make_camera(320, 240, fov=1.0, t=t))
        return pts, cams

    def _project(self, pts, cam):
        w2c = np.asarray(cam.w2c)
        K = np.array([[float(cam.fx), 0, float(cam.cx)],
                      [0, float(cam.fy), float(cam.cy)], [0, 0, 1]])
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uv = pc @ K.T
        return uv[:, :2] / uv[:, 2:3], pc[:, 2]

    def test_triangulates_and_localizes(self, rng):
        from gs_localization_tpu.sfm.match_dense import aggregate_dense_matches
        from gs_localization_tpu.sfm.triangulate import (
            build_tracks, triangulate_tracks,
        )
        from gs_localization_tpu.sfm.pnp import pnp_ransac

        pts, cams = self._scene(rng)
        uvs = [self._project(pts, c)[0] for c in cams]

        # synthetic "LoFTR": every consecutive pair sees all points with
        # sub-pixel noise
        dense = {}
        for a in range(len(cams) - 1):
            for b in range(a + 1, len(cams)):
                noise = rng.normal(0, 0.2, uvs[a].shape)
                dense[(a, b)] = (uvs[a] + noise, uvs[b] + noise,
                                 rng.uniform(0.5, 1.0, len(pts)))
        kps, _, matches = aggregate_dense_matches(
            dense, max_error=1.0, cell_size=1.0)

        counts = [len(kps[i]) for i in range(len(cams))]
        tracks = build_tracks(
            len(cams), counts, {k: m for k, (m, _s) in matches.items()})
        w2c = np.stack([np.asarray(c.w2c) for c in cams])
        Ks = np.stack([
            np.array([[float(c.fx), 0, float(c.cx)],
                      [0, float(c.fy), float(c.cy)], [0, 0, 1]])
            for c in cams
        ])
        xyz, valid = triangulate_tracks(
            tracks, [kps[i] for i in range(len(cams))], w2c, Ks,
            max_reproj_px=4.0, min_tri_angle_deg=0.5)
        assert valid.sum() >= 0.8 * len(pts)
        # triangulated points match gt (match by NN, cell noise ~2 px)
        d = np.linalg.norm(xyz[valid][:, None] - pts[None], axis=-1).min(1)
        assert np.median(d) < 0.1

        # dense localization: a held-out camera PnPs from the model
        qcam = make_camera(320, 240, fov=1.0, t=np.array([0.1, 0.05, 0.0]))
        quv, _ = self._project(pts, qcam)
        qK = np.array([[float(qcam.fx), 0, float(qcam.cx)],
                       [0, float(qcam.fy), float(qcam.cy)], [0, 0, 1]])
        # 2D-3D: each track's position vs the query's true projection of gt
        pts3d = xyz[valid]
        # recover which gt point each track is (NN match)
        nn = np.linalg.norm(xyz[valid][:, None] - pts[None], axis=-1).argmin(1)
        res = pnp_ransac(quv[nn], pts3d, qK, max_error_px=6.0, seed=0)
        assert res.success
        w2c_q = np.asarray(qcam.w2c)
        t_err = np.linalg.norm(res.tvec - w2c_q[:3, 3])
        assert t_err < 0.05


class TestDensePipeline:
    """build_point_model(dense_matcher=...) + localize_query_dense."""

    def test_build_and_localize(self, rng):
        from gs_localization_tpu.pipelines.sfm_init import (
            SfmInitConfig, build_point_model, localize_query_dense,
        )

        n_pts = 80
        pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                        rng.uniform(4, 6, n_pts)], 1)
        cams, uvs = [], []
        for i in range(4):
            cam = make_camera(320, 240, fov=1.0,
                              t=np.array([0.3 * i - 0.45, 0, 0]))
            cams.append(cam)
        imgs = [rng.uniform(0, 1, (240, 320, 3)).astype(np.float32)
                for _ in cams]

        def project(pts, cam):
            w2c = np.asarray(cam.w2c)
            K = np.array([[float(cam.fx), 0, float(cam.cx)],
                          [0, float(cam.fy), float(cam.cy)], [0, 0, 1]])
            pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
            uv = pc @ K.T
            return uv[:, :2] / uv[:, 2:3]

        cam_of = {id(img): cam for img, cam in zip(imgs, cams)}

        def fake_loftr(img0, img1):
            c0, c1 = cam_of[id(img0)], cam_of[id(img1)]
            u0, u1 = project(pts, c0), project(pts, c1)
            noise = rng.normal(0, 0.15, u0.shape)
            return u0 + noise, u1 + noise, rng.uniform(0.5, 1.0, n_pts)

        cfg = SfmInitConfig(dense_max_error=1.0, dense_cell_size=1.0,
                            retrieval_k=3)
        mapped = build_point_model(imgs, cams, cfg,
                                   dense_matcher=fake_loftr,
                                   log_fn=lambda s: None)
        assert mapped.valid.sum() >= 0.7 * n_pts

        qcam = make_camera(320, 240, fov=1.0,
                           t=np.array([0.1, 0.05, 0.0]))
        qimg = rng.uniform(0, 1, (240, 320, 3)).astype(np.float32)
        cam_of[id(qimg)] = qcam
        qK = np.array([[float(qcam.fx), 0, float(qcam.cx)],
                       [0, float(qcam.fy), float(qcam.cy)], [0, 0, 1]])
        qvec, tvec, info = localize_query_dense(
            qimg, qK, mapped, cams, fake_loftr, imgs, cfg)
        assert info["method"] == "pnp"
        t_err = np.linalg.norm(tvec - np.asarray(qcam.w2c)[:3, 3])
        assert t_err < 0.05
