"""Parity against the VENDORED reference nets, loaded directly.

VERDICT r1 item 3: the twin-based tests (test_superglue.py etc.) re-implement
the torch nets inside the test, so a transcription error passes parity while
real official weights break. Here the actual reference modules under
/root/reference/hloc/third_party are imported and run:

- SuperPoint / SuperGlue (SuperGluePretrainedNetwork/models) with seeded
  random init (their weights are not vendored),
- D2-Net (d2net/lib/model_test.py) with default torch init,
- R2D2 (r2d2/nets/patchnet.py Quad_L2Net_ConfCFS) with the OFFICIAL
  vendored checkpoint r2d2_WASF_N16.pt — real-weight parity.
"""

import sys
from pathlib import Path
from unittest import mock

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/hloc/third_party")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not available")


def _no_load(self, *a, **k):  # replaces nn.Module.load_state_dict in init
    return None


# --------------------------------------------------------------- SuperPoint
class TestSuperPointVsReference:
    def _reference_net(self, seed=0):
        sys.path.insert(0, str(REF / "SuperGluePretrainedNetwork"))
        from models.superpoint import SuperPoint

        torch.manual_seed(seed)
        with mock.patch.object(torch.nn.Module, "load_state_dict", _no_load), \
                mock.patch("torch.load", lambda *a, **k: {}):
            net = SuperPoint({"max_keypoints": -1})
        return net.eval()

    def test_keypoints_scores_descriptors(self):
        from gs_localization_tpu.sfm.superpoint import (
            convert_torch_weights, extract_superpoint)

        net = self._reference_net()
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (64, 80)).astype(np.float32)
        with torch.no_grad():
            pred = net({"image": torch.from_numpy(img)[None, None]})
        kpts_t = pred["keypoints"][0].numpy()          # (N, 2) xy
        scores_t = pred["scores"][0].numpy()
        desc_t = pred["descriptors"][0].numpy().T      # (N, 256)
        assert 5 < len(kpts_t) <= 1024, len(kpts_t)

        params = convert_torch_weights(
            {k: v.numpy() for k, v in net.state_dict().items()})
        feats = extract_superpoint(params, jnp.asarray(img),
                                   num_keypoints=1024)
        valid = np.asarray(feats.scores) > 0
        kpts_j = np.asarray(feats.keypoints)[valid]
        scores_j = np.asarray(feats.scores)[valid]
        desc_j = np.asarray(feats.descriptors)[valid]

        ref = {tuple(map(int, k)): (s, d)
               for k, s, d in zip(kpts_t, scores_t, desc_t)}
        got = {tuple(map(int, k)): (s, d)
               for k, s, d in zip(kpts_j, scores_j, desc_j)}
        assert set(ref) == set(got)
        for key in ref:
            np.testing.assert_allclose(got[key][0], ref[key][0], atol=1e-5)
            np.testing.assert_allclose(got[key][1], ref[key][1], atol=2e-4)


# ---------------------------------------------------------------- SuperGlue
class TestSuperGlueVsReference:
    def _reference_net(self, seed=1, iters=30):
        sys.path.insert(0, str(REF / "SuperGluePretrainedNetwork"))
        from models.superglue import SuperGlue

        torch.manual_seed(seed)
        with mock.patch.object(torch.nn.Module, "load_state_dict", _no_load), \
                mock.patch("torch.load", lambda *a, **k: {}):
            net = SuperGlue({"weights": "indoor",
                             "sinkhorn_iterations": iters})
        return net.eval()

    def test_matches_and_scores(self):
        from gs_localization_tpu.sfm.superglue import (
            convert_torch_weights_superglue, superglue_match)

        iters = 30
        net = self._reference_net(iters=iters)
        rng = np.random.default_rng(1)
        w, h = 160, 120
        n0, n1 = 40, 48
        kpts0 = rng.uniform((0, 0), (w, h), (n0, 2)).astype(np.float32)
        kpts1 = rng.uniform((0, 0), (w, h), (n1, 2)).astype(np.float32)
        sc0 = rng.uniform(0, 1, n0).astype(np.float32)
        sc1 = rng.uniform(0, 1, n1).astype(np.float32)

        def l2(x):
            return x / np.linalg.norm(x, axis=0, keepdims=True)

        d0 = l2(rng.standard_normal((256, n0)).astype(np.float32))
        d1 = l2(rng.standard_normal((256, n1)).astype(np.float32))

        data = {
            "keypoints0": torch.from_numpy(kpts0)[None],
            "keypoints1": torch.from_numpy(kpts1)[None],
            "scores0": torch.from_numpy(sc0)[None],
            "scores1": torch.from_numpy(sc1)[None],
            "descriptors0": torch.from_numpy(d0)[None],
            "descriptors1": torch.from_numpy(d1)[None],
            "image0": torch.empty(1, 1, h, w),
            "image1": torch.empty(1, 1, h, w),
        }
        with torch.no_grad():
            out = net(data)

        params = convert_torch_weights_superglue(
            {k: v.numpy() for k, v in net.state_dict().items()})
        res = superglue_match(
            params, jnp.asarray(kpts0), jnp.asarray(sc0), jnp.asarray(d0.T),
            jnp.asarray(kpts1), jnp.asarray(sc1), jnp.asarray(d1.T),
            width0=w, height0=h, width1=w, height1=h,
            sinkhorn_iters=iters, match_threshold=0.2)

        np.testing.assert_allclose(
            np.asarray(res.matching_scores0),
            out["matching_scores0"][0].numpy(), atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(res.matches0), out["matches0"][0].numpy())
        np.testing.assert_array_equal(
            np.asarray(res.matches1), out["matches1"][0].numpy())


# ------------------------------------------------------------------- D2-Net
class TestD2NetVsReference:
    def _reference_net(self, seed=2):
        sys.path.insert(0, str(REF / "d2net"))
        from lib.model_test import D2Net as RefD2Net

        torch.manual_seed(seed)
        return RefD2Net(model_file=None, use_relu=True,
                        use_cuda=False).eval()

    def test_dense_features_detection_localization(self):
        from gs_localization_tpu.sfm.d2net import (
            convert_torch_weights_d2net, dense_features, hard_detection,
            localization)

        net = self._reference_net()
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (48, 56, 3)).astype(np.float32)
        # hloc extractor preprocessing (extractors/d2net.py:41-44)
        x = torch.from_numpy(img.transpose(2, 0, 1))[None].flip(1)
        x = x * 255 - torch.tensor([103.939, 116.779, 123.68]).view(1, 3, 1, 1)
        with torch.no_grad():
            dense_t = net.dense_feature_extraction(x)
            det_t = net.detection(dense_t)[0].numpy().transpose(1, 2, 0)
            disp_t = net.localization(dense_t).numpy()  # (1, 2, c, h, w)
        dense_t = dense_t[0].numpy().transpose(1, 2, 0)

        params = convert_torch_weights_d2net(
            {k: v.numpy() for k, v in net.state_dict().items()})
        f = np.asarray(dense_features(params, jnp.asarray(img)))
        scale = np.abs(dense_t).max()
        np.testing.assert_allclose(f, dense_t, atol=2e-4 * scale)

        det_j = np.asarray(hard_detection(jnp.asarray(dense_t)))
        assert det_t.sum() > 0
        # masks computed from identical features must agree exactly
        np.testing.assert_array_equal(det_j, det_t)

        disp_j = np.asarray(localization(jnp.asarray(dense_t)))
        disp_t = disp_t[0].transpose(2, 3, 1, 0)       # (h, w, c, 2[i,j])
        sel = det_t & np.all(np.abs(disp_t) < 0.5, axis=-1) \
            & np.all(np.isfinite(disp_t), axis=-1)
        np.testing.assert_allclose(disp_j[sel], disp_t[sel], atol=1e-4)


# -------------------------------------------------- R2D2 (official weights)
class TestR2D2VsReferenceOfficialWeights:
    CKPT = REF / "r2d2/models/r2d2_WASF_N16.pt"

    @pytest.mark.skipif(not CKPT.exists(), reason="checkpoint not vendored")
    def test_forward_parity_official_checkpoint(self):
        from gs_localization_tpu.sfm.r2d2 import load_r2d2, r2d2_forward

        sys.path.insert(0, str(REF / "r2d2"))
        from nets.patchnet import Quad_L2Net_ConfCFS  # noqa: E402

        ckpt = torch.load(str(self.CKPT), map_location="cpu")
        assert "Quad_L2Net_ConfCFS" in ckpt["net"]
        net = Quad_L2Net_ConfCFS()
        net.load_state_dict({k.replace("module.", ""): v
                             for k, v in ckpt["state_dict"].items()})
        net.eval()

        rng = np.random.default_rng(3)
        img = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = torch.from_numpy(
            ((img - mean) / std).transpose(2, 0, 1))[None]
        with torch.no_grad():
            res = net([x])
        desc_t = res["descriptors"][0][0].numpy().transpose(1, 2, 0)
        rel_t = res["reliability"][0][0, 0].numpy()
        rep_t = res["repeatability"][0][0, 0].numpy()

        params = load_r2d2(str(self.CKPT))
        desc, rel, rep = r2d2_forward(params, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(desc), desc_t,
                                   rtol=2e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(rel), rel_t,
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(rep), rep_t,
                                   rtol=2e-3, atol=2e-4)
