"""D2-Net-in-JAX parity vs torch twins of the vendored reference modules."""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm import d2net as d2

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_dense(params, img_np, use_relu=True):
    x = torch.from_numpy(img_np[..., ::-1].copy()).permute(2, 0, 1)[None]
    x = x.float() * 255.0
    x = x - torch.tensor([103.939, 116.779, 123.68]).view(1, 3, 1, 1)
    for i in range(10):
        if d2.MAXPOOL_BEFORE[i]:
            x = F.max_pool2d(x, 2, 2)
        if d2.AVGPOOL_BEFORE[i]:
            x = F.avg_pool2d(x, 2, stride=1)
        p = params[i]
        w = torch.from_numpy(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1)).float()
        b = torch.from_numpy(np.asarray(p["bias"])).float()
        dil = d2.DILATION[i]
        x = F.conv2d(x, w, b, padding=dil, dilation=dil)
        if i < 9:
            x = F.relu(x)
    if use_relu:
        x = F.relu(x)
    return x


def _torch_detect(batch):
    """Twin of HardDetectionModule.forward (model_test.py:81-133)."""
    b, c, h, w = batch.size()
    depth_wise_max = torch.max(batch, dim=1)[0]
    is_depth_wise_max = batch == depth_wise_max
    local_max = F.max_pool2d(batch, 3, stride=1, padding=1)
    is_local_max = batch == local_max
    dii_f = torch.tensor([[0, 1., 0], [0, -2., 0], [0, 1., 0]]).view(1, 1, 3, 3)
    dij_f = 0.25 * torch.tensor(
        [[1., 0, -1.], [0, 0., 0], [-1., 0, 1.]]).view(1, 1, 3, 3)
    djj_f = torch.tensor([[0, 0, 0], [1., -2., 1.], [0, 0, 0]]).view(1, 1, 3, 3)
    dii = F.conv2d(batch.view(-1, 1, h, w), dii_f, padding=1).view(b, c, h, w)
    dij = F.conv2d(batch.view(-1, 1, h, w), dij_f, padding=1).view(b, c, h, w)
    djj = F.conv2d(batch.view(-1, 1, h, w), djj_f, padding=1).view(b, c, h, w)
    det = dii * djj - dij * dij
    tr = dii + djj
    threshold = (5.0 + 1) ** 2 / 5.0
    is_not_edge = torch.min(tr * tr / det <= threshold, det > 0)
    return torch.min(is_depth_wise_max, torch.min(is_local_max, is_not_edge))


class TestD2Net:
    def test_dense_feature_parity(self, rng):
        params = d2.init_params(rng)
        img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        ours = np.asarray(d2.dense_features(params, jnp.asarray(img)))
        theirs = _torch_dense(params, img)[0].permute(1, 2, 0).numpy()
        # two /2 maxpools then a stride-1 VALID avgpool: 48x64 -> 11x15
        assert ours.shape == theirs.shape == (11, 15, 512)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-2)

    def test_detection_parity(self, rng):
        f = rng.standard_normal((1, 32, 10, 12)).astype(np.float32)
        ours = np.asarray(d2.hard_detection(
            jnp.asarray(f[0].transpose(1, 2, 0))))
        theirs = _torch_detect(torch.from_numpy(f))[0].permute(
            1, 2, 0).numpy()
        np.testing.assert_array_equal(ours, theirs)

    def test_extract_shapes_and_coords(self, rng):
        params = d2.init_params(rng)
        img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
        feats = d2.extract_d2net(params, jnp.asarray(img), num_keypoints=64)
        kp = np.asarray(feats.keypoints)
        sc = np.asarray(feats.scores)
        de = np.asarray(feats.descriptors)
        assert kp.shape == (64, 2) and de.shape == (64, 512)
        live = sc > 0
        assert live.sum() > 0
        # keypoints land inside the image, descriptors unit-norm
        assert np.all(kp[live, 0] >= -0.5) and np.all(kp[live, 0] < 96.5)
        assert np.all(kp[live, 1] >= -0.5) and np.all(kp[live, 1] < 64.5)
        np.testing.assert_allclose(
            np.linalg.norm(de[live], axis=1), 1.0, atol=1e-4)

    def test_converter(self, rng):
        sd = {}
        cin = 3
        for i, cout in zip(d2.TORCH_CONV_IDX, d2.CONV_CHANNELS):
            sd[f"dense_feature_extraction.model.{i}.weight"] = \
                rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
            sd[f"dense_feature_extraction.model.{i}.bias"] = \
                np.zeros(cout, np.float32)
            cin = cout
        p = d2.convert_torch_weights_d2net(sd)
        assert len(p) == 10 and p[0]["kernel"].shape == (3, 3, 3, 64)
