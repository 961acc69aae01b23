"""R2D2-in-JAX parity vs a torch twin of the vendored Quad_L2Net_ConfCFS."""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm import r2d2 as r2

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_twin(params, img_np):
    x = torch.from_numpy(img_np).permute(2, 0, 1)[None].float()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (x - mean) / std
    for i, (_, k, d, has_bn, has_relu) in enumerate(r2.PLAN):
        p = params["convs"][i]
        w = torch.from_numpy(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1)).float()
        b = torch.from_numpy(np.asarray(p["bias"])).float()
        x = F.conv2d(x, w, b, padding=((k - 1) * d) // 2, dilation=d)
        if has_bn:
            m = torch.from_numpy(np.asarray(p["bn"]["mean"])).float()
            v = torch.from_numpy(np.asarray(p["bn"]["var"])).float()
            x = F.batch_norm(x, m, v, None, None, False, 0.0, 1e-5)
        if has_relu:
            x = F.relu(x)
    desc = F.normalize(x, p=2, dim=1)
    xsq = x ** 2   # heads run on squared features (patchnet.py:122-128)
    wc = torch.from_numpy(
        np.asarray(params["clf"]["kernel"]).transpose(3, 2, 0, 1)).float()
    bc = torch.from_numpy(np.asarray(params["clf"]["bias"])).float()
    rel = F.softmax(F.conv2d(xsq, wc, bc), dim=1)[:, 1]
    ws = torch.from_numpy(
        np.asarray(params["sal"]["kernel"]).transpose(3, 2, 0, 1)).float()
    bs = torch.from_numpy(np.asarray(params["sal"]["bias"])).float()
    sp = F.softplus(F.conv2d(xsq, ws, bs))
    rep = (sp / (1 + sp))[:, 0]
    return (desc[0].permute(1, 2, 0).numpy(), rel[0].numpy(), rep[0].numpy())


class TestR2D2:
    def test_forward_parity(self, rng):
        params = r2.init_params(rng)
        # give BN stats non-trivial values
        for p in params["convs"]:
            if "bn" in p:
                c = p["bn"]["mean"].shape[0]
                p["bn"]["mean"] = jnp.asarray(
                    0.1 * rng.standard_normal(c).astype(np.float32))
                p["bn"]["var"] = jnp.asarray(
                    rng.uniform(0.5, 2.0, c).astype(np.float32))
        img = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
        desc, rel, rep = r2.r2d2_forward(params, jnp.asarray(img))
        dt, lt, pt = _torch_twin(params, img)
        assert desc.shape == (40, 56, 128)      # full resolution (dilated)
        np.testing.assert_allclose(np.asarray(desc), dt, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(rel), lt, rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(rep), pt, rtol=2e-3, atol=2e-5)

    def test_extract_invariants(self, rng):
        params = r2.init_params(rng)
        img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
        f = r2.extract_r2d2(params, jnp.asarray(img), num_keypoints=32,
                            reliability_threshold=0.0,
                            repeatability_threshold=0.0)
        kp, sc, de = (np.asarray(f.keypoints), np.asarray(f.scores),
                      np.asarray(f.descriptors))
        live = sc > 0
        assert live.sum() > 0
        assert np.all(kp[live] >= 0) and np.all(kp[live] < 48)
        np.testing.assert_allclose(np.linalg.norm(de[live], axis=1), 1.0,
                                   atol=1e-4)

    def test_converter_roundtrip(self, rng):
        sd = {}
        cin = 3
        for i, (cout, k, _, has_bn, _) in zip(r2.TORCH_OPS_IDX, r2.PLAN):
            sd[f"ops.{i}.weight"] = rng.standard_normal(
                (cout, cin, k, k)).astype(np.float32)
            sd[f"ops.{i}.bias"] = np.zeros(cout, np.float32)
            if has_bn:
                sd[f"ops.{i + 1}.running_mean"] = np.zeros(cout, np.float32)
                sd[f"ops.{i + 1}.running_var"] = np.ones(cout, np.float32)
            cin = cout
        sd["clf.weight"] = rng.standard_normal((2, 128, 1, 1)).astype(
            np.float32)
        sd["clf.bias"] = np.zeros(2, np.float32)
        sd["sal.weight"] = rng.standard_normal((1, 128, 1, 1)).astype(
            np.float32)
        sd["sal.bias"] = np.zeros(1, np.float32)
        p = r2.convert_torch_weights_r2d2(sd)
        img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        desc, rel, rep = r2.r2d2_forward(p, jnp.asarray(img))
        assert desc.shape == (32, 32, 128)
        assert np.all(np.isfinite(np.asarray(rel)))
