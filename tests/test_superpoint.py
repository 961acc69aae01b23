"""SuperPoint-in-JAX: shapes, NMS/postprocess, and torch weight conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm.superpoint import (
    SuperPointNet, convert_torch_weights, extract_superpoint, postprocess,
    simple_nms,
)


@pytest.fixture(scope="module")
def params():
    net = SuperPointNet()
    img = jnp.zeros((64, 80))
    return net.init(jax.random.PRNGKey(0), img)["params"]


class TestSuperPoint:
    def test_shapes(self, params):
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 80)),
                          jnp.float32)
        scores, desc = SuperPointNet().apply({"params": params}, img)
        assert scores.shape == (64, 80)
        assert desc.shape == (8, 10, 256)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc), axis=-1), 1.0, atol=1e-4)

    def test_nms(self):
        s = jnp.zeros((16, 16)).at[5, 5].set(1.0).at[5, 7].set(0.8)
        out = np.asarray(simple_nms(s, 2))
        assert out[5, 5] == 1.0
        assert out[5, 7] == 0.0  # suppressed by the stronger neighbor

    def test_extract_end_to_end(self, params):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (64, 80)), jnp.float32)
        feats = extract_superpoint(params, img, num_keypoints=64,
                                   score_threshold=0.0)
        assert feats.keypoints.shape == (64, 2)
        assert feats.descriptors.shape == (64, 256)
        valid = np.asarray(feats.scores) > 0
        if valid.any():
            d = np.asarray(feats.descriptors)[valid]
            np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0,
                                       atol=1e-3)

    def test_torch_weight_conversion(self, params):
        torch = pytest.importorskip("torch")
        # build a fake torch state dict with the standard layer names/shapes
        shapes = {
            "conv1a": (64, 1), "conv1b": (64, 64),
            "conv2a": (64, 64), "conv2b": (64, 64),
            "conv3a": (128, 64), "conv3b": (128, 128),
            "conv4a": (128, 128), "conv4b": (128, 128),
            "convPa": (256, 128), "convDa": (256, 128),
        }
        sd = {}
        gen = torch.Generator().manual_seed(0)
        for name, (o, i) in shapes.items():
            sd[f"{name}.weight"] = torch.randn(o, i, 3, 3, generator=gen)
            sd[f"{name}.bias"] = torch.randn(o, generator=gen)
        sd["convPb.weight"] = torch.randn(65, 256, 1, 1, generator=gen)
        sd["convPb.bias"] = torch.randn(65, generator=gen)
        sd["convDb.weight"] = torch.randn(256, 256, 1, 1, generator=gen)
        sd["convDb.bias"] = torch.randn(256, generator=gen)

        conv = convert_torch_weights(sd)
        # structure must match what the module initializes
        for name in params:
            assert conv[name]["kernel"].shape == params[name]["kernel"].shape, name
            assert conv[name]["bias"].shape == params[name]["bias"].shape, name
        # converted weights must actually run
        img = jnp.zeros((32, 32))
        scores, desc = SuperPointNet().apply({"params": conv}, img)
        assert scores.shape == (32, 32)

    def test_matches_torch_reference_conv(self, params):
        """Cross-check one conv block numerically against torch."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        w = rng.standard_normal((8, 1, 3, 3)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        img = rng.standard_normal((16, 16)).astype(np.float32)

        t_out = F.relu(F.conv2d(torch.from_numpy(img)[None, None],
                                torch.from_numpy(w),
                                torch.from_numpy(b), padding=1))
        t_out = t_out[0].numpy().transpose(1, 2, 0)

        from flax import linen as nn

        class One(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.relu(nn.Conv(8, (3, 3), padding=1, name="c")(
                    x[None, :, :, None]))[0]

        p = {"c": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                   "bias": jnp.asarray(b)}}
        j_out = np.asarray(One().apply({"params": p}, jnp.asarray(img)))
        np.testing.assert_allclose(j_out, t_out, atol=1e-5)
