"""EigenPlaces/CosPlace JAX parity vs a from-scratch torch twin.

The reference's nets are torch.hub (gmberton/EigenPlaces, gmberton/CosPlace),
not vendored — the twin reproduces the published architecture (truncated
ResNet + L2Norm -> GeM -> Linear -> L2Norm head) with random weights.
"""

import numpy as np
import pytest

from gs_localization_tpu.sfm import eigenplaces
from gs_localization_tpu.sfm.dir import BN_EPS, GEM_EPS, RGB_MEAN, RGB_STD

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(p):
    return torch.from_numpy(np.asarray(p)).double()


def _bn(x, p):
    return (x - _t(p["mean"]).view(1, -1, 1, 1)) \
        / torch.sqrt(_t(p["var"]).view(1, -1, 1, 1) + BN_EPS) \
        * _t(p["scale"]).view(1, -1, 1, 1) + _t(p["bias"]).view(1, -1, 1, 1)


def _block(p, x, kind):
    r = x
    if kind == "bottleneck":
        y = F.relu(_bn(F.conv2d(x, _t(p["conv1"])), p["bn1"]))
        y = F.relu(_bn(F.conv2d(y, _t(p["conv2"]), stride=p["stride"],
                                padding=1), p["bn2"]))
        y = _bn(F.conv2d(y, _t(p["conv3"])), p["bn3"])
    else:
        y = F.relu(_bn(F.conv2d(x, _t(p["conv1"]), stride=p["stride"],
                                padding=1), p["bn1"]))
        y = _bn(F.conv2d(y, _t(p["conv2"]), padding=1), p["bn2"])
    if "down_w" in p:
        r = _bn(F.conv2d(x, _t(p["down_w"]), stride=p["stride"]),
                p["down_bn"])
    return F.relu(y + r)


def _torch_twin(params, img_np):
    x = torch.from_numpy(img_np).permute(2, 0, 1)[None].double()
    x = (x - _t(RGB_MEAN).view(1, 3, 1, 1)) / _t(RGB_STD).view(1, 3, 1, 1)
    x = F.relu(_bn(F.conv2d(x, _t(params["conv1"]), stride=2, padding=3),
                   params["bn1"]))
    x = F.max_pool2d(x, 3, 2, padding=1)
    for stage in params["layers"]:
        for blk in stage:
            x = _block(blk, x, params["block"])
    # head: L2Norm over C -> GeM(p) -> Linear -> L2Norm
    x = F.normalize(x, p=2, dim=1)
    p = params["gemp"]
    g = F.avg_pool2d(x.clamp(min=GEM_EPS).pow(p),
                     (x.shape[2], x.shape[3])).pow(1.0 / p)[0, :, 0, 0]
    d = _t(params["fc_w"]) @ g + _t(params["fc_b"])
    return F.normalize(d, p=2, dim=0).numpy()


class TestEigenPlaces:
    @pytest.fixture()
    def rng(self):
        return np.random.default_rng(11)

    def test_parity_vs_torch_twin(self, rng):
        params = eigenplaces.init_params(rng, arch="resnet18",
                                         fc_output_dim=128)
        img = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
        ours = np.asarray(eigenplaces.eigenplaces_descriptor(params, img))
        ref = _torch_twin(params, img.astype(np.float64))
        assert ours.shape == (128,)
        np.testing.assert_allclose(ours, ref, atol=2e-4)
        np.testing.assert_allclose(np.linalg.norm(ours), 1.0, atol=1e-5)

    def test_converter_roundtrip(self, rng):
        """Hub-style flat state dict -> converter -> same descriptor."""
        params = eigenplaces.init_params(rng, arch="resnet18",
                                         fc_output_dim=64)
        sd = {"backbone.0.weight": _t(params["conv1"])}
        for k in ("scale", "bias", "mean", "var"):
            name = {"scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}[k]
            sd[f"backbone.1.{name}"] = _t(params["bn1"][k])
        for li, stage in enumerate(params["layers"]):
            for bi, blk in enumerate(stage):
                pre = f"backbone.{4 + li}.{bi}"
                for ci in (1, 2):
                    sd[f"{pre}.conv{ci}.weight"] = _t(blk[f"conv{ci}"])
                    for k, name in (("scale", "weight"), ("bias", "bias"),
                                    ("mean", "running_mean"),
                                    ("var", "running_var")):
                        sd[f"{pre}.bn{ci}.{name}"] = _t(blk[f"bn{ci}"][k])
                if "down_w" in blk:
                    sd[f"{pre}.downsample.0.weight"] = _t(blk["down_w"])
                    for k, name in (("scale", "weight"), ("bias", "bias"),
                                    ("mean", "running_mean"),
                                    ("var", "running_var")):
                        sd[f"{pre}.downsample.1.{name}"] = _t(
                            blk["down_bn"][k])
        sd["aggregation.1.p"] = torch.tensor([params["gemp"]])
        sd["aggregation.3.weight"] = _t(params["fc_w"])
        sd["aggregation.3.bias"] = _t(params["fc_b"])
        conv = eigenplaces.convert_torch_weights_eigenplaces(
            sd, arch="resnet18")
        img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        a = np.asarray(eigenplaces.eigenplaces_descriptor(params, img))
        b = np.asarray(eigenplaces.eigenplaces_descriptor(conv, img))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_registry_entries(self, rng):
        from gs_localization_tpu.sfm.registry import get_global_descriptor

        params = eigenplaces.init_params(rng, arch="resnet18",
                                         fc_output_dim=32)
        for conf in ("eigenplaces", "cosplace"):
            fn = get_global_descriptor(conf, params=params)
            d = np.asarray(fn(
                rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)))
            assert d.shape == (32,)
