"""MiDaS-v2.1-in-JAX parity vs a from-scratch torch twin (random weights)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.ops import midas as md

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x)).float()


def _conv(x, k, stride=1, pad=None, groups=1):
    kt = _t(k).permute(3, 2, 0, 1)
    if pad is None:
        pad = k.shape[0] // 2
    return F.conv2d(x, kt, stride=stride, padding=pad, groups=groups)


def _bn(p, x):
    return F.batch_norm(x, _t(p["mean"]), _t(p["var"]), _t(p["gamma"]),
                        _t(p["beta"]), False, 0.0, 1e-5)


def _torch_forward(params, img):
    x = _t(img).permute(2, 0, 1)[None]
    mean = torch.tensor(md._MEAN).view(1, 3, 1, 1)
    std = torch.tensor(md._STD).view(1, 3, 1, 1)
    x = (x - mean) / std
    p = params["pretrained"]
    x = F.relu(_bn(p["bn1"], _conv(x, p["conv1"], 2, pad=3)))
    x = F.max_pool2d(x, 3, 2, 1)
    outs = []
    for s, blocks in enumerate(p["layers"]):
        for i, bp in enumerate(blocks):
            stride = 2 if (i == 0 and s > 0) else 1
            y = F.relu(_bn(bp["bn1"], _conv(x, bp["conv1"], 1, pad=0)))
            y = F.relu(_bn(bp["bn2"], _conv(y, bp["conv2"], stride,
                                            groups=md.GROUPS)))
            y = _bn(bp["bn3"], _conv(y, bp["conv3"], 1, pad=0))
            if "down" in bp:
                x = _bn(bp["down_bn"], _conv(x, bp["down"], stride, pad=0))
            x = F.relu(x + y)
        outs.append(x)
    l1, l2, l3, l4 = outs
    s = params["scratch"]

    def rcu(p, x):
        y = _conv(F.relu(x), p["conv1"], 1) + _t(p["b1"]).view(1, -1, 1, 1)
        y = _conv(F.relu(y), p["conv2"], 1) + _t(p["b2"]).view(1, -1, 1, 1)
        return x + y

    def fusion(p, x, skip=None):
        if skip is not None:
            x = x + rcu(p["rcu1"], skip)
        x = rcu(p["rcu2"], x)
        # MiDaS FeatureFusionBlock uses align_corners=True
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=True)

    r1 = _conv(l1, s["layer1_rn"], 1)
    r2 = _conv(l2, s["layer2_rn"], 1)
    r3 = _conv(l3, s["layer3_rn"], 1)
    r4 = _conv(l4, s["layer4_rn"], 1)
    p4 = fusion(s["refinenet4"], r4)
    p3 = fusion(s["refinenet3"], p4, r3)
    p2 = fusion(s["refinenet2"], p3, r2)
    p1 = fusion(s["refinenet1"], p2, r1)
    y = _conv(p1, s["out1"], 1) + _t(s["out1_b"]).view(1, -1, 1, 1)
    y = F.interpolate(y, scale_factor=2, mode="bilinear",
                      align_corners=False)
    y = F.relu(_conv(y, s["out2"], 1) + _t(s["out2_b"]).view(1, -1, 1, 1))
    y = F.relu(_conv(y, s["out3"], 1, pad=0)
               + _t(s["out3_b"]).view(1, -1, 1, 1))
    return y[0, 0].numpy()


class TestMiDaS:
    def test_forward_parity_small(self, rng):
        params = md.init_params(rng, stage_blocks=(1, 1, 1, 1))
        img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        ours = np.asarray(md.midas_forward(params, jnp.asarray(img)))
        theirs = _torch_forward(params, img)
        assert ours.shape == theirs.shape == (64, 64)
        assert np.all(ours >= 0)
        rng_max = max(theirs.max(), 1e-3)
        np.testing.assert_allclose(ours / rng_max, theirs / rng_max,
                                   atol=5e-3)

    def test_estimator_callback(self, rng):
        params = md.init_params(rng, stage_blocks=(1, 1, 1, 1))
        est = md.make_midas_estimator(params)
        d = est(rng.uniform(0, 1, (48, 60, 3)).astype(np.float32))
        assert d.shape == (48, 60) and np.all(np.isfinite(d))

    def test_converter_layout(self, rng):
        """Round-trip a torch-style state dict through the converter."""
        sd = {}

        def add_conv(key, cout, cin, k):
            sd[key] = rng.standard_normal((cout, cin, k, k)).astype(
                np.float32)

        def add_bn(prefix, c):
            sd[f"{prefix}.weight"] = np.ones(c, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

        add_conv("pretrained.layer1.0.weight", 64, 3, 7)
        add_bn("pretrained.layer1.1", 64)
        stage_prefix = ["pretrained.layer1.4", "pretrained.layer2",
                        "pretrained.layer3", "pretrained.layer4"]
        cin = 64
        for s, nb in enumerate(md.STAGE_BLOCKS):
            cout = md.STAGE_CH[s]
            cmid = cout // 2
            for i in range(nb):
                pre = f"{stage_prefix[s]}.{i}"
                add_conv(f"{pre}.conv1.weight", cmid, cin if i == 0 else cout,
                         1)
                add_bn(f"{pre}.bn1", cmid)
                add_conv(f"{pre}.conv2.weight", cmid, cmid // md.GROUPS, 3)
                add_bn(f"{pre}.bn2", cmid)
                add_conv(f"{pre}.conv3.weight", cout, cmid, 1)
                add_bn(f"{pre}.bn3", cout)
                if i == 0:
                    add_conv(f"{pre}.downsample.0.weight", cout, cin, 1)
                    add_bn(f"{pre}.downsample.1", cout)
            cin = cout
        for k in range(1, 5):
            add_conv(f"scratch.layer{k}_rn.weight", 256, md.STAGE_CH[k - 1],
                     3)
            for r in (1, 2):
                add_conv(f"scratch.refinenet{k}.resConfUnit{r}.conv1.weight",
                         256, 256, 3)
                sd[f"scratch.refinenet{k}.resConfUnit{r}.conv1.bias"] = \
                    np.zeros(256, np.float32)
                add_conv(f"scratch.refinenet{k}.resConfUnit{r}.conv2.weight",
                         256, 256, 3)
                sd[f"scratch.refinenet{k}.resConfUnit{r}.conv2.bias"] = \
                    np.zeros(256, np.float32)
        add_conv("scratch.output_conv.0.weight", 128, 256, 3)
        sd["scratch.output_conv.0.bias"] = np.zeros(128, np.float32)
        add_conv("scratch.output_conv.2.weight", 32, 128, 3)
        sd["scratch.output_conv.2.bias"] = np.zeros(32, np.float32)
        add_conv("scratch.output_conv.4.weight", 1, 32, 1)
        sd["scratch.output_conv.4.bias"] = np.zeros(1, np.float32)

        p = md.convert_torch_weights_midas(sd)
        assert p["pretrained"]["conv1"].shape == (7, 7, 3, 64)
        assert len(p["pretrained"]["layers"][2]) == 23
        assert p["scratch"]["out3"].shape == (1, 1, 32, 1)
