"""LoFTR-in-JAX parity vs a from-scratch torch twin (random weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm import loftr as lf

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x)).float()


def _conv(x, k, stride=1, pad=None):
    kt = _t(k).permute(3, 2, 0, 1)
    if pad is None:
        pad = k.shape[0] // 2
    return F.conv2d(x, kt, stride=stride, padding=pad)


def _bn(p, x):
    return F.batch_norm(x, _t(p["mean"]), _t(p["var"]), _t(p["gamma"]),
                        _t(p["beta"]), False, 0.0, 1e-5)


def _block(p, x, stride):
    y = F.relu(_bn(p["bn1"], _conv(x, p["conv1"], stride)))
    y = _bn(p["bn2"], _conv(y, p["conv2"], 1))
    if "down" in p:
        x = _bn(p["down_bn"], _conv(x, p["down"], stride, pad=0))
    return F.relu(x + y)


def _torch_backbone(p, img):
    x = _t(img)[None, None]
    x0 = F.relu(_bn(p["bn1"], _conv(x, p["conv1"], 2, pad=3)))
    x1 = _block(p["layer1"][0], x0, 1)
    x1 = _block(p["layer1"][1], x1, 1)
    x2 = _block(p["layer2"][0], x1, 2)
    x2 = _block(p["layer2"][1], x2, 1)
    x3 = _block(p["layer3"][0], x2, 2)
    x3 = _block(p["layer3"][1], x3, 1)
    x3o = _conv(x3, p["layer3_outconv"], 1, pad=0)
    up3 = F.interpolate(x3o, size=x2.shape[2:], mode="bilinear",
                        align_corners=False)
    x2o = _conv(x2, p["layer2_outconv"], 1, pad=0) + up3
    x2o = _conv(F.leaky_relu(_bn(p["layer2_outconv2_bn"],
                                 _conv(x2o, p["layer2_outconv2_a"], 1)),
                             0.01),
                p["layer2_outconv2_b"], 1)
    up2 = F.interpolate(x2o, size=x1.shape[2:], mode="bilinear",
                        align_corners=False)
    x1o = _conv(x1, p["layer1_outconv"], 1, pad=0) + up2
    x1o = _conv(F.leaky_relu(_bn(p["layer1_outconv2_bn"],
                                 _conv(x1o, p["layer1_outconv2_a"], 1)),
                             0.01),
                p["layer1_outconv2_b"], 1)
    return (x3o[0].permute(1, 2, 0).numpy(), x1o[0].permute(1, 2, 0).numpy())


def _torch_encoder(p, x, source, d):
    hd = d // lf.NHEAD
    L, S = x.shape[0], source.shape[0]
    q = (x @ _t(p["q"])).reshape(L, lf.NHEAD, hd)
    k = (source @ _t(p["k"])).reshape(S, lf.NHEAD, hd)
    v = (source @ _t(p["v"])).reshape(S, lf.NHEAD, hd)
    Q, K = F.elu(q) + 1, F.elu(k) + 1
    vv = v / S
    KV = torch.einsum("shd,shv->hdv", K, vv)
    Z = 1.0 / (torch.einsum("lhd,hd->lh", Q, K.sum(0)) + 1e-6)
    msg = torch.einsum("lhd,hdv,lh->lhv", Q, KV, Z) * S
    msg = msg.reshape(L, d) @ _t(p["merge"])
    msg = F.layer_norm(msg, (d,), _t(p["norm1"]["gamma"]),
                       _t(p["norm1"]["beta"]))
    msg = torch.cat([x, msg], -1)
    msg = F.relu(msg @ _t(p["mlp1"]))
    msg = F.layer_norm(msg @ _t(p["mlp2"]), (d,), _t(p["norm2"]["gamma"]),
                       _t(p["norm2"]["beta"]))
    return x + msg


class TestLoFTR:
    def test_backbone_parity(self, rng):
        p = lf.init_params(rng)["backbone"]
        img = rng.uniform(0, 1, (64, 96)).astype(np.float32)
        c, f = lf.backbone_fpn(p, jnp.asarray(img))
        ct, ft = _torch_backbone(p, img)
        assert c.shape == (8, 12, 256) and f.shape == (32, 48, 128)
        np.testing.assert_allclose(np.asarray(c), ct, rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(f), ft, rtol=5e-3, atol=5e-3)

    def test_encoder_layer_parity(self, rng):
        p = lf.init_params(rng)["coarse"][0]
        x = rng.standard_normal((20, lf.D_COARSE)).astype(np.float32)
        s = rng.standard_normal((24, lf.D_COARSE)).astype(np.float32)
        ours = np.asarray(lf._encoder_layer(p, jnp.asarray(x),
                                            jnp.asarray(s), lf.D_COARSE))
        theirs = _torch_encoder(p, _t(x), _t(s), lf.D_COARSE).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)

    def test_pos_encoding_matches_reference_formula(self):
        pe = lf.sine_pos_encoding(4, 6, 16)
        assert pe.shape == (4, 6, 16)
        div0 = np.exp(0.0)
        # channel 0 is sin(x * div0) with x starting at 1 (cumsum of ones)
        np.testing.assert_allclose(pe[0, 0, 0], np.sin(1.0 * div0), rtol=1e-6)
        np.testing.assert_allclose(pe[0, 2, 1], np.cos(3.0 * div0), rtol=1e-6)
        np.testing.assert_allclose(pe[2, 0, 2], np.sin(3.0 * div0), rtol=1e-6)

    def test_end_to_end_identity_match(self, rng):
        """Same image twice: mutual coarse matches should be the identity
        cells (interior), regardless of weights."""
        p = lf.init_params(rng)
        img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
        res = lf.loftr_match(p, jnp.asarray(img), jnp.asarray(img),
                             max_matches=64, match_threshold=0.0)
        k0 = np.asarray(res.kpts0)
        k1 = np.asarray(res.kpts1)
        sc = np.asarray(res.scores)
        live = sc > 0
        assert live.sum() > 0
        # coarse cells identical -> k0 differs from k1 only by the fine
        # sub-pixel expectation, bounded by the 5x5 window (+-2 cells x 2 px)
        d = np.abs(k0[live] - k1[live]).max(1)
        assert np.all(d <= 4.001), d.max()
        # with random weights the fine offset is arbitrary in-window, but the
        # coarse assignment must be the identity cell
        cell0 = np.round((k0[live] - d[:, None] * 0 - 3.5) / 8 - 0.001)
        cell1 = np.round((k1[live] - 3.5) / 8)
        # k0 may drift across a cell edge by <=4px; allow off-by-one
        assert np.all(np.abs(cell0 - cell1) <= 1)

    def test_converter_shapes(self, rng):
        # build a torch-style state dict and convert
        sd = {}
        def add_conv(prefix, cin, cout, k):
            sd[f"{prefix}.weight"] = rng.standard_normal(
                (cout, cin, k, k)).astype(np.float32)
        def add_bn(prefix, c):
            sd[f"{prefix}.weight"] = np.ones(c, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(c, np.float32)
        def add_block(prefix, cin, cout, down):
            add_conv(f"{prefix}.conv1", cin, cout, 3)
            add_bn(f"{prefix}.bn1", cout)
            add_conv(f"{prefix}.conv2", cout, cout, 3)
            add_bn(f"{prefix}.bn2", cout)
            if down:
                add_conv(f"{prefix}.downsample.0", cin, cout, 1)
                add_bn(f"{prefix}.downsample.1", cout)
        d1, d2, d3 = lf.BLOCK_DIMS
        add_conv("backbone.conv1", 1, 128, 7)
        add_bn("backbone.bn1", 128)
        add_block("backbone.layer1.0", 128, d1, False)
        add_block("backbone.layer1.1", d1, d1, False)
        add_block("backbone.layer2.0", d1, d2, True)
        add_block("backbone.layer2.1", d2, d2, False)
        add_block("backbone.layer3.0", d2, d3, True)
        add_block("backbone.layer3.1", d3, d3, False)
        add_conv("backbone.layer3_outconv", d3, d3, 1)
        add_conv("backbone.layer2_outconv", d2, d3, 1)
        add_conv("backbone.layer2_outconv2.0", d3, d3, 3)
        add_bn("backbone.layer2_outconv2.1", d3)
        add_conv("backbone.layer2_outconv2.3", d3, d2, 3)
        add_conv("backbone.layer1_outconv", d1, d2, 1)
        add_conv("backbone.layer1_outconv2.0", d2, d2, 3)
        add_bn("backbone.layer1_outconv2.1", d2)
        add_conv("backbone.layer1_outconv2.3", d2, d1, 3)
        def add_enc(prefix, d):
            for n in ("q_proj", "k_proj", "v_proj", "merge"):
                sd[f"{prefix}.{n}.weight"] = rng.standard_normal(
                    (d, d)).astype(np.float32)
            sd[f"{prefix}.mlp.0.weight"] = rng.standard_normal(
                (2 * d, 2 * d)).astype(np.float32)
            sd[f"{prefix}.mlp.2.weight"] = rng.standard_normal(
                (d, 2 * d)).astype(np.float32)
            for n in ("norm1", "norm2"):
                sd[f"{prefix}.{n}.weight"] = np.ones(d, np.float32)
                sd[f"{prefix}.{n}.bias"] = np.zeros(d, np.float32)
        for i in range(8):
            add_enc(f"loftr_coarse.layers.{i}", 256)
        for i in range(2):
            add_enc(f"loftr_fine.layers.{i}", 128)
        sd["fine_preprocess.down_proj.weight"] = rng.standard_normal(
            (128, 256)).astype(np.float32)
        sd["fine_preprocess.down_proj.bias"] = np.zeros(128, np.float32)
        sd["fine_preprocess.merge_feat.weight"] = rng.standard_normal(
            (128, 256)).astype(np.float32)
        sd["fine_preprocess.merge_feat.bias"] = np.zeros(128, np.float32)
        p = lf.convert_torch_weights_loftr(sd)
        img = rng.uniform(0, 1, (32, 32)).astype(np.float32)
        res = lf.loftr_match(p, jnp.asarray(img), jnp.asarray(img),
                             max_matches=16, match_threshold=0.0)
        assert res.kpts0.shape == (16, 2)
