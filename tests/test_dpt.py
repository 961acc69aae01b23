"""DPT_Hybrid JAX parity vs a from-scratch torch twin.

The reference loads DPT_Hybrid from torch.hub (depth_utils.py:3), not
vendored — the twin reproduces the published DPT architecture (R50+ViT-B/16
hybrid backbone, project readout, fusion decoder) with random weights, the
same standard as LoFTR/NetVLAD parity.
"""

import numpy as np
import pytest

from gs_localization_tpu.ops import dpt

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(p):
    return torch.from_numpy(np.asarray(p)).double()


def _conv_w(p):
    """HWIO -> OIHW torch kernel."""
    return _t(p).permute(3, 2, 0, 1)


def _pad_same(x, k, s):
    ph = dpt._pad_same(x.shape[2], k, s)
    pw = dpt._pad_same(x.shape[3], k, s)
    return F.pad(x, (pw[0], pw[1], ph[0], ph[1]))


def _std_conv(x, w_hwio, stride):
    w = _conv_w(w_hwio)
    mu = w.mean(dim=(1, 2, 3), keepdim=True)
    var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
    w = (w - mu) / torch.sqrt(var + dpt.WS_EPS)
    x = _pad_same(x, w.shape[2], stride)
    return F.conv2d(x, w, stride=stride)


def _gn(p, x, act=True):
    y = F.group_norm(x, dpt.GN_GROUPS, _t(p["gamma"]), _t(p["beta"]),
                     eps=dpt.GN_EPS)
    return F.relu(y) if act else y


def _bottleneck(p, x, stride):
    sc = x
    if "down_w" in p:
        sc = _gn(p["down_gn"], _std_conv(x, p["down_w"], stride), act=False)
    y = _gn(p["gn1"], _std_conv(x, p["conv1"], 1))
    y = _gn(p["gn2"], _std_conv(y, p["conv2"], stride))
    y = _gn(p["gn3"], _std_conv(y, p["conv3"], 1), act=False)
    return F.relu(y + sc)


def _vit_block(p, x):
    def ln(q, v):
        return F.layer_norm(v, (v.shape[-1],), _t(q["gamma"]), _t(q["beta"]),
                            eps=dpt.LN_EPS)

    a = p["attn"]
    h = ln(p["ln1"], x)
    n, c = h.shape
    qkv = (h @ _t(a["qkv_w"]).T + _t(a["qkv_b"])).reshape(
        n, 3, dpt.HEADS, c // dpt.HEADS)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    att = torch.einsum("nhd,mhd->hnm", q * (c // dpt.HEADS) ** -0.5, k)
    att = att.softmax(dim=-1)
    y = torch.einsum("hnm,mhd->nhd", att, v).reshape(n, c)
    x = x + y @ _t(a["proj_w"]).T + _t(a["proj_b"])
    h = ln(p["ln2"], x)
    h = F.gelu(h @ _t(p["fc1_w"]).T + _t(p["fc1_b"]))
    return x + h @ _t(p["fc2_w"]).T + _t(p["fc2_b"])


def _rcu(p, x):
    y = F.conv2d(F.relu(x), _conv_w(p["conv1_w"]), _t(p["conv1_b"]),
                 padding=1)
    y = F.conv2d(F.relu(y), _conv_w(p["conv2_w"]), _t(p["conv2_b"]),
                 padding=1)
    return x + y


def _fusion(p, x, skip=None):
    if skip is not None:
        x = x + _rcu(p["rcu1"], skip)
    x = _rcu(p["rcu2"], x)
    x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
    return F.conv2d(x, _conv_w(p["out_w"]), _t(p["out_b"]))


def _torch_twin(params, img_np):
    x = torch.from_numpy(img_np).permute(2, 0, 1)[None].double()
    x = (x - 0.5) / 0.5
    rp = params["pretrained"]["resnet"]
    x = _gn(rp["stem_gn"], _std_conv(x, rp["stem_conv"], 2))
    x = _pad_same(x, 3, 2)
    x = F.max_pool2d(x, 3, 2)
    outs = []
    for s, blocks in enumerate(rp["stages"]):
        for i, bp in enumerate(blocks):
            x = _bottleneck(bp, x, 2 if (i == 0 and s > 0) else 1)
        outs.append(x)
    s0, s1, s2 = outs
    p = params["pretrained"]
    tok = F.conv2d(s2, _conv_w(p["embed_w"]), _t(p["embed_b"]))
    _, c, gh, gw = tok.shape
    tok = tok.flatten(2).permute(0, 2, 1)[0]               # (N, C)
    tok = torch.cat([_t(p["cls_token"]), tok], dim=0)
    pos = _t(p["pos_embed"])
    cls_pos, grid = pos[0, :1], pos[0, 1:]
    g0 = int(round(float(np.sqrt(grid.shape[0]))))
    grid = grid.reshape(1, g0, g0, -1).permute(0, 3, 1, 2)
    grid = F.interpolate(grid, size=(gh, gw), mode="bilinear",
                         align_corners=False)
    grid = grid.permute(0, 2, 3, 1).reshape(gh * gw, -1)
    tok = tok + torch.cat([cls_pos, grid], dim=0)
    taps = []
    for i, bp in enumerate(p["blocks"]):
        tok = _vit_block(bp, tok)
        if i in (8, 11):
            taps.append(tok)

    def readout(rp_, t):
        cls, patches = t[:1], t[1:]
        cat = torch.cat([patches, cls.expand_as(patches)], dim=-1)
        y = F.gelu(cat @ _t(rp_["w"]).T + _t(rp_["b"]))
        return y.reshape(1, gh, gw, -1).permute(0, 3, 1, 2)

    l3 = F.conv2d(readout(p["readout3"], taps[0]), _conv_w(p["post3_w"]),
                  _t(p["post3_b"]))
    l4 = readout(p["readout4"], taps[1])
    l4 = F.conv2d(l4, _conv_w(p["post4a_w"]), _t(p["post4a_b"]))
    l4 = F.conv2d(l4, _conv_w(p["post4b_w"]), _t(p["post4b_b"]), stride=2,
                  padding=1)
    sc = params["scratch"]
    r1 = F.conv2d(s0, _conv_w(sc["layer1_rn"]), padding=1)
    r2 = F.conv2d(s1, _conv_w(sc["layer2_rn"]), padding=1)
    r3 = F.conv2d(l3, _conv_w(sc["layer3_rn"]), padding=1)
    r4 = F.conv2d(l4, _conv_w(sc["layer4_rn"]), padding=1)
    p4 = _fusion(sc["refinenet4"], r4)
    p3 = _fusion(sc["refinenet3"], p4, r3)
    p2 = _fusion(sc["refinenet2"], p3, r2)
    p1 = _fusion(sc["refinenet1"], p2, r1)
    y = F.conv2d(p1, _conv_w(sc["out1_w"]), _t(sc["out1_b"]), padding=1)
    y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=True)
    y = F.relu(F.conv2d(y, _conv_w(sc["out2_w"]), _t(sc["out2_b"]),
                        padding=1))
    y = F.relu(F.conv2d(y, _conv_w(sc["out3_w"]), _t(sc["out3_b"])))
    return y[0, 0].numpy()


class TestDPT:
    @pytest.fixture()
    def rng(self):
        return np.random.default_rng(3)

    def test_parity_vs_torch_twin(self, rng):
        params = dpt.init_params(rng)
        img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
        ours = np.asarray(dpt.dpt_forward(params, img))
        ref = _torch_twin(params, img.astype(np.float64))
        assert ours.shape == (64, 96)
        assert ref.shape == (64, 96)
        scale = max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-4)

    def test_converter_roundtrip(self, rng):
        """Hub-style flat state dict -> converter -> same output."""
        params = dpt.init_params(rng)
        sd = {}
        bb = "pretrained.model.patch_embed.backbone"
        rp = params["pretrained"]["resnet"]

        def put_conv(key, w_hwio):
            sd[key] = np.asarray(w_hwio).transpose(3, 2, 0, 1)

        def put_gn(prefix, p):
            sd[f"{prefix}.weight"] = np.asarray(p["gamma"])
            sd[f"{prefix}.bias"] = np.asarray(p["beta"])

        put_conv(f"{bb}.stem.conv.weight", rp["stem_conv"])
        put_gn(f"{bb}.stem.norm", rp["stem_gn"])
        for s, blocks in enumerate(rp["stages"]):
            for i, blk in enumerate(blocks):
                pre = f"{bb}.stages.{s}.blocks.{i}"
                for ci in (1, 2, 3):
                    put_conv(f"{pre}.conv{ci}.weight", blk[f"conv{ci}"])
                    put_gn(f"{pre}.norm{ci}", blk[f"gn{ci}"])
                if "down_w" in blk:
                    put_conv(f"{pre}.downsample.conv.weight", blk["down_w"])
                    put_gn(f"{pre}.downsample.norm", blk["down_gn"])
        vm = "pretrained.model"
        p = params["pretrained"]
        put_conv(f"{vm}.patch_embed.proj.weight", p["embed_w"])
        sd[f"{vm}.patch_embed.proj.bias"] = np.asarray(p["embed_b"])
        sd[f"{vm}.cls_token"] = np.asarray(p["cls_token"])[None]
        sd[f"{vm}.pos_embed"] = np.asarray(p["pos_embed"])
        for i, blk in enumerate(p["blocks"]):
            pre = f"{vm}.blocks.{i}"
            put_gn(f"{pre}.norm1", blk["ln1"])
            put_gn(f"{pre}.norm2", blk["ln2"])
            a = blk["attn"]
            sd[f"{pre}.attn.qkv.weight"] = np.asarray(a["qkv_w"])
            sd[f"{pre}.attn.qkv.bias"] = np.asarray(a["qkv_b"])
            sd[f"{pre}.attn.proj.weight"] = np.asarray(a["proj_w"])
            sd[f"{pre}.attn.proj.bias"] = np.asarray(a["proj_b"])
            sd[f"{pre}.mlp.fc1.weight"] = np.asarray(blk["fc1_w"])
            sd[f"{pre}.mlp.fc1.bias"] = np.asarray(blk["fc1_b"])
            sd[f"{pre}.mlp.fc2.weight"] = np.asarray(blk["fc2_w"])
            sd[f"{pre}.mlp.fc2.bias"] = np.asarray(blk["fc2_b"])
        for idx, key in ((3, "readout3"), (4, "readout4")):
            pre = f"pretrained.act_postprocess{idx}.0.project.0"
            sd[f"{pre}.weight"] = np.asarray(p[key]["w"])
            sd[f"{pre}.bias"] = np.asarray(p[key]["b"])
        put_conv("pretrained.act_postprocess3.3.weight", p["post3_w"])
        sd["pretrained.act_postprocess3.3.bias"] = np.asarray(p["post3_b"])
        put_conv("pretrained.act_postprocess4.3.weight", p["post4a_w"])
        sd["pretrained.act_postprocess4.3.bias"] = np.asarray(p["post4a_b"])
        put_conv("pretrained.act_postprocess4.4.weight", p["post4b_w"])
        sd["pretrained.act_postprocess4.4.bias"] = np.asarray(p["post4b_b"])
        s = params["scratch"]
        for k in range(1, 5):
            put_conv(f"scratch.layer{k}_rn.weight", s[f"layer{k}_rn"])
            fn = s[f"refinenet{k}"]
            for rn, rcu in (("resConfUnit1", "rcu1"), ("resConfUnit2",
                                                       "rcu2")):
                put_conv(f"scratch.refinenet{k}.{rn}.conv1.weight",
                         fn[rcu]["conv1_w"])
                sd[f"scratch.refinenet{k}.{rn}.conv1.bias"] = np.asarray(
                    fn[rcu]["conv1_b"])
                put_conv(f"scratch.refinenet{k}.{rn}.conv2.weight",
                         fn[rcu]["conv2_w"])
                sd[f"scratch.refinenet{k}.{rn}.conv2.bias"] = np.asarray(
                    fn[rcu]["conv2_b"])
            put_conv(f"scratch.refinenet{k}.out_conv.weight", fn["out_w"])
            sd[f"scratch.refinenet{k}.out_conv.bias"] = np.asarray(
                fn["out_b"])
        for j, name in ((0, "out1"), (2, "out2"), (4, "out3")):
            put_conv(f"scratch.output_conv.{j}.weight", s[f"{name}_w"])
            sd[f"scratch.output_conv.{j}.bias"] = np.asarray(s[f"{name}_b"])

        conv = dpt.convert_torch_weights_dpt(sd)
        img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        a = np.asarray(dpt.dpt_forward(params, img))
        b = np.asarray(dpt.dpt_forward(conv, img))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_estimator_protocol(self, rng):
        """estimate_depth resizes through 384x512 and back (tiny check via
        the estimator callback wrapper)."""
        params = dpt.init_params(rng)
        est = dpt.make_dpt_estimator(params)
        out = est(rng.uniform(0, 1, (96, 128, 3)).astype(np.float32))
        assert out.shape == (96, 128)
        assert np.all(np.isfinite(out))
        # net output is ReLU-non-negative; the bicubic resize back may ring
        # slightly below zero (the reference does not clamp either,
        # depth_utils.py:25-33)
        assert float(out.min()) > -0.1 * float(np.abs(out).max())
