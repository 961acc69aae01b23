"""MiDaS DPT_Hybrid (R50+ViT-B/16 + DPT decoder) monocular depth in JAX.

The reference's pseudo-depth prior IS DPT_Hybrid
(/root/reference/gaussian_splatting/utils/depth_utils.py:3 loads torch.hub
"intel-isl/MiDaS" "DPT_Hybrid"); ops/midas.py implements the v2.1
convolutional MiDaS as a lighter fallback. This module implements the actual
DPT architecture (published in isl-org/DPT; not vendored in the reference
tree, so parity is against a from-scratch torch twin — tests/test_dpt.py,
the LoFTR standard):

- hybrid backbone: ResNetV2 stem + 3 stages (3, 4, 9 bottlenecks,
  weight-standardized convs + GroupNorm(32), TF-"same" asymmetric padding),
  then a 1x1 patch-embed projection of the /16 feature map into 768-d
  tokens, a cls token, bilinearly resized position embeddings, and 12
  pre-LN ViT-B transformer blocks (12 heads, MLP 3072, GELU);
- taps: ResNet stages 1-2 (/4, /8) and transformer blocks 9 and 12 (token
  maps at /16), the hybrid hook set [0, 1, 8, 11];
- readout: "project" — concatenate the cls token onto every patch token,
  Linear(1536 -> 768) + GELU, reshape to a spatial map; tap 4 adds a
  stride-2 3x3 conv (-> /32);
- decoder ("scratch"): per-tap 3x3 conv to 256 ch, four fusion blocks
  (residual conv units + 2x align-corners upsample + 1x1 out conv), and the
  monodepth head (conv 256->128, 2x upsample, conv 128->32, ReLU, 1x1 -> 1,
  ReLU for non-negative inverse depth).

All heavy math is matmul/conv (MXU). ``estimate_depth`` mirrors the
reference protocol (resize to 384x512, run, resize back,
depth_utils.py:15-40); weights are user-supplied (zero-egress) via
``convert_torch_weights_dpt`` on the official ``dpt_hybrid-midas`` /
torch.hub DPT_Hybrid state dict.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MEAN = np.array([0.5, 0.5, 0.5], np.float32)   # DPT normalization
_STD = np.array([0.5, 0.5, 0.5], np.float32)
EMBED = 768
HEADS = 12
MLP = 3072
FEAT = 256
STAGE_BLOCKS = (3, 4, 9)
STAGE_CH = (256, 512, 1024)
GN_GROUPS = 32
GN_EPS = 1e-5
LN_EPS = 1e-6
WS_EPS = 1e-6          # timm StdConv2d weight-standardization epsilon


# ----------------------------------------------------------- conv helpers --
def _pad_same(h: int, k: int, s: int) -> Tuple[int, int]:
    """TF-'same' padding (timm StdConv2dSame): asymmetric, bottom/right
    heavy."""
    pad = max((-(-h // s) - 1) * s + k - h, 0)
    return pad // 2, pad - pad // 2


def _std_conv(x, w, stride=1, same=True):
    """Weight-standardized conv (HWIO kernel), TF-same padding."""
    mu = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    w = (w - mu) * jax.lax.rsqrt(var + WS_EPS)
    k = w.shape[0]
    ph = _pad_same(x.shape[1], k, stride)
    pw = _pad_same(x.shape[2], k, stride)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), (ph, pw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _conv(x, w, b=None, stride=1, pad=None):
    """Plain conv, symmetric torch-style padding (default k//2)."""
    k = w.shape[0]
    if pad is None:
        pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y if b is None else y + b


def _gn(p, x, act=True):
    """GroupNorm(32) + optional ReLU (timm GroupNormAct)."""
    n, h, w, c = x.shape
    g = GN_GROUPS
    xg = x.reshape(n, h, w, g, c // g)
    mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + GN_EPS)
    y = xg.reshape(n, h, w, c) * p["gamma"] + p["beta"]
    return jax.nn.relu(y) if act else y


def _ln(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * p["gamma"] + p["beta"]


# ------------------------------------------------------------- backbone ----
def _bottleneck_v2(p, x, stride):
    """timm ResNetV2 non-preact bottleneck: StdConv + GN(+ReLU) x3,
    act-free norm3, ReLU after the residual add."""
    sc = x
    if "down_w" in p:
        sc = _gn(p["down_gn"], _std_conv(x, p["down_w"], stride), act=False)
    y = _gn(p["gn1"], _std_conv(x, p["conv1"], 1))
    y = _gn(p["gn2"], _std_conv(y, p["conv2"], stride))
    y = _gn(p["gn3"], _std_conv(y, p["conv3"], 1), act=False)
    return jax.nn.relu(y + sc)


def _maxpool_same(x, k=3, s=2):
    ph = _pad_same(x.shape[1], k, s)
    pw = _pad_same(x.shape[2], k, s)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), ph, pw, (0, 0)))


def resnet_stem_stages(p, x) -> List[jnp.ndarray]:
    """-> [stage0 (/4, 256), stage1 (/8, 512), stage2 (/16, 1024)]."""
    x = _gn(p["stem_gn"], _std_conv(x, p["stem_conv"], 2))
    x = _maxpool_same(x)
    outs = []
    for s, blocks in enumerate(p["stages"]):
        for i, bp in enumerate(blocks):
            x = _bottleneck_v2(bp, x, 2 if (i == 0 and s > 0) else 1)
        outs.append(x)
    return outs


def _attention(p, x):
    """(N, C) tokens, pre-LN multi-head self-attention."""
    n, c = x.shape
    qkv = x @ p["qkv_w"].T + p["qkv_b"]                      # (N, 3C)
    qkv = qkv.reshape(n, 3, HEADS, c // HEADS)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]                # (N, H, D)
    scale = (c // HEADS) ** -0.5
    att = jnp.einsum("nhd,mhd->hnm", q * scale, k)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("hnm,mhd->nhd", att, v).reshape(n, c)
    return y @ p["proj_w"].T + p["proj_b"]


def _vit_block(p, x):
    x = x + _attention(p["attn"], _ln(p["ln1"], x))
    h = _ln(p["ln2"], x)
    h = jax.nn.gelu(h @ p["fc1_w"].T + p["fc1_b"], approximate=False)
    return x + (h @ p["fc2_w"].T + p["fc2_b"])


def _resize_pos_embed(pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """(1, 1 + g0*g0, C) -> (1 + gh*gw, C), grid part bilinearly resized
    (DPT vit.py _resize_pos_embed; align_corners=False)."""
    cls, grid = pos[0, :1], pos[0, 1:]
    g0 = int(round(float(np.sqrt(grid.shape[0]))))
    grid = grid.reshape(g0, g0, -1)
    # antialias=False matches torch F.interpolate(align_corners=False)
    grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]), "bilinear",
                            antialias=False)
    return jnp.concatenate([cls, grid.reshape(gh * gw, -1)], axis=0)


def hybrid_backbone(p, x) -> List[jnp.ndarray]:
    """-> [l1 (/4, 256), l2 (/8, 512), t9 tokens, t12 tokens] (NHWC / (N,C)).

    Token taps are transformer blocks 9 and 12 (hybrid hooks 8, 11)."""
    s0, s1, s2 = resnet_stem_stages(p["resnet"], x)
    n, gh, gw, _ = s2.shape
    tok = _conv(s2, p["embed_w"], p["embed_b"], pad=0)[0].reshape(-1, EMBED)
    tok = jnp.concatenate([p["cls_token"], tok], axis=0)
    tok = tok + _resize_pos_embed(p["pos_embed"], gh, gw)
    taps = []
    for i, bp in enumerate(p["blocks"]):
        tok = _vit_block(bp, tok)
        if i in (8, 11):
            taps.append(tok)
    return [s0, s1, taps[0], taps[1]]


def _project_readout(p, tok, gh, gw):
    """Tokens (1+N, C) -> (1, gh, gw, C): cat cls onto each patch token,
    Linear(2C -> C) + GELU (DPT ProjectReadout)."""
    cls, patches = tok[:1], tok[1:]
    cat = jnp.concatenate(
        [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1)
    y = jax.nn.gelu(cat @ p["w"].T + p["b"], approximate=False)
    return y.reshape(1, gh, gw, EMBED)


# -------------------------------------------------------------- decoder ----
def _upsample2_ac(x):
    """2x bilinear, align_corners=True (torch semantics)."""
    n, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, 2 * h)
    xs = jnp.linspace(0.0, w - 1.0, 2 * w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(h - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(w - 2, 0))
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, jnp.minimum(x0 + 1, w - 1)]
    cc = x[:, jnp.minimum(y0 + 1, h - 1)][:, :, x0]
    d = x[:, jnp.minimum(y0 + 1, h - 1)][:, :, jnp.minimum(x0 + 1, w - 1)]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + cc * fy * (1 - fx) + d * fy * fx)


def _rcu(p, x):
    """ResidualConvUnit_custom (bn=False): relu-conv-relu-conv + skip."""
    y = _conv(jax.nn.relu(x), p["conv1_w"], p["conv1_b"])
    y = _conv(jax.nn.relu(y), p["conv2_w"], p["conv2_b"])
    return x + y


def _fusion(p, x, skip=None):
    """FeatureFusionBlock_custom: optional skip RCU, RCU, 2x up, 1x1 out."""
    if skip is not None:
        x = x + _rcu(p["rcu1"], skip)
    x = _rcu(p["rcu2"], x)
    x = _upsample2_ac(x)
    return _conv(x, p["out_w"], p["out_b"], pad=0)


def dpt_forward(params: Dict[str, Any], image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] (H, W % 32 == 0) -> (H, W) inverse depth."""
    x = ((image - _MEAN) / _STD)[None]
    l1, l2, t3, t4 = hybrid_backbone(params["pretrained"], x)
    gh, gw = l2.shape[1] // 2, l2.shape[2] // 2
    p = params["pretrained"]
    l3 = _conv(_project_readout(p["readout3"], t3, gh, gw),
               p["post3_w"], p["post3_b"], pad=0)
    l4 = _project_readout(p["readout4"], t4, gh, gw)
    l4 = _conv(l4, p["post4a_w"], p["post4a_b"], pad=0)
    l4 = _conv(l4, p["post4b_w"], p["post4b_b"], stride=2)
    s = params["scratch"]
    r1 = _conv(l1, s["layer1_rn"])
    r2 = _conv(l2, s["layer2_rn"])
    r3 = _conv(l3, s["layer3_rn"])
    r4 = _conv(l4, s["layer4_rn"])
    p4 = _fusion(s["refinenet4"], r4)
    p3 = _fusion(s["refinenet3"], p4, r3)
    p2 = _fusion(s["refinenet2"], p3, r2)
    p1 = _fusion(s["refinenet1"], p2, r1)
    y = _conv(p1, s["out1_w"], s["out1_b"])
    y = _upsample2_ac(y)
    y = jax.nn.relu(_conv(y, s["out2_w"], s["out2_b"]))
    y = jax.nn.relu(_conv(y, s["out3_w"], s["out3_b"], pad=0))
    return y[0, :, :, 0]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def estimate_depth(params, image: jnp.ndarray, out_h: int, out_w: int):
    """Reference protocol (depth_utils.py:15-40): 384x512 bicubic in/out."""
    x = jax.image.resize(image, (384, 512, 3), "cubic")
    d = dpt_forward(params, x)
    return jax.image.resize(d, (out_h, out_w), "cubic")


def make_dpt_estimator(params):
    """-> depth_estimator callback for pipelines.train_map (host np API)."""
    def estimator(rgb: np.ndarray) -> np.ndarray:
        h, w = rgb.shape[:2]
        return np.asarray(estimate_depth(params, jnp.asarray(rgb), h, w))
    return estimator


# ------------------------------------------------------------ init/convert -
def init_params(rng: np.random.Generator, depth: int = 12,
                stage_blocks=STAGE_BLOCKS, grid: int = 24) -> Dict[str, Any]:
    """Random-weight params (architecture tests; real use converts hub
    weights). ``depth`` < 12 still taps the LAST two blocks at the hybrid
    hook spacing for small-test speed only when depth == 12; tests should
    use depth=12 with tiny images."""
    def conv(k, cin, cout):
        return jnp.asarray((rng.standard_normal((k, k, cin, cout))
                            * np.sqrt(2.0 / (k * k * cin))).astype(
                                np.float32))

    def gnp(c):
        return {"gamma": jnp.asarray(
                    rng.uniform(0.5, 1.5, c).astype(np.float32)),
                "beta": jnp.asarray(
                    0.1 * rng.standard_normal(c).astype(np.float32))}

    def lin(cin, cout):
        return (jnp.asarray((rng.standard_normal((cout, cin)) *
                             np.sqrt(1.0 / cin)).astype(np.float32)),
                jnp.asarray(0.01 * rng.standard_normal(cout).astype(
                    np.float32)))

    stages, cin = [], 64
    for s, nb in enumerate(stage_blocks):
        cout, cmid = STAGE_CH[s], STAGE_CH[s] // 4
        blocks = []
        for i in range(nb):
            blk = {"conv1": conv(1, cin if i == 0 else cout, cmid),
                   "gn1": gnp(cmid),
                   "conv2": conv(3, cmid, cmid), "gn2": gnp(cmid),
                   "conv3": conv(1, cmid, cout), "gn3": gnp(cout)}
            if i == 0:
                blk["down_w"] = conv(1, cin, cout)
                blk["down_gn"] = gnp(cout)
            blocks.append(blk)
        stages.append(blocks)
        cin = cout

    def vit_block():
        qkv_w, qkv_b = lin(EMBED, 3 * EMBED)
        proj_w, proj_b = lin(EMBED, EMBED)
        fc1_w, fc1_b = lin(EMBED, MLP)
        fc2_w, fc2_b = lin(MLP, EMBED)
        return {"ln1": {"gamma": jnp.ones(EMBED), "beta": jnp.zeros(EMBED)},
                "attn": {"qkv_w": qkv_w, "qkv_b": qkv_b,
                         "proj_w": proj_w, "proj_b": proj_b},
                "ln2": {"gamma": jnp.ones(EMBED), "beta": jnp.zeros(EMBED)},
                "fc1_w": fc1_w, "fc1_b": fc1_b,
                "fc2_w": fc2_w, "fc2_b": fc2_b}

    def readout():
        w, b = lin(2 * EMBED, EMBED)
        return {"w": w, "b": b}

    def rcu():
        return {"conv1_w": conv(3, FEAT, FEAT),
                "conv1_b": jnp.zeros(FEAT, jnp.float32),
                "conv2_w": conv(3, FEAT, FEAT),
                "conv2_b": jnp.zeros(FEAT, jnp.float32)}

    def fusion():
        return {"rcu1": rcu(), "rcu2": rcu(),
                "out_w": conv(1, FEAT, FEAT),
                "out_b": jnp.zeros(FEAT, jnp.float32)}

    pretrained = {
        "resnet": {"stem_conv": conv(7, 3, 64), "stem_gn": gnp(64),
                   "stages": stages},
        "embed_w": conv(1, STAGE_CH[-1], EMBED),
        "embed_b": jnp.zeros(EMBED, jnp.float32),
        "cls_token": jnp.asarray(
            0.02 * rng.standard_normal((1, EMBED)).astype(np.float32)),
        "pos_embed": jnp.asarray(
            0.02 * rng.standard_normal(
                (1, 1 + grid * grid, EMBED)).astype(np.float32)),
        "blocks": [vit_block() for _ in range(depth)],
        "readout3": readout(), "readout4": readout(),
        "post3_w": conv(1, EMBED, EMBED),
        "post3_b": jnp.zeros(EMBED, jnp.float32),
        "post4a_w": conv(1, EMBED, EMBED),
        "post4a_b": jnp.zeros(EMBED, jnp.float32),
        "post4b_w": conv(3, EMBED, EMBED),
        "post4b_b": jnp.zeros(EMBED, jnp.float32),
    }
    scratch = {
        "layer1_rn": conv(3, STAGE_CH[0], FEAT),
        "layer2_rn": conv(3, STAGE_CH[1], FEAT),
        "layer3_rn": conv(3, EMBED, FEAT),
        "layer4_rn": conv(3, EMBED, FEAT),
        "refinenet1": fusion(), "refinenet2": fusion(),
        "refinenet3": fusion(), "refinenet4": fusion(),
        "out1_w": conv(3, FEAT, 128), "out1_b": jnp.zeros(128, jnp.float32),
        "out2_w": conv(3, 128, 32), "out2_b": jnp.zeros(32, jnp.float32),
        "out3_w": conv(1, 32, 1), "out3_b": jnp.zeros(1, jnp.float32),
    }
    return {"pretrained": pretrained, "scratch": scratch}


def convert_torch_weights_dpt(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch.hub DPT_Hybrid (DPTDepthModel) state dict -> JAX params.

    Key layout (isl-org/DPT dpt/vit.py + blocks.py + models.py):
    ``pretrained.model.patch_embed.backbone.{stem,stages.*}``,
    ``pretrained.model.{cls_token,pos_embed,blocks.*}``,
    ``pretrained.act_postprocess{3,4}.{0.project.0,3,4}``,
    ``scratch.{layer*_rn,refinenet*,output_conv.*}``. Hard-asserted shapes.
    """
    sd = {k: np.asarray(
        v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)
        for k, v in state_dict.items()}

    def conv_t(key):
        w = sd[key]
        assert w.ndim == 4, (key, w.shape)
        return jnp.asarray(w.transpose(2, 3, 1, 0))        # OIHW -> HWIO

    def gn_t(prefix):
        return {"gamma": jnp.asarray(sd[f"{prefix}.weight"]),
                "beta": jnp.asarray(sd[f"{prefix}.bias"])}

    bb = "pretrained.model.patch_embed.backbone"
    stages = []
    for s, nb in enumerate(STAGE_BLOCKS):
        blocks = []
        for i in range(nb):
            pre = f"{bb}.stages.{s}.blocks.{i}"
            blk = {"conv1": conv_t(f"{pre}.conv1.weight"),
                   "gn1": gn_t(f"{pre}.norm1"),
                   "conv2": conv_t(f"{pre}.conv2.weight"),
                   "gn2": gn_t(f"{pre}.norm2"),
                   "conv3": conv_t(f"{pre}.conv3.weight"),
                   "gn3": gn_t(f"{pre}.norm3")}
            if f"{pre}.downsample.conv.weight" in sd:
                blk["down_w"] = conv_t(f"{pre}.downsample.conv.weight")
                blk["down_gn"] = gn_t(f"{pre}.downsample.norm")
            blocks.append(blk)
        stages.append(blocks)

    vm = "pretrained.model"
    blocks = []
    i = 0
    while f"{vm}.blocks.{i}.norm1.weight" in sd:
        pre = f"{vm}.blocks.{i}"
        blocks.append({
            "ln1": gn_t(f"{pre}.norm1"),
            "attn": {"qkv_w": jnp.asarray(sd[f"{pre}.attn.qkv.weight"]),
                     "qkv_b": jnp.asarray(sd[f"{pre}.attn.qkv.bias"]),
                     "proj_w": jnp.asarray(sd[f"{pre}.attn.proj.weight"]),
                     "proj_b": jnp.asarray(sd[f"{pre}.attn.proj.bias"])},
            "ln2": gn_t(f"{pre}.norm2"),
            "fc1_w": jnp.asarray(sd[f"{pre}.mlp.fc1.weight"]),
            "fc1_b": jnp.asarray(sd[f"{pre}.mlp.fc1.bias"]),
            "fc2_w": jnp.asarray(sd[f"{pre}.mlp.fc2.weight"]),
            "fc2_b": jnp.asarray(sd[f"{pre}.mlp.fc2.bias"]),
        })
        i += 1
    assert len(blocks) == 12, f"expected 12 ViT blocks, got {len(blocks)}"

    def readout(idx):
        pre = f"pretrained.act_postprocess{idx}.0.project.0"
        return {"w": jnp.asarray(sd[f"{pre}.weight"]),
                "b": jnp.asarray(sd[f"{pre}.bias"])}

    cls = sd[f"{vm}.cls_token"]
    pos = sd[f"{vm}.pos_embed"]
    assert cls.shape == (1, 1, EMBED) and pos.ndim == 3
    pretrained = {
        "resnet": {"stem_conv": conv_t(f"{bb}.stem.conv.weight"),
                   "stem_gn": gn_t(f"{bb}.stem.norm"),
                   "stages": stages},
        "embed_w": conv_t(f"{vm}.patch_embed.proj.weight"),
        "embed_b": jnp.asarray(sd[f"{vm}.patch_embed.proj.bias"]),
        "cls_token": jnp.asarray(cls[0]),
        "pos_embed": jnp.asarray(pos),
        "blocks": blocks,
        "readout3": readout(3), "readout4": readout(4),
        "post3_w": conv_t("pretrained.act_postprocess3.3.weight"),
        "post3_b": jnp.asarray(sd["pretrained.act_postprocess3.3.bias"]),
        "post4a_w": conv_t("pretrained.act_postprocess4.3.weight"),
        "post4a_b": jnp.asarray(sd["pretrained.act_postprocess4.3.bias"]),
        "post4b_w": conv_t("pretrained.act_postprocess4.4.weight"),
        "post4b_b": jnp.asarray(sd["pretrained.act_postprocess4.4.bias"]),
    }

    def rcu(prefix):
        return {"conv1_w": conv_t(f"{prefix}.conv1.weight"),
                "conv1_b": jnp.asarray(sd[f"{prefix}.conv1.bias"]),
                "conv2_w": conv_t(f"{prefix}.conv2.weight"),
                "conv2_b": jnp.asarray(sd[f"{prefix}.conv2.bias"])}

    scratch: Dict[str, Any] = {}
    for k in range(1, 5):
        scratch[f"layer{k}_rn"] = conv_t(f"scratch.layer{k}_rn.weight")
        scratch[f"refinenet{k}"] = {
            "rcu1": rcu(f"scratch.refinenet{k}.resConfUnit1"),
            "rcu2": rcu(f"scratch.refinenet{k}.resConfUnit2"),
            "out_w": conv_t(f"scratch.refinenet{k}.out_conv.weight"),
            "out_b": jnp.asarray(sd[f"scratch.refinenet{k}.out_conv.bias"])}
    for j, name in ((0, "out1"), (2, "out2"), (4, "out3")):
        scratch[f"{name}_w"] = conv_t(f"scratch.output_conv.{j}.weight")
        scratch[f"{name}_b"] = jnp.asarray(
            sd[f"scratch.output_conv.{j}.bias"])
    return {"pretrained": pretrained, "scratch": scratch}
