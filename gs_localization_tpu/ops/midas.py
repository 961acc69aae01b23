"""MiDaS monocular depth (v2.1, ResNeXt101-WSL + fusion decoder) in JAX.

The reference regularizes few-shot map training with a frozen MiDaS prior
(torch.hub DPT_Hybrid; /root/reference/gaussian_splatting/utils/
depth_utils.py:1-40, used at gs/7scenes_gs_full_dslam.py:168-206). The loss
is a scale/shift-invariant Pearson correlation, so any MiDaS-family relative
depth works; we implement the v2.1 architecture (MidasNet: ResNeXt101 32x8d
backbone + 256-ch FeatureFusion decoder, non-negative inverse depth) whose
torch layout is standard and convertible without timm internals.

``estimate_depth`` mirrors the reference protocol: resize to 384x512
(bicubic), run the net, resize back (depth_utils.py:15-40). The pipelines
take any ``depth_estimator(rgb) -> depth`` callable; build one with
``make_midas_estimator(params)`` after loading user-supplied
``midas_v21_384.pt`` weights (zero-egress: not bundled).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
# ResNeXt101_32x8d: blocks per stage, width factor 8, groups 32
STAGE_BLOCKS = (3, 4, 23, 3)
STAGE_CH = (256, 512, 1024, 2048)
GROUPS = 32
FEAT = 256


def _conv(x, kernel, stride=1, pad=None, groups=1):
    k = kernel.shape[0]
    if pad is None:
        pad = k // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.float32)


def _bn(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["gamma"] \
        + p["beta"]


def _bottleneck(p, x, stride):
    y = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], 1, pad=0)))
    y = jax.nn.relu(_bn(p["bn2"], _conv(y, p["conv2"], stride,
                                        groups=GROUPS)))
    y = _bn(p["bn3"], _conv(y, p["conv3"], 1, pad=0))
    if "down" in p:
        x = _bn(p["down_bn"], _conv(x, p["down"], stride, pad=0))
    return jax.nn.relu(x + y)


def backbone(p, x):
    """NHWC input -> four stage outputs (1/4 .. 1/32)."""
    x = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], 2, pad=3)))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-np.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    outs = []
    for s, blocks in enumerate(p["layers"]):
        for i, bp in enumerate(blocks):
            x = _bottleneck(bp, x, 2 if (i == 0 and s > 0) else 1)
        outs.append(x)
    return outs


def _residual_conv_unit(p, x):
    y = _conv(jax.nn.relu(x), p["conv1"], 1) + p["b1"]
    y = _conv(jax.nn.relu(y), p["conv2"], 1) + p["b2"]
    return x + y


def _upsample2_align_corners(x):
    """2x bilinear with align_corners=True (torch interpolate semantics in
    MiDaS's FeatureFusionBlock; jax.image.resize only does half-pixel)."""
    n, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, 2 * h)
    xs = jnp.linspace(0.0, w - 1.0, 2 * w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x0 + 1]
    cc = x[:, y0 + 1][:, :, x0]
    d = x[:, y0 + 1][:, :, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + cc * fy * (1 - fx) + d * fy * fx)


def _fusion(p, x, skip=None):
    if skip is not None:
        x = x + _residual_conv_unit(p["rcu1"], skip)
    x = _residual_conv_unit(p["rcu2"], x)
    return _upsample2_align_corners(x)


def midas_forward(params: Dict[str, Any], image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] (H, W % 32 == 0) -> (H, W) inverse depth."""
    x = ((image - _MEAN) / _STD)[None]
    l1, l2, l3, l4 = backbone(params["pretrained"], x)
    s = params["scratch"]
    r1 = _conv(l1, s["layer1_rn"], 1)
    r2 = _conv(l2, s["layer2_rn"], 1)
    r3 = _conv(l3, s["layer3_rn"], 1)
    r4 = _conv(l4, s["layer4_rn"], 1)
    p4 = _fusion(s["refinenet4"], r4)
    p3 = _fusion(s["refinenet3"], p4, r3)
    p2 = _fusion(s["refinenet2"], p3, r2)
    p1 = _fusion(s["refinenet1"], p2, r1)
    y = _conv(p1, s["out1"], 1) + s["out1_b"]
    n, h, w, c = y.shape
    y = jax.image.resize(y, (n, 2 * h, 2 * w, c), "bilinear")
    y = jax.nn.relu(_conv(y, s["out2"], 1) + s["out2_b"])
    y = jax.nn.relu(_conv(y, s["out3"], 1, pad=0) + s["out3_b"])
    return y[0, :, :, 0]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def estimate_depth(params, image: jnp.ndarray, out_h: int, out_w: int):
    """Reference protocol: net at 384x512, bicubic resizes both ways."""
    x = jax.image.resize(image, (384, 512, 3), "cubic")
    d = midas_forward(params, x)
    return jax.image.resize(d, (out_h, out_w), "cubic")


def make_midas_estimator(params):
    """-> depth_estimator callback for pipelines.train_map (host np API)."""
    def estimator(rgb: np.ndarray) -> np.ndarray:
        h, w = rgb.shape[:2]
        return np.asarray(estimate_depth(params, jnp.asarray(rgb), h, w))
    return estimator


# ------------------------------------------------------------- init/convert
def init_params(rng: np.random.Generator,
                stage_blocks=STAGE_BLOCKS) -> Dict[str, Any]:
    def conv(k, cin, cout, groups=1):
        return jnp.asarray((rng.standard_normal((k, k, cin // groups, cout))
                            * np.sqrt(2.0 / (k * k * cin / groups))
                            ).astype(np.float32))

    def bnp(c):
        return {"gamma": jnp.ones(c, jnp.float32),
                "beta": jnp.zeros(c, jnp.float32),
                "mean": jnp.zeros(c, jnp.float32),
                "var": jnp.ones(c, jnp.float32)}

    def bottleneck(cin, cmid, cout, downsample):
        p = {"conv1": conv(1, cin, cmid), "bn1": bnp(cmid),
             "conv2": conv(3, cmid, cmid, GROUPS), "bn2": bnp(cmid),
             "conv3": conv(1, cmid, cout), "bn3": bnp(cout)}
        if downsample:
            p["down"] = conv(1, cin, cout)
            p["down_bn"] = bnp(cout)
        return p

    layers, cin = [], 64
    for s, nb in enumerate(stage_blocks):
        cout = STAGE_CH[s]
        cmid = cout // 2            # resnext 32x8d width
        blocks = [bottleneck(cin, cmid, cout, True)]
        for _ in range(nb - 1):
            blocks.append(bottleneck(cout, cmid, cout, False))
        layers.append(blocks)
        cin = cout

    def rcu():
        return {"conv1": conv(3, FEAT, FEAT),
                "b1": jnp.zeros(FEAT, jnp.float32),
                "conv2": conv(3, FEAT, FEAT),
                "b2": jnp.zeros(FEAT, jnp.float32)}

    scratch = {
        "layer1_rn": conv(3, STAGE_CH[0], FEAT),
        "layer2_rn": conv(3, STAGE_CH[1], FEAT),
        "layer3_rn": conv(3, STAGE_CH[2], FEAT),
        "layer4_rn": conv(3, STAGE_CH[3], FEAT),
        "refinenet1": {"rcu1": rcu(), "rcu2": rcu()},
        "refinenet2": {"rcu1": rcu(), "rcu2": rcu()},
        "refinenet3": {"rcu1": rcu(), "rcu2": rcu()},
        "refinenet4": {"rcu1": rcu(), "rcu2": rcu()},
        "out1": conv(3, FEAT, 128), "out1_b": jnp.zeros(128, jnp.float32),
        "out2": conv(3, 128, 32), "out2_b": jnp.zeros(32, jnp.float32),
        "out3": conv(1, 32, 1), "out3_b": jnp.zeros(1, jnp.float32),
    }
    return {"pretrained": {"conv1": conv(7, 3, 64), "bn1": bnp(64),
                           "layers": layers},
            "scratch": scratch}


def convert_torch_weights_midas(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map the official midas_v21_384.pt state_dict.

    Layout: pretrained.layer{1..4} wrap torchvision resnext101_32x8d_wsl
    (pretrained.layer1 = Sequential(conv1, bn1, relu, maxpool, layer1) in
    MiDaS's _make_resnet_backbone; layers 2-4 are the plain stages);
    scratch.layer{k}_rn, scratch.refinenet{k}.resConfUnit{1,2}.conv{1,2},
    scratch.output_conv.{0,2,4}.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv_t(key):
        return jnp.asarray(sd[key].transpose(2, 3, 1, 0))

    def bn_t(prefix):
        return {"gamma": jnp.asarray(sd[f"{prefix}.weight"]),
                "beta": jnp.asarray(sd[f"{prefix}.bias"]),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                "var": jnp.asarray(sd[f"{prefix}.running_var"])}

    # MiDaS packs stem+stage1 into pretrained.layer1: indices 0=conv1,
    # 1=bn1, 4=layer1 (relu/maxpool hold no params)
    def block(prefix, downsample):
        p = {"conv1": conv_t(f"{prefix}.conv1.weight"),
             "bn1": bn_t(f"{prefix}.bn1"),
             "conv2": conv_t(f"{prefix}.conv2.weight"),
             "bn2": bn_t(f"{prefix}.bn2"),
             "conv3": conv_t(f"{prefix}.conv3.weight"),
             "bn3": bn_t(f"{prefix}.bn3")}
        if downsample:
            p["down"] = conv_t(f"{prefix}.downsample.0.weight")
            p["down_bn"] = bn_t(f"{prefix}.downsample.1")
        return p

    stage_prefix = ["pretrained.layer1.4", "pretrained.layer2",
                    "pretrained.layer3", "pretrained.layer4"]
    layers = []
    for s, nb in enumerate(STAGE_BLOCKS):
        blocks = [block(f"{stage_prefix[s]}.0", True)]
        for i in range(1, nb):
            blocks.append(block(f"{stage_prefix[s]}.{i}", False))
        layers.append(blocks)

    def rcu(prefix):
        return {"conv1": conv_t(f"{prefix}.conv1.weight"),
                "b1": jnp.asarray(sd[f"{prefix}.conv1.bias"]),
                "conv2": conv_t(f"{prefix}.conv2.weight"),
                "b2": jnp.asarray(sd[f"{prefix}.conv2.bias"])}

    scratch = {}
    for k in range(1, 5):
        scratch[f"layer{k}_rn"] = conv_t(f"scratch.layer{k}_rn.weight")
        scratch[f"refinenet{k}"] = {
            "rcu1": rcu(f"scratch.refinenet{k}.resConfUnit1"),
            "rcu2": rcu(f"scratch.refinenet{k}.resConfUnit2")}
    scratch["out1"] = conv_t("scratch.output_conv.0.weight")
    scratch["out1_b"] = jnp.asarray(sd["scratch.output_conv.0.bias"])
    scratch["out2"] = conv_t("scratch.output_conv.2.weight")
    scratch["out2_b"] = jnp.asarray(sd["scratch.output_conv.2.bias"])
    scratch["out3"] = conv_t("scratch.output_conv.4.weight")
    scratch["out3_b"] = jnp.asarray(sd["scratch.output_conv.4.bias"])
    return {"pretrained": {"conv1": conv_t("pretrained.layer1.0.weight"),
                           "bn1": bn_t("pretrained.layer1.1"),
                           "layers": layers},
            "scratch": scratch}
