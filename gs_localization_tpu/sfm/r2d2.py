"""R2D2 (reliable & repeatable) features in JAX.

Re-implements hloc's R2D2 extractor (/root/reference/hloc/extractors/
r2d2.py; architecture Quad_L2Net_ConfCFS, /root/reference/hloc/third_party/
r2d2/nets/patchnet.py:93-120): a fully-convolutional dilated L2-Net (every
"stride" becomes a dilation doubling, so the output is full resolution) with
128-d L2-normalized descriptors, a 2-class reliability head (softmax[1]) and
a softplus repeatability head x/(1+x); detection is a 3x3 local-max NMS on
repeatability with the reference thresholds (rel 0.7 / rep 0.7,
hloc extractor conf).

TPU-first: the whole net is stride-1 dilated convs (perfectly static shapes);
detection + top-k replaces the reference's nonzero() with fixed capacity.
Single-scale extraction (the pyramid loop of extract.py is host-side resizing
around this same function).

Weights are NOT bundled; ``convert_torch_weights_r2d2`` maps the official
``r2d2_WASF_N16.pt`` checkpoint (BatchNorm affine=False -> running stats
only) onto this module.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .features import Features

# (out_ch, kernel, dilation, has_bn, has_relu) per conv, dilated mode
PLAN = (
    (32, 3, 1, True, True),
    (32, 3, 1, True, True),
    (64, 3, 1, True, True),     # "stride 2" -> dilation doubles after
    (64, 3, 2, True, True),
    (128, 3, 2, True, True),    # dilation doubles after
    (128, 3, 4, True, True),
    (128, 2, 4, True, False),   # 2x2 convs replacing the 8x8 (relu22=False)
    (128, 2, 8, True, False),
    (128, 2, 16, False, False),
)
# torch ops.{i} module index of each conv (bn/relu are separate modules)
TORCH_OPS_IDX = (0, 3, 6, 9, 12, 15, 18, 20, 22)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv(x, kernel, bias, k, dilation):
    pad = ((k - 1) * dilation) // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + bias


def _bn(p, x, eps=1e-5):
    """affine=False batchnorm: running stats only."""
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)


def r2d2_forward(params: Dict[str, Any], image: jnp.ndarray):
    """(H, W, 3) RGB in [0, 1] -> (desc (H,W,128), reliability (H,W),
    repeatability (H,W))."""
    x = ((image - _MEAN) / _STD)[None]
    for i, (_, k, d, has_bn, has_relu) in enumerate(PLAN):
        p = params["convs"][i]
        x = _conv(x, p["kernel"], p["bias"], k, d)
        if has_bn:
            x = _bn(p["bn"], x)
        if has_relu:
            x = jax.nn.relu(x)
    x = x[0]
    desc = x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-24))
    # the confidence heads run on the SQUARED features
    # (patchnet.py:122-128: clf(x**2) / sal(x**2))
    xsq = (x * x)[None]
    clf = _conv(xsq, params["clf"]["kernel"], params["clf"]["bias"],
                1, 1)[0]
    rel = jax.nn.softmax(clf, axis=-1)[..., 1]
    sal = _conv(xsq, params["sal"]["kernel"], params["sal"]["bias"],
                1, 1)[0, ..., 0]
    sp = jax.nn.softplus(sal)
    rep = sp / (1.0 + sp)
    return desc, rel, rep


@functools.partial(jax.jit, static_argnames=("num_keypoints",))
def extract_r2d2(params, image: jnp.ndarray, num_keypoints: int = 1024,
                 reliability_threshold: float = 0.7,
                 repeatability_threshold: float = 0.7) -> Features:
    """Single-scale R2D2 extraction with NMS (extract.py NonMaxSuppression)."""
    desc, rel, rep = r2d2_forward(params, image)
    h, w = rep.shape
    local = jax.lax.reduce_window(
        rep, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    keep = ((rep == local) & (rep >= repeatability_threshold)
            & (rel >= reliability_threshold))
    score = jnp.where(keep, rel * rep, -jnp.inf)
    vals, idx = jax.lax.top_k(score.reshape(-1), num_keypoints)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    d = desc.reshape(-1, 128)[idx]
    valid = jnp.isfinite(vals)
    return Features(
        keypoints=jnp.where(valid[:, None], jnp.stack([xs, ys], 1), -1.0),
        scores=jnp.where(valid, vals, 0.0),
        descriptors=jnp.where(valid[:, None], d, 0.0),
    )


def init_params(rng: np.random.Generator) -> Dict[str, Any]:
    convs, cin = [], 3
    for cout, k, _, has_bn, _ in PLAN:
        p = {"kernel": jnp.asarray(
                 (rng.standard_normal((k, k, cin, cout)) *
                  np.sqrt(2.0 / (k * k * cin))).astype(np.float32)),
             "bias": jnp.zeros(cout, jnp.float32)}
        if has_bn:
            p["bn"] = {"mean": jnp.zeros(cout, jnp.float32),
                       "var": jnp.ones(cout, jnp.float32)}
        convs.append(p)
        cin = cout
    def head(cout):
        return {"kernel": jnp.asarray(
                    0.1 * rng.standard_normal((1, 1, 128, cout)
                                              ).astype(np.float32)),
                "bias": jnp.zeros(cout, jnp.float32)}
    return {"convs": convs, "clf": head(2), "sal": head(1)}


def convert_torch_weights_r2d2(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map the official r2d2 checkpoint ({'state_dict': ...} or flat)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    convs = []
    for i, (_, _, _, has_bn, _) in zip(TORCH_OPS_IDX, PLAN):
        w = sd[f"ops.{i}.weight"]
        p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
             "bias": jnp.asarray(sd[f"ops.{i}.bias"])}
        if has_bn:
            p["bn"] = {"mean": jnp.asarray(sd[f"ops.{i + 1}.running_mean"]),
                       "var": jnp.asarray(sd[f"ops.{i + 1}.running_var"])}
        convs.append(p)
    return {
        "convs": convs,
        "clf": {"kernel": jnp.asarray(
                    sd["clf.weight"].transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(sd["clf.bias"])},
        "sal": {"kernel": jnp.asarray(
                    sd["sal.weight"].transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(sd["sal.bias"])},
    }


def load_r2d2(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    # official checkpoints carry a DataParallel 'module.' prefix
    # (r2d2/extract.py:25)
    return convert_torch_weights_r2d2(
        {k.replace("module.", ""): v.numpy() for k, v in sd.items()})
