"""D2-Net detect-and-describe features in JAX.

Re-implements hloc's ``d2net-ss`` extractor (single-scale path of
/root/reference/hloc/extractors/d2net.py; architecture
/root/reference/hloc/third_party/d2net/lib/model_test.py): a VGG16 stack
truncated at conv4_3 (dilated conv4 block after a stride-1 average pool),
hard detection (channel-wise max ∧ 3x3 local max ∧ Hessian edge test with
edge_threshold=5), handcrafted sub-pixel localization via an inverse-Hessian
step, and bilinear descriptor sampling (coordinate mapping
pyramid.py:91,100-101 with upscale_positions' x*2+0.5 per scaling step).

TPU-first: detection/localization are pure stencil ops (XLA fuses them); the
variable-count nonzero() of the reference becomes a fixed-capacity top-k over
the masked score map, so one jit covers extract end to end.

Weights are NOT bundled (zero-egress); ``convert_torch_weights_d2net`` maps
the official ``d2_tf.pth`` state_dict (keys
``dense_feature_extraction.model.{i}.*``) onto this module.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .features import Features

# model_test.py Sequential indices of the 10 convs (pool/relu interleaved)
TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)
CONV_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512)
# pools BEFORE conv i: maxpool2x2/2 before convs 2 and 4; avgpool2x2/1
# before conv 7; convs 7-9 are dilation 2
MAXPOOL_BEFORE = (False, False, True, False, True, False, False, False,
                  False, False)
AVGPOOL_BEFORE = (False, False, False, False, False, False, False, True,
                  False, False)
DILATION = (1, 1, 1, 1, 1, 1, 1, 2, 2, 2)
EDGE_THRESHOLD = 5.0
_BGR_MEAN = np.array([103.939, 116.779, 123.68], np.float32)


def _conv3x3(x, kernel, bias, dilation=1):
    pad = dilation
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + bias


def dense_features(params: List[Dict[str, jnp.ndarray]], image: jnp.ndarray,
                   use_relu: bool = True) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] -> (H/4, W/4, 512) caffe-style features."""
    x = image[..., ::-1] * 255.0 - _BGR_MEAN          # RGB -> BGR, caffe norm
    x = x[None]
    for i in range(len(CONV_CHANNELS)):
        if MAXPOOL_BEFORE[i]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        if AVGPOOL_BEFORE[i]:
            s = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "VALID")
            x = s / 4.0
        p = params[i]
        x = _conv3x3(x, p["kernel"], p["bias"], DILATION[i])
        if i < len(CONV_CHANNELS) - 1:
            x = jax.nn.relu(x)
    if use_relu:
        x = jax.nn.relu(x)
    return x[0]


def _stencil(f: jnp.ndarray, kernel3: np.ndarray) -> jnp.ndarray:
    """Per-channel 3x3 stencil with zero padding ((H,W,C) -> (H,W,C))."""
    k = jnp.asarray(kernel3, jnp.float32)[:, :, None, None]
    c = f.shape[-1]
    return jax.lax.conv_general_dilated(
        f[None], jnp.tile(k, (1, 1, 1, c)), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.float32)[0]


_DII = np.array([[0, 1, 0], [0, -2, 0], [0, 1, 0]], np.float32)
_DIJ = 0.25 * np.array([[1, 0, -1], [0, 0, 0], [-1, 0, 1]], np.float32)
_DJJ = np.array([[0, 0, 0], [1, -2, 1], [0, 0, 0]], np.float32)
_DI = np.array([[0, -0.5, 0], [0, 0, 0], [0, 0.5, 0]], np.float32)
_DJ = np.array([[0, 0, 0], [-0.5, 0, 0.5], [0, 0, 0]], np.float32)


def hard_detection(f: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, C) bool detection mask (model_test.py:81-133)."""
    depth_max = f == jnp.max(f, axis=-1, keepdims=True)
    local = jax.lax.reduce_window(
        f, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME")
    local_max = f == local
    dii, dij, djj = _stencil(f, _DII), _stencil(f, _DIJ), _stencil(f, _DJJ)
    det = dii * djj - dij * dij
    tr = dii + djj
    thr = (EDGE_THRESHOLD + 1) ** 2 / EDGE_THRESHOLD
    not_edge = (tr * tr / det <= thr) & (det > 0)
    return depth_max & local_max & not_edge


def localization(f: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, C, 2) inverse-Hessian displacement (i, j)."""
    dii, dij, djj = _stencil(f, _DII), _stencil(f, _DIJ), _stencil(f, _DJJ)
    det = dii * djj - dij * dij
    di, dj = _stencil(f, _DI), _stencil(f, _DJ)
    step_i = -(djj * di - dij * dj) / det
    step_j = -(-dij * di + dii * dj) / det
    return jnp.stack([step_i, step_j], -1)


@functools.partial(jax.jit, static_argnames=("num_keypoints", "use_relu"))
def extract_d2net(params, image: jnp.ndarray, num_keypoints: int = 1024,
                  use_relu: bool = True) -> Features:
    """Single-scale D2-Net extraction (pyramid.py scales=[1] path)."""
    f = dense_features(params, image, use_relu)       # (h, w, 512)
    h, w, c = f.shape
    detected = hard_detection(f)
    disp = localization(f)
    ok = (detected & (jnp.abs(disp[..., 0]) < 0.5)
          & (jnp.abs(disp[..., 1]) < 0.5))
    # reference score: raw feature value at the detection (pyramid.py:105-107)
    score = jnp.where(ok & jnp.isfinite(disp).all(-1), f, -jnp.inf)
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, num_keypoints)
    ci = idx % c
    ji = (idx // c) % w
    ii = idx // (c * w)
    d_i = disp.reshape(-1, 2)[idx]
    fi = ii.astype(jnp.float32) + d_i[:, 0]
    fj = ji.astype(jnp.float32) + d_i[:, 1]

    # bilinear descriptor sampling at fmap positions
    i0 = jnp.clip(jnp.floor(fi), 0, h - 2).astype(jnp.int32)
    j0 = jnp.clip(jnp.floor(fj), 0, w - 2).astype(jnp.int32)
    ti = jnp.clip(fi - i0, 0.0, 1.0)[:, None]
    tj = jnp.clip(fj - j0, 0.0, 1.0)[:, None]
    d00, d01 = f[i0, j0], f[i0, j0 + 1]
    d10, d11 = f[i0 + 1, j0], f[i0 + 1, j0 + 1]
    desc = (d00 * (1 - ti) * (1 - tj) + d01 * (1 - ti) * tj
            + d10 * ti * (1 - tj) + d11 * ti * tj)
    desc = desc * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(desc * desc, -1, keepdims=True), 1e-12))

    # fmap -> image coords: two upscale steps (x*2+0.5 each => 4x + 1.5)
    valid = jnp.isfinite(vals)
    xs = fj * 4.0 + 1.5
    ys = fi * 4.0 + 1.5
    return Features(
        keypoints=jnp.where(valid[:, None], jnp.stack([xs, ys], 1), -1.0),
        scores=jnp.where(valid, vals, 0.0),
        descriptors=jnp.where(valid[:, None], desc, 0.0),
    )


def init_params(rng: np.random.Generator) -> List[Dict[str, jnp.ndarray]]:
    params, cin = [], 3
    for cout in CONV_CHANNELS:
        k = (rng.standard_normal((3, 3, cin, cout)) *
             np.sqrt(2.0 / (9 * cin))).astype(np.float32)
        params.append({"kernel": jnp.asarray(k),
                       "bias": jnp.zeros(cout, jnp.float32)})
        cin = cout
    return params


def convert_torch_weights_d2net(state_dict: Dict[str, Any]
                                ) -> List[Dict[str, jnp.ndarray]]:
    """Map the official d2_tf.pth ('model' sub-dict or flat) state_dict."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = []
    for i in TORCH_CONV_IDX:
        for prefix in (f"dense_feature_extraction.model.{i}", f"model.{i}"):
            if f"{prefix}.weight" in sd:
                w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
                params.append({
                    "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(b)})
                break
        else:
            raise KeyError(f"missing conv {i} in state dict")
    return params
