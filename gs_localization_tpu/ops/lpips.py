"""LPIPS (Learned Perceptual Image Patch Similarity) in pure JAX.

Re-implements the reference's vendored ``lpipsPyTorch`` (richzhang v0.1
design; /root/reference/gaussian_splatting/lpipsPyTorch/modules/lpips.py):
a frozen VGG16 feature stack tapped after relu1_2/relu2_2/relu3_3/relu4_3/
relu5_3, channel-unit-normalized activations, squared diffs weighted by 1x1
"lin" convolutions, spatially averaged and summed across taps. The metric is
used by the reference's render-quality eval (gaussian_splatting/metrics.py:74,
net_type='vgg').

Input convention matches the reference exactly: images in [0, 1], shift/scale
constants (-.030,-.088,-.188)/(.458,.448,.450) applied directly (the
reference feeds [0,1] tensors to the v0.1 scaling layer; we reproduce that
behavior bit-for-bit rather than "fixing" it — lpips.py:30-36, networks.py:41-51).

Weights are NOT bundled (zero-egress): ``convert_torch_weights_lpips`` maps
torchvision's ``vgg16().features`` state_dict plus the richzhang
``vgg.pth`` lin weights onto this module. Architecture correctness is tested
against a from-scratch torch twin with random weights (tests/test_lpips.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features layout: 'C'=3x3 conv (+ReLU), 'P'=2x2 maxpool.
VGG16_LAYOUT: Sequence = (
    ("C", 64), ("C", 64), ("P",),
    ("C", 128), ("C", 128), ("P",),
    ("C", 256), ("C", 256), ("C", 256), ("P",),
    ("C", 512), ("C", 512), ("C", 512), ("P",),
    ("C", 512), ("C", 512), ("C", 512),
)
# taps AFTER the ReLU of these conv indices (0-based over the conv list):
# conv1_2, conv2_2, conv3_3, conv4_3, conv5_3.
VGG16_TAPS = (1, 3, 6, 9, 12)
VGG16_TAP_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray):
    """NHWC 3x3 same-padding convolution (MXU path)."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + bias


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_tapped_features(params: List[Dict[str, jnp.ndarray]],
                          image: jnp.ndarray) -> List[jnp.ndarray]:
    """Unit-normalized tap activations for an (H, W, 3) image in [0, 1]."""
    x = (image - _SHIFT) / _SCALE
    x = x[None]
    taps, conv_i = [], 0
    for entry in VGG16_LAYOUT:
        if entry[0] == "P":
            x = _maxpool2(x)
            continue
        p = params[conv_i]
        x = jax.nn.relu(_conv3x3(x, p["kernel"], p["bias"]))
        if conv_i in VGG16_TAPS:
            norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
            taps.append(x / (norm + 1e-10))
        conv_i += 1
    return taps


def lpips(params: Dict[str, Any], x: jnp.ndarray, y: jnp.ndarray):
    """LPIPS distance between two (H, W, 3) images in [0, 1].

    params = {"features": [{"kernel","bias"}, ...13 convs],
              "lin": [(C_tap,) nonneg weights per tap]}.
    """
    fx = vgg16_tapped_features(params["features"], x)
    fy = vgg16_tapped_features(params["features"], y)
    total = jnp.zeros((), jnp.float32)
    for tx, ty, w in zip(fx, fy, params["lin"]):
        d = (tx - ty) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def init_params(rng: np.random.Generator) -> Dict[str, Any]:
    """Random-weight params (architecture tests / smoke use)."""
    feats, cin = [], 3
    for entry in VGG16_LAYOUT:
        if entry[0] == "P":
            continue
        cout = entry[1]
        k = (rng.standard_normal((3, 3, cin, cout)) *
             np.sqrt(2.0 / (9 * cin))).astype(np.float32)
        feats.append({"kernel": jnp.asarray(k),
                      "bias": jnp.asarray(np.zeros(cout, np.float32))})
        cin = cout
    lin = [jnp.asarray(rng.uniform(0, 0.1, c).astype(np.float32))
           for c in VGG16_TAP_CHANNELS]
    return {"features": feats, "lin": lin}


def convert_torch_weights_lpips(vgg_features_sd: Dict[str, Any],
                                lin_sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map torchvision ``vgg16().features.state_dict()`` + richzhang lin
    weights (keys ``0.1.weight``..``4.1.weight`` or ``lin0.model.1.weight``)
    onto this module.

    torch convs store (out, in, kh, kw); we want (kh, kw, in, out).
    """
    # torchvision features module indices of the 13 convs
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    feats = []
    for i in conv_idx:
        w = np.asarray(vgg_features_sd[f"{i}.weight"])
        b = np.asarray(vgg_features_sd[f"{i}.bias"])
        feats.append({"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                      "bias": jnp.asarray(b)})
    lin = []
    for t in range(5):
        for key in (f"{t}.1.weight", f"lin{t}.model.1.weight",
                    f"lin{t}.1.weight"):
            if key in lin_sd:
                w = np.asarray(lin_sd[key])  # (1, C, 1, 1)
                lin.append(jnp.asarray(w.reshape(-1)))
                break
        else:
            raise KeyError(f"missing lin weight for tap {t}")
    return {"features": feats, "lin": lin}
