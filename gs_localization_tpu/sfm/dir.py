"""DIR (deep image retrieval, ResNet-AP-GeM) global descriptor in JAX.

Re-implements hloc's DIR extractor (/root/reference/hloc/extractors/dir.py,
default conf Resnet-101-AP-GeM + Landmarks_clean PCA whitening), whose net is
vendored at /root/reference/hloc/third_party/deep-image-retrieval:

- backbone: standard ResNet (dirtorch/nets/backbones/resnet.py) — conv7x7/2,
  BN, ReLU, maxpool3x3/2, four bottleneck stages; resnet101 = [3, 4, 23, 3]
  Bottleneck blocks (rmac_resnet.py:84-86), resnet18 = [2, 2, 2, 2]
  BasicBlock;
- head (ResNet_RMAC.forward, rmac_resnet.py:39-70): GeM pooling with
  learnable exponent p (layers/pooling.py:38-55 —
  avgpool(clamp(x, 1e-6)^p)^(1/p)), FC 2048->2048, L2 normalize;
- input normalization: ImageNet mean/std (backbones/resnet.py:110-111,
  applied by the hloc wrapper extractors/dir.py:62-66);
- optional PCA whitening (utils/common.py:221-240):
  (d - mean) @ components[:v].T / (m * var[:v]^p'), then L2 — hloc uses
  whitenp=0.25, whitenv=None (all components), whitenm=1.0.

All heavy math is convs/matmuls (MXU). Parity is tested against the VENDORED
dirtorch modules loaded directly (tests/test_dir.py), not a hand-written
twin.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)
BN_EPS = 1e-5
GEM_EPS = 1e-6

# block-structure table: name -> (block kind, stage depths)
ARCHS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _conv(x, w, stride=1, pad=None):
    """NHWC conv with torch OIHW kernels, explicit symmetric padding."""
    k = w.shape[-1]
    if pad is None:
        pad = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn(x, p):
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"]) * (inv * p["scale"]) + p["bias"]


def _basic_block(p: Dict[str, Any], x):
    r = x
    y = jax.nn.relu(_bn(_conv(x, p["conv1"], stride=p["stride"]), p["bn1"]))
    y = _bn(_conv(y, p["conv2"]), p["bn2"])
    if "down_w" in p:
        r = _bn(_conv(x, p["down_w"], stride=p["stride"], pad=0), p["down_bn"])
    return jax.nn.relu(y + r)


def _bottleneck_block(p: Dict[str, Any], x):
    r = x
    y = jax.nn.relu(_bn(_conv(x, p["conv1"], pad=0), p["bn1"]))
    y = jax.nn.relu(_bn(_conv(y, p["conv2"], stride=p["stride"]), p["bn2"]))
    y = _bn(_conv(y, p["conv3"], pad=0), p["bn3"])
    if "down_w" in p:
        r = _bn(_conv(x, p["down_w"], stride=p["stride"], pad=0), p["down_bn"])
    return jax.nn.relu(y + r)


def _maxpool3_2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def backbone_forward(params: Dict[str, Any], image: jnp.ndarray
                     ) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] -> (h, w, C) final-stage feature map."""
    x = (jnp.asarray(image, jnp.float32) - RGB_MEAN) / RGB_STD
    x = x[None]
    x = jax.nn.relu(_bn(_conv(x, params["conv1"], stride=2), params["bn1"]))
    x = _maxpool3_2(x)
    block = (_bottleneck_block if params["block"] == "bottleneck"
             else _basic_block)
    for stage in params["layers"]:
        for blk in stage:
            x = block(blk, x)
    return x[0]


def gem_pool(x: jnp.ndarray, p) -> jnp.ndarray:
    """(h, w, C) -> (C,) generalized-mean pooling (pooling.py:38-55)."""
    xp = jnp.power(jnp.maximum(x, GEM_EPS), p)
    return jnp.power(jnp.mean(xp, axis=(0, 1)), 1.0 / p)


def dir_descriptor(params: Dict[str, Any], image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] -> (D,) L2-normalized global descriptor."""
    feat = backbone_forward(params, image)
    d = gem_pool(feat, params["gemp"])
    d = d @ params["fc_w"].T + params["fc_b"]
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
    if params.get("pca") is not None:
        d = whiten(d[None], params["pca"])[0]
    return d


def whiten(x: jnp.ndarray, pca: Dict[str, Any], whitenp: float = 0.25,
           whitenv: Optional[int] = None, whitenm: float = 1.0
           ) -> jnp.ndarray:
    """PCA-whiten rows of (B, D) (dirtorch utils/common.py:221-240)."""
    x = x - pca["mean"]
    comp = pca["components"][:whitenv]
    y = x @ comp.T
    if pca.get("whiten", True):
        y = y / (whitenm * jnp.power(pca["variance"][:whitenv], whitenp))
    return y / jnp.maximum(
        jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)


# ------------------------------------------------------------- converter ---
def convert_torch_weights_dir(state_dict: Dict[str, Any],
                              arch: str = "resnet101",
                              pca: Optional[Dict[str, Any]] = None
                              ) -> Dict[str, Any]:
    """dirtorch ``ResNet_RMAC`` state dict -> JAX params.

    Key layout (backbones/resnet.py + rmac_resnet.py): ``conv1.weight``,
    ``bn1.{weight,bias,running_mean,running_var}``,
    ``layer{1..4}.{i}.conv{1..3}.weight`` / ``bn{1..3}.*`` /
    ``downsample.{0.weight,1.*}``, ``fc.{weight,bias}``, ``adpool.p``.
    Every expected tensor is hard-asserted; a mismatched checkpoint fails
    instead of converting garbage.
    """
    def to_np(t):
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            np.float32)

    sd = {k: to_np(v) for k, v in state_dict.items()}

    def take(key, ndim):
        assert key in sd, f"missing '{key}'"
        v = sd[key]
        assert v.ndim == ndim, (key, v.shape)
        return v

    def bn(prefix):
        return {
            "scale": take(prefix + ".weight", 1),
            "bias": take(prefix + ".bias", 1),
            "mean": take(prefix + ".running_mean", 1),
            "var": take(prefix + ".running_var", 1),
        }

    kind, depths = ARCHS[arch]
    n_convs = 3 if kind == "bottleneck" else 2
    layers: List[List[Dict[str, Any]]] = []
    for li, depth in enumerate(depths, start=1):
        stage = []
        for bi in range(depth):
            pre = f"layer{li}.{bi}"
            blk: Dict[str, Any] = {
                "stride": 2 if (li > 1 and bi == 0) else 1}
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = take(f"{pre}.conv{ci}.weight", 4)
                blk[f"bn{ci}"] = bn(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_w"] = take(f"{pre}.downsample.0.weight", 4)
                blk["down_bn"] = bn(f"{pre}.downsample.1")
            stage.append(blk)
        layers.append(stage)

    gemp = sd.get("adpool.p", np.array([3.0], np.float32))
    return {
        "block": kind,
        "conv1": take("conv1.weight", 4),
        "bn1": bn("bn1"),
        "layers": layers,
        "fc_w": take("fc.weight", 2),
        "fc_b": take("fc.bias", 1),
        "gemp": float(np.asarray(gemp).ravel()[0]),
        "pca": pca,
    }


def load_pca_from_sklearn(pca_obj: Any) -> Dict[str, Any]:
    """sklearn-PCA-like object (as stored in dirtorch checkpoints under
    ``net.pca['Landmarks_clean']``) -> whitening params."""
    return {
        "mean": np.asarray(pca_obj.mean_, np.float32),
        "components": np.asarray(pca_obj.components_, np.float32),
        "variance": np.asarray(pca_obj.explained_variance_, np.float32),
        "whiten": bool(getattr(pca_obj, "whiten", True)),
    }


@functools.lru_cache(maxsize=1)
def _jitted():
    return jax.jit(dir_descriptor)
