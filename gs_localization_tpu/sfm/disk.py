"""DISK keypoint extractor (thin U-Net + grid NMS) in functional JAX.

Fills the reference's DISK conf (/root/reference/hloc/extractors/disk.py:1-32,
which wraps ``kornia.feature.DISK.from_pretrained('depth')``). Neither kornia
nor the original DISK repo is vendored in the reference tree, so — like the
LoFTR/LightGlue/MiDaS twins — this follows the published architecture (DISK:
Tyszkiewicz et al., NeurIPS 2020; reference implementation
github.com/cvlab-epfl/disk, U-Net from github.com/jatentaki/unets):

- thin U-Net, 5x5 convs, ``down=[16, 32, 64, 64, 64]``,
  ``up=[64, 64, 64, desc_dim + 1]`` with desc_dim=128; input RGB in [0, 1]
  (H, W divisible by 16);
- down block = 2x2 average-pool ("TrivialDownsample", skipped in the first
  block) followed by one pre-activation conv unit
  InstanceNorm(no affine) -> per-channel PReLU -> 5x5 conv (the "thin"
  setup: one conv per block where the standard U-Net has two);
- up block = 2x nearest upsample ("TrivialUpsample"), concat with the
  horizontal skip, one conv unit;
- head: channels [0:128] = dense descriptors, channel 128 = detection
  heatmap;
- inference keypoints (kornia semantics): local-max NMS over a
  ``window_size`` square, optional score threshold, top-``n`` by heatmap
  score; descriptors sampled at keypoint pixels, L2-normalized.

The exact conv-unit ordering inside the original checkpoints cannot be
re-verified offline; ``convert_torch_weights_disk`` therefore asserts the
key layout it expects by NAME and fails loudly on mismatch rather than
silently mis-assigning (tests/test_disk.py pins a torch twin of this spec).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .features import Features

DOWN = [16, 32, 64, 64, 64]
UP = [64, 64, 64, 129]
DESC_DIM = 128
KERNEL = 5


# ------------------------------------------------------------- building ----
def _conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """NHWC conv, SAME padding, torch OIHW kernel layout."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )[0]
    return out + b


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): per-channel over spatial dims."""
    mu = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.var(x, axis=(0, 1), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, a * x)


def _conv_unit(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """Pre-activation unit: InstanceNorm -> PReLU -> 5x5 conv."""
    x = _instance_norm(x)
    x = _prelu(x, p["prelu"])
    return _conv2d(x, p["w"], p["b"])


def _first_conv(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """First block: bare conv (no norm/gate on raw pixels)."""
    return _conv2d(x, p["w"], p["b"])


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    h, w, c = x.shape
    return x.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)


def unet_forward(params: Dict[str, Any], image: jnp.ndarray) -> jnp.ndarray:
    """image (H, W, 3) in [0, 1] -> (H, W, 129) dense output."""
    x = jnp.asarray(image, jnp.float32)
    skips: List[jnp.ndarray] = []
    for i, p in enumerate(params["down"]):
        if i == 0:
            x = _first_conv(p, x)
        else:
            x = _avg_pool2(x)
            x = _conv_unit(p, x)
        skips.append(x)
    # bottom feature = skips[-1]; walk up pairing with down skips in reverse
    y = skips[-1]
    for i, p in enumerate(params["up"]):
        y = _upsample2(y)
        hor = skips[len(DOWN) - 2 - i]
        y = jnp.concatenate([y, hor], axis=-1)
        y = _conv_unit(p, y)
    return y


# ------------------------------------------------------------- detection ---
def _nms_keep(heat: jnp.ndarray, window: int) -> jnp.ndarray:
    """True where the pixel equals the max of its window x window patch."""
    pad = window // 2
    mx = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (window, window), (1, 1),
        [(pad, pad), (pad, pad)],
    )
    return heat >= mx


@functools.partial(jax.jit, static_argnames=("num_keypoints", "window_size",
                                             "score_threshold"))
def extract_disk(
    params: Dict[str, Any],
    image: jnp.ndarray,                # (H, W, 3) RGB in [0, 1]
    num_keypoints: int = 2048,
    window_size: int = 5,
    score_threshold: float = 0.0,
) -> Features:
    dense = unet_forward(params, image)
    desc_map = dense[..., :DESC_DIM]
    heat = dense[..., DESC_DIM]
    keep = _nms_keep(heat, window_size) & (heat > score_threshold)
    score = jnp.where(keep, heat, -jnp.inf)
    h, w = score.shape
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, num_keypoints)
    ys, xs = idx // w, idx % w
    valid = jnp.isfinite(vals)
    kpts = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    desc = desc_map[ys, xs]
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True),
                              1e-8)
    return Features(
        keypoints=jnp.where(valid[:, None], kpts, 0.0),
        scores=jnp.where(valid, vals, 0.0),
        descriptors=jnp.where(valid[:, None], desc, 0.0),
    )


# ------------------------------------------------------------- converter ---
def init_params(rng: np.random.Generator, scale: float = 0.5
                ) -> Dict[str, Any]:
    """Random parameters with the production layout (for tests)."""
    def conv(cin, cout, first=False):
        p = {
            "w": (scale * rng.standard_normal((cout, cin, KERNEL, KERNEL))
                  / np.sqrt(cin * KERNEL * KERNEL)).astype(np.float32),
            "b": (0.1 * rng.standard_normal(cout)).astype(np.float32),
        }
        if not first:
            p["prelu"] = (0.25 + 0.05 * rng.standard_normal(cin)).astype(
                np.float32)
        return p

    down, cin = [], 3
    for i, cout in enumerate(DOWN):
        down.append(conv(cin, cout, first=(i == 0)))
        cin = cout
    up = []
    bot = DOWN[-1]
    for i, cout in enumerate(UP):
        cin_up = bot + DOWN[len(DOWN) - 2 - i]
        up.append(conv(cin_up, cout))
        bot = cout
    return {"down": down, "up": up}


def convert_torch_weights_disk(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """kornia ``DISK`` / original-repo checkpoint -> JAX params.

    Expects per down/up block a single conv unit under
    ``unet.path_down.{i}`` / ``unet.path_up.{i}`` with a 4-D conv weight, a
    1-D bias of matching out-channels, and (except the first down block) a
    PReLU weight of in-channel size. Keys are matched by suffix shape, with
    hard asserts on every expected tensor — a checkpoint from a different
    layout fails instead of converting garbage.
    """
    def to_np(t):
        return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    sd = {k: to_np(v) for k, v in state_dict.items()}

    def block(prefix: str, cin: int, cout: int, first: bool):
        keys = sorted(k for k in sd if k.startswith(prefix))
        assert keys, f"no tensors under '{prefix}'"
        wk = [k for k in keys if sd[k].ndim == 4]
        assert len(wk) == 1, (prefix, wk)
        w = sd[wk[0]]
        assert w.shape == (cout, cin, KERNEL, KERNEL), (prefix, w.shape)
        bk = [k for k in keys if sd[k].ndim == 1 and sd[k].shape == (cout,)
              and k.rsplit(".", 1)[-1] == "bias"]
        assert len(bk) == 1, (prefix, bk)
        p = {"w": w, "b": sd[bk[0]]}
        if not first:
            ak = [k for k in keys if sd[k].ndim == 1
                  and k not in (wk[0], bk[0])
                  and sd[k].shape in ((cin,), (1,))]
            assert len(ak) == 1, (prefix, ak)
            a = sd[ak[0]]
            p["prelu"] = (np.full(cin, a[0], np.float32)
                          if a.shape == (1,) else a)
        return p

    down, cin = [], 3
    for i, cout in enumerate(DOWN):
        down.append(block(f"unet.path_down.{i}.", cin, cout, first=(i == 0)))
        cin = cout
    up = []
    bot = DOWN[-1]
    for i, cout in enumerate(UP):
        cin_up = bot + DOWN[len(DOWN) - 2 - i]
        up.append(block(f"unet.path_up.{i}.", cin_up, cout, first=False))
        bot = cout
    return {"down": down, "up": up}
