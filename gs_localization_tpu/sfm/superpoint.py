"""SuperPoint keypoint detector/descriptor in JAX/Flax.

Implements the public SuperPoint architecture (DeTone et al., "SuperPoint:
Self-Supervised Interest Point Detection and Description", CVPR-W 2018):
a shared VGG-style encoder (4 conv blocks, 3 maxpools) and two heads — a
65-channel detector (8x8 cell softmax with dustbin) and a 256-d descriptor
(bicubic-upsampled here as bilinear + L2 norm). This is the extractor the
LoGS SfM stage uses through hloc (/root/reference/hloc/extractors/
superpoint.py — conf: nms 3/4, max 4096 keypoints).

Weights are NOT bundled (zero-egress pods); ``convert_torch_weights`` maps
the standard ``superpoint_v1.pth`` state_dict (conv1a..convDb) onto this
module so user-supplied weights drop in. Without weights, the classical
Harris path (sfm/features.py) serves the same API.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .features import Features


class SuperPointNet(nn.Module):
    """Returns (scores (H, W), descriptors (H/8, W/8, 256))."""

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        x = image[None, :, :, None]                      # NHWC
        c = [64, 64, 128, 128, 256]

        def conv(x, features, name):
            return nn.Conv(features, (3, 3), padding=1, name=name)(x)

        x = nn.relu(conv(x, c[0], "conv1a"))
        x = nn.relu(conv(x, c[0], "conv1b"))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(conv(x, c[1], "conv2a"))
        x = nn.relu(conv(x, c[1], "conv2b"))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(conv(x, c[2], "conv3a"))
        x = nn.relu(conv(x, c[2], "conv3b"))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(conv(x, c[3], "conv4a"))
        x = nn.relu(conv(x, c[3], "conv4b"))

        # detector head
        d = nn.relu(nn.Conv(c[4], (3, 3), padding=1, name="convPa")(x))
        d = nn.Conv(65, (1, 1), name="convPb")(d)        # (1, H/8, W/8, 65)
        d = jax.nn.softmax(d, axis=-1)[..., :64]
        n, hc, wc, _ = d.shape
        d = d.reshape(n, hc, wc, 8, 8)
        d = d.transpose(0, 1, 3, 2, 4).reshape(n, hc * 8, wc * 8)
        scores = d[0]

        # descriptor head
        e = nn.relu(nn.Conv(c[4], (3, 3), padding=1, name="convDa")(x))
        e = nn.Conv(256, (1, 1), name="convDb")(e)
        e = e[0]
        e = e * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(e * e, axis=-1, keepdims=True), 1e-12))
        return scores, e


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Iterated non-maximum suppression, exactly the reference algorithm
    (SuperGluePretrainedNetwork/models/superpoint.py:47-62): initial local-max
    mask, then 2 rounds that re-admit maxima of the suppressed complement."""
    win = 2 * radius + 1

    def max_pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME")

    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.astype(jnp.float32)) > 0
        supp_scores = jnp.where(supp_mask, 0.0, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, 0.0)


@functools.partial(jax.jit, static_argnames=("num_keypoints", "nms_radius",
                                             "border"))
def postprocess(
    scores: jnp.ndarray, desc_coarse: jnp.ndarray,
    num_keypoints: int = 1024, nms_radius: int = 4,
    score_threshold: float = 0.005, border: int = 4,
) -> Features:
    h, w = scores.shape
    s = simple_nms(scores, nms_radius)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = ((yy >= border) & (yy < h - border)
                & (xx >= border) & (xx < w - border))
    s = jnp.where(interior & (s > score_threshold), s, 0.0)
    vals, idx = jax.lax.top_k(s.reshape(-1), num_keypoints)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)

    # bilinear sample of the coarse descriptor grid at keypoint locations,
    # with the reference's exact coordinate mapping (superpoint.py:80-92:
    # (kp - s/2 + 0.5) / (dim*s - s/2 - 0.5) -> [-1,1], grid_sample
    # align_corners=True => u = t * (dim_c - 1))
    hc, wc, dd = desc_coarse.shape
    gx = jnp.clip((xs - 3.5) / (wc * 8.0 - 4.5) * (wc - 1), 0.0, wc - 1.001)
    gy = jnp.clip((ys - 3.5) / (hc * 8.0 - 4.5) * (hc - 1), 0.0, hc - 1.001)
    x0 = gx.astype(jnp.int32)
    y0 = gy.astype(jnp.int32)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    d00 = desc_coarse[y0, x0]
    d01 = desc_coarse[y0, jnp.minimum(x0 + 1, wc - 1)]
    d10 = desc_coarse[jnp.minimum(y0 + 1, hc - 1), x0]
    d11 = desc_coarse[jnp.minimum(y0 + 1, hc - 1), jnp.minimum(x0 + 1, wc - 1)]
    desc = (d00 * (1 - fx) * (1 - fy) + d01 * fx * (1 - fy)
            + d10 * (1 - fx) * fy + d11 * fx * fy)
    desc = desc * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(desc * desc, axis=-1, keepdims=True), 1e-12))

    valid = vals > 0
    return Features(
        keypoints=jnp.where(valid[:, None],
                            jnp.stack([xs, ys], 1), -1.0),
        scores=jnp.where(valid, vals, 0.0),
        descriptors=jnp.where(valid[:, None], desc, 0.0),
    )


def extract_superpoint(params: Dict[str, Any], image_gray: jnp.ndarray,
                       num_keypoints: int = 1024, nms_radius: int = 4,
                       score_threshold: float = 0.005) -> Features:
    scores, desc = SuperPointNet().apply({"params": params}, image_gray)
    return postprocess(scores, desc, num_keypoints, nms_radius,
                       score_threshold)


def convert_torch_weights(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a standard superpoint_v1.pth state_dict to this module's params.

    torch convs store (out, in, kh, kw); flax wants (kh, kw, in, out).
    """
    params: Dict[str, Any] = {}
    for name in ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]:
        wkey, bkey = f"{name}.weight", f"{name}.bias"
        if wkey not in state_dict:
            raise KeyError(f"missing {wkey} in state dict")
        w = np.asarray(state_dict[wkey])
        b = np.asarray(state_dict[bkey])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return params
