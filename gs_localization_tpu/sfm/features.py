"""Native JAX local features: Harris-corner keypoints + patch descriptors.

Standalone replacement for the role hloc's learned extractors play in the
LoGS pipeline (/root/reference/hloc/extract_features.py) when no external
weights are available (zero-egress TPU pods). The detector is Shi-Tomasi /
Harris on a Gaussian pyramid; descriptors are bias/gain-normalized image
patches (SSD-matchable). A SuperPoint-in-JAX path (sfm/superpoint.py) slots
into the same API when the user supplies standard weights.

Everything is fixed-shape and jittable: top-K keypoints with score masking,
so batches of images vmap cleanly on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Features(NamedTuple):
    keypoints: jnp.ndarray     # (K, 2) xy pixel coords
    scores: jnp.ndarray        # (K,) detector response (0 => invalid slot)
    descriptors: jnp.ndarray   # (K, D) L2-normalized
    # optional per-keypoint geometry (SIFT-style extractors); feed the
    # AdaLAM scale-rate / orientation-difference gates (sfm/adalam.py;
    # reference kornia AdalamFilter required inputs, hloc matchers/adalam.py)
    scales: Optional[jnp.ndarray] = None        # (K,) blur scale
    orientations: Optional[jnp.ndarray] = None  # (K,) radians


def _gauss_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _sep_conv(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable symmetric filter on (H, W) with SAME zero padding."""
    kj = jnp.asarray(k)
    r = len(k) // 2
    x = img[None, :, :, None]
    kh = kj[:, None, None, None]
    kw = kj[None, :, None, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(r, r), (0, 0)],
                                     dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (r, r)],
                                     dimension_numbers=dn)
    return x[0, :, :, 0]


@functools.partial(jax.jit, static_argnames=("num_keypoints", "nms_radius",
                                             "patch_radius"))
def extract_harris_features(
    image: jnp.ndarray,              # (H, W) grayscale float [0,1]
    num_keypoints: int = 1024,
    nms_radius: int = 4,
    patch_radius: int = 5,
    k_harris: float = 0.04,
) -> Features:
    h, w = image.shape
    smooth = _sep_conv(image, _gauss_kernel(1.0, 2))
    dx = (jnp.roll(smooth, -1, 1) - jnp.roll(smooth, 1, 1)) * 0.5
    dy = (jnp.roll(smooth, -1, 0) - jnp.roll(smooth, 1, 0)) * 0.5
    g = _gauss_kernel(1.5, 3)
    ixx = _sep_conv(dx * dx, g)
    iyy = _sep_conv(dy * dy, g)
    ixy = _sep_conv(dx * dy, g)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    response = det - k_harris * tr * tr

    # NMS: keep strict local maxima within (2r+1)^2 windows
    win = 2 * nms_radius + 1
    maxed = jax.lax.reduce_window(
        response, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME")
    is_max = (response >= maxed) & (response > 0)
    # suppress borders (patch must fit)
    b = max(patch_radius, nms_radius) + 1
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    score_map = jnp.where(is_max & interior, response, 0.0)

    flat = score_map.reshape(-1)
    scores, idx = jax.lax.top_k(flat, num_keypoints)
    ys = idx // w
    xs = idx % w
    kps = jnp.stack([xs, ys], axis=1).astype(jnp.float32)

    # descriptors: normalized (2r+1)^2 patches of the smoothed image
    d = 2 * patch_radius + 1
    oy = jnp.arange(-patch_radius, patch_radius + 1)
    ox = jnp.arange(-patch_radius, patch_radius + 1)
    py = jnp.clip(ys[:, None, None] + oy[None, :, None], 0, h - 1)
    px = jnp.clip(xs[:, None, None] + ox[None, None, :], 0, w - 1)
    patches = smooth[py, px].reshape(num_keypoints, d * d)
    mu = jnp.mean(patches, axis=1, keepdims=True)
    patches = patches - mu
    norm = jnp.sqrt(jnp.sum(patches**2, axis=1, keepdims=True))
    desc = patches * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(patches**2, axis=1, keepdims=True), 1e-12))
    del norm

    valid = scores > 0
    return Features(
        keypoints=jnp.where(valid[:, None], kps, -1.0),
        scores=jnp.where(valid, scores, 0.0),
        descriptors=jnp.where(valid[:, None], desc, 0.0),
    )


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])


def tiny_image_descriptor(rgb: jnp.ndarray, size: int = 16) -> jnp.ndarray:
    """Global descriptor: blurred, downsampled, whitened thumbnail.

    A classical stand-in for NetVLAD retrieval (pairs_from_retrieval) that
    works surprisingly well for scene-level nearest neighbors indoors.
    """
    gray = rgb_to_gray(rgb)
    h, w = gray.shape
    gray = _sep_conv(gray, _gauss_kernel(max(h, w) / (2.0 * size), 5))
    ys = (jnp.arange(size) + 0.5) * (h / size)
    xs = (jnp.arange(size) + 0.5) * (w / size)
    thumb = gray[ys.astype(int)[:, None], xs.astype(int)[None, :]]
    v = thumb.reshape(-1)
    v = v - jnp.mean(v)
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v), 1e-12))
