"""Image-gradient ops for tracking masks.

Matches the reference Scharr-filter pipeline
(/root/reference/gs_localization/pipelines/tools/descent_utils.py:34-66 and
camera_utils.py:164-193): 3x3 Scharr kernels normalized by 1/32, reflect
padding, a validity mask requiring all 3x3 neighbors |v| > eps, and the edge
mask ``|grad| > median(|grad|) * edge_threshold``. Keypoint box masks mirror
create_mask (pipelines/7scenes_localize_full_dslam.py:126-149).

Images here are (H, W) or (H, W, C) float arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SCHARR_Y = np.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]], np.float32) / 32.0
_SCHARR_X = np.array([[3, 10, 3], [0, 0, 0], [-3, -10, -3]], np.float32) / 32.0


def _conv3x3(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Reflect-padded 3x3 conv on (H, W)."""
    x = jnp.pad(img, 1, mode="reflect")[None, :, :, None]
    k = jnp.asarray(kernel)[:, :, None, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID", dimension_numbers=dn)
    return out[0, :, :, 0]


def image_gradient(gray: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(grad_v, grad_h) Scharr gradients of an (H, W) image."""
    return _conv3x3(gray, _SCHARR_X), _conv3x3(gray, _SCHARR_Y)


def image_gradient_mask(gray: jnp.ndarray, eps: float = 0.01) -> jnp.ndarray:
    """True where all 3x3 neighbors have |v| > eps (both Scharr taps valid)."""
    ind = (jnp.abs(jnp.pad(gray, 1, mode="reflect")) > eps).astype(jnp.float32)
    x = ind[None, :, :, None]
    k = jnp.ones((3, 3, 1, 1), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    s = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID", dimension_numbers=dn)[0, :, :, 0]
    return s == 9.0


def compute_grad_mask(rgb: jnp.ndarray, edge_threshold: float = 1.1) -> jnp.ndarray:
    """Edge mask: |Scharr grad| > median * edge_threshold. rgb: (H, W, 3)."""
    gray = jnp.mean(rgb, axis=-1)
    gv, gh = image_gradient(gray)
    mv = image_gradient_mask(gray)
    intensity = jnp.sqrt((gv * mv) ** 2 + (gh * mv) ** 2)
    med = jnp.median(intensity)
    return intensity > med * edge_threshold


def keypoint_box_mask(
    keypoints: jnp.ndarray, width: int, height: int, k: int = 10,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """True in a k x k box around each keypoint. keypoints: (N, 2) xy pixels.

    Vectorized (no python loop over points): for each pixel, true iff some
    keypoint lies within the box — computed separably via 1-D histograms is
    wrong for boxes, so we use a dilated scatter: scatter points then box-sum.
    """
    kp = jnp.round(keypoints).astype(jnp.int32)
    ok = (
        (kp[:, 0] >= 0) & (kp[:, 0] < width) & (kp[:, 1] >= 0) & (kp[:, 1] < height)
    )
    if valid is not None:
        ok = ok & valid
    x = jnp.where(ok, kp[:, 0], width)     # out-of-range -> dropped
    y = jnp.where(ok, kp[:, 1], height)
    img = jnp.zeros((height, width), jnp.float32).at[y, x].add(1.0, mode="drop")
    half = k // 2
    # box filter (k_odd = 2*half+1 to match the reference's [x-h, x+h] box)
    size = 2 * half + 1
    xpad = jnp.pad(img, half)[None, :, :, None]
    kern = jnp.ones((size, size, 1, 1), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(xpad.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(xpad, kern, (1, 1), "VALID",
                                       dimension_numbers=dn)[0, :, :, 0]
    return out > 0.0
