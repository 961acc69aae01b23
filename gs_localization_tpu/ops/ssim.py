"""SSIM with an 11-tap sigma-1.5 Gaussian window.

Matches the reference training loss
(/root/reference/gaussian_splatting/utils/loss_utils.py:17-63): per-channel
depthwise convolution, SAME padding of window//2, C1=0.01^2, C2=0.03^2.
Images are (H, W, C) float in [0, 1] here (the reference is CHW).

The separable window is applied as two 1-D depthwise convs — on TPU this maps
to fused VPU ops rather than a dense 11x11 conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, SAME (zero) padding. img: (H, W, C)."""
    w = jnp.asarray(_gaussian_window(window_size, sigma))
    # NHWC depthwise conv via two 1-D convs
    c = img.shape[-1]
    x = img[None]                                    # (1, H, W, C)
    kernel_h = jnp.tile(w[:, None, None, None], (1, 1, 1, c))  # (K,1,1,C)
    kernel_w = jnp.tile(w[None, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel_h.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = window_size // 2
    x = jax.lax.conv_general_dilated(
        x, kernel_h, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, kernel_w, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c)
    return x[0]


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair."""
    c1 = 0.01**2
    c2 = 0.03**2
    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
