"""Map-training losses.

Composition matches the reference LoGS training loop
(/root/reference/gs_localization/gs/7scenes_gs_full_dslam.py:163-206):

  loss = (1 - lambda_dssim) * L1(rgb) + lambda_dssim * (1 - SSIM)
       + 0.01  * min-Pearson(pseudo depth)        [if pseudo depth given]
       + 0.05  * masked L1(gt depth)              [if gt depth given]
       (+ 0.005 * pseudo-view Pearson, handled by the caller sampling a
          pseudo camera — same pearson_depth_loss)

Images are (H, W, 3); depths (H, W).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.ssim import ssim


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def pearson_corrcoef(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    x = x.reshape(-1)
    y = y.reshape(-1)
    xm = x - jnp.mean(x)
    ym = y - jnp.mean(y)
    denom = jnp.sqrt(jnp.sum(xm * xm) * jnp.sum(ym * ym))
    return jnp.sum(xm * ym) / jnp.maximum(denom, 1e-12)


def pearson_depth_loss(pseudo_depth: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """min over the two monotone alignments of MiDaS-style inverse depth
    (gs/7scenes_gs_full_dslam.py:173-177)."""
    a = 1.0 - pearson_corrcoef(-pseudo_depth, depth)
    b = 1.0 - pearson_corrcoef(1000.0 / (pseudo_depth + 200.0), depth)
    return jnp.minimum(a, b)


def training_loss(
    image: jnp.ndarray,
    gt_image: jnp.ndarray,
    depth: Optional[jnp.ndarray] = None,
    gt_depth: Optional[jnp.ndarray] = None,
    pseudo_depth: Optional[jnp.ndarray] = None,
    lambda_dssim: float = 0.2,
    lambda_pseudo_depth: float = 0.01,
    lambda_gt_depth: float = 0.05,
) -> tuple[jnp.ndarray, dict]:
    ll1 = l1_loss(image, gt_image)
    loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt_image))
    aux = {"l1": ll1}
    if pseudo_depth is not None and depth is not None:
        pd = pearson_depth_loss(pseudo_depth, depth)
        loss = loss + lambda_pseudo_depth * pd
        aux["pearson"] = pd
    if gt_depth is not None and depth is not None:
        mask = (gt_depth > 0.0).astype(depth.dtype)
        dl1 = jnp.mean(jnp.abs(depth * mask - gt_depth * mask))
        loss = loss + lambda_gt_depth * dl1
        aux["depth_l1"] = dl1
    aux["total"] = loss
    return loss, aux
