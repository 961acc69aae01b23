"""Render + metrics pipeline (reference render.py / metrics.py equivalent).

Renders a camera set from a trained map and reports PSNR / SSIM, plus LPIPS
when weights are available (the reference vendors lpipsPyTorch and evaluates
net_type='vgg' — gaussian_splatting/metrics.py:74; ours is the native JAX
twin in ops/lpips.py, loaded from user-supplied torch checkpoints since the
pods have zero egress).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams
from ..data.scene import CameraInfo, load_image
from ..mapping.losses import psnr
from ..ops.ssim import ssim
from ..raster import RasterizerConfig, rasterize


def load_lpips_params(vgg_path: str, lin_path: str):
    """Build LPIPS params from torch checkpoints on disk.

    vgg_path: torchvision ``vgg16`` (full model or features) state_dict.
    lin_path: richzhang v0.1 ``vgg.pth`` lin-layer state_dict.
    """
    import torch

    from ..ops.lpips import convert_torch_weights_lpips

    vgg_sd = torch.load(vgg_path, map_location="cpu")
    if any(k.startswith("features.") for k in vgg_sd):
        vgg_sd = {k[len("features."):]: v for k, v in vgg_sd.items()
                  if k.startswith("features.")}
    lin_sd = torch.load(lin_path, map_location="cpu")
    lin_sd = {k.replace("lin", "").replace("model.", ""): v
              for k, v in lin_sd.items()}
    return convert_torch_weights_lpips(
        {k: v.numpy() for k, v in vgg_sd.items()},
        {k: v.numpy() for k, v in lin_sd.items()})


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
    lpips_params: Optional[Dict[str, Any]] = None,
) -> Dict[str, float]:
    if image_loader is None:
        def image_loader(info):
            return load_image(info.image_path), None

    psnrs: List[float] = []
    ssims: List[float] = []
    lpipss: List[float] = []
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
            if lpips_params is not None:
                from ..ops.lpips import lpips

                lpipss.append(float(lpips(lpips_params, out.color, gt)))
    metrics = {}
    if psnrs:
        metrics = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
        if lpipss:
            metrics["lpips"] = float(np.mean(lpipss))
        log_fn(f"PSNR {metrics['psnr']:.2f}  SSIM {metrics['ssim']:.4f}"
               + (f"  LPIPS {metrics['lpips']:.4f}" if lpipss else "")
               + f" over {len(psnrs)} views")
    return metrics
