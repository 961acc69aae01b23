#!/usr/bin/env python
"""Refinement-degradation diagnostic (VERDICT r4 #1).

The r4 acceptance artifact showed pose refinement DEGRADING its PnP
initialization (rotation 0.173 -> 1.520 deg). This script isolates the
suspects one at a time on the acceptance scene's own world (the true
Gaussian map, so map quality is out of the equation), PnP-scale pose
perturbations, and the exact product settings:

  A. gt depth = raw accumulated render depth, full-ones mask   (test regime)
  B. gt depth = disk semantics (alpha-normalized, mm-quantized, alpha>0.5)
  C. B + edge mask (grad_mask, threshold 1.1)
  D. C + product tracking preset (pose_mode, rebin_every=10)
  E. C but monocular (no depth term at all)
  F. C with alpha-normalized RENDERED depth in the loss (the candidate fix)

Each config reports median translation/rotation error of init vs refined
over the 8 test-style views. Run on TPU or CPU:

  python benchmarks/diag_refine.py [--size 320 240] [--world 12288]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(320, 240))
    ap.add_argument("--world", type=int, default=12288)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--normalize-depth", action="store_true",
                    help="(obsolete: cfg F covers it)")
    args = ap.parse_args(argv)
    W, H = args.size

    import jax
    import jax.numpy as jnp

    from helpers import make_camera
    from accuracy_report import textured_surface
    from gs_localization_tpu.core import se3
    from gs_localization_tpu.loc import TrackingConfig, refine_poses_batch
    from gs_localization_tpu.ops.image import compute_grad_mask
    from gs_localization_tpu.raster import RasterizerConfig, rasterize

    rng = np.random.default_rng(3)
    gx = int(np.sqrt(args.world * 4 / 3))
    world = textured_surface(rng, gx=gx, gy=gx * 3 // 4)
    cfg = RasterizerConfig(max_pairs=1 << 19, max_per_tile=768, chunk=64,
                           use_stream=False)

    # cameras + PnP-scale init perturbations (median PnP error r4:
    # 1.58 cm / 0.173 deg)
    cams_gt, cams_init, imgs, deps_acc, deps_disk, masks = \
        [], [], [], [], [], []
    for i in range(args.views):
        tau = np.zeros(6, np.float32)
        tau[:3] = 0.05 * rng.standard_normal(3)
        tau[3:] = 0.12 * rng.standard_normal(3)
        cam = make_camera(W, H, fov=1.0).with_delta(jnp.asarray(tau))
        out = rasterize(world, cam, cfg)
        alpha = np.asarray(out.alpha)
        depth = np.asarray(out.depth)
        dnorm = depth / np.maximum(alpha, 1e-6)
        dmm = np.where(alpha > 0.5, dnorm * 1000.0, 0.0).astype(np.uint16)
        img = np.clip(np.asarray(out.color), 0, 1)
        img8 = (img * 255).astype(np.uint8).astype(np.float32) / 255.0

        ptau = np.zeros(6, np.float32)
        ptau[:3] = 0.003 * rng.standard_normal(3)   # ~0.17 deg scale
        ptau[3:] = 0.013 * rng.standard_normal(3)   # ~1.6 cm scale
        cams_gt.append(cam)
        cams_init.append(cam.with_delta(jnp.asarray(ptau)))
        imgs.append(img8)
        deps_acc.append(depth)
        deps_disk.append(dmm.astype(np.float32) / 1000.0)
        masks.append(np.asarray(compute_grad_mask(jnp.asarray(img8), 1.1)))

    stack = lambda xs: jnp.stack([jnp.asarray(x) for x in xs])
    cams_init_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *cams_init)
    imgs_b = stack(imgs)
    ones_b = jnp.ones((args.views, H, W), bool)
    masks_b = stack(masks)
    dacc_b = stack(deps_acc)
    ddisk_b = stack(deps_disk)

    def errors(w2cs):
        et, er = [], []
        for i, cam in enumerate(cams_gt):
            R = w2cs[i, :3, :3]
            et.append(float(jnp.linalg.norm(-R.T @ w2cs[i, :3, 3]
                                            - cam.campos)))
            er.append(float(se3.rotation_geodesic_error_deg(R, cam.R_w2c)))
        return float(np.median(et)), float(np.median(er))

    e0t, e0r = errors(np.stack([np.asarray(c.w2c) for c in cams_init]))
    print(f"init: {e0t*100:.2f} cm / {e0r:.3f} deg")

    base = TrackingConfig(num_iters=args.iters, lr=1e-3, convergence=1e-4,
                          opacity_threshold=0.99, alpha=0.99)
    product = base.replace(pose_mode=True, rebin_every=10)
    configs = [
        ("A acc-depth ones-mask", base, ones_b, dacc_b),
        ("B disk-depth ones-mask", base, ones_b, ddisk_b),
        ("C disk-depth edge-mask", base, masks_b, ddisk_b),
        ("D C+product(posemode,rebin10)", product, masks_b, ddisk_b),
        ("E monocular edge-mask", base.replace(monocular=True),
         masks_b, None),
        ("F D+normalized-render-depth",
         product.replace(normalize_depth=True), masks_b, ddisk_b),
    ]
    for name, tcfg, mk, dp in configs:
        try:
            res = refine_poses_batch(world, cams_init_b, imgs_b, mk,
                                     tcfg, cfg, gt_depths=dp)
        except TypeError as e:   # normalize_depth not implemented yet
            print(f"{name}: SKIP ({e})")
            continue
        t, r = errors(np.asarray(res.w2c))
        print(f"{name}: {t*100:.2f} cm / {r:.3f} deg  "
              f"(iters {np.asarray(res.num_iters).tolist()})")


if __name__ == "__main__":
    main()
