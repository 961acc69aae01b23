#!/usr/bin/env python
"""Localize-stage A/B sweep on a kept accuracy-report scene (VERDICT r4 #1).

Loads the trained map + PnP init poses from an accuracy_report --keep dir
and runs refinement under a grid of tracking configurations, printing
init vs refined median errors per variant — isolating pose_mode/rebin
approximations, the depth-normalization mismatch, and the mask/exposure
stack on the exact scene the acceptance gates run on.

  python benchmarks/diag_localize.py --root .scratch/acc [--iters 3000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--iters", type=int, default=3000,
                    help="iteration of the trained map to load")
    ap.add_argument("--variants", default=None,
                    help="comma-separated variant names to run (default all)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gs_localization_tpu.core.camera import w2c_from_quat_t
    from gs_localization_tpu.data.scene import load_depth, load_image
    from gs_localization_tpu.data.seven_scenes import load_seven_scenes_scene
    from gs_localization_tpu.loc import TrackingConfig
    from gs_localization_tpu.pipelines import presets
    from gs_localization_tpu.pipelines.localize import (
        LocalizePipelineConfig, QuerySpec, load_map, localize_queries)
    from gs_localization_tpu.raster import RasterizerConfig
    from gs_localization_tpu.sfm.evaluate import pose_errors
    from gs_localization_tpu.sfm.io import read_pose_results

    root = args.root
    out = os.path.join(root, "output_tpu")
    scene = load_seven_scenes_scene(root, model_dir="sparse_dslam/0")
    gaussians = load_map(os.path.join(
        out, f"gs_map/iteration_{args.iters}", "point_cloud.ply"))
    init = read_pose_results(os.path.join(out, "results_dense.txt"))
    rcfg = RasterizerConfig(max_pairs=1 << 19, max_per_tile=768)

    queries = []
    e_t, e_r = [], []
    for q in scene.test_cameras:
        if q.name not in init:
            continue
        qv, tv = init[q.name]
        cam = q.camera.replace(w2c=w2c_from_quat_t(
            jnp.asarray(qv, jnp.float32), jnp.asarray(tv, jnp.float32)))
        img = load_image(q.image_path)
        dep = load_depth(q.depth_path) if q.depth_path and \
            os.path.exists(q.depth_path) else None
        queries.append(QuerySpec(name=q.name, camera=cam, image=img,
                                 depth=dep, gt_w2c=np.asarray(q.camera.w2c)))
        R = np.asarray(cam.w2c[:3, :3])
        et, er = pose_errors(R, np.asarray(cam.w2c[:3, 3]),
                             np.asarray(q.camera.w2c[:3, :3]),
                             np.asarray(q.camera.w2c[:3, 3]))
        e_t.append(float(et))
        e_r.append(float(er))
    print(f"PnP init: {np.median(e_t)*100:.2f} cm / "
          f"{np.median(e_r):.3f} deg over {len(queries)} queries")

    base = presets.seven_scenes_tracking()
    variants = {
        "product": base,
        "exact": base.replace(pose_mode=False, rebin_every=1),
        "product+normdepth": base.replace(normalize_depth=True),
        "exact+normdepth": base.replace(pose_mode=False, rebin_every=1,
                                        normalize_depth=True),
        "monocular": base.replace(monocular=True),
        "exact+normdepth+100it": base.replace(
            pose_mode=False, rebin_every=1, normalize_depth=True,
            num_iters=100),
    }
    sel = args.variants.split(",") if args.variants else list(variants)
    for name in sel:
        tcfg = variants[name]
        lcfg = LocalizePipelineConfig(batch_size=args.batch, tracking=tcfg)
        _, metrics = localize_queries(gaussians, queries, lcfg, rcfg,
                                      log_fn=lambda m: None)
        print(f"{name}: {metrics['median_trans_m']*100:.2f} cm / "
              f"{metrics['median_rot_deg']:.3f} deg  "
              f"recall@5cm5d {metrics['recall@0.05m,5.0deg']:.2f}")


if __name__ == "__main__":
    main()
