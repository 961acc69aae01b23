"""Scene runner CLI — the four LoGS stages as one command.

Reference equivalent: the per-dataset script quartet (SURVEY.md §2.7)
process/ -> sfm/ -> gs/ -> pipelines/. Here:

  python -m gs_localization_tpu.pipelines.run_scene \
      --scene /data/7scenes/chess --preset seven_scenes --stage all

Stages:
  prepare   : 7-Scenes split layout (data/seven_scenes.py)
  sfm       : native point model + PnP init poses -> results_dense.txt
  train     : 3DGS map -> out/gs_map/iteration_N/point_cloud.ply
  localize  : batched pose refinement + median/recall metrics -> results.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

import numpy as np


def stage_prepare(args) -> None:
    if args.preset == "cambridge":
        from ..data.prepare import prepare_cambridge

        train, test = prepare_cambridge(
            args.scene, depth_dir=args.depth_dir,
            size=tuple(args.prepare_size))
    elif args.preset in ("llff", "mip360"):
        from ..data.prepare import prepare_360, prepare_llff

        fn = prepare_llff if args.preset == "llff" else prepare_360
        train, test = fn(args.scene)
    else:
        from ..data.seven_scenes import prepare_scene

        train, test = prepare_scene(args.scene)
    print(f"prepared: {len(train)} train / {len(test)} test images")


def _load_scene(args):
    from ..data.seven_scenes import load_seven_scenes_scene
    from ..data.scene import load_colmap_scene

    if args.preset == "seven_scenes":
        return load_seven_scenes_scene(args.scene, model_dir=args.model_dir)
    if args.preset in ("llff", "mip360"):
        from ..data.prepare import load_llff_scene

        return load_llff_scene(args.scene)
    if args.preset == "cambridge":
        def read_list(fname):
            path = os.path.join(args.scene, fname)
            return [l.strip() for l in open(path) if l.strip()] \
                if os.path.exists(path) else None

        return load_colmap_scene(
            os.path.join(args.scene, "sparse/0"),
            images_dir=os.path.join(args.scene, args.images_dir),
            train_list=read_list("train_full.txt"),
            test_list=read_list("test_full.txt"),
        )
    return load_colmap_scene(
        os.path.join(args.scene, args.model_dir),
        images_dir=os.path.join(args.scene, args.images_dir),
        eval_split=True,
    )


def _build_frontend(args, cfg, frame_size=None):
    """(extractor, sparse_matcher, global_desc_fn) from the CLI flags.

    ``frame_size`` (w, h) is required for learned matchers (keypoint
    normalization); pass the mapping-image size. Per-image sizes are not
    supported by this front end — scenes mixing resolutions should resize
    in prepare (the reference's Cambridge path does the same).

    --weights-dir lights up the reference's learned front end (SuperPoint
    + SuperGlue + NetVLAD) from user-supplied official checkpoints
    (WEIGHTS.md manifest); whatever files are absent fall back to the
    self-contained classical path (Harris/SIFT + mutual-NN + tiny-image
    retrieval)."""
    import jax.numpy as jnp

    extractor = None
    if args.extractor == "sift":
        from ..sfm.sift import extract_sift
        from ..sfm.features import rgb_to_gray

        extractor = lambda img: extract_sift(   # noqa: E731
            rgb_to_gray(jnp.asarray(img)), num_keypoints=cfg.num_keypoints)
    sparse_matcher = None
    global_desc_fn = None
    if args.weights_dir:
        from ..sfm import weights as weights_lib
        from ..sfm.registry import get_extractor, get_matcher

        def path_of(name):
            return os.path.join(args.weights_dir,
                                weights_lib.MANIFEST[name].file)

        if os.path.exists(path_of("superpoint")):
            sp = weights_lib.load("superpoint", path_of("superpoint"))
            extractor = get_extractor("superpoint_aachen", params=sp,
                                      num_keypoints=cfg.num_keypoints)
            print("weights: superpoint extractor enabled")
            if os.path.exists(path_of("superglue_outdoor")):
                sg = weights_lib.load("superglue_outdoor",
                                      path_of("superglue_outdoor"))
                assert frame_size is not None, (
                    "superglue matching needs frame_size=(w, h)")
                matcher = get_matcher("superglue-fast", params=sg)
                def sparse_matcher(f0, f1, _m=matcher, _s=frame_size):
                    return _m(f0, f1, _s, _s)
                print("weights: superglue matcher enabled (sinkhorn 5)")
        if os.path.exists(path_of("netvlad")):
            from ..sfm.netvlad import load_netvlad_mat, netvlad_descriptor
            nv = load_netvlad_mat(path_of("netvlad"))
            global_desc_fn = lambda img: netvlad_descriptor(  # noqa: E731
                nv, jnp.asarray(img))
            print("weights: netvlad retrieval enabled")
    return extractor, sparse_matcher, global_desc_fn


def stage_sfm(args) -> None:
    import jax.numpy as jnp

    from ..data.scene import load_depth, load_image
    from ..pipelines.sfm_init import (
        SfmInitConfig, build_point_model, localize_query_pnp,
    )
    from ..sfm.io import write_pose_results

    scene = _load_scene(args)
    cfg = SfmInitConfig()
    imgs = [load_image(c.image_path) for c in scene.train_cameras]
    extractor, sparse_matcher, global_desc_fn = _build_frontend(
        args, cfg, frame_size=(imgs[0].shape[1], imgs[0].shape[0]))
    deps = None
    if args.use_depth:
        deps = [load_depth(c.depth_path) if c.depth_path and
                os.path.exists(c.depth_path) else
                np.zeros(imgs[i].shape[:2], np.float32)
                for i, c in enumerate(scene.train_cameras)]
    mapped = build_point_model(imgs, [c.camera for c in scene.train_cameras],
                               cfg, depth_maps=deps, extractor=extractor,
                               sparse_matcher=sparse_matcher,
                               global_desc_fn=global_desc_fn)
    poses = {}
    for q in scene.test_cameras:
        qimg = load_image(q.image_path)
        cam = q.camera
        K = np.array([[float(cam.fx), 0, float(cam.cx)],
                      [0, float(cam.fy), float(cam.cy)], [0, 0, 1.0]])
        qvec, tvec, info = localize_query_pnp(
            qimg, K, mapped, [c.camera for c in scene.train_cameras], cfg,
            extractor=extractor, sparse_matcher=sparse_matcher,
            global_desc_fn=global_desc_fn)
        poses[q.name] = (qvec, tvec)
        print(f"{q.name}: {info['method']} ({info.get('num_inliers', 0)} inl)")
    out = os.path.join(args.out, "results_dense.txt")
    os.makedirs(args.out, exist_ok=True)
    write_pose_results(out, poses)
    print(f"wrote {out}")
    # persist the triangulated cloud: scenes whose gt model carries no
    # points3D (cambridge/llff layouts) initialize the map from it
    # (reference flow: sfm triangulated model -> gs points3D.ply)
    valid = np.asarray(mapped.valid)
    pts = np.asarray(mapped.points)[valid]
    cols = (np.asarray(mapped.track_colors)[valid]
            if mapped.track_colors is not None
            else np.full((len(pts), 3), 0.5, np.float32))
    np.savez(os.path.join(args.out, "sfm_points.npz"),
             points=pts.astype(np.float32), colors=cols.astype(np.float32))
    print(f"saved {len(pts)} sfm points")


def _build_depth_estimator(args):
    """--weights-dir containing the MiDaS checkpoint lights up the few-shot
    pseudo-depth training path (reference gaussian_splatting/utils/
    depth_utils.py:1-40 via gs/7scenes_gs_full_dslam.py:187-206): DPT_Hybrid
    when dpt_hybrid-midas-501f0c75.pt is present, else MiDaS v2.1 when
    midas_v21-f6b98070.pt is. Returns None (no pseudo-depth prior)
    otherwise."""
    if not args.weights_dir:
        return None
    from ..sfm import weights as weights_lib

    for name, maker in (
        ("dpt_hybrid", "make_dpt_estimator"),
        ("midas_v21", "make_midas_estimator"),
    ):
        path = os.path.join(args.weights_dir, weights_lib.MANIFEST[name].file)
        if os.path.exists(path):
            params = weights_lib.load(name, path)
            if name == "dpt_hybrid":
                from ..ops.dpt import make_dpt_estimator as make
            else:
                from ..ops.midas import make_midas_estimator as make
            print(f"weights: {name} depth prior enabled (few-shot "
                  "pseudo-view regularization)")
            return make(params)
    return None


def stage_train(args) -> None:
    from ..pipelines import presets, train_map
    from ..raster import RasterizerConfig

    scene = _load_scene(args)
    sfm_pts = os.path.join(args.out, "sfm_points.npz")
    if scene.points.shape[0] == 0 and os.path.exists(sfm_pts):
        d = np.load(sfm_pts)
        scene.points = d["points"]
        scene.colors = d["colors"]
        print(f"initialized from {len(d['points'])} sfm points")
    tcfg = {"cambridge": presets.cambridge_training,
            "llff": presets.mip360_training,
            "mip360": presets.mip360_training}.get(
        args.preset, presets.seven_scenes_training)()
    if args.iterations:
        tcfg.iterations = args.iterations
        tcfg.test_iterations = (args.iterations,)
        tcfg.save_iterations = (args.iterations,)
        # keep the reference's schedule SHAPE on short runs: densify for
        # the first half (reference: 15k of 30k) — otherwise a 3k-iter run
        # densifies to the very end and the map balloons unconverged
        if args.iterations < 2 * tcfg.densify_until:
            tcfg.densify_until = args.iterations // 2
        # same for the few-shot pseudo-view window (reference: (2k, 29k)
        # of 30k, gs/7scenes_gs_full_dslam.py:187): scale it so short runs
        # still exercise the depth prior instead of never reaching 2000
        if args.iterations < tcfg.end_sample_pseudo:
            frac = args.iterations / 30_000
            tcfg.start_sample_pseudo = max(1, int(2_000 * frac))
            tcfg.end_sample_pseudo = max(2, int(29_000 * frac))
    mcfg = {"cambridge": presets.cambridge_map_cfg,
            "llff": presets.mip360_map_cfg,
            "mip360": presets.mip360_map_cfg}.get(
        args.preset, presets.seven_scenes_map_cfg)(scene.extent)
    rcfg = RasterizerConfig(max_pairs=args.max_pairs,
                            max_per_tile=args.max_per_tile,
                            use_stream=args.stream)
    train_map(scene, args.out, tcfg, mcfg, rcfg,
              depth_estimator=_build_depth_estimator(args))


def stage_localize(args) -> None:
    import jax.numpy as jnp

    from ..core.camera import w2c_from_quat_t
    from ..data.scene import load_depth, load_image
    from ..pipelines import presets
    from ..pipelines.localize import QuerySpec, load_map, localize_queries
    from ..raster import RasterizerConfig
    from ..sfm.io import read_pose_results, write_pose_results
    from ..core.camera import rotmat_to_quat

    scene = _load_scene(args)
    map_path = args.map or os.path.join(
        args.out, f"gs_map/iteration_{args.iterations or 30000}",
        "point_cloud.ply")
    gaussians = load_map(map_path)
    init = read_pose_results(os.path.join(args.out, "results_dense.txt"))
    lcfg = {"cambridge": presets.cambridge_localize,
            "llff": presets.mip360_localize,
            "mip360": presets.mip360_localize}.get(
        args.preset, presets.seven_scenes_localize)()
    rcfg = RasterizerConfig(max_pairs=args.max_pairs,
                            max_per_tile=args.max_per_tile,
                            use_stream=args.stream)
    # reference masks are grad_mask UNION SuperPoint-keypoint boxes
    # (7scenes_localize_full_dslam.py:352-360); with --weights-dir the
    # extractor is available — feed per-query keypoints into the mask
    kp_extractor = None
    if args.weights_dir:
        from ..sfm import weights as weights_lib
        from ..sfm.registry import get_extractor

        sp_path = os.path.join(args.weights_dir,
                               weights_lib.MANIFEST["superpoint"].file)
        if os.path.exists(sp_path):
            sp = weights_lib.load("superpoint", sp_path)
            kp_extractor = get_extractor("superpoint_aachen", params=sp)
            print("weights: superpoint keypoint masks enabled")

    queries = []
    for q in scene.test_cameras:
        if q.name not in init:
            continue
        qv, tv = init[q.name]
        cam = q.camera.replace(w2c=w2c_from_quat_t(
            jnp.asarray(qv, jnp.float32), jnp.asarray(tv, jnp.float32)))
        img = load_image(q.image_path)
        dep = None
        if not lcfg.tracking.monocular and q.depth_path and \
                os.path.exists(q.depth_path):
            dep = load_depth(q.depth_path)
        kps = None
        if kp_extractor is not None:
            feats = kp_extractor(img)
            kp = np.asarray(feats.keypoints)
            sc = np.asarray(feats.scores)
            kps = kp[sc > lcfg.keypoint_score_min]
        queries.append(QuerySpec(
            name=q.name, camera=cam, image=img, depth=dep, keypoints=kps,
            gt_w2c=np.asarray(q.camera.w2c),
        ))
    results, metrics = localize_queries(gaussians, queries, lcfg, rcfg)
    os.makedirs(args.out, exist_ok=True)
    poses = {}
    for name, w2c in results.items():
        poses[name] = (rotmat_to_quat(w2c[:3, :3]), w2c[:3, 3])
    write_pose_results(os.path.join(args.out, "results.txt"), poses)
    if metrics:
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics, indent=2))


def main(argv=None) -> None:
    from ..utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--stage", default="all",
                    choices=["prepare", "sfm", "train", "localize", "all"])
    ap.add_argument("--preset", default="seven_scenes",
                    choices=["seven_scenes", "cambridge", "llff", "mip360",
                             "colmap"])
    ap.add_argument("--depth-dir", default=None,
                    help="Cambridge_additional-style depth tree for prepare")
    ap.add_argument("--prepare-size", type=int, nargs=2,
                    default=(1024, 576),
                    help="cambridge prepare resize WxH (reference: 1024 576)")
    ap.add_argument("--model-dir", default="sparse_dslam/0")
    ap.add_argument("--images-dir", default="images_full")
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--map", default=None)
    ap.add_argument("--use-depth", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="default: on for seven_scenes (RGB-D), off for "
                         "the monocular presets (cambridge/llff/mip360)")
    ap.add_argument("--max-pairs", type=int, default=1 << 21)
    ap.add_argument("--stream", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="pallas stream-v2 rasterizer layout (default); "
                         "--no-stream falls back to the legacy pregathered "
                         "kernels (KNOWN_ISSUES.md #1)")
    ap.add_argument("--max-per-tile", type=int, default=1024)
    ap.add_argument("--extractor", default="harris",
                    choices=("harris", "sift"),
                    help="SfM front-end features (sift = DoG+rootSIFT); "
                         "--weights-dir upgrades to SuperPoint when "
                         "superpoint_v1.pth is present")
    ap.add_argument("--weights-dir", default=None,
                    help="directory of official checkpoints (WEIGHTS.md): "
                         "enables SuperPoint/SuperGlue/NetVLAD for the sfm "
                         "stage; absent files fall back to the classical "
                         "front end")
    args = ap.parse_args(argv)
    if args.out is None:
        args.out = os.path.join(args.scene, "output_tpu")
    if args.use_depth is None:
        args.use_depth = args.preset == "seven_scenes"

    stages = ([args.stage] if args.stage != "all"
              else ["prepare", "sfm", "train", "localize"])
    for s in stages:
        print(f"=== stage: {s} ===")
        {"prepare": stage_prepare, "sfm": stage_sfm,
         "train": stage_train, "localize": stage_localize}[s](args)


if __name__ == "__main__":
    main()
