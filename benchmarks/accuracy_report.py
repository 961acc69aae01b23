#!/usr/bin/env python
"""Reference-style localization accuracy report on a synthetic RGB-D scene.

VERDICT r2 #5: run the FULL stack at acceptance strength — SfM-initialized
map points (not GT), PnP-initialized query poses (not GT), RGB-D pose
refinement — and record the reference's per-scene report (median errors +
the (1cm,1deg)...(5m,10deg) recall table, protocol
/root/reference/gs_localization/pipelines/7scenes_localize_full_dslam.py:
368-390) to RESULTS.md, asserting tight gates (<= 2 cm / 1 deg median at
this scene scale — 50x tighter than the old e2e bound).

The scene is a textured Gaussian world rendered to a synthetic 7-Scenes
disk layout (seq dirs, 16-bit mm depth PNGs, TrainSplit/TestSplit, gt
COLMAP model WITHOUT points3D), then the real 4-stage CLI runs end to end:
prepare -> sfm (triangulated points + NetVLAD-style retrieval + PnP) ->
train (map from SfM points) -> localize (PnP init + refinement).

Usage (the script inserts repo + tests into sys.path itself; do NOT
override PYTHONPATH — the default env's PYTHONPATH loads the TPU plugin):
  python benchmarks/accuracy_report.py \
      [--size 160 120] [--iters 1200] [--world 2500] [--train 24]
      [--test 8] [--report RESULTS.md] [--keep DIR]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

GATES = {
    "median_trans_m": 0.02,
    "median_rot_deg": 1.0,
    "recall@0.05m,5.0deg": 0.99,
}


def textured_surface(rng, gx=128, gy=96, z=4.0, spread=2.2, colnoise=0.35,
                     structure=True):
    """Gaussians on a bumpy plane with patchy colors + foreground slabs.

    Floating random splats render as sub-pixel dots that defeat corner
    detection; a surface with low-frequency color structure + per-splat
    noise gives the SfM front end stable, distinctive corners (match
    precision ~87% measured at 320x240 against depth-reprojected GT).

    ``structure`` adds ~8 textured slabs floating 0.6-1.6 m in front of
    the wall (VERDICT r4 #1): a purely planar world leaves the classic
    rotation-vs-translation homography ambiguity nearly unconstrained, so
    photometric pose refinement can trade a 1-deg rotation against a cm
    of translation with almost no residual change — the reference's
    7-Scenes rooms are full 3D, and depth diversity is what conditions
    the rotation. Measured on the r4 failure (repro'd this round):
    refinement DEGRADED rotation 0.17 -> 1.5 deg on the flat wall.
    """
    from gs_localization_tpu.core import sh as sh_lib
    from gs_localization_tpu.core.gaussians import GaussianParams

    xs = np.linspace(-spread, spread, gx)
    ys = np.linspace(-spread * 0.75, spread * 0.75, gy)
    X, Y = np.meshgrid(xs, ys)
    Z = z + 0.3 * np.sin(X * 2.1) * np.cos(Y * 1.7) \
        + 0.05 * rng.standard_normal(X.shape)
    xyz = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1).astype(np.float32)
    n = len(xyz)
    base = 0.5 + 0.45 * np.sin(X * 3.3 + 1) * np.cos(Y * 2.9)
    col = np.stack(
        [base.ravel(),
         (0.5 + 0.45 * np.cos(X * 2.2) * np.sin(Y * 3.7)).ravel(),
         rng.uniform(0.1, 0.9, n)], 1)
    col = np.clip(col + colnoise * rng.standard_normal((n, 3)), 0.02, 0.98)
    step = 2 * spread / gx
    scale = np.full((n, 3), np.log(step * 0.9), np.float32)

    if structure:
        # foreground slabs: small dense textured patches at varied depths.
        # GENTLE structure: shallow offsets and few slabs — deep slabs
        # (0.6-1.6 m tried first) made occlusion/parallax so hard that the
        # 3k-iter map collapsed to PSNR 11 and two-thirds of the SfM
        # points abandoned the wall; the goal is depth diversity that
        # conditions rotation, not a hard occlusion benchmark
        sxyz, scol, sscale = [], [], []
        for _ in range(5):
            cx = rng.uniform(-0.7, 0.7) * spread
            cy = rng.uniform(-0.55, 0.55) * spread
            cz = z - rng.uniform(0.25, 0.7)
            w = rng.uniform(0.2, 0.35)
            grid = 16
            px, py = np.meshgrid(np.linspace(-w, w, grid),
                                 np.linspace(-w, w, grid))
            pz = cz + 0.03 * rng.standard_normal(px.shape)
            sxyz.append(np.stack([cx + px.ravel(), cy + py.ravel(),
                                  pz.ravel()], 1))
            # many texture cycles across the slab (wavelength ~0.1-0.2 m):
            # sub-cycle frequencies rendered each slab as ONE smooth blob
            # — no corners for SfM, nothing sharp for the map to lock onto
            f1, f2, p1 = rng.uniform(2.5, 6.5, 3) * np.pi / w
            c = np.stack(
                [0.5 + 0.45 * np.sin(px.ravel() * f1 + p1),
                 0.5 + 0.45 * np.cos(py.ravel() * f2),
                 np.full(px.size, rng.uniform(0.15, 0.85))], 1)
            scol.append(np.clip(
                c + colnoise * rng.standard_normal(c.shape), 0.02, 0.98))
            spacing = 2 * w / grid
            sscale.append(np.full((px.size, 3), np.log(spacing * 0.8),
                                  np.float32))
        sxyz = np.concatenate(sxyz).astype(np.float32)
        xyz = np.concatenate([xyz, sxyz])
        col = np.concatenate([col, np.concatenate(scol)])
        scale = np.concatenate([scale, np.concatenate(sscale)])
        n = len(xyz)

    k = sh_lib.num_sh_coeffs(1)
    return GaussianParams.from_arrays(
        xyz=xyz,
        features_dc=sh_lib.rgb_to_sh_dc(col).astype(np.float32)[:, None, :],
        features_rest=np.zeros((n, k - 1, 3), np.float32),
        scaling=scale,
        rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        opacity=np.full((n, 1), 3.0, np.float32),
        sh_degree=1)


def build_layout(root, W, H, n_world, n_train, n_test, seed=3):
    """Textured world -> 7-Scenes raw layout + gt model. Returns world."""
    import jax.numpy as jnp
    from PIL import Image

    from helpers import make_camera
    from gs_localization_tpu.core.camera import rotmat_to_quat
    from gs_localization_tpu.data.colmap import (
        ColmapCamera, ColmapImage, write_colmap_model_text)
    from gs_localization_tpu.data.seven_scenes import flat_name
    from gs_localization_tpu.raster import RasterizerConfig, rasterize

    rng = np.random.default_rng(seed)
    gx = int(np.sqrt(n_world * 4 / 3))
    world = textured_surface(rng, gx=gx, gy=gx * 3 // 4)
    cfg = RasterizerConfig(max_pairs=1 << 19, max_per_tile=768, chunk=64)

    os.makedirs(os.path.join(root, "seq-01"), exist_ok=True)
    os.makedirs(os.path.join(root, "seq-02"), exist_ok=True)
    cams, names = [], []
    for i in range(n_train + n_test):
        tau = np.zeros(6, np.float32)
        tau[:3] = 0.05 * rng.standard_normal(3)      # rotations ~3 deg
        tau[3:] = 0.12 * rng.standard_normal(3)      # translations ~0.12 m
        cam = make_camera(W, H, fov=1.0).with_delta(jnp.asarray(tau))
        seq = "seq-01" if i < n_train else "seq-02"
        fname = f"frame-{i:06d}.color.png"
        cams.append(cam)
        names.append((seq, fname))

    for cam, (seq, fname) in zip(cams, names):
        out = rasterize(world, cam, cfg)
        rgb = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(root, seq, fname))
        # expected depth normalized by alpha; invalid where alpha ~ 0
        alpha = np.asarray(out.alpha)
        depth = np.asarray(out.depth) / np.maximum(alpha, 1e-6)
        depth_mm = np.where(alpha > 0.5, depth * 1000.0, 0.0)
        Image.fromarray(depth_mm.astype(np.uint16)).save(
            os.path.join(root, seq,
                         fname.replace(".color.png", ".depth.png")))

    with open(os.path.join(root, "TrainSplit.txt"), "w") as f:
        f.write("sequence1\n")
    with open(os.path.join(root, "TestSplit.txt"), "w") as f:
        f.write("sequence2\n")

    cam0 = cams[0]
    colmap_cams = {1: ColmapCamera(
        1, "PINHOLE", W, H,
        np.array([float(cam0.fx), float(cam0.fy), float(cam0.cx),
                  float(cam0.cy)], np.float64))}
    imgs = {}
    for i, (cam, (seq, fname)) in enumerate(zip(cams, names)):
        w2c = np.asarray(cam.w2c)
        q = np.asarray(rotmat_to_quat(jnp.asarray(w2c[:3, :3])))
        imgs[i + 1] = ColmapImage(
            i + 1, q, w2c[:3, 3], 1, flat_name(seq, fname),
            np.zeros((0, 2)), np.zeros((0,), np.int64))
    model_dir = os.path.join(root, "sparse_dslam", "0")
    os.makedirs(model_dir, exist_ok=True)
    write_colmap_model_text(model_dir, colmap_cams, imgs, {})
    return world


def init_pose_errors(root, out):
    """PnP-init errors (results_dense.txt vs gt model) pre-refinement."""
    import jax.numpy as jnp

    from gs_localization_tpu.core.camera import quat_to_rotmat
    from gs_localization_tpu.data.colmap import read_colmap_model
    from gs_localization_tpu.sfm.evaluate import pose_errors
    from gs_localization_tpu.sfm.io import read_pose_results

    _, images, _ = read_colmap_model(os.path.join(root, "sparse_dslam/0"))
    gt = {im.name: im for im in images.values()}
    init = read_pose_results(os.path.join(out, "results_dense.txt"))
    e_t, e_r = [], []
    for name, (qv, tv) in init.items():
        if name not in gt:
            continue
        R = np.asarray(quat_to_rotmat(jnp.asarray(qv, jnp.float32)))
        et, er = pose_errors(R, np.asarray(tv), gt[name].rotmat(),
                             gt[name].tvec)
        e_t.append(float(et))
        e_r.append(float(er))
    return np.array(e_t), np.array(e_r)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(320, 240))
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--world", type=int, default=12288)
    ap.add_argument("--train", type=int, default=24)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--report", default="RESULTS.md")
    ap.add_argument("--keep", default=None,
                    help="keep the scene dir here (default: temp, removed)")
    ap.add_argument("--stage", default="all",
                    help="run_scene stage to run (resume with --keep DIR "
                         "--skip-build --stage localize)")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse the scene layout already in --keep DIR")
    args = ap.parse_args(argv)
    if args.skip_build and not args.keep:
        ap.error("--skip-build requires --keep DIR (nothing to reuse in a "
                 "fresh temp dir)")
    if args.stage != "all" and not args.keep:
        ap.error("--stage partial runs require --keep DIR (the staged work "
                 "would be deleted on exit)")
    W, H = args.size

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))

    from gs_localization_tpu.pipelines import run_scene

    root = args.keep or tempfile.mkdtemp(prefix="acc_report_")
    os.makedirs(root, exist_ok=True)
    try:
        if not args.skip_build:
            print(f"building synthetic RGB-D scene in {root} "
                  f"({args.world} splats, {args.train}+{args.test} views, "
                  f"{W}x{H})")
            build_layout(root, W, H, args.world, args.train, args.test)
        out = os.path.join(root, "output_tpu")
        run_scene.main([
            "--scene", root, "--preset", "seven_scenes",
            "--stage", args.stage,
            "--iterations", str(args.iters),
            "--max-pairs", str(1 << 19), "--max-per-tile", "768",
            "--use-depth", "--out", out,
            # NO --no-stream: this scene's single-chunk regime faults the
            # stream kernels (KNOWN_ISSUES.md #1), but since r5 the
            # pipelines detect the regime and auto-route to the legacy
            # kernels (raster.stream_regime_guard) — the harness runs the
            # product defaults
        ])
        if args.stage not in ("localize", "all"):
            # metrics.json is only written by the localize stage; partial
            # runs stop after their stage (resume later with --keep DIR
            # --skip-build --stage localize)
            print(f"stage '{args.stage}' done; skipping report/gates")
            return
        metrics = json.load(open(os.path.join(out, "metrics.json")))
        it, ir = init_pose_errors(root, out)

        lines = [
            "# Localization accuracy report (synthetic RGB-D acceptance)",
            "",
            "Produced by `benchmarks/accuracy_report.py` — the full 4-stage",
            "pipeline (prepare -> SfM+PnP -> map training -> refinement) on",
            "a synthetic textured 7-Scenes-style RGB-D scene. Map points",
            "come from triangulated SfM tracks (not GT), query poses start",
            "from retrieval+PnP (not GT), refinement is the product",
            "pose-mode RGB-D path. Protocol: reference",
            "`pipelines/7scenes_localize_full_dslam.py:368-390`.",
            "",
            f"- scene: {args.world} splats, {args.train} train / "
            f"{args.test} test views at {W}x{H}, fov 1.0 rad",
            f"- map: {args.iters} training iterations from SfM points",
            "",
            "| metric | PnP init | after refinement |",
            "|---|---|---|",
            f"| median translation | {np.median(it)*100:.2f} cm | "
            f"**{metrics['median_trans_m']*100:.2f} cm** |",
            f"| median rotation | {np.median(ir):.3f} deg | "
            f"**{metrics['median_rot_deg']:.3f} deg** |",
            "",
            "Recall table (reference thresholds):",
            "",
            "| threshold | recall |",
            "|---|---|",
        ]
        for k, v in metrics.items():
            if k.startswith("recall@"):
                lines.append(f"| {k[7:]} | {v*100:.1f}% |")
        lines += ["", "Gates asserted by the script:", ""]
        ok = True
        for k, gate in GATES.items():
            val = metrics[k]
            passed = (val >= gate) if k.startswith("recall") else (val <= gate)
            ok = ok and passed
            cmp_s = ">=" if k.startswith("recall") else "<="
            lines.append(f"- `{k}` = {val:.4f} ({cmp_s} {gate}): "
                         f"{'PASS' if passed else 'FAIL'}")
        # 4th gate (VERDICT r4 #1): refinement must IMPROVE on its PnP
        # initialization on both metrics — the product's whole reason to
        # exist (reference: <=50 Adam steps strictly improve the
        # retrieval+PnP pose, pipelines/7scenes_localize_full_dslam.py:
        # 29-93). Small tolerance: an init already at the noise floor may
        # bounce within measurement noise.
        for label, refined, init_med in (
            ("trans", metrics["median_trans_m"], float(np.median(it))),
            ("rot", metrics["median_rot_deg"], float(np.median(ir))),
        ):
            passed = refined <= init_med * 1.05 + 1e-6
            ok = ok and passed
            lines.append(
                f"- refined median {label} {refined:.4f} <= PnP init "
                f"{init_med:.4f} (x1.05): {'PASS' if passed else 'FAIL'}")
        report = "\n".join(lines) + "\n"
        with open(args.report, "w") as f:
            f.write(report)
        print(report)
        if not ok:
            print("accuracy gates FAILED", file=sys.stderr)
            sys.exit(1)
    finally:
        if args.keep is None:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
