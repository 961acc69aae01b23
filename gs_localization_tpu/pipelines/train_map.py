"""Map-training pipeline: COLMAP scene -> trained Gaussian map (PLY).

Host loop mirroring the reference training driver
(/root/reference/gs_localization/gs/7scenes_gs_full_dslam.py:93-246 and
gaussian_splatting/train.py:32-161): random camera per iteration, SH degree
bump every 1000 iters, densify every ``densification_interval`` in
[densify_from, densify_until], opacity reset every ``opacity_reset_interval``,
periodic held-out evaluation, PLY snapshots.

The device work (render + loss + Adam) is one jitted ``train_step``;
densify/prune/reset are separate jitted calls. Images are cached host-side.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams
from ..data.ply import save_gaussian_ply
from ..data.scene import SceneInfo, load_image, load_depth
from ..mapping import (
    MapTrainConfig, densify_and_prune, init_training, reset_opacity,
    train_step,
)
from ..mapping.train import grow_capacity
from ..mapping.losses import psnr
import functools


@functools.partial(jax.jit, static_argnames=("raster_cfg",))
def _jit_render(gaussians, camera, raster_cfg):
    """Eval/pseudo-view renders go through jit: eager Pallas dispatch can
    fault the tunneled TPU runtime (see mapping/train.py train_step)."""
    from ..raster import rasterize

    return rasterize(gaussians, camera, raster_cfg)
from ..raster import RasterizerConfig, rasterize
from ..raster.rasterize import _blend_mode


def _default_loader():
    """Prefer the native threaded decoder; fall back to PIL with a dict cache."""
    try:
        from ..data.native_loader import NativeLoader, PrefetchingSceneLoader

        if NativeLoader.available():
            pl = PrefetchingSceneLoader(n_threads=4)

            def loader(info):
                pl.request(info.uid, info.image_path, info.depth_path)
                return pl.get(info.uid)

            return loader
    except Exception:
        pass
    cache: Dict[int, tuple] = {}

    def loader(info):
        if info.uid not in cache:
            img = load_image(info.image_path)
            dep = load_depth(info.depth_path) if info.depth_path and \
                os.path.exists(info.depth_path) else None
            cache[info.uid] = (img, dep)
        return cache[info.uid]

    return loader


@dataclass
class TrainPipelineConfig:
    iterations: int = 30_000
    sh_degree: int = 3
    capacity_multiplier: float = 4.0     # capacity = mult * init points
    # when densification overflows the free list, grow capacity host-side
    # (x factor, rounded up to a multiple of 1024) and retry — mirrors the
    # reference's unbounded growth (gaussian_model.py:258-327) at one re-jit
    # per growth event. max_capacity=None = unbounded (like the reference).
    capacity_growth_factor: float = 1.5
    max_capacity: Optional[int] = None
    densify_from: int = 500
    densify_until: int = 15_000
    densification_interval: int = 100
    densify_grad_threshold: float = 2e-4
    opacity_reset_interval: int = 3_000
    min_opacity: float = 0.005
    percent_dense: float = 0.01
    sh_up_interval: int = 1_000
    test_iterations: Sequence[int] = (3000, 7000, 10000, 15000, 20000, 25000, 30000)
    save_iterations: Sequence[int] = (7000, 30000)
    max_screen_size: float = 20.0
    log_every: int = 500
    seed: int = 0
    # few-shot pseudo-view regularization (reference scene_batch.py:83-94 and
    # gs/7scenes_gs_full_dslam.py:187-206): generated when < fewshot_threshold
    # train views AND a monocular depth estimator callback is provided
    fewshot_threshold: int = 200
    sample_pseudo_interval: int = 20
    start_sample_pseudo: int = 2_000
    end_sample_pseudo: int = 29_000
    pseudo_per_edge: int = 3
    # "too large" scenes (reference training_too_large,
    # gs/7scenes_gs_full_dslam.py:250-277): cap the working camera set and
    # swap to a fresh subset once mid-run so the whole scene is eventually
    # seen without holding every decoded image resident.
    max_cameras: Optional[int] = None           # reference uses 3000
    camera_swap_iteration: Optional[int] = None  # reference uses 11_900


def train_map(
    scene: SceneInfo,
    out_dir: Optional[str] = None,
    cfg: TrainPipelineConfig = TrainPipelineConfig(),
    map_cfg: MapTrainConfig = None,
    raster_cfg: RasterizerConfig = None,
    image_loader: Optional[Callable] = None,
    depth_estimator: Optional[Callable] = None,
    log_fn: Callable[[str], None] = print,
) -> GaussianParams:
    """Train a Gaussian map. ``image_loader(cam_info) -> (rgb, depth|None)``
    defaults to reading from cam_info.image_path/depth_path.
    ``depth_estimator(rgb (H,W,3)) -> (H,W) depth`` enables pseudo-view
    regularization for few-shot scenes (MiDaS in the reference; any
    monocular prior plugs in here)."""
    if map_cfg is None:
        map_cfg = MapTrainConfig(spatial_scale=scene.extent)
    if raster_cfg is None:
        raster_cfg = RasterizerConfig()
    if image_loader is None:
        image_loader = _default_loader()

    capacity = max(int(scene.points.shape[0] * cfg.capacity_multiplier), 1024)
    gaussians = GaussianParams.from_pcd(
        scene.points, scene.colors, sh_degree=cfg.sh_degree, capacity=capacity
    )
    # KNOWN_ISSUES #1 auto-guard: probe the first camera's binning regime
    # and route single-chunk scenes to the legacy kernels BEFORE compiling
    # the stream graphs (the faulting regime is a scene property, not an
    # iteration property — see also the mid-run switch below)
    if scene.train_cameras:
        from ..raster import stream_regime_guard

        raster_cfg = stream_regime_guard(
            gaussians, scene.train_cameras[0].camera, raster_cfg,
            log_fn=log_fn)
    state = init_training(gaussians, map_cfg, seed=cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    all_cams = list(scene.train_cameras)
    if cfg.max_cameras is not None and len(all_cams) > cfg.max_cameras:
        sel = rng.permutation(len(all_cams))
        train_cams = [all_cams[i] for i in sel[:cfg.max_cameras]]
        log_fn(f"too-large scene: training on {len(train_cams)}/"
               f"{len(all_cams)} cameras")
    else:
        train_cams = all_cams
    t0 = time.time()

    pseudo_cams = []
    if depth_estimator is not None and len(train_cams) < cfg.fewshot_threshold:
        from ..mapping.pseudo_views import generate_pseudo_poses

        pseudo_cams = generate_pseudo_poses(
            [c.camera for c in train_cams], n_per_edge=cfg.pseudo_per_edge)
        log_fn(f"few-shot: generated {len(pseudo_cams)} pseudo views")

    for it in range(1, cfg.iterations + 1):
        if (cfg.camera_swap_iteration is not None
                and it == cfg.camera_swap_iteration
                and cfg.max_cameras is not None
                and len(all_cams) > cfg.max_cameras):
            sel = rng.permutation(len(all_cams))
            train_cams = [all_cams[i] for i in sel[:cfg.max_cameras]]
            log_fn(f"[{it}] swapped to a fresh {len(train_cams)}-camera "
                   "subset")
        if it % cfg.sh_up_interval == 0:
            state = state.replace(
                gaussians=state.gaussians.one_up_sh_degree())
        info = train_cams[rng.integers(len(train_cams))]
        img, dep = image_loader(info)

        pseudo_cam = None
        pseudo_view_depth = None
        if (pseudo_cams and it % cfg.sample_pseudo_interval == 0
                and cfg.start_sample_pseudo < it < cfg.end_sample_pseudo):
            pseudo_cam = pseudo_cams[rng.integers(len(pseudo_cams))]
            pv = _jit_render(state.gaussians, pseudo_cam, raster_cfg)
            pseudo_view_depth = jnp.asarray(
                depth_estimator(np.asarray(pv.color)))

        state, aux = train_step(
            state, info.camera, jnp.asarray(img), map_cfg, raster_cfg,
            gt_depth=None if dep is None else jnp.asarray(dep),
            pseudo_camera=pseudo_cam, pseudo_view_depth=pseudo_view_depth,
        )

        # tile-capacity audit (VERDICT r2 #4): a truncated tile list drops
        # the farthest Gaussians from the render AND their gradients — grow
        # max_per_tile host-side (one recompile) instead of training on
        # silently-truncated work. Pair capacity gets the same treatment.
        # Checked every 10 steps: the host fetch would otherwise serialize
        # the async dispatch pipeline (the reference pays a D2H sync every
        # forward, rasterizer_impl.cu:282 — we keep it off the common path).
        # mid-run stream-regime guard (one-way): pruning can drive a scene
        # into the all-tiles-single-chunk regime after training starts —
        # switch to the legacy kernels the moment it is entered rather
        # than faulting (KNOWN_ISSUES #1). The max_tile_count fetch rides
        # the same 10-step cadence as the overflow audit.
        if (it % 10 == 0 and raster_cfg.use_stream
                and not os.environ.get("GSL_NO_STREAM_GUARD")
                and _blend_mode(raster_cfg.backend) == "pallas"
                and int(aux["max_tile_count"]) <= raster_cfg.pallas_chunk):
            log_fn(f"[{it}] stream-regime guard: max tile count "
                   f"{int(aux['max_tile_count'])} <= chunk "
                   f"{raster_cfg.pallas_chunk} — switching to legacy "
                   "kernels (re-jit; KNOWN_ISSUES.md #1)")
            raster_cfg = raster_cfg.replace(use_stream=False)
        if it % 10 == 0 and (bool(aux["tile_overflow"])
                             or bool(aux["overflow"])):
            mtc = int(aux["max_tile_count"])
            old = raster_cfg.max_per_tile
            if bool(aux["tile_overflow"]):
                # legacy (T, cap) layout: grow the per-tile cap to the true
                # max count; stream layout: tile_overflow means the
                # materialized pair stream truncated -> double max_render
                new_cap = old
                while new_cap < mtc:
                    new_cap *= 2
                mr = raster_cfg.max_render or raster_cfg.max_pairs
                raster_cfg = raster_cfg.replace(max_per_tile=new_cap,
                                                max_render=2 * mr)
            if bool(aux["overflow"]):
                raster_cfg = raster_cfg.replace(
                    max_pairs=2 * raster_cfg.max_pairs)
            log_fn(f"[{it}] binning overflow (max_tile_count={mtc}): "
                   f"raster capacities now max_per_tile="
                   f"{raster_cfg.max_per_tile} max_pairs="
                   f"{raster_cfg.max_pairs} max_render="
                   f"{raster_cfg.max_render} (re-jit)")

        if it < cfg.densify_until and it > cfg.densify_from \
                and it % cfg.densification_interval == 0:
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), it)
            size_thr = (cfg.max_screen_size
                        if it > cfg.opacity_reset_interval else None)
            while True:
                g2, d2, opt2, report = densify_and_prune(
                    state.gaussians, state.densify, state.opt_state, key,
                    grad_threshold=cfg.densify_grad_threshold,
                    min_opacity=cfg.min_opacity,
                    extent=scene.extent,
                    max_screen_size=size_thr,
                    percent_dense=cfg.percent_dense,
                )
                if int(report.dropped) == 0:
                    break
                # free list exhausted: grow capacity and redo this round
                # from the (functional, untouched) pre-densify state
                old_cap = state.gaussians.capacity
                new_cap = -(-int(old_cap * cfg.capacity_growth_factor)
                            // 1024) * 1024
                if cfg.max_capacity is not None:
                    new_cap = min(new_cap, cfg.max_capacity)
                if new_cap <= old_cap:
                    log_fn(f"[{it}] densify dropped {int(report.dropped)} "
                           f"(at max_capacity {old_cap})")
                    break
                state = grow_capacity(state, new_cap)
                log_fn(f"[{it}] grew capacity {old_cap} -> {new_cap} "
                       f"({int(report.dropped)} dropped; re-jit)")
            state = state.replace(gaussians=g2, densify=d2, opt_state=opt2)

        # debug affordance (reference's snapshot_fw.dump analog): dump the
        # full Gaussian state at a given iteration to triage device faults
        if os.environ.get("GSL_DUMP_STATE_AT") == str(it):
            g = state.gaussians
            np.savez(os.environ.get("GSL_DUMP_STATE_TO",
                                    "/tmp/gsl_state.npz"),
                     xyz=np.asarray(g.xyz),
                     features_dc=np.asarray(g.features_dc),
                     features_rest=np.asarray(g.features_rest),
                     scaling=np.asarray(g.scaling),
                     rotation=np.asarray(g.rotation),
                     opacity=np.asarray(g.opacity),
                     live=np.asarray(g.live))
            log_fn(f"[{it}] dumped state")

        # skip the reset when too few iterations remain to recover from it:
        # the reference resets every 3000 DURING a 30k run (train.py resets
        # then keeps optimizing); a run whose LAST iteration is a multiple
        # of the interval would otherwise save a transparency-crushed map
        # (r4: 3000-iter accuracy run saved at PSNR 6.8 instead of ~20)
        if (it % cfg.opacity_reset_interval == 0
                and cfg.iterations - it >= cfg.opacity_reset_interval // 6):
            g2, opt2 = reset_opacity(state.gaussians, state.opt_state)
            state = state.replace(gaussians=g2, opt_state=opt2)

        if it % cfg.log_every == 0:
            log_fn(f"[{it}] loss={float(aux['total']):.5f} "
                   f"live={int(state.gaussians.num_live)} "
                   f"({(time.time()-t0)/cfg.log_every*1000:.0f} ms/it)")
            t0 = time.time()

        if it in cfg.test_iterations and scene.test_cameras:
            vals = []
            for tinfo in scene.test_cameras[:8]:
                timg, _ = image_loader(tinfo)
                out = _jit_render(state.gaussians, tinfo.camera,
                                  raster_cfg)
                vals.append(float(psnr(out.color, jnp.asarray(timg))))
            log_fn(f"[{it}] test PSNR {np.mean(vals):.2f}")

        if out_dir and it in cfg.save_iterations:
            d = os.path.join(out_dir, f"gs_map/iteration_{it}")
            os.makedirs(d, exist_ok=True)
            save_gaussian_ply(os.path.join(d, "point_cloud.ply"),
                              state.gaussians)
            log_fn(f"[{it}] saved map to {d}")

    return state.gaussians
