#!/usr/bin/env python
"""Headline benchmark: rasterizer fwd+bwd throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Scenario: 640x480 render + full parameter/pose backward over a 100k-Gaussian
synthetic map — the localization inner loop (SURVEY.md §3.2) which is the
throughput-critical path of the reference. vs_baseline is measured against
BASELINE.json's qualitative target (no published reference numbers exist —
BASELINE.md): we report Mpix/s of fused fwd+bwd steps; vs_baseline compares
against a 10 Mpix/s provisional bar (typical single-GPU CUDA reference
throughput for fwd+bwd at this scene scale).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "tests")

    from gs_localization_tpu.core.camera import Camera
    from gs_localization_tpu.core.gaussians import GaussianParams
    from gs_localization_tpu.core import sh as sh_lib
    from gs_localization_tpu.raster import RasterizerConfig, rasterize
    from gs_localization_tpu.loc.refine import TrackingConfig, tracking_loss

    rng = np.random.default_rng(0)
    n = 100_000
    xyz = np.stack(
        [rng.uniform(-2.5, 2.5, n), rng.uniform(-2.0, 2.0, n),
         rng.uniform(2.0, 9.0, n)], 1,
    ).astype(np.float32)
    k = sh_lib.num_sh_coeffs(3)
    g = GaussianParams.from_arrays(
        xyz=xyz,
        features_dc=sh_lib.rgb_to_sh_dc(
            rng.uniform(0.05, 0.95, (n, 3))).astype(np.float32)[:, None, :],
        features_rest=0.05 * rng.standard_normal((n, k - 1, 3)).astype(np.float32),
        scaling=rng.uniform(-4.5, -3.0, (n, 3)).astype(np.float32),
        rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        opacity=rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32),
        sh_degree=3,
    )
    W, H = 640, 480
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, W, H)
    on_tpu = jax.default_backend() == "tpu"
    # max_per_tile=512 fits this scene (overflow flag stays False) and
    # halves gather+DMA volume vs 1024 — measured 1.6x on v5e.
    cfg = RasterizerConfig(
        max_pairs=1 << 21, max_per_tile=512, fast_k=0,
        backend="pallas" if on_tpu else "jnp",
        pallas_chunk=256,
    )
    # the product workload: the full jitted pose-refinement loop (render +
    # tracking loss + backward + Adam + SE(3) retraction per iteration, tile
    # lists refreshed every 10 steps). Timing chains a data dependency and
    # forces a host fetch — the tunneled runtime executes lazily and
    # block_until_ready alone under-reports.
    from gs_localization_tpu.loc.refine import refine_pose

    n_loop = 25
    tcfg = TrackingConfig(num_iters=n_loop, lr=1e-3, convergence=0.0,
                          rebin_every=10)
    gt_img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    gt_dep = jnp.asarray(rng.uniform(1, 8, (H, W)), jnp.float32)
    mask = jnp.ones((H, W), bool)

    run = jax.jit(lambda cam_: refine_pose(
        g, cam_, gt_img, mask, tcfg, cfg, gt_depth=gt_dep))

    res = run(cam)
    _ = float(res.w2c[0, 0])       # compile + settle
    reps = 3
    t0 = time.time()
    c = cam
    for _ in range(reps):
        res = run(c)
        c = c.replace(w2c=res.w2c)  # chain
    _ = float(res.w2c[0, 0])
    dt = (time.time() - t0) / (reps * n_loop)
    mpix_s = W * H / dt / 1e6
    baseline_mpix_s = 10.0
    print(json.dumps({
        "metric": "pose_refine_fwd_bwd_throughput_640x480_100k",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / baseline_mpix_s, 3),
    }))


if __name__ == "__main__":
    main()
