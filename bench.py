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
    cfg = RasterizerConfig(
        max_pairs=1 << 21, max_per_tile=1024, fast_k=0,
        backend="pallas" if on_tpu else "jnp",
        pallas_chunk=256,
    )
    tcfg = TrackingConfig()
    gt_img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    gt_dep = jnp.asarray(rng.uniform(1, 8, (H, W)), jnp.float32)
    mask = jnp.ones((H, W), bool)

    def step(tau):
        out = rasterize(g, cam.with_delta(tau), cfg)
        return tracking_loss(out.color, out.depth, out.alpha, jnp.zeros(2),
                             gt_img, mask, tcfg, gt_depth=gt_dep)

    fwd_bwd = jax.jit(jax.grad(step))
    tau = jnp.zeros(6)
    # chain iterations through a data dependency and force a host fetch at
    # the end: the tunneled TPU runtime executes lazily, so block_until_ready
    # alone under-reports (see .claude memory axon-tpu-env)
    float(fwd_bwd(tau)[0])  # compile + settle
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        tau = fwd_bwd(tau) * 1e-12
    _ = float(tau[0])
    dt = (time.time() - t0) / iters
    mpix_s = W * H / dt / 1e6
    baseline_mpix_s = 10.0
    print(json.dumps({
        "metric": "raster_fwd_bwd_throughput_640x480_100k",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / baseline_mpix_s, 3),
    }))


if __name__ == "__main__":
    main()
