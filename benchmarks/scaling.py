#!/usr/bin/env python
"""Multi-device scaling benchmark (BASELINE.md metric 3).

Measures query-parallel localization throughput (the §3.2 batching
opportunity) at 1..N devices, reporting scaling efficiency. On this box it
runs on the 8-virtual-CPU mesh for plumbing validation (pass --cpu); on a
real multi-chip slice the same harness measures ICI scaling.

CPU-mesh caveat (VERDICT r3 weak #5): virtual devices SHARE the host's
physical cores (this box: 2), so wall-clock "efficiency" here measures
host dispatch amortization + core contention, not parallel speedup — the
r3 4-device dip (0.77) was run-to-run contention noise at iters=2. The
harness now (a) repeats each measurement and reports the spread, and (b)
records process-CPU-time per run: total CPU work growing ~linearly with
device count while wall time stays core-bound is the signature of the
shared-core artifact, distinguishing it from a genuine SPMD inefficiency
(which would inflate CPU time superlinearly via collective stalls).

Usage:
  python benchmarks/scaling.py --cpu            # virtual 8-device CPU mesh
  PYTHONPATH=...:/root/.axon_site python benchmarks/scaling.py   # TPU
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main(use_cpu: bool, n_queries_per_dev: int = 2, iters: int = 2,
         reps: int = 3):
    if use_cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
    import jax

    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from helpers import random_scene, make_camera
    from gs_localization_tpu.loc import TrackingConfig
    from gs_localization_tpu.parallel import make_mesh, shard_queries_refine
    from gs_localization_tpu.raster import RasterizerConfig, rasterize

    n_dev_total = len(jax.devices())
    rng = np.random.default_rng(0)
    g = random_scene(rng, n=2000, sh_degree=1, spread=1.5,
                     scale_range=(-3.5, -2.5))
    W, H = 96, 64
    cam_gt = make_camera(W, H, fov=1.1)
    cfg = RasterizerConfig(max_pairs=1 << 15, max_per_tile=256, chunk=32,
                           backend="jnp" if use_cpu else "pallas",
                           pallas_chunk=64)
    target = rasterize(g, cam_gt, cfg)
    tcfg = TrackingConfig(num_iters=10, lr=2e-3)

    results = {}
    cpu_med = {}
    counts = [d for d in (1, 2, 4, 8) if d <= n_dev_total]
    for nd in counts:
        mesh = make_mesh(nd)
        b = nd * n_queries_per_dev
        taus = jnp.asarray(0.01 * rng.standard_normal((b, 6)), jnp.float32)
        cams = jax.vmap(cam_gt.with_delta)(taus)
        imgs = jnp.tile(target.color[None], (b, 1, 1, 1))
        deps = jnp.tile(target.depth[None], (b, 1, 1))
        masks = jnp.ones((b, H, W), bool)

        def run():
            return shard_queries_refine(mesh, g, cams, imgs, masks, tcfg,
                                        cfg, gt_depths=deps)

        r = run()
        _ = np.asarray(r.w2c).ravel()[0]           # force + compile
        dts, cpus = [], []
        for _ in range(reps):
            c0 = time.process_time()
            t0 = time.time()
            for _ in range(iters):
                r = run()
            _ = np.asarray(r.w2c).ravel()[0]
            dts.append((time.time() - t0) / iters)
            cpus.append((time.process_time() - c0) / iters)
        dt = float(np.median(dts))
        qps = b / dt
        results[nd] = qps
        cpu_med[nd] = float(np.median(cpus))
        eff = qps / (results[1] * nd) if 1 in results and nd > 1 else 1.0
        print(f"devices={nd:2d}  queries/s={qps:8.2f}  efficiency={eff:5.2f}"
              f"  wall={dt:6.2f}s [{min(dts):.2f},{max(dts):.2f}]"
              f"  cpu={cpu_med[nd]:6.2f}s", flush=True)

    print(json.dumps({
        "metric": "query_localization_scaling",
        "queries_per_s": {str(k): round(v, 2) for k, v in results.items()},
        "cpu_s_per_run": {str(k): round(v, 2) for k, v in cpu_med.items()},
        "cpu_count_logical": os.cpu_count(),
        "efficiency_at_max": round(
            results[counts[-1]] / (results[1] * counts[-1]), 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    main(a.cpu)
