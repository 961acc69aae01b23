#!/usr/bin/env python
"""2-process multi-host dryrun on CPU (VERDICT r3 missing #2).

The single-process 8-device dryrun (__graft_entry__.dryrun_multichip)
validates SPMD semantics but not the multi-process CONTROLLER path:
``jax.distributed.initialize``, global meshes spanning processes,
per-host data loading, cross-process collectives, and host-side metric
merges. This harness launches N real OS processes on localhost (Gloo
collectives — the CPU stand-in for ICI/DCN), runs

  1. a DP training step over a global camera batch where each process
     builds ONLY its host-local block (parallel/runtime.py
     host_local_slice + make_global_batch), asserting the distributed
     loss/grads match a single-process computation of the same batch, and
  2. query-parallel localization (shard_queries_refine) over a global
     query batch, asserting the allgathered refined poses match
     single-process refinement,

then prints one OK line per process. Usage:

  python benchmarks/dryrun_multiprocess.py [--nproc 2] [--dev-per-proc 4]
"""

import argparse
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(pid: int, nproc: int, dpp: int, port: int) -> None:
    from gs_localization_tpu.parallel import runtime

    assert runtime.initialize_runtime(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid, cpu_devices_per_process=dpp)

    import jax
    import jax.numpy as jnp

    from gs_localization_tpu.core.camera import Camera
    from gs_localization_tpu.loc.refine import (
        TrackingConfig, refine_poses_batch)
    from gs_localization_tpu.mapping import losses
    from gs_localization_tpu.mapping.train import TRAINABLE
    from gs_localization_tpu.parallel.dp import (
        dp_train_grads, shard_queries_refine)
    from gs_localization_tpu.raster import RasterizerConfig, rasterize
    from __graft_entry__ import _tiny_scene

    n_global = nproc * dpp
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == n_global, len(jax.devices())
    mesh = runtime.global_mesh(("data",))

    # deterministic GLOBAL batch (every process derives the same one, then
    # materializes only its host-local block — the per-host loading path)
    g = _tiny_scene(n=128, sh_degree=1, seed=1)
    W, H = 32, 32
    rng = np.random.default_rng(0)
    taus = jnp.asarray(0.01 * rng.standard_normal((n_global, 6)), jnp.float32)
    base = Camera.from_rt(np.eye(3), np.zeros(3), 30.0, 30.0, W, H)
    cams_global = jax.vmap(base.with_delta)(taus)
    imgs_global = np.asarray(
        rng.uniform(0, 1, (n_global, H, W, 3)), np.float32)
    cfg = RasterizerConfig(max_pairs=1 << 12, max_per_tile=64, chunk=32,
                           backend="jnp")

    lo, hi = runtime.host_local_slice(n_global, mesh)
    assert hi - lo == dpp, (lo, hi)
    sl = lambda t: jax.tree_util.tree_map(lambda x: np.asarray(x)[lo:hi], t)
    cams = runtime.make_global_batch(sl(cams_global), mesh)
    imgs = runtime.make_global_batch(imgs_global[lo:hi], mesh)

    # ---- 1. DP training step across processes ---------------------------
    loss, grads = jax.jit(
        lambda c, i: dp_train_grads(mesh, g, c, i, cfg))(cams, imgs)
    loss = float(loss)

    def one_loss(cam, img):
        out = rasterize(g, cam, cfg)
        return losses.training_loss(out.color, img)[0]

    ref_loss = float(jnp.mean(jax.vmap(one_loss)(
        cams_global, jnp.asarray(imgs_global))))
    assert abs(loss - ref_loss) < 1e-5, (loss, ref_loss)
    gleaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in gleaves)

    # ---- 2. query-parallel localization across processes ----------------
    target = jax.vmap(lambda c: rasterize(g, c, cfg).color)(cams_global)
    masks_global = np.ones((n_global, H, W), bool)
    tcfg = TrackingConfig(num_iters=3, lr=1e-3, convergence=0.0,
                          monocular=True)
    res = jax.jit(lambda c, t, m: shard_queries_refine(
        mesh, g, c, t, m, tcfg, cfg))(
            cams, runtime.make_global_batch(np.asarray(target)[lo:hi], mesh),
            runtime.make_global_batch(masks_global[lo:hi], mesh))
    w2c_local = np.asarray(
        [s.data for s in res.w2c.addressable_shards]).reshape(-1, 4, 4)
    w2c_all = runtime.process_allgather(w2c_local).reshape(-1, 4, 4)

    ref = refine_poses_batch(g, cams_global, target,
                             jnp.asarray(masks_global), tcfg, cfg)
    # Adam normalizes each tangent component by sqrt(v): fp-noise sign
    # flips on near-zero grads move the pose by O(lr) per iter, so
    # vmap-vs-shard_map lanes agree only to ~lr * iters. Query ROUTING
    # errors would show as O(1e-1) (each query has a distinct tau).
    diff = float(np.abs(w2c_all - np.asarray(ref.w2c)).max())
    assert diff < 2.0 * tcfg.lr * tcfg.num_iters, diff
    loss_local = np.asarray(
        [s.data for s in res.final_loss.addressable_shards]).reshape(-1)
    loss_all = runtime.process_allgather(loss_local).reshape(-1)
    np.testing.assert_allclose(loss_all, np.asarray(ref.final_loss),
                               rtol=0.1, atol=1e-4)

    print(f"dryrun_multiprocess: p{pid}/{nproc} x {dpp}dev — DP loss "
          f"{loss:.4f} == single-process {ref_loss:.4f}; {n_global} queries "
          f"refined, allgathered pose diff {diff:.2e} ok", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--dev-per-proc", type=int, default=4)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nproc, args.dev_per_proc, args.port)
        return

    with socket.socket() as s:     # free localhost port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--nproc", str(args.nproc),
             "--dev-per-proc", str(args.dev_per_proc), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO)
        for i in range(args.nproc)
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        ok = [ln for ln in out.splitlines()
              if ln.startswith("dryrun_multiprocess:")]
        print("\n".join(ok) if ok else out[-2000:])
        rc |= p.returncode
    if rc:
        sys.exit(rc)
    print(f"dryrun_multiprocess: ALL OK ({args.nproc} processes x "
          f"{args.dev_per_proc} devices)")


if __name__ == "__main__":
    main()
