#!/usr/bin/env python
"""Roofline / MFU analysis of the rasterizer at the headline bench scene.

Times each stage INSIDE one jitted lax.fori_loop (K chained iterations per
dispatch) so the tunneled runtime's per-dispatch overhead (~5 ms) cannot
corrupt the attribution, then compares measured time against an analytic
speed-of-light bound from the kernels' FLOP and byte counts.

Work definition (reference forward.cu:263-379, backward.cu:399-581): per
(pixel, pair) the blend does the conic evaluation + exp + front-to-back
compositing; our kernels express the per-chunk T recurrence as an
(npix, G) @ (G, G) triangular matmul (MXU) plus an (4, G) x (npix, G)
accumulation, so the MXU term dominates the analytic FLOP count.

v5e peaks used (public): 197 TFLOP/s bf16 MXU; f32 matmuls decompose to
~3 bf16 passes => ~65 TFLOP/s effective; VPU ~4 TFLOP/s f32; HBM 819 GB/s.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/tests")

PEAK_MXU_F32 = 65e12     # f32-via-bf16x3 matmul throughput
PEAK_MXU_BF16 = 197e12
PEAK_VPU = 4e12
PEAK_HBM = 819e9


def timed_loop(name, body, x0, iters=8, reps=3):
    """Time `body` chained `iters` times inside one jit; return ms/iter."""
    import jax

    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x), x0)

    jf = jax.jit(loop)
    r = jf(x0)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]   # settle
    t0 = time.time()
    for _ in range(reps):
        r = jf(x0)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    ms = (time.time() - t0) / (reps * iters) * 1e3
    print(f"{name:<34} {ms:9.3f} ms/iter", flush=True)
    return ms


def main(n_gauss=100_000, width=640, height=480, cap=1024, chunk=256,
         iters=8):
    import jax
    import jax.numpy as jnp

    from helpers import random_scene
    from gs_localization_tpu.core.camera import Camera
    from gs_localization_tpu.raster import RasterizerConfig, rasterize
    from gs_localization_tpu.raster.preprocess import preprocess
    from gs_localization_tpu.raster import binning as B
    from gs_localization_tpu.raster import pallas_blend
    from gs_localization_tpu.raster.rasterize import compute_bins

    rng = np.random.default_rng(0)
    g = random_scene(rng, n=n_gauss, sh_degree=3, spread=2.5,
                     z_range=(2.0, 9.0), scale_range=(-4.5, -3.0))
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, width, height)
    ts = 16
    gx, gy = -(-width // ts), -(-height // ts)
    T = gx * gy
    npix = ts * ts
    MP = 1 << 19
    on_tpu = jax.default_backend() == "tpu"
    cfg = RasterizerConfig(max_pairs=MP, max_per_tile=cap, max_render=MP,
                           fast_k=1,
                           backend="pallas" if on_tpu else "jnp",
                           pallas_chunk=chunk)
    print(f"backend={jax.default_backend()} P={n_gauss} {width}x{height} "
          f"T={T} cap={cap} chunk={chunk}", flush=True)

    prep0 = jax.jit(lambda g_: preprocess(g_, cam, tile_size=ts))(g)
    bins0 = jax.jit(
        lambda pr: B.bin_gaussians(pr, gx, gy, MP, cap, fast_k=0))(prep0)
    sbins0 = jax.jit(
        lambda pr: B.bin_stream(pr, gx, gy, MP, MP, fast_k=1,
                                align=chunk))(prep0)
    nr = int(bins0.num_rendered)
    mtc = int(bins0.max_tile_count)
    mean_cnt = float(np.mean(np.asarray(bins0.tile_counts)))
    print(f"pairs={nr}  max_tile_count={mtc}  mean_tile_count={mean_cnt:.0f}"
          f"  legacy_tile_overflow={bool(bins0.tile_overflow)}"
          f"  stream_trunc={bool(sbins0.tile_overflow)}", flush=True)

    eps = 1e-30

    # ---- stage: preprocess ------------------------------------------------
    def prep_step(x):
        pr = preprocess(g.replace(xyz=g.xyz + x * eps), cam, tile_size=ts)
        return jnp.sum(pr.means2d) * eps + jnp.sum(pr.conic) * eps + x
    t_prep = timed_loop("preprocess", prep_step, jnp.float32(1.0), iters)

    # ---- stage: binning (stream layout, the pallas product path) ----------
    def bin_step(x):
        pr = prep0._replace(depths=prep0.depths + x * eps)
        bins = B.bin_stream(pr, gx, gy, MP, MP, fast_k=1, align=chunk)
        return jnp.sum(bins.tile_counts).astype(jnp.float32) * eps + x
    t_bin = timed_loop("binning (stream)", bin_step, jnp.float32(1.0), iters)

    # ---- stage: stream assembly (pack row gather + transpose) -------------
    pack_rows = jnp.stack([prep0.means2d[:, 0]] * 12, axis=1)  # (P, 12)

    def sasm_step(x):
        pp = jnp.concatenate(
            [pack_rows + x * eps, jnp.zeros((1, 12), jnp.float32)], axis=0)
        st = jnp.swapaxes(pp[sbins0.gid_of_pos], 0, 1)     # (12, MR_AL)
        return jnp.sum(st[:, ::255]) * eps + x
    t_sasm = timed_loop("stream assemble (gather+T)", sasm_step,
                        jnp.float32(1.0), iters)

    # ---- stage: slot reduction (the stream backward outside the kernel) ---
    mr_al = sbins0.gid_of_pos.shape[0]
    dstream0 = jnp.ones((16, mr_al + chunk), jnp.float32)

    def sred_step(x):
        drows = jnp.swapaxes(dstream0[:12] + x * eps, 0, 1)
        ok = jnp.arange(mr_al + chunk, dtype=jnp.int32) < sbins0.kept_al
        drows = jnp.where(ok[:, None], drows, 0.0)
        dslot = drows[sbins0.pos_by_slot]
        dranked = dslot[:n_gauss].reshape(n_gauss, 1, 12).sum(axis=1)
        dslow = dslot[n_gauss:]
        cum = jnp.concatenate(
            [jnp.zeros((1, 12), jnp.float32), jnp.cumsum(dslow, axis=0)])
        sb = jnp.clip(sbins0.slow_starts, 0, dslow.shape[0])
        dranked = dranked + cum[sb[1:]] - cum[sb[:-1]]
        dpack = jnp.zeros((n_gauss, 12), jnp.float32).at[sbins0.order].set(
            dranked, unique_indices=True)
        return jnp.sum(dpack[::63]) * eps + x
    t_sred = timed_loop("slot reduction (stream bwd)", sred_step,
                        jnp.float32(1.0), iters)

    # ---- stage: legacy gather (pose-mode pack build; NOT on the stream
    # per-iteration path) ---------------------------------------------------
    pack12 = jnp.stack([prep0.means2d[:, 0]] * 12, axis=1)

    def gather_step(x):
        rows = (pack12 + x * eps)[bins0.tile_gid]      # (T, cap, 12)
        return jnp.sum(rows[:, ::127, 0]) * eps + x
    t_gather = timed_loop("gather pack[tile_gid]", gather_step,
                          jnp.float32(1.0), iters)

    # ---- stage: blend fwd (pregathered) ------------------------------------
    gathered = jnp.swapaxes(
        jnp.stack([prep0.means2d[:, 0], prep0.means2d[:, 1],
                   prep0.conic[:, 0], prep0.conic[:, 1], prep0.conic[:, 2],
                   prep0.opacity, jnp.ones_like(prep0.opacity),
                   jnp.zeros_like(prep0.opacity),
                   prep0.rgb[:, 0], prep0.rgb[:, 1], prep0.rgb[:, 2],
                   prep0.depths], axis=1)[bins0.tile_gid], 1, 2)
    geom0, rgbd0 = gathered[:, :8], gathered[:, 8:]

    def blend_fwd_step(x):
        out = pallas_blend.blend_pregathered_pallas(
            bins0.tile_counts, geom0 + x * eps, rgbd0, gx, ts, chunk=chunk)
        return jnp.sum(out.color[::13, ::13]) * eps + x
    t_bfwd = timed_loop("blend fwd (pregathered)", blend_fwd_step,
                        jnp.float32(1.0), iters)

    # ---- stage: blend fwd+bwd (pregathered) --------------------------------
    def blend_fb_step(x):
        def loss(geom):
            out = pallas_blend.blend_pregathered_pallas(
                bins0.tile_counts, geom, rgbd0, gx, ts, chunk=chunk)
            return jnp.sum(out.color) + jnp.sum(out.log_t)
        gr = jax.grad(loss)(geom0 + x * eps)
        return jnp.sum(gr[::13, :, ::13]) * eps + x
    t_bfb = timed_loop("blend fwd+bwd (pregathered)", blend_fb_step,
                       jnp.float32(1.0), iters)

    # ---- full fwd ----------------------------------------------------------
    def fwd_step(x):
        out = rasterize(g.replace(xyz=g.xyz + x * eps), cam, cfg)
        return jnp.sum(out.color[::13, ::13]) * eps + x
    t_fwd = timed_loop("full rasterize fwd", fwd_step, jnp.float32(1.0),
                       iters)

    # ---- full fwd+bwd (params + pose), rebin every iter --------------------
    def fb_step(x):
        def loss(gg, tau):
            out = rasterize(gg, cam.with_delta(tau), cfg)
            return jnp.abs(out.color).mean() + 0.01 * jnp.abs(out.depth).mean()
        gr, gtau = jax.grad(loss, argnums=(0, 1), allow_int=True)(
            g.replace(xyz=g.xyz + x * eps), jnp.zeros(6))
        return jnp.sum(gtau) * eps + jnp.sum(gr.opacity[::31]) * eps + x
    t_fb = timed_loop("full fwd+bwd (rebin, pose+params)", fb_step,
                      jnp.float32(1.0), iters)

    # ---- pose-mode iteration (pregathered pack, pose grads only) -----------
    from gs_localization_tpu.raster.pose_mode import (
        build_pair_pack, render_pose_mode)
    pack = jax.jit(lambda: build_pair_pack(g, cam, cfg))()

    def pm_step(x):
        def loss(tau):
            c, d, a = render_pose_mode(pack, cam.with_delta(tau), cfg)
            return jnp.abs(c).mean() + 0.01 * jnp.abs(d).mean()
        gtau = jax.grad(loss)(jnp.zeros(6) + x * eps)
        return jnp.sum(gtau) * eps + x
    t_pm = timed_loop("pose-mode fwd+bwd (pose only)", pm_step,
                      jnp.float32(1.0), iters)

    # ---- analytic roofline --------------------------------------------------
    n_chunks = cap // chunk
    # forward per tile: per chunk one (npix,G)@(G,G) prefix matmul + one
    # (4,G)x(npix,G) accumulation; VPU ~25 ops per (pixel,pair)
    mxu_fwd = T * n_chunks * (2 * npix * chunk * chunk + 2 * 4 * npix * chunk)
    vpu_fwd = T * n_chunks * (25 * npix * chunk)
    # backward per tile: prefix matmul + suffix matmul + wbar matmul +
    # drgbd matmul + ~60 VPU ops per (pixel,pair) incl. 6 reductions
    mxu_bwd = T * n_chunks * (2 * 2 * npix * chunk * chunk
                              + 2 * 2 * 4 * npix * chunk)
    vpu_bwd = T * n_chunks * (60 * npix * chunk)
    # HBM per blend dispatch: geom+rgbd in (fwd) / in+grads out (bwd) + images
    bytes_fwd = T * (8 + 4) * cap * 4 + T * npix * (4 + 1 + 2) * 4
    bytes_bwd = T * (8 + 4) * cap * 4 * 2 + T * npix * (4 + 1 + 2) * 4

    def bound(mxu, vpu, byts):
        return max(mxu / PEAK_MXU_F32, vpu / PEAK_VPU, byts / PEAK_HBM) * 1e3

    sol_fwd = bound(mxu_fwd, vpu_fwd, bytes_fwd)
    sol_fb = bound(mxu_fwd + mxu_bwd, vpu_fwd + vpu_bwd,
                   bytes_fwd + bytes_bwd)
    print(f"\n--- analytic speed-of-light (full-capacity walk, no early "
          f"exit) ---")
    print(f"blend fwd:      SoL {sol_fwd:7.3f} ms   measured {t_bfwd:7.3f}"
          f"   => {100 * sol_fwd / max(t_bfwd, 1e-9):5.1f}% of roofline")
    print(f"blend fwd+bwd:  SoL {sol_fb:7.3f} ms   measured {t_bfb:7.3f}"
          f"   => {100 * sol_fb / max(t_bfb, 1e-9):5.1f}% of roofline")
    mpix = width * height / 1e6
    print(f"\n--- Mpix/s at reference semantics (rebin every iter) ---")
    print(f"full fwd:     {mpix / (t_fwd / 1e3):8.1f} Mpix/s")
    print(f"full fwd+bwd: {mpix / (t_fb / 1e3):8.1f} Mpix/s")
    print(f"pose-mode:    {mpix / (t_pm / 1e3):8.1f} Mpix/s")
    ssum = t_prep + t_bin + t_sasm + t_bfb + t_sred
    print(f"\nstage table of full fwd+bwd (rebin) step = {t_fb:.2f} ms:")
    print(f"  preprocess fwd         {t_prep:7.2f} ms")
    print(f"  binning (stream)       {t_bin:7.2f} ms")
    print(f"  stream assemble fwd    {t_sasm:7.2f} ms")
    print(f"  blend kernels fwd+bwd  {t_bfb:7.2f} ms  (pregathered proxy)")
    print(f"  slot reduction bwd     {t_sred:7.2f} ms")
    print(f"  -- sum {ssum:7.2f} ms = {100 * ssum / max(t_fb, 1e-9):.0f}% of "
          f"step (rest: preprocess bwd + pack stack/unstack)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--wh", type=str, default="640x480")
    ap.add_argument("--cap", type=int, default=768)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    a = ap.parse_args()
    w, h = map(int, a.wh.split("x"))
    main(a.n, w, h, a.cap, a.chunk, a.iters)
