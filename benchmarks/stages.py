#!/usr/bin/env python
"""Per-stage rasterizer benchmarks with honest timing on the tunneled TPU.

The axon runtime executes lazily — block_until_ready alone under-reports by
orders of magnitude. Every benchmark here chains iterations through a data
dependency and forces one host fetch at the end.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, "/root/repo/tests")


def chain_bench(name, f, x0, n=20):
    import jax
    import jax.numpy as jnp

    jf = jax.jit(f)
    x = jf(x0)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]
    t0 = time.time()
    x = x0
    for _ in range(n):
        x = jf(x)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:<30} {dt:8.2f} ms", flush=True)
    return dt


def main(n_gauss=100_000, width=640, height=480):
    import jax
    import jax.numpy as jnp

    from helpers import random_scene, make_camera
    from gs_localization_tpu.raster import RasterizerConfig, rasterize
    from gs_localization_tpu.raster.preprocess import preprocess
    from gs_localization_tpu.raster import binning as B, pallas_blend

    rng = np.random.default_rng(0)
    g = random_scene(rng, n=n_gauss, sh_degree=3, spread=2.5,
                     z_range=(2.0, 9.0), scale_range=(-4.5, -3.0))
    cam = make_camera(width, height, fov=1.2)
    ts = 16
    gx, gy = -(-width // ts), -(-height // ts)
    MP, CAP = 1 << 21, 1024
    on_tpu = jax.default_backend() == "tpu"
    cfg = RasterizerConfig(max_pairs=MP, max_per_tile=CAP, fast_k=0,
                           backend="pallas" if on_tpu else "jnp",
                           pallas_chunk=256)
    print(f"backend={jax.default_backend()} P={n_gauss} {width}x{height} "
          f"max_pairs={MP} cap={CAP}", flush=True)

    # stage 1: preprocess. Chain with a *non-zero* epsilon dependency on
    # every output — 0.0*x gets algebraically simplified away and the stage
    # under-reports (XLA DCEs the unused work).
    def dep(*arrays):
        tot = 0.0
        for a in arrays:
            tot = tot + jnp.sum(a.astype(jnp.float32)) * 1e-20
        return tot

    def prep_step(g_):
        pr = preprocess(g_, cam, tile_size=ts)
        return g_.replace(xyz=g_.xyz + dep(pr.depths, pr.means2d, pr.conic,
                                           pr.rgb, pr.opacity, pr.radii))
    chain_bench("preprocess", prep_step, g)

    prep = jax.jit(lambda g_: preprocess(g_, cam, tile_size=ts))(g)

    # stage 2: binning (chained through a depths nudge)
    def bin_step(pr):
        bins = B.bin_gaussians(pr, gx, gy, MP, CAP, fast_k=0)
        return pr._replace(
            depths=pr.depths + dep(bins.tile_gid, bins.tile_counts,
                                   bins.num_rendered))
    chain_bench("binning", bin_step, prep)

    bins = jax.jit(lambda pr: B.bin_gaussians(pr, gx, gy, MP, CAP))(prep)

    # stage 3: gather + blend
    def blend_step(pr):
        if on_tpu:
            out = pallas_blend.blend_tiles_pallas(
                bins.tile_gid, bins.tile_counts, pr.means2d, pr.conic,
                pr.rgb, pr.opacity, pr.depths, gx, gy, ts, chunk=256)
        else:
            from gs_localization_tpu.raster import blend as blend_lib
            out = blend_lib.blend_tiles(
                bins.tile_gid, bins.tile_mask, pr.means2d, pr.conic,
                pr.rgb, pr.opacity, pr.depths, gx, gy, ts, chunk=64)
        return pr._replace(depths=pr.depths + dep(out.color, out.depth,
                                                  out.log_t))
    chain_bench("gather+blend fwd", blend_step, prep)

    # full forward
    def fwd_step(g_):
        out = rasterize(g_, cam, cfg)
        return g_.replace(xyz=g_.xyz + dep(out.color, out.depth, out.alpha))
    t_fwd = chain_bench("rasterize fwd", fwd_step, g)

    # full forward+backward (photometric L1 grad wrt pose tangent + params)
    gt = jnp.zeros((height, width, 3))

    def fwdbwd_step(g_):
        def loss(gg):
            out = rasterize(gg, cam, cfg)
            return jnp.abs(out.color - gt).mean() + 0.01 * jnp.abs(out.depth).mean()
        grads = jax.grad(loss, allow_int=True)(g_)
        return g_.replace(xyz=g_.xyz + dep(grads.xyz, grads.scaling,
                                           grads.opacity) + 1e-20 * grads.xyz)
    t_bwd = chain_bench("rasterize fwd+bwd", fwdbwd_step, g)

    print(f"fwd Mpix/s: {width*height/t_fwd/1e3:.1f}   "
          f"fwd+bwd Mpix/s: {width*height/t_bwd/1e3:.1f}", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--wh", type=str, default="640x480")
    a = ap.parse_args()
    w, h = map(int, a.wh.split("x"))
    main(a.n, w, h)
