#!/usr/bin/env python
"""Stage-level timing of the rasterizer hot path on the bench scene.

Each stage is chained K times inside one jit (see timing.py — the tunneled
runtime needs a data dependency + single fetch for honest numbers).

Run on the TPU: python benchmarks/profile_stages.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from benchmarks.timing import chained_time, measure_floor  # noqa: E402
from gs_localization_tpu.core.camera import Camera  # noqa: E402
from gs_localization_tpu.core.gaussians import GaussianParams  # noqa: E402
from gs_localization_tpu.core import sh as sh_lib  # noqa: E402
from gs_localization_tpu.raster import RasterizerConfig, rasterize  # noqa: E402
from gs_localization_tpu.raster.rasterize import compute_bins  # noqa: E402
from gs_localization_tpu.loc.refine import TrackingConfig, refine_pose  # noqa: E402


def make_scene(n=100_000, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-2.5, 2.5, n), rng.uniform(-2.0, 2.0, n),
         rng.uniform(2.0, 9.0, n)], 1).astype(np.float32)
    k = sh_lib.num_sh_coeffs(3)
    return GaussianParams.from_arrays(
        xyz=xyz,
        features_dc=sh_lib.rgb_to_sh_dc(
            rng.uniform(0.05, 0.95, (n, 3))).astype(np.float32)[:, None, :],
        features_rest=0.05 * rng.standard_normal((n, k - 1, 3)).astype(np.float32),
        scaling=rng.uniform(-4.5, -3.0, (n, 3)).astype(np.float32),
        rotation=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        opacity=rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32),
        sh_degree=3,
    )


def main():
    g = make_scene()
    W, H = 640, 480
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, W, H)
    on_tpu = jax.default_backend() == "tpu"
    cfg = RasterizerConfig(
        max_pairs=1 << 19, max_per_tile=1024, max_render=1 << 19, fast_k=1,
        backend="pallas" if on_tpu else "jnp", pallas_chunk=256)

    floor = measure_floor()
    print(f"dispatch+fetch floor:       {floor*1e3:8.2f} ms")

    from gs_localization_tpu.raster.preprocess import preprocess

    t = chained_time(
        lambda w2c: preprocess(g, cam.replace(w2c=w2c), tile_size=16).depths,
        cam.w2c, floor=floor)
    print(f"preprocess only:            {t*1e3:8.2f} ms")
    t_prep = t

    t = chained_time(
        lambda w2c: compute_bins(g, cam.replace(w2c=w2c), cfg).num_rendered,
        cam.w2c, K=10, floor=floor)
    print(f"preprocess+binning:         {t*1e3:8.2f} ms"
          f"   (binning ~ {(t-t_prep)*1e3:.2f} ms)")

    bins = jax.jit(lambda: compute_bins(g, cam, cfg))()
    print("num_rendered:", int(bins.num_rendered),
          "max_tile_count:", int(bins.max_tile_count),
          "tile_overflow:", bool(bins.tile_overflow))

    t = chained_time(
        lambda w2c: rasterize(g, cam.replace(w2c=w2c), cfg, bins=bins).color,
        cam.w2c, K=10, floor=floor)
    print(f"prep+blend fwd (fixed bins):{t*1e3:8.2f} ms")

    def loss_fixed(tau):
        out = rasterize(g, cam.with_delta(tau), cfg, bins=bins)
        return jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    t = chained_time(lambda tau: jax.grad(loss_fixed)(tau),
                     jnp.zeros(6), K=10, floor=floor)
    print(f"fwd+bwd->tau (fixed bins):  {t*1e3:8.2f} ms")

    def loss_full(tau):
        out = rasterize(g, cam.with_delta(tau), cfg)
        return jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    t = chained_time(lambda tau: jax.grad(loss_full)(tau),
                     jnp.zeros(6), K=10, floor=floor)
    print(f"fwd+bwd->tau (rebin):       {t*1e3:8.2f} ms")

    rng = np.random.default_rng(1)
    gt_img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    gt_dep = jnp.asarray(rng.uniform(1, 8, (H, W)), jnp.float32)
    mask = jnp.ones((H, W), bool)

    for re, pm in ((1, False), (10, False), (1, True), (10, True)):
        n_loop = 10
        tcfg = TrackingConfig(num_iters=n_loop, lr=1e-3, convergence=0.0,
                              rebin_every=re, pose_mode=pm)

        def op(w2c):
            res = refine_pose(g, cam.replace(w2c=w2c), gt_img, mask, tcfg,
                              cfg, gt_depth=gt_dep)
            return res.w2c

        t = chained_time(op, cam.w2c, K=3, reps=2, floor=floor) / n_loop
        print(f"refine iter (rebin={re:2d} pose_mode={int(pm)}): "
              f"{t*1e3:8.2f} ms -> {W*H/t/1e6:7.2f} Mpix/s")


if __name__ == "__main__":
    main()
