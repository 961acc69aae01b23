#!/usr/bin/env python
"""Quick TPU attribution of the stream rasterize path (iteration helper).

Stages: preprocess / binning / fwd (fixed bins) / fwd+bwd param grads
(fixed bins) / fwd+bwd with rebin (reference semantics). Full profile:
profile_stages.py.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from benchmarks.timing import chained_time, measure_floor  # noqa: E402
from benchmarks.profile_stages import make_scene  # noqa: E402
from gs_localization_tpu.core.camera import Camera  # noqa: E402
from gs_localization_tpu.raster import RasterizerConfig, rasterize  # noqa: E402
from gs_localization_tpu.raster.rasterize import compute_bins  # noqa: E402


def main():
    g = make_scene()
    W, H = 640, 480
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, W, H)
    cfg = RasterizerConfig(
        max_pairs=1 << 19, max_render=1 << 19, fast_k=1,
        backend="pallas", pallas_chunk=256)
    mpix = W * H / 1e6

    floor = measure_floor()
    print(f"floor: {floor*1e3:.2f} ms")

    bins = jax.jit(lambda: compute_bins(g, cam, cfg))()
    print("num_rendered:", int(bins.num_rendered), "kept:", int(bins.kept),
          "overflow:", bool(bins.overflow),
          "stream_trunc:", bool(bins.tile_overflow),
          "max_tile_count:", int(bins.max_tile_count))

    t = chained_time(
        lambda w2c: compute_bins(g, cam.replace(w2c=w2c), cfg).kept
        .astype(jnp.float32),
        cam.w2c, K=10, floor=floor)
    print(f"preprocess+binning:        {t*1e3:8.2f} ms")

    t = chained_time(
        lambda w2c: rasterize(g, cam.replace(w2c=w2c), cfg, bins=bins).color,
        cam.w2c, K=10, floor=floor)
    print(f"prep+assemble+fwd (fixed): {t*1e3:8.2f} ms")

    def loss_fixed(gg, tau):
        out = rasterize(gg, cam.with_delta(tau), cfg, bins=bins)
        return jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    t = chained_time(
        lambda tau: jax.grad(loss_fixed, argnums=1)(g, tau),
        jnp.zeros(6), K=10, floor=floor)
    print(f"fwd+bwd tau (fixed bins):  {t*1e3:8.2f} ms")

    t = chained_time(
        lambda tau: jax.grad(loss_fixed, argnums=0,
                             allow_int=True)(g, tau).xyz,
        jnp.zeros(6), K=10, floor=floor)
    print(f"fwd+bwd params (fixed):    {t*1e3:8.2f} ms")

    def loss_full(gg, tau):
        out = rasterize(gg, cam.with_delta(tau), cfg)
        return jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    t = chained_time(
        lambda tau: jax.grad(loss_full, argnums=(0, 1),
                             allow_int=True)(g, tau)[0].xyz,
        jnp.zeros(6), K=10, floor=floor)
    print(f"fwd+bwd full (rebin):      {t*1e3:8.2f} ms "
          f"-> {mpix/t:6.2f} Mpix/s")


if __name__ == "__main__":
    main()
