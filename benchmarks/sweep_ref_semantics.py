#!/usr/bin/env python
"""Knob sweep for the reference-semantics step (VERDICT r4 #5).

Times the full rasterize fwd+bwd (rebin every iteration, param+pose
grads — reference forward.cu:263-379 + backward.cu:399-581 work) across
rasterizer knobs: pallas chunk/align, fast_k, pool sizes. Usage:

  PYTHONPATH=/root/repo python benchmarks/sweep_ref_semantics.py
"""

import os
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import chained_time, measure_floor
    from helpers import random_scene
    from gs_localization_tpu.core.camera import Camera
    from gs_localization_tpu.raster import RasterizerConfig, rasterize
    from gs_localization_tpu.raster.rasterize import compute_bins

    W, H = 640, 480
    rng = np.random.default_rng(0)
    g = random_scene(rng, n=100_000, sh_degree=3, spread=2.5,
                     z_range=(2.0, 9.0), scale_range=(-4.5, -3.0))
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, W, H)
    gt = jnp.zeros((H, W, 3))
    mpix = W * H / 1e6
    floor = measure_floor()
    print(f"floor {floor*1e3:.1f} ms")

    def loss(gg, tau, cfg):
        out = rasterize(gg, cam.with_delta(tau), cfg)
        return jnp.abs(out.color - gt).mean() \
            + 0.01 * jnp.abs(out.depth).mean()

    for name, kw in [
        ("base chunk256 fk1", dict(pallas_chunk=256, fast_k=1)),
        ("chunk128 fk1", dict(pallas_chunk=128, fast_k=1)),
        ("chunk128 fk2", dict(pallas_chunk=128, fast_k=2)),
        ("chunk256 fk2", dict(pallas_chunk=256, fast_k=2)),
        ("chunk256 fk4", dict(pallas_chunk=256, fast_k=4)),
        ("chunk128 fk4", dict(pallas_chunk=128, fast_k=4)),
    ]:
        cfg = RasterizerConfig(max_pairs=1 << 19, max_render=1 << 19,
                               backend="pallas", **kw)
        bins = jax.jit(lambda: compute_bins(g, cam, cfg))()
        slow = int(bins.slow_starts[-1])
        kept = int(bins.kept)
        mp = max(1 << 15, -(-int(slow * 1.2) // 4096) * 4096)
        mr = max(1 << 15, -(-int(kept * 1.15) // kw["pallas_chunk"])
                 * kw["pallas_chunk"])
        cfg = cfg.replace(max_pairs=mp, max_render=mr)
        bins = jax.jit(lambda: compute_bins(g, cam, cfg))()
        assert not bool(bins.overflow) and not bool(bins.tile_overflow)
        dt = chained_time(
            lambda tau: jax.grad(loss, argnums=(0, 1), allow_int=True)(
                g, tau, cfg)[1],
            jnp.zeros(6), K=10, floor=floor)
        print(f"{name:<22} slow={slow} kept={kept} kept_al={int(bins.kept_al)}"
              f" mp={mp} mr={mr}  {dt*1e3:7.2f} ms  "
              f"{mpix/dt:6.2f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
