#!/usr/bin/env python
"""Quick probe: blend kernel fwd / fwd+bwd time at the bench scene shape.

Measures ONLY the pregathered Pallas kernel (no assembly), the number the
roofline pct is computed from. Run on TPU.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from benchmarks.timing import chained_time, measure_floor  # noqa: E402

CAP = 768
CHUNK = 256
TS = 16
GX, GY = 40, 30
T = GX * GY


def main():
    rng = np.random.default_rng(0)
    from gs_localization_tpu.raster import pallas_blend

    # synthetic windows statistically like the bench scene (counts ~400)
    counts = jnp.asarray(
        np.minimum(rng.poisson(390, T), CAP), jnp.int32)
    geom = np.zeros((T, 8, CAP), np.float32)
    geom[:, 0] = rng.uniform(0, 640, (T, CAP))
    geom[:, 1] = rng.uniform(0, 480, (T, CAP))
    geom[:, 2] = rng.uniform(0.01, 0.3, (T, CAP))
    geom[:, 3] = rng.uniform(-0.02, 0.02, (T, CAP))
    geom[:, 4] = rng.uniform(0.01, 0.3, (T, CAP))
    geom[:, 5] = rng.uniform(0.05, 0.9, (T, CAP))
    geom[:, 6] = 1.0
    geom = jnp.asarray(geom)
    rgbd = jnp.asarray(rng.uniform(0, 1, (T, 4, CAP)), jnp.float32)

    floor = measure_floor()
    print(f"floor {floor*1e3:.2f} ms")

    def fwd(x):
        out = pallas_blend.blend_pregathered_pallas(
            counts, geom + x, rgbd, GX, TS, chunk=CHUNK)
        return out.color

    t = chained_time(lambda x: jnp.sum(fwd(x)) * 1e-9, jnp.float32(0.0),
                     K=20, floor=floor)
    print(f"kernel fwd:     {t*1e3:8.2f} ms")

    def fb(x):
        def loss(g):
            out = pallas_blend.blend_pregathered_pallas(
                counts, g, rgbd, GX, TS, chunk=CHUNK)
            return jnp.sum(out.color) + jnp.sum(out.log_t)
        return jax.grad(loss)(geom + x)[0, 0, 0] * 1e-9

    t = chained_time(fb, jnp.float32(0.0), K=20, floor=floor)
    print(f"kernel fwd+bwd: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
