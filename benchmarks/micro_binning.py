#!/usr/bin/env python
"""Microbench of binning building blocks on the TPU.

The tunneled runtime has a ~25 ms dispatch+fetch round trip and its
block_until_ready under-reports, so every measurement chains K repetitions
of the op INSIDE one jit (data dependency through a scalar) and fetches
once; the per-op time is (total - floor) / K.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

# the float-sub noise chaining of timing.py: an int *0 bump gets
# constant-folded and the loop body hoisted (this bit the r3 compute_bins
# rows, see BENCH_MICRO_r03.json)
from benchmarks.timing import chained_time as _chained  # noqa: E402


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def chained_time(op, x, K=20, reps=3):
    """report() subtracts the amortized dispatch floor afterwards."""
    def op_f(xx):
        y = op(xx)
        leaf = jnp.asarray(jax.tree_util.tree_leaves(y)[0])
        return leaf.astype(jnp.float32)

    return _chained(op_f, x, K=K, reps=reps, floor=0.0)


FLOOR = [0.0]


def report(name, t):
    per = (t - FLOOR[0])
    print(f"{name:34s} {per*1e3:8.3f} ms")


def main():
    rng = np.random.default_rng(0)

    # floor: fetch round-trip with a trivial chained body
    x0 = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    _fetch(f(x0))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(f(x0))
    FLOOR[0] = 0.0
    floor_total = (time.perf_counter() - t0) / 5
    print(f"{'dispatch+fetch round trip':34s} {floor_total*1e3:8.3f} ms")
    FLOOR[0] = floor_total / 20  # amortized over K=20 chain

    p = 100_000
    keyi = jnp.asarray(rng.integers(0, 1 << 30, p), jnp.int32)
    report("argsort 100k int32",
           chained_time(lambda k: jnp.argsort(k).astype(jnp.int32), keyi))

    for n in (1 << 18, 1 << 19, 1 << 20, 1 << 21):
        keys = jnp.asarray(rng.integers(0, 1 << 27, n), jnp.int32)
        report(f"lax.sort {n>>10}k int32",
               chained_time(jax.lax.sort, keys))

    n = 1 << 21
    keys2m = jnp.asarray(rng.integers(0, 1 << 27, n), jnp.int32)
    report("argsort 2M int32",
           chained_time(lambda k: jnp.argsort(k).astype(jnp.int32), keys2m))

    # slow-path ownership machinery at max_pairs=2M
    mp = 1 << 21
    starts = jnp.asarray(np.sort(rng.integers(0, mp, p)), jnp.int32)
    vals = jnp.arange(p, dtype=jnp.int32)

    def ownership(s):
        mark = jnp.zeros((mp,), jnp.int32).at[s].max(vals, mode="drop")
        return jax.lax.associative_scan(jnp.maximum, mark)

    report("scatter100k + assoc_scan 2M", chained_time(ownership, starts))

    gsrt = jnp.asarray(rng.integers(0, p, mp), jnp.int32)
    table = jnp.asarray(rng.standard_normal((p, 4)), jnp.float32)
    report("row-gather (2M, 4) f32",
           chained_time(lambda g: table[g], gsrt))

    tile_gid = jnp.asarray(rng.integers(0, p, (1200, 512)), jnp.int32)
    pack = jnp.asarray(rng.standard_normal((p, 12)), jnp.float32)
    report("blend gather (1200,512,12)",
           chained_time(lambda g: jnp.swapaxes(pack[g], 1, 2), tile_gid))
    tile_gid2 = jnp.asarray(rng.integers(0, p, (1200, 1024)), jnp.int32)
    report("blend gather (1200,1024,12)",
           chained_time(lambda g: jnp.swapaxes(pack[g], 1, 2), tile_gid2))

    # scatter-add transpose of the blend gather (the backward cost)
    dg = jnp.asarray(rng.standard_normal((1200, 512, 12)), jnp.float32)
    report("scatter-add (1200*512,12)->P",
           chained_time(
               lambda d: jnp.zeros((p, 12), jnp.float32).at[
                   tile_gid.reshape(-1)].add(d.reshape(-1, 12)), dg))

    npairs = 500_000
    pos = jnp.asarray(rng.permutation(1200 * 1024)[:npairs], jnp.int32)
    gid = jnp.asarray(rng.integers(0, p, npairs), jnp.int32)
    report("unique scatter 500k->1.2M",
           chained_time(
               lambda q: jnp.zeros((1200 * 1024,), jnp.int32).at[q].set(
                   gid, mode="drop", unique_indices=True), pos))

    keys_s = jax.lax.sort(keys2m)
    bnd = jnp.arange(1201, dtype=jnp.int32) * (1 << 17)
    report("searchsorted 1201 in 2M",
           chained_time(lambda b: jnp.searchsorted(keys_s, b).astype(jnp.int32),
                        bnd))

    # full bin_gaussians variants on the real scene
    import sys
    sys.path.insert(0, "/root/repo")
    from benchmarks.profile_stages import make_scene
    from gs_localization_tpu.core.camera import Camera
    from gs_localization_tpu.raster import RasterizerConfig
    from gs_localization_tpu.raster.rasterize import compute_bins

    g = make_scene()
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, 640, 480)
    for fast_k, mxp in ((0, 1 << 21), (8, 1 << 18), (4, 1 << 19)):
        cfg = RasterizerConfig(max_pairs=mxp, max_per_tile=1024,
                               fast_k=fast_k, backend="pallas")

        def op(w2c, cfg=cfg):
            b = compute_bins(g, cam.replace(w2c=w2c), cfg)
            return b.num_rendered

        t = chained_time(op, cam.w2c, K=10)
        b = jax.jit(lambda: compute_bins(g, cam, cfg))()
        print(f"compute_bins fast_k={fast_k} mp=2^{int(np.log2(mxp))}:"
              f"      {(t-FLOOR[0])*1e3:8.3f} ms  overflow={bool(b.overflow)}"
              f" tile_of={bool(b.tile_overflow)} nr={int(b.num_rendered)}"
              f" maxtc={int(b.max_tile_count)}")


if __name__ == "__main__":
    main()
