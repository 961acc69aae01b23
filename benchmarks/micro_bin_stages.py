#!/usr/bin/env python
"""Intra-binning stage attribution at bench shapes (VERDICT r4 #5).

Times bin_stream's internal phases separately: depth argsort, pair-key
emission, the (key, slot) sort alone, a key-only 1-op sort, and the
post-sort table construction — so the r5 optimization targets what the
sort vs the scatter/gather plumbing actually costs.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/micro_bin_stages.py
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
    from gs_localization_tpu.raster import binning as B
    from gs_localization_tpu.raster.preprocess import preprocess
    from gs_localization_tpu.raster.binning import (
        _emit_pair_keys, _next_pow2, INT32_MAX)

    W, H = 640, 480
    MP = 507904          # right-sized slow pool (sweep1)
    FK = 1
    rng = np.random.default_rng(0)
    g = random_scene(rng, n=100_000, sh_degree=3, spread=2.5,
                     z_range=(2.0, 9.0), scale_range=(-4.5, -3.0))
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, W, H)
    gx, gy = W // 16, H // 16
    p = 100_000
    rank_size = _next_pow2(p)
    floor = measure_floor()
    print(f"floor {floor*1e3:.2f} ms")

    prep = jax.jit(lambda: preprocess(g, cam, tile_size=16))()

    def noise(*outs):
        # float-sub chaining: int*0 gets constant-folded (and the whole
        # op DCE'd); float x-x survives because of NaN/inf semantics
        tot = jnp.float32(0.0)
        for o in outs:
            v = jnp.asarray(o).ravel()[0].astype(jnp.float32)
            tot = tot + v
        return (tot - tot).astype(jnp.int32)

    def t(name, fn, x, K=20):
        dt = chained_time(fn, x, K=K, floor=floor)
        print(f"{name:36s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    # depth argsort (P)
    dkey = jnp.where(prep.valid,
                     jax.lax.bitcast_convert_type(prep.depths, jnp.int32),
                     INT32_MAX)
    t("depth argsort (100k)",
      lambda k: k + noise(jnp.argsort(k)), dkey)

    order = jnp.argsort(dkey).astype(jnp.int32)

    # pair-key emission
    def emit(o):
        keys, starts, tot, touched = _emit_pair_keys(
            prep, o, gx, gy, rank_size, MP, FK, 16, True)
        return o + noise(keys, starts, tot)
    t("emit pair keys", emit, order)

    keys, starts, tot, touched = jax.jit(
        lambda: _emit_pair_keys(prep, order, gx, gy, rank_size, MP, FK,
                                16, True))()
    slots = jnp.arange(keys.shape[0], dtype=jnp.int32)
    print(f"  s = {keys.shape[0]} keys")

    # the 2-op sort (current) vs key-only
    def sort2(k):
        ks, sp = jax.lax.sort((k, slots))
        return k + noise(ks, sp)
    t("sort 2-op (key, slot)", sort2, keys)

    def sort1(k):
        ks = jax.lax.sort(k)
        return k + noise(ks)
    t("sort 1-op (key only)", sort1, keys)

    # post-sort construction (everything in bin_stream after the sort)
    def full(o):
        sb = B.bin_stream(prep, gx, gy, MP, 359424, fast_k=FK, align=256)
        return o + noise(sb.gid_of_pos, sb.pos_by_slot, sb.tstart,
                         sb.walk_counts, sb.kept)
    t("bin_stream total", full, order)


if __name__ == "__main__" and not os.environ.get("GATHER_EXP"):
    main()

def gather_experiments():
    """Candidate restructurings: locality-aware two-hop gathers."""
    import jax
    import jax.numpy as jnp
    from benchmarks.timing import chained_time, measure_floor
    from helpers import random_scene
    from gs_localization_tpu.core.camera import Camera
    from gs_localization_tpu.raster import binning as B
    from gs_localization_tpu.raster.preprocess import preprocess

    W, H = 640, 480
    MP, MR = 507904, 359424
    rng = np.random.default_rng(0)
    g = random_scene(rng, n=100_000, sh_degree=3, spread=2.5,
                     z_range=(2.0, 9.0), scale_range=(-4.5, -3.0))
    cam = Camera.from_rt(np.eye(3), np.zeros(3), 520.0, 520.0, W, H)
    gx, gy = W // 16, H // 16
    floor = measure_floor()
    prep = jax.jit(lambda: preprocess(g, cam, tile_size=16))()
    sb = jax.jit(lambda: B.bin_stream(prep, gx, gy, MP, MR, fast_k=1,
                                      align=256))()
    mr_al = sb.gid_of_pos.shape[0]
    s_slots = sb.pos_by_slot.shape[0]
    print(f"mr_al={mr_al} s={s_slots}")
    pack = jnp.concatenate(
        [prep.means2d, prep.conic, prep.opacity[:, None],
         prep.valid.astype(jnp.float32)[:, None],
         jnp.zeros((100_000, 1), jnp.float32), prep.rgb,
         prep.depths[:, None]], axis=1)             # (P, 12)
    pack_pad = jnp.concatenate([pack, jnp.zeros((1, 12))], 0)

    def noise(*outs):
        # SUM the whole result: picking [0] lets XLA shrink a gather to
        # one row (measured 0.000 ms); a full-array sum forces it all
        tot = jnp.float32(0.0)
        for o in outs:
            tot = tot + jnp.sum(jnp.asarray(o).astype(jnp.float32))
        return tot - tot

    def t(name, fn, x, K=20):
        dt = chained_time(fn, x, K=K, floor=floor)
        print(f"{name:40s} {dt*1e3:8.3f} ms", flush=True)

    gid_of_pos = sb.gid_of_pos
    # NOTE: the gathered OPERAND must be loop-carried — constant operands
    # let XLA hoist the gather out of the chained fori_loop (LICM) and the
    # stage measures 0.000 ms
    t("assemble: pack[gid_of_pos]",
      lambda pk: pk + noise(pk[gid_of_pos]), pack_pad)

    order_pad = jnp.concatenate([sb.order, jnp.full((1,), 100_000,
                                                    jnp.int32)])
    inv = jnp.zeros((100_001,), jnp.int32).at[order_pad].set(
        jnp.arange(100_001, dtype=jnp.int32))
    rank_of_apos = inv[gid_of_pos]

    def twohop(pk):
        pack_ranked = pk[order_pad]                  # (P+1, 12) random
        stream = pack_ranked[rank_of_apos]           # (mr_al, 12) sawtooth
        return pk + noise(stream)
    t("assemble: 2-hop rank-space", twohop, pack_pad)

    drows = jnp.asarray(rng.standard_normal((mr_al + 1, 12)),
                        jnp.float32)
    pbs = sb.pos_by_slot
    t("slotred: drows[pos_by_slot]",
      lambda d: d + noise(d[pbs]), drows)

    t("slotred alt: scatter-add by rank",
      lambda d: d + noise(
          jnp.zeros((100_001, 12)).at[rank_of_apos].add(d[:mr_al])),
      drows, K=10)

    t("slotred alt: scatter-add by gid (random)",
      lambda d: d + noise(
          jnp.zeros((100_001, 12)).at[gid_of_pos].add(d[:mr_al])),
      drows, K=10)

    # ---- lane-major (transposed) variants --------------------------------
    pack_t = jnp.swapaxes(pack_pad, 0, 1)            # (12, P+1)
    t("assemble-T: pack_t[:, gid_of_pos]",
      lambda pk: pk + noise(pk[:, gid_of_pos]), pack_t)

    def assemble_cur(pk):
        stream = pk[gid_of_pos]                      # (mr_al, 12)
        stream_t = jnp.concatenate(
            [jnp.swapaxes(stream, 0, 1),
             jnp.zeros((4, mr_al), jnp.float32)], axis=0)
        return pk + noise(stream_t)
    t("assemble current (gather+T+pad)", assemble_cur, pack_pad)

    drows_t = jnp.swapaxes(drows, 0, 1)              # (12, mr_al+1)
    t("slotred-T: drows_t[:, pos_by_slot]",
      lambda d: d + noise(d[:, pbs]), drows_t)

    t("cumsum (S,12) axis0 (current)",
      lambda d: d + noise(jnp.cumsum(d[:mr_al], axis=0)), drows)
    t("cumsum-T (12,S) axis1",
      lambda d: d + noise(jnp.cumsum(d[:, :mr_al], axis=1)), drows_t)


if __name__ == "__main__" and os.environ.get("GATHER_EXP"):
    gather_experiments()
