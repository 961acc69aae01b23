#!/usr/bin/env python
"""Minimal-repro scanner for KNOWN_ISSUES #1 (stream-kernel TPU fault).

The r4 bisect established the faulting regime: ~300 tiles, EVERY tile
single-chunk (max count < chunk), many empty tiles, and the fault only
fires when the stream fwd+bwd runs inside a large train-step-shaped
graph (full output set) or in an unsynced eager pipeline. This harness
synthesizes scenes across one-knob-at-a-time variations of that regime
and runs each in a SUBPROCESS (a TPU worker crash kills only the probe),
recording pass/fault per configuration:

  python benchmarks/repro_stream_fault.py [--quick]

Each probe builds a random scene shaped to hit a target per-tile count
profile, then runs N jitted steps of: rasterize fwd -> loss -> grad over
params -> sgd update -> aux dict (overflow flags, max_tile_count, loss,
psnr-ish stats) returning (new_params, aux) — the shape that faulted.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import sys
sys.path.insert(0, __REPO__)
sys.path.insert(0, __REPO__ + "/tests")
import numpy as np
import jax
import jax.numpy as jnp
from gs_localization_tpu.raster import RasterizerConfig, rasterize
from helpers import random_scene, make_camera

cfgd = __CFG__
W, H = cfgd["wh"]
rng = np.random.default_rng(7)
# scale_range tunes per-tile density: smaller splats -> lower counts
g = random_scene(rng, n=cfgd["n"], sh_degree=1, spread=cfgd["spread"],
                 z_range=(2.5, 6.0), scale_range=tuple(cfgd["scale_range"]))
cam = make_camera(W, H, fov=1.0)
rcfg = RasterizerConfig(max_pairs=1 << 19, max_render=1 << 19,
                        backend="pallas", pallas_chunk=256,
                        use_stream=True)

from gs_localization_tpu.raster.rasterize import compute_bins
bins = jax.jit(lambda: compute_bins(g, cam, rcfg))()
mtc = int(bins.max_tile_count)
nt = (-(-W // 16)) * (-(-H // 16))
counts = None
print(f"probe regime: tiles={nt} max_tile_count={mtc} "
      f"single_chunk={mtc <= 256}", flush=True)

gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

def step(params, _):
    def loss_fn(p):
        out = rasterize(p, cam, rcfg)
        return (jnp.abs(out.color - gt).mean()
                + 0.01 * jnp.abs(out.depth).mean(),
                (out.overflow, out.tile_overflow, out.max_tile_count,
                 out.num_rendered, out.alpha.mean()))
    (l, auxout), grads = jax.value_and_grad(loss_fn, has_aux=True,
                                            allow_int=True)(params)
    new = params.replace(
        xyz=params.xyz - 1e-4 * grads.xyz,
        opacity=params.opacity - 1e-4 * grads.opacity,
        scaling=params.scaling - 1e-4 * grads.scaling,
    )
    aux = dict(loss=l, ovf=auxout[0], tovf=auxout[1], mtc=auxout[2],
               nr=auxout[3], am=auxout[4])
    return new, aux

mode = cfgd["mode"]
if mode == "jit_full":
    jstep = jax.jit(step)
    p = g
    for i in range(cfgd["steps"]):
        p, aux = jstep(p, i)
    print("final loss", float(aux["loss"]), flush=True)
elif mode == "eager_nosync":
    p = g
    for i in range(cfgd["steps"]):
        p, aux = step(p, i)
    print("final loss", float(aux["loss"]), flush=True)
print("PROBE_OK", flush=True)
"""


def run_probe(cfg, timeout=900):
    code = PROBE.replace("__REPO__", repr(REPO)).replace(
        "__CFG__", repr(cfg))
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return "TIMEOUT", ""
    out = r.stdout + r.stderr
    if "PROBE_OK" in r.stdout:
        return "OK", out
    return f"FAULT(rc={r.returncode})", out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    base = dict(wh=(320, 240), n=12288, spread=2.2,
                scale_range=(-4.8, -3.8), steps=args.steps,
                mode="jit_full")
    variants = [
        ("crash-regime jit_full", dict(base)),
        ("crash-regime eager", dict(base, mode="eager_nosync")),
        ("bigger-grid (640x480)", dict(base, wh=(640, 480))),
        ("denser (multi-chunk)", dict(base, scale_range=(-3.6, -2.8))),
        ("fewer empties (spread 1.2)", dict(base, spread=1.2)),
        ("small-n (2048)", dict(base, n=2048)),
    ]
    if args.quick:
        variants = variants[:2]
    results = {}
    for name, cfg in variants:
        status, out = run_probe(cfg)
        tail = "\n".join(out.strip().splitlines()[-4:])
        print(f"=== {name}: {status}\n{tail}\n", flush=True)
        results[name] = status
    print(json.dumps(results))


if __name__ == "__main__":
    main()
