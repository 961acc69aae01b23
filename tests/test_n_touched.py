"""n_touched (per-Gaussian contributed-pixel count) vs a numpy oracle."""

import numpy as np
import jax.numpy as jnp

from gs_localization_tpu.raster import RasterizerConfig, rasterize
from gs_localization_tpu.raster.preprocess import preprocess
from gs_localization_tpu.raster.rasterize import render

from helpers import random_scene, make_camera


def _oracle_n_touched(g, cam, tile_size=16):
    """Sequential per-pixel count with the reference skip/saturate rules."""
    prep = preprocess(g, cam, tile_size=tile_size)
    xy = np.asarray(prep.means2d)
    con = np.asarray(prep.conic)
    opa = np.where(np.asarray(prep.valid), np.asarray(prep.opacity), 0.0)
    dep = np.asarray(prep.depths)
    rect = np.asarray(prep.rect)
    order = np.argsort(np.where(np.asarray(prep.valid), dep, np.inf),
                       kind="stable")
    w, h = cam.width, cam.height
    touched = np.zeros(xy.shape[0], np.int64)
    for py in range(h):
        for px in range(w):
            tx, ty = px // tile_size, py // tile_size
            T = 1.0
            for gi in order:
                if not (rect[gi, 0] <= tx < rect[gi, 2]
                        and rect[gi, 1] <= ty < rect[gi, 3]):
                    continue
                dx, dy = xy[gi, 0] - px, xy[gi, 1] - py
                power = (-0.5 * (con[gi, 0] * dx * dx + con[gi, 2] * dy * dy)
                         - con[gi, 1] * dx * dy)
                if power > 0:
                    continue
                alpha = min(0.99, opa[gi] * np.exp(power))
                if alpha < 1 / 255:
                    continue
                T_new = T * (1 - alpha)
                if T_new < 1e-4:
                    break
                touched[gi] += 1
                T = T_new
    return touched


class TestNTouched:
    def test_matches_oracle(self, rng):
        g = random_scene(rng, n=24, sh_degree=1)
        cam = make_camera(width=32, height=32)
        cfg = RasterizerConfig(backend="jnp", max_pairs=1 << 12,
                               max_per_tile=64, chunk=16)
        out = rasterize(g, cam, cfg, return_n_touched=True)
        ours = np.asarray(out.n_touched)
        ref = _oracle_n_touched(g, cam)
        np.testing.assert_array_equal(ours, ref)
        assert ours.sum() > 0

    def test_render_dict_passthrough(self, rng):
        g = random_scene(rng, n=16, sh_degree=1)
        cam = make_camera(width=32, height=16)
        cfg = RasterizerConfig(backend="jnp", max_pairs=1 << 12,
                               max_per_tile=64, chunk=16)
        d = render(g, cam, cfg, return_n_touched=True)
        assert d["n_touched"].shape == (16,)
        d2 = render(g, cam, cfg)
        assert "n_touched" not in d2

    def test_off_by_default_is_none(self, rng):
        g = random_scene(rng, n=8, sh_degree=1)
        cam = make_camera(width=16, height=16)
        cfg = RasterizerConfig(backend="jnp", max_pairs=1 << 10,
                               max_per_tile=32, chunk=16)
        out = rasterize(g, cam, cfg)
        assert out.n_touched is None
