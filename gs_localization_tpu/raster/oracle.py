"""Dense sequential oracle renderer.

Composites every (valid) Gaussian at every pixel with the *sequential*
front-to-back recurrence, exactly as one CUDA thread does in the reference
(forward.cu:263-379) — a lax.scan over depth-sorted Gaussians with per-pixel
carried transmittance T, sticky ``done`` flag, and the same skip rules.

This is O(P * pixels) and slow on purpose: it is an independent correctness
oracle for the tiled cumsum-formulation rasterizer (different algorithm, same
semantics), and it is fully differentiable, so it also cross-checks gradients.

``respect_tile_rect=True`` applies the same tile-rect coverage culling the
tiled path uses, making the two bitwise-comparable; ``False`` gives the
"ideal" dense render.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from .blend import ALPHA_MAX, ALPHA_MIN
from .preprocess import preprocess


class OracleOutput(NamedTuple):
    color: jnp.ndarray
    depth: jnp.ndarray
    alpha: jnp.ndarray


def render_oracle(
    gaussians: GaussianParams,
    camera: Camera,
    bg: Optional[jnp.ndarray] = None,
    tile_size: int = 16,
    respect_tile_rect: bool = True,
) -> OracleOutput:
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    w, h = camera.width, camera.height
    prep = preprocess(gaussians, camera, tile_size=tile_size)

    order = jnp.argsort(jnp.where(prep.valid, prep.depths, jnp.inf))
    xy = prep.means2d[order]
    con = prep.conic[order]
    opa = jnp.where(prep.valid[order], prep.opacity[order], 0.0)
    col = prep.rgb[order]
    dep = prep.depths[order]
    rect = prep.rect[order]

    px = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, axis=0).reshape(-1)
    py = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, axis=1).reshape(-1)
    tile_x = (px / tile_size).astype(jnp.int32)
    tile_y = (py / tile_size).astype(jnp.int32)

    def step(carry, inp):
        t, c, d, done = carry
        g_xy, g_con, g_opa, g_col, g_dep, g_rect = inp
        dx = g_xy[0] - px
        dy = g_xy[1] - py
        power = -0.5 * (g_con[0] * dx * dx + g_con[2] * dy * dy) - g_con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, g_opa * jnp.exp(jnp.minimum(power, 0.0)))
        skip = (power > 0.0) | (alpha < ALPHA_MIN)
        if respect_tile_rect:
            covered = (
                (tile_x >= g_rect[0]) & (tile_x < g_rect[2])
                & (tile_y >= g_rect[1]) & (tile_y < g_rect[3])
            )
            skip = skip | ~covered
        test_t = t * (1.0 - alpha)
        saturate = (test_t < 1e-4) & ~skip
        done_new = done | saturate
        apply = ~skip & ~done
        weight = jnp.where(apply & ~saturate, alpha * t, 0.0)
        c = c + weight[:, None] * g_col[None, :]
        d = d + weight * g_dep
        t = jnp.where(apply & ~saturate, test_t, t)
        return (t, c, d, done_new), None

    npix = h * w
    init = (
        jnp.ones((npix,), jnp.float32),
        jnp.zeros((npix, 3), jnp.float32),
        jnp.zeros((npix,), jnp.float32),
        jnp.zeros((npix,), bool),
    )
    (t, c, d, _), _ = jax.lax.scan(step, init, (xy, con, opa, col, dep, rect))
    color = (c + t[:, None] * bg[None, :]).reshape(h, w, 3)
    return OracleOutput(
        color=color, depth=d.reshape(h, w), alpha=(1.0 - t).reshape(h, w)
    )
