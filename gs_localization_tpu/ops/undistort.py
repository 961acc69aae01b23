"""Native image undistortion (OpenCV radial-tangential model).

The reference shims this through cv2.initUndistortRectifyMap/remap in its
dataset loaders (gs_localization/pipelines/tools/dataset.py). Here the map
computation and bilinear remap are pure jnp (one-time map per camera, then a
gather per image — vmappable over batches).

Model (OPENCV params k1 k2 p1 p2 [k3]):
  x' = x(1 + k1 r^2 + k2 r^4 + k3 r^6) + 2 p1 x y + p2 (r^2 + 2 x^2)
  y' = y(1 + k1 r^2 + k2 r^4 + k3 r^6) + p1 (r^2 + 2 y^2) + 2 p2 x y
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def undistort_map(
    width: int, height: int, fx, fy, cx, cy,
    k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
) -> jnp.ndarray:
    """(H, W, 2) source pixel coordinates for each undistorted target pixel."""
    xs = (jnp.arange(width, dtype=jnp.float32) - cx) / fx
    ys = (jnp.arange(height, dtype=jnp.float32) - cy) / fy
    x = xs[None, :].repeat(height, 0)
    y = ys[:, None].repeat(width, 1)
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    u = xd * fx + cx
    v = yd * fy + cy
    return jnp.stack([u, v], axis=-1)


@functools.partial(jax.jit, static_argnames=())
def remap_bilinear(image: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` (H, W[, C]) at ``src`` (H', W', 2) float coords;
    out-of-bounds samples are zero."""
    h, w = image.shape[:2]
    u = src[..., 0]
    v = src[..., 1]
    valid = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    u = jnp.clip(u, 0.0, float(w - 1))
    v = jnp.clip(v, 0.0, float(h - 1))
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    fx_ = u - x0
    fy_ = v - y0
    if image.ndim == 3:
        fx_ = fx_[..., None]
        fy_ = fy_[..., None]
        valid_b = valid[..., None]
    else:
        valid_b = valid
    i00 = image[y0, x0]
    i01 = image[y0, jnp.minimum(x0 + 1, w - 1)]
    i10 = image[jnp.minimum(y0 + 1, h - 1), x0]
    i11 = image[jnp.minimum(y0 + 1, h - 1), jnp.minimum(x0 + 1, w - 1)]
    out = (i00 * (1 - fx_) * (1 - fy_) + i01 * fx_ * (1 - fy_)
           + i10 * (1 - fx_) * fy_ + i11 * fx_ * fy_)
    return jnp.where(valid_b, out, 0.0)


def undistort_image(
    image: jnp.ndarray, fx, fy, cx, cy, dist_params,
) -> jnp.ndarray:
    """Convenience: build the map and remap one image."""
    h, w = image.shape[:2]
    k = list(dist_params) + [0.0] * (5 - len(dist_params))
    src = undistort_map(w, h, fx, fy, cx, cy, *k[:5])
    return remap_bilinear(image, src)
