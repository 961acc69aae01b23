"""Classical DoG + SIFT (rootsift) features in pure JAX — no weights needed.

Native equivalent of hloc's ``dog``/``sift`` extractor confs
(/root/reference/hloc/extractors/dog.py), which delegate to pycolmap's
VLFeat SIFT (C++). This is a from-scratch TPU implementation of the same
capability: a Gaussian scale-space pyramid, DoG extrema detection with peak
(0.01) and edge (r=10) tests, orientation assignment from a 36-bin gradient
histogram, and the 4x4x8 gradient-histogram SIFT descriptor with 0.2
clipping and L1-root ("rootsift") normalization (dog.py:12-16).

Design notes (TPU): octaves are static shapes; extrema become masked top-k
(fixed capacity) instead of nonzero(); orientation + descriptor are a vmap
over keypoints of fixed-size gather windows — everything jits into one
program per image size. Not bit-identical to VLFeat (different blur
boundaries, single orientation per keypoint), but the same algorithm and
invariances, verified by shifted/rotated matching tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .features import Features

N_SCALES = 3            # sampled scales per octave
SIGMA0 = 1.6
PEAK_THRESHOLD = 0.01   # hloc conf default
EDGE_R = 10.0
N_ORI_BINS = 36
DESC_WIDTH = 4          # 4x4 spatial bins
DESC_ORI = 8


def _gauss_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    r = max(1, int(np.ceil(3 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    kj = jnp.asarray(k)
    img = img[None, :, :, None]
    pad = ((r, r), (0, 0))
    out = jax.lax.conv_general_dilated(
        img, kj.reshape(-1, 1, 1, 1), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        out, kj.reshape(1, -1, 1, 1), (1, 1), ((0, 0), (r, r)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, :, :, 0]


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    return img[::2, ::2]


class _OctaveKps(NamedTuple):
    xy: jnp.ndarray        # (K, 2) octave-local float coords
    score: jnp.ndarray     # (K,) |DoG|
    sigma: jnp.ndarray     # (K,) blur level (octave-local)


def _detect_octave(gauss, dogs, k_per_octave: int) -> _OctaveKps:
    """3x3x3 extrema of the middle DoG slices, peak + edge tested."""
    D = jnp.stack(dogs)                         # (S+1, H, W)
    h, w = D.shape[1:]
    kps_xy, kps_sc, kps_sg = [], [], []
    for s in range(1, D.shape[0] - 1):
        d = D[s]
        stackn = jax.lax.reduce_window(
            D[s - 1:s + 2], -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1),
            "SAME")[1]
        stackx = jax.lax.reduce_window(
            D[s - 1:s + 2], jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1),
            "SAME")[1]
        is_ext = ((d >= stackn) | (d <= stackx)) & (jnp.abs(d)
                                                    > PEAK_THRESHOLD)
        # 2x2 spatial Hessian edge test (Lowe §4.1)
        dxx = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
        dyy = jnp.roll(d, -1, 0) + jnp.roll(d, 1, 0) - 2 * d
        dxy = 0.25 * (jnp.roll(jnp.roll(d, -1, 0), -1, 1)
                      + jnp.roll(jnp.roll(d, 1, 0), 1, 1)
                      - jnp.roll(jnp.roll(d, -1, 0), 1, 1)
                      - jnp.roll(jnp.roll(d, 1, 0), -1, 1))
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        not_edge = (det > 0) & (tr * tr / det
                                < (EDGE_R + 1) ** 2 / EDGE_R)
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        interior = (yy >= 4) & (yy < h - 4) & (xx >= 4) & (xx < w - 4)
        score = jnp.where(is_ext & not_edge & interior, jnp.abs(d), 0.0)
        vals, idx = jax.lax.top_k(score.reshape(-1), k_per_octave)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        # quadratic sub-pixel refinement in x, y
        gx = 0.5 * (d.reshape(-1)[jnp.clip(idx + 1, 0, h * w - 1)]
                    - d.reshape(-1)[jnp.clip(idx - 1, 0, h * w - 1)])
        gy = 0.5 * (d.reshape(-1)[jnp.clip(idx + w, 0, h * w - 1)]
                    - d.reshape(-1)[jnp.clip(idx - w, 0, h * w - 1)])
        hxx = dxx.reshape(-1)[idx]
        hyy = dyy.reshape(-1)[idx]
        off_x = jnp.clip(-gx / jnp.where(jnp.abs(hxx) > 1e-8, hxx, 1e-8),
                         -0.5, 0.5)
        off_y = jnp.clip(-gy / jnp.where(jnp.abs(hyy) > 1e-8, hyy, 1e-8),
                         -0.5, 0.5)
        kps_xy.append(jnp.stack([xs + off_x, ys + off_y], 1))
        kps_sc.append(vals)
        kps_sg.append(jnp.full((k_per_octave,),
                               SIGMA0 * 2.0 ** (s / N_SCALES)))
    return _OctaveKps(xy=jnp.concatenate(kps_xy),
                      score=jnp.concatenate(kps_sc),
                      sigma=jnp.concatenate(kps_sg))


def _orientation_and_desc(gauss_img, xy, sigma):
    """Dominant orientation + 128-d SIFT descriptor for one keypoint."""
    h, w = gauss_img.shape
    R = 8                                        # fixed half-window (16x16)

    def sample(pts):
        x = jnp.clip(pts[..., 0], 0.0, w - 1.001)
        y = jnp.clip(pts[..., 1], 0.0, h - 1.001)
        x0 = x.astype(jnp.int32)
        y0 = y.astype(jnp.int32)
        fx, fy = x - x0, y - y0
        g = gauss_img
        v = (g[y0, x0] * (1 - fx) * (1 - fy) + g[y0, x0 + 1] * fx * (1 - fy)
             + g[y0 + 1, x0] * (1 - fx) * fy + g[y0 + 1, x0 + 1] * fx * fy)
        return v

    # orientation: 36-bin histogram of gradient angles in the window
    gy_, gx_ = jnp.meshgrid(jnp.arange(-R, R, dtype=jnp.float32),
                            jnp.arange(-R, R, dtype=jnp.float32),
                            indexing="ij")
    base = xy[None, None, :] + jnp.stack([gx_, gy_], -1)
    dx = sample(base + jnp.array([1.0, 0.0])) - sample(
        base - jnp.array([1.0, 0.0]))
    dy = sample(base + jnp.array([0.0, 1.0])) - sample(
        base - jnp.array([0.0, 1.0]))
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)                   # [-pi, pi]
    wgt = mag * jnp.exp(-(gx_ ** 2 + gy_ ** 2) / (2 * (1.5 * sigma) ** 2))
    bins = ((ang + np.pi) / (2 * np.pi) * N_ORI_BINS).astype(jnp.int32)
    bins = jnp.clip(bins, 0, N_ORI_BINS - 1)
    hist = jnp.zeros(N_ORI_BINS).at[bins.reshape(-1)].add(wgt.reshape(-1))
    # smooth and take the peak
    hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    ori = (jnp.argmax(hist).astype(jnp.float32) + 0.5) \
        / N_ORI_BINS * 2 * np.pi - np.pi

    # descriptor: rotate the sampling grid by -ori
    # grid in keypoint frame -> image frame: rotate by +ori, matching the
    # "image angle - ori" reduction of gradient directions below
    c, s = jnp.cos(ori), jnp.sin(ori)
    rx = c * gx_ - s * gy_
    ry = s * gx_ + c * gy_
    pts = xy[None, None, :] + jnp.stack([rx, ry], -1)
    ddx = sample(pts + jnp.array([1.0, 0.0])) - sample(
        pts - jnp.array([1.0, 0.0]))
    ddy = sample(pts + jnp.array([0.0, 1.0])) - sample(
        pts - jnp.array([0.0, 1.0]))
    dmag = jnp.sqrt(ddx * ddx + ddy * ddy)
    dang = jnp.arctan2(ddy, ddx) - ori
    dang = jnp.mod(dang + np.pi, 2 * np.pi)     # [0, 2pi)
    dwgt = dmag * jnp.exp(-(gx_ ** 2 + gy_ ** 2) / (2 * (0.5 * 2 * R) ** 2))

    # soft-assign to 4x4 spatial x 8 orientation bins
    sx = (gx_ + R) / (2 * R) * DESC_WIDTH - 0.5   # [-0.5, 3.5]
    sy = (gy_ + R) / (2 * R) * DESC_WIDTH - 0.5
    so = dang / (2 * np.pi) * DESC_ORI
    desc = jnp.zeros((DESC_WIDTH, DESC_WIDTH, DESC_ORI))
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    o0 = jnp.floor(so).astype(jnp.int32)
    fx, fy, fo = sx - x0, sy - y0, so - o0
    for ix, wx in ((x0, 1 - fx), (x0 + 1, fx)):
        for iy, wy in ((y0, 1 - fy), (y0 + 1, fy)):
            for io, wo in ((o0 % DESC_ORI, 1 - fo), ((o0 + 1) % DESC_ORI, fo)):
                valid = (ix >= 0) & (ix < DESC_WIDTH) & (iy >= 0) \
                    & (iy < DESC_WIDTH)
                wv = jnp.where(valid, dwgt * wx * wy * wo, 0.0)
                desc = desc.at[jnp.clip(iy, 0, 3), jnp.clip(ix, 0, 3),
                               io].add(wv)
    v = desc.reshape(-1)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    v = jnp.minimum(v, 0.2)                      # Lowe clipping
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    # rootsift (dog.py:12-16)
    v = v / (jnp.sum(jnp.abs(v)) + 1e-6)
    v = jnp.sqrt(jnp.maximum(v, 1e-6))
    v = v / (jnp.linalg.norm(v) + 1e-6)
    return v, ori


@functools.partial(jax.jit, static_argnames=("num_keypoints", "n_octaves"))
def extract_sift(image_gray: jnp.ndarray, num_keypoints: int = 1024,
                 n_octaves: int = 3) -> Features:
    """(H, W) grayscale in [0, 1] -> rootsift Features (128-d)."""
    img = image_gray.astype(jnp.float32)
    per_oct = max(num_keypoints // n_octaves, 16)
    all_xy, all_score, all_desc = [], [], []
    all_ori, all_scale = [], []
    base = img
    for o in range(n_octaves):
        sigmas = [SIGMA0 * 2.0 ** (s / N_SCALES)
                  for s in range(N_SCALES + 2)]
        gs = [_gauss_blur(base, sig) for sig in sigmas]
        dogs = [gs[i + 1] - gs[i] for i in range(len(gs) - 1)]
        det = _detect_octave(gs, dogs, per_oct)
        # describe on the octave's mid-blur image
        mid = gs[len(gs) // 2]
        desc, ori = jax.vmap(
            lambda p, sg: _orientation_and_desc(mid, p, sg)
        )(det.xy, det.sigma)
        scale_f = float(2 ** o)
        all_xy.append(det.xy * scale_f)
        all_score.append(det.score)
        all_desc.append(desc)
        all_ori.append(ori)
        all_scale.append(det.sigma * scale_f)
        if o + 1 < n_octaves:
            base = _downsample2(gs[N_SCALES])
    xy = jnp.concatenate(all_xy)
    score = jnp.concatenate(all_score)
    desc = jnp.concatenate(all_desc)
    ori = jnp.concatenate(all_ori)
    scale = jnp.concatenate(all_scale)
    vals, idx = jax.lax.top_k(score, num_keypoints)
    valid = vals > 0
    return Features(
        keypoints=jnp.where(valid[:, None], xy[idx], -1.0),
        scores=jnp.where(valid, vals, 0.0),
        descriptors=jnp.where(valid[:, None], desc[idx], 0.0),
        scales=jnp.where(valid, scale[idx], 0.0),
        orientations=jnp.where(valid, ori[idx], 0.0),
    )
