"""Per-Gaussian preprocessing: projection, EWA covariance, culling, SH color.

Vectorized over all P Gaussians (the reference runs one CUDA thread per
Gaussian, forward.cu:156-256; here the whole stage is a handful of fused VPU
ops). Differentiable w.r.t. Gaussian parameters AND camera inputs — the
camera-side gradients are what replace the external
``diff_gaussian_rasterization_pose`` CUDA kernel (SURVEY.md §2.3).

Math parity notes (vs cuda_rasterizer/forward.cu):
- near cull: view-space z <= 0.2 drops the Gaussian (auxiliary.h:139-164)
- projection w-epsilon 1e-7 (forward.cu:197)
- Jacobian clamp at 1.3*tan(fov) (forward.cu:82-87); clamp gradient gating
  happens automatically through jnp.clip
- +0.3 low-pass on cov2D diagonal (forward.cu:110-111)
- radius = ceil(3*sqrt(max eigenvalue)), eigenvalue floor 0.1 (forward.cu:229-232)
- ndc -> pixel ((v+1)*S - 1)/2 (auxiliary.h:41-44)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import sh as sh_lib
from ..core.camera import Camera
from ..core.gaussians import GaussianParams


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (P, ...))."""

    depths: jnp.ndarray        # (P,)   view-space z
    means2d: jnp.ndarray       # (P, 2) pixel coords
    conic: jnp.ndarray         # (P, 3) inverse 2D covariance (a, b, c)
    rgb: jnp.ndarray           # (P, 3) view-dependent color
    opacity: jnp.ndarray       # (P,)   activated opacity
    radii: jnp.ndarray         # (P,)   int32 screen radius (0 = culled)
    rect: jnp.ndarray          # (P, 4) int32 tile rect (x0, y0, x1, y1)
    tiles_touched: jnp.ndarray  # (P,)  int32
    valid: jnp.ndarray         # (P,)  bool


def build_cov3d(scaling: jnp.ndarray, rotation_unit: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """Sigma = R S^2 R^T from activated scales and unit wxyz quats. (P, 3, 3)."""
    s = scaling * scale_modifier
    w, x, y, z = (rotation_unit[:, 0], rotation_unit[:, 1],
                  rotation_unit[:, 2], rotation_unit[:, 3])
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )  # (P, 3, 3)
    RS = R * s[:, None, :]          # R @ diag(s)
    return RS @ jnp.swapaxes(RS, -1, -2)


def preprocess(
    gaussians: GaussianParams,
    camera: Camera,
    tile_size: int = 16,
    scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,
    near_cull: float = 0.2,
) -> Preprocessed:
    xyz = gaussians.xyz                      # (P, 3)
    p = xyz.shape[0]
    w2c = camera.w2c
    full_proj = camera.full_proj
    fx, fy = camera.fx, camera.fy
    width, height = camera.width, camera.height
    grid_x = -(-width // tile_size)
    grid_y = -(-height // tile_size)

    # ---- view / clip transforms -------------------------------------
    p_view = xyz @ w2c[:3, :3].T + w2c[:3, 3]            # (P, 3)
    depth = p_view[:, 2]
    p_hom = xyz @ full_proj[:3, :3].T + full_proj[:3, 3]  # xyz rows of clip
    p_w_hom = xyz @ full_proj[3, :3] + full_proj[3, 3]
    inv_w = 1.0 / (p_w_hom + 1e-7)
    p_proj = p_hom * inv_w[:, None]

    # ---- 3D covariance -> EWA 2D covariance -------------------------
    cov3d = build_cov3d(gaussians.get_scaling, gaussians.get_rotation, scale_modifier)
    cov_cam = jnp.einsum("ij,pjk,lk->pil", w2c[:3, :3], cov3d, w2c[:3, :3])

    z_safe = jnp.where(jnp.abs(depth) < 1e-6, 1e-6, depth)
    lim_x = 1.3 * camera.tan_fovx
    lim_y = 1.3 * camera.tan_fovy
    tx = jnp.clip(p_view[:, 0] / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(p_view[:, 1] / z_safe, -lim_y, lim_y) * z_safe
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # J rows: d(pix)/d(cam xyz) up to focal scaling (2, 3) per Gaussian
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    # cov2d = J Vc J^T with J = [[j00, 0, j02], [0, j11, j12]]
    a = (
        j00 * j00 * cov_cam[:, 0, 0]
        + 2.0 * j00 * j02 * cov_cam[:, 0, 2]
        + j02 * j02 * cov_cam[:, 2, 2]
    ) + 0.3
    b = (
        j00 * j11 * cov_cam[:, 0, 1]
        + j00 * j12 * cov_cam[:, 0, 2]
        + j02 * j11 * cov_cam[:, 1, 2]
        + j02 * j12 * cov_cam[:, 2, 2]
    )
    c = (
        j11 * j11 * cov_cam[:, 1, 1]
        + 2.0 * j11 * j12 * cov_cam[:, 1, 2]
        + j12 * j12 * cov_cam[:, 2, 2]
    ) + 0.3

    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # ---- screen position & tile rect --------------------------------
    px = ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5
    means2d = jnp.stack([px, py], axis=-1)

    # Binning uses an opacity-aware radius: beyond
    # r = sqrt(2 ln(255 opa) lambda_max) every pixel fails the blend's
    # alpha >= 1/255 gate (forward.cu:341-345), so pairs outside it render
    # EXACTLY nothing — dropping them changes no output, only pair count.
    # The reference's fixed 3-sigma radius (forward.cu:229-232) is kept for
    # the `radii` output / visibility semantics.
    opacity = gaussians.get_opacity[:, 0]
    r_cull = jnp.sqrt(jnp.maximum(
        2.0 * jnp.log(jnp.maximum(opacity, 1e-30) * 255.0), 0.0)
        * jnp.maximum(lambda1, 0.0))
    rad_i = jnp.minimum(radius_f, jnp.ceil(r_cull))
    x0 = jnp.clip(jnp.floor((px - rad_i) / tile_size), 0, grid_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((py - rad_i) / tile_size), 0, grid_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((px + rad_i + tile_size - 1) / tile_size), 0, grid_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((py + rad_i + tile_size - 1) / tile_size), 0, grid_y).astype(jnp.int32)

    # non-finite projections (NaN params mid-training, inf radii) must cull,
    # not propagate: NaN survives jnp.clip and turns int casts into garbage,
    # which the stream path would feed to DMA offsets (a kernel fault, not
    # just bad pixels like the reference's CUDA)
    finite = (jnp.isfinite(px) & jnp.isfinite(py) & jnp.isfinite(radius_f)
              & jnp.isfinite(r_cull) & jnp.isfinite(depth))
    base_valid = (
        gaussians.live
        & finite
        & (depth > near_cull)
        & (jnp.abs(det) > 1e-12)
    )
    valid = base_valid & ((x1 - x0) * (y1 - y0) > 0) & (r_cull > 0.0)
    tiles_touched = jnp.where(valid, (x1 - x0) * (y1 - y0), 0).astype(jnp.int32)
    # radii/visibility keep the reference's 3-sigma semantics (the rect above
    # may be empty for near-transparent Gaussians the reference still rates
    # visible)
    rx0 = jnp.clip(jnp.floor((px - radius_f) / tile_size), 0, grid_x)
    ry0 = jnp.clip(jnp.floor((py - radius_f) / tile_size), 0, grid_y)
    rx1 = jnp.clip(jnp.floor((px + radius_f + tile_size - 1) / tile_size), 0, grid_x)
    ry1 = jnp.clip(jnp.floor((py + radius_f + tile_size - 1) / tile_size), 0, grid_y)
    ref_valid = base_valid & ((rx1 - rx0) * (ry1 - ry0) > 0)
    radii = jnp.where(ref_valid, radius_f, 0.0).astype(jnp.int32)

    # ---- color ------------------------------------------------------
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        dirs = xyz - camera.campos
        # rsqrt-with-floor: keeps the gradient NaN-free at dirs == 0 (dead
        # slots sit at the origin; norm() would give 0/0 in the backward)
        sq = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
        dirs = dirs * jax.lax.rsqrt(jnp.maximum(sq, 1e-20))
        rgb = sh_lib.sh_to_clamped_rgb(
            gaussians.get_features, dirs, gaussians.sh_degree
        )

    opacity = gaussians.get_opacity[:, 0]

    return Preprocessed(
        depths=depth,
        means2d=means2d,
        conic=conic,
        rgb=rgb,
        opacity=opacity,
        radii=radii,
        rect=jnp.stack([x0, y0, x1, y1], axis=-1),
        tiles_touched=tiles_touched,
        valid=valid,
    )
