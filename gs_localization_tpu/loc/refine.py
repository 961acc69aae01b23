"""Gradient-descent pose refinement against a pretrained 3DGS map.

Reference flow (/root/reference/gs_localization/pipelines/
7scenes_localize_full_dslam.py:29-93 + tools/descent_utils.py:85-123 +
tools/pose_utils.py:105-122):

  per query: <=50 Adam(lr 1e-3) steps over [rot_delta, trans_delta,
  exposure_a, exposure_b]; each step renders, computes the masked tracking
  loss, backprops to the SE(3) tangent, steps, then retracts
  w2c <- exp(tau) @ w2c and re-zeros tau; stop when ||tau_update|| < 1e-4.

Here the whole loop is a jitted lax.while_loop (renders + gradients inside),
and queries batch via vmap — the reference is strictly sequential per query,
so batching is the headline TPU throughput win (SURVEY.md §3.2).

The tracking loss reproduces get_loss_tracking_rgb/rgbd exactly: exposure
compensation exp(a)*I + b, pixel mask = grad_mask (x keypoint mask upstream),
opacity mask alpha > 0.99, RGBD adds (1-alpha_cfg)=0.01 x masked depth L1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..raster import RasterizerConfig, rasterize


@struct.dataclass
class TrackingConfig:
    num_iters: int = struct.field(pytree_node=False, default=50)
    lr: float = struct.field(pytree_node=False, default=1e-3)
    convergence: float = struct.field(pytree_node=False, default=1e-4)
    opacity_threshold: float = struct.field(pytree_node=False, default=0.99)
    alpha: float = struct.field(pytree_node=False, default=0.99)
    monocular: bool = struct.field(pytree_node=False, default=False)
    # recompute the tile lists every N iterations (1 = every iteration, the
    # reference behavior). The pose moves ~1e-3/step, so lists stay valid for
    # several steps — binning dominates the per-iteration cost on TPU.
    rebin_every: int = struct.field(pytree_node=False, default=1)
    # pose_mode: gather pose-independent params per pair once per rebin and
    # project elementwise per iteration (raster/pose_mode.py) — removes the
    # per-iteration gather/scatter that dominates the TPU step cost. rgb is
    # frozen at the rebin view direction (error O(pose delta) ~ 1e-3).
    pose_mode: bool = struct.field(pytree_node=False, default=False)
    # normalize the RENDERED depth by alpha before the depth L1. The
    # rasterizer accumulates D = sum(d_i a_i T_i) (reference forward.cu:
    # 336-346 depth fork) which reads ~alpha*true_depth, while sensor /
    # on-disk gt depth is true depth — inside the opacity>0.99 band that
    # mismatch is a systematic up-to-(1-alpha)*depth bias (~4 cm at 4 m)
    # that the 0.01-weight depth term pulls the pose toward. Normalizing
    # restores metric semantics; at alpha->1 it is the identity, so the
    # reference behavior is the limit case.
    normalize_depth: bool = struct.field(pytree_node=False, default=False)


class RefineResult(NamedTuple):
    w2c: jnp.ndarray          # (4, 4) refined pose
    exposure_ab: jnp.ndarray  # (2,)
    num_iters: jnp.ndarray    # () int32 iterations actually run
    final_loss: jnp.ndarray   # ()
    overflow: Optional[jnp.ndarray] = None  # () bool: any binning capacity
    #   (pair or per-tile) exceeded during the loop -> truncated renders;
    #   production surfaces this and grows max_per_tile (VERDICT r2 #4)


def tracking_loss(
    color: jnp.ndarray,
    depth: jnp.ndarray,
    alpha: jnp.ndarray,
    exposure_ab: jnp.ndarray,
    gt_image: jnp.ndarray,
    grad_mask: jnp.ndarray,
    cfg: TrackingConfig,
    gt_depth: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    image_ab = jnp.exp(exposure_ab[0]) * color + exposure_ab[1]
    opacity_mask = (alpha > cfg.opacity_threshold).astype(color.dtype)[..., None]
    gm = grad_mask.astype(color.dtype)[..., None]
    l1 = opacity_mask * jnp.abs(image_ab * gm - gt_image * gm)
    loss = jnp.mean(l1)
    if not cfg.monocular:
        assert gt_depth is not None
        dmask = (
            (gt_depth > 0.01).astype(depth.dtype)
            * opacity_mask[..., 0]
            * grad_mask.astype(depth.dtype)
        )
        if cfg.normalize_depth:
            depth = depth / jnp.maximum(alpha, 1e-6)
        l1_d = jnp.abs(depth * dmask - gt_depth * dmask)
        loss = loss + (1.0 - cfg.alpha) * jnp.mean(l1_d)
    return loss


def refine_pose(
    gaussians: GaussianParams,
    camera: Camera,
    gt_image: jnp.ndarray,
    grad_mask: jnp.ndarray,
    cfg: TrackingConfig = TrackingConfig(),
    raster_cfg: RasterizerConfig = RasterizerConfig(),
    gt_depth: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
) -> RefineResult:
    """Refine one camera pose. jit/vmap-safe."""

    from ..raster.rasterize import compute_bins

    if cfg.pose_mode:
        from ..raster.rasterize import _blend_mode
        from ..raster.pose_mode import (
            build_pair_pack, build_stream_pair_pack, render_pose_mode)

        # pallas backends take the UNCAPPED stream layout (no max_per_tile,
        # no truncation-retry: the r3 bench crash class is structurally
        # gone); the jnp twin keeps the legacy capped pack
        if (_blend_mode(raster_cfg.backend) in ("pallas", "pallas_interpret")
                and raster_cfg.use_stream):
            def make_bins(cam):
                return build_stream_pair_pack(gaussians, cam, raster_cfg)
        else:
            def make_bins(cam):
                return build_pair_pack(gaussians, cam, raster_cfg)

        def bins_overflow(pack):
            return pack.overflow

        def loss_at(w2c, tau, ab, pack):
            cam = camera.replace(w2c=w2c).with_delta(tau)
            color, depth, alpha = render_pose_mode(pack, cam, raster_cfg,
                                                   bg=bg)
            return tracking_loss(color, depth, alpha, ab, gt_image,
                                 grad_mask, cfg, gt_depth=gt_depth)
    else:
        def make_bins(cam):
            return compute_bins(gaussians, cam, raster_cfg)

        def bins_overflow(bins):
            return bins.overflow | bins.tile_overflow

        def loss_at(w2c, tau, ab, bins):
            cam = camera.replace(w2c=w2c).with_delta(tau)
            out = rasterize(gaussians, cam, raster_cfg, bg=bg, bins=bins)
            return tracking_loss(
                out.color, out.depth, out.alpha, ab, gt_image, grad_mask,
                cfg, gt_depth=gt_depth,
            )

    grad_fn = jax.value_and_grad(loss_at, argnums=(1, 2))

    # Adam state over the 6-dim tangent and the 2-dim exposure
    def adam_update(g, m, v, t):
        b1, b2, eps = 0.9, 0.999, 1e-8
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1**t)
        vhat = v / (1 - b2**t)
        return -cfg.lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    def cond(state):
        it, done, *_ = state
        return (it < cfg.num_iters) & ~done

    def body(state):
        it, done, w2c, ab, m6, v6, m2, v2, loss, bins, ovf = state
        if cfg.rebin_every > 1:
            bins = jax.lax.cond(
                it % cfg.rebin_every == 0,
                lambda: make_bins(camera.replace(w2c=w2c)),
                lambda: bins,
            )
        else:
            bins = make_bins(camera.replace(w2c=w2c))
        loss, (g_tau, g_ab) = grad_fn(w2c, jnp.zeros(6), ab, bins)
        t = (it + 1).astype(jnp.float32)
        upd6, m6, v6 = adam_update(g_tau, m6, v6, t)
        upd2, m2, v2 = adam_update(g_ab, m2, v2, t)
        # retraction: fold the updated tangent into the pose, re-zero tau
        from ..core import se3
        w2c = se3.apply_delta(upd6, w2c)
        ab = ab + upd2
        converged = jnp.linalg.norm(upd6) < cfg.convergence
        ovf = ovf | bins_overflow(bins)
        return it + 1, converged, w2c, ab, m6, v6, m2, v2, loss, bins, ovf

    bins0 = make_bins(camera)
    init = (
        jnp.int32(0), jnp.bool_(False), camera.w2c, jnp.zeros(2),
        jnp.zeros(6), jnp.zeros(6), jnp.zeros(2), jnp.zeros(2),
        jnp.float32(0.0), bins0, bins_overflow(bins0),
    )
    out_state = jax.lax.while_loop(cond, body, init)
    it, _, w2c, ab = out_state[0], out_state[1], out_state[2], out_state[3]
    loss, ovf = out_state[8], out_state[10]
    return RefineResult(w2c=w2c, exposure_ab=ab, num_iters=it,
                        final_loss=loss, overflow=ovf)


def refine_poses_batch(
    gaussians: GaussianParams,
    cameras: Camera,                # batched pytree: w2c (B,4,4), fx (B,), ...
    gt_images: jnp.ndarray,         # (B, H, W, 3)
    grad_masks: jnp.ndarray,        # (B, H, W)
    cfg: TrackingConfig = TrackingConfig(),
    raster_cfg: RasterizerConfig = RasterizerConfig(),
    gt_depths: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
) -> RefineResult:
    """vmap over queries (the reference loops sequentially, SURVEY.md §3.2)."""
    fn = lambda cam, img, mask, dep: refine_pose(
        gaussians, cam, img, mask, cfg, raster_cfg, gt_depth=dep, bg=bg
    )
    if gt_depths is None:
        fn2 = lambda cam, img, mask: refine_pose(
            gaussians, cam, img, mask, cfg, raster_cfg, bg=bg
        )
        return jax.vmap(fn2)(cameras, gt_images, grad_masks)
    return jax.vmap(fn)(cameras, gt_images, grad_masks, gt_depths)
