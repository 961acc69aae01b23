"""Data-parallel map training and query-parallel localization.

The reference is strictly single-GPU single-process (SURVEY.md §2.6); this
module is the first of the new distributed layers: a 1-D ``data`` mesh where

- map training: each device renders a different camera against the replicated
  Gaussian map; parameter gradients are ``psum`` over the mesh (the classic
  DP recipe — XLA lowers the psum onto ICI),
- localization: queries shard across devices and refine independently
  (embarrassingly parallel; no collectives in the loop).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..loc.refine import RefineResult, TrackingConfig, refine_pose
from ..raster import RasterizerConfig, rasterize
from ..mapping import losses
from ..mapping.train import TRAINABLE


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def dp_train_grads(
    mesh: Mesh,
    gaussians: GaussianParams,
    cameras: Camera,          # batched pytree, leading dim = n_devices * k
    gt_images: jnp.ndarray,   # (B, H, W, 3)
    raster_cfg: RasterizerConfig,
    lambda_dssim: float = 0.2,
):
    """Mean loss + psum'd gradients for a batch of cameras sharded over the
    mesh. Gaussians are replicated; grads are reduced over 'data'."""
    axis = mesh.axis_names[0]

    trainable = {k: getattr(gaussians, k) for k in TRAINABLE}

    def device_fn(trainable_rep, cams_local, imgs_local):
        def one(cam, img):
            def loss_fn(tr):
                g = gaussians.replace(**tr)
                out = rasterize(g, cam, raster_cfg)
                l, _ = losses.training_loss(
                    out.color, img, lambda_dssim=lambda_dssim)
                return l
            return jax.value_and_grad(loss_fn)(trainable_rep)

        loss, grads = jax.vmap(one)(cams_local, imgs_local)
        loss = jnp.mean(loss)
        grads = jax.tree_util.tree_map(lambda g: jnp.mean(g, axis=0), grads)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)
        return loss, grads

    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(trainable, cameras, gt_images)


def shard_queries_refine(
    mesh: Mesh,
    gaussians: GaussianParams,
    cameras: Camera,              # batched, leading dim divisible by mesh size
    gt_images: jnp.ndarray,
    grad_masks: jnp.ndarray,
    cfg: TrackingConfig,
    raster_cfg: RasterizerConfig,
    gt_depths: Optional[jnp.ndarray] = None,
) -> RefineResult:
    """Localize a batch of queries, sharded across the mesh (no collectives)."""
    axis = mesh.axis_names[0]

    def device_fn(cams, imgs, masks, deps):
        def one(cam, img, mask, dep):
            return refine_pose(gaussians, cam, img, mask, cfg, raster_cfg,
                               gt_depth=dep)
        return jax.vmap(one)(cams, imgs, masks, deps)

    if gt_depths is None:
        gt_depths = jnp.zeros(gt_images.shape[:3], jnp.float32)

    fn = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(cameras, gt_images, grad_masks, gt_depths)


# ---------------------------------------------------------------------------
def dryrun_train_step(n_devices: int) -> None:
    """One DP-sharded training step on tiny shapes (driver validation)."""
    import optax

    from __graft_entry__ import _tiny_scene  # reuse the tiny scene builder

    mesh = make_mesh(n_devices)
    g = _tiny_scene(n=128, sh_degree=1, seed=1)
    W, H = 32, 32
    rng = np.random.default_rng(0)

    taus = jnp.asarray(0.01 * rng.standard_normal((n_devices, 6)), jnp.float32)
    base = Camera.from_rt(np.eye(3), np.zeros(3), 30.0, 30.0, W, H)
    cams = jax.vmap(base.with_delta)(taus)
    imgs = jnp.asarray(rng.uniform(0, 1, (n_devices, H, W, 3)), jnp.float32)

    cfg = RasterizerConfig(max_pairs=1 << 12, max_per_tile=64, chunk=32,
                           backend="jnp")

    @jax.jit
    def step(trainable_g, cams, imgs):
        loss, grads = dp_train_grads(mesh, trainable_g, cams, imgs, cfg)
        opt = optax.sgd(1e-3)
        tr = {k: getattr(trainable_g, k) for k in TRAINABLE}
        upd, _ = opt.update(grads, opt.init(tr), tr)
        return loss, trainable_g.replace(**optax.apply_updates(tr, upd))

    loss, g2 = step(g, cams, imgs)
    loss = float(loss)
    assert np.isfinite(loss), loss
    # params actually moved
    delta = float(jnp.abs(g2.xyz - g.xyz).sum())
    assert np.isfinite(delta)
    print(f"dryrun_multichip: DP {n_devices} devices, loss={loss:.4f} ok")

    # --- 2-D (data, gauss) mesh: sharded map + sharded cameras ----------
    if n_devices >= 2 and n_devices % 2 == 0:
        from .gauss_shard import gauss_sharded_loss_and_grads, make_mesh_2d

        n_data, n_gauss = n_devices // 2, 2
        mesh2 = make_mesh_2d(n_data, n_gauss)
        g128 = _tiny_scene(n=128, sh_degree=1, seed=2)  # 128 % n_gauss == 0
        taus2 = jnp.asarray(
            0.01 * rng.standard_normal((n_data, 6)), jnp.float32)
        cams2 = jax.vmap(base.with_delta)(taus2)
        imgs2 = jnp.asarray(
            rng.uniform(0, 1, (n_data, H, W, 3)), jnp.float32)
        loss2, grads2 = jax.jit(
            lambda gg, c, i: gauss_sharded_loss_and_grads(
                mesh2, gg, c, i, cfg)
        )(g128, cams2, imgs2)
        assert np.isfinite(float(loss2))
        assert all(np.isfinite(np.asarray(v)).all() for v in
                   jax.tree_util.tree_leaves(grads2))
        print(f"dryrun_multichip: data{n_data} x gauss{n_gauss} mesh, "
              f"loss={float(loss2):.4f} ok")

    # --- tile ("SP") axis: one frame's tiles sharded over all devices ---
    from .tile_shard import rasterize_tile_sharded

    # 32-wide image with one tile row per device -> tiles divide the mesh
    ts = cfg.tile_size
    cam_big = Camera.from_rt(np.eye(3), np.zeros(3), 30.0, 30.0,
                             32, ts * n_devices)
    out = jax.jit(
        lambda gg: rasterize_tile_sharded(
            make_mesh(n_devices, axis="tile"), gg, cam_big, cfg)
    )(g)
    assert np.isfinite(np.asarray(out.color)).all()
    print(f"dryrun_multichip: tile-sharded render over {n_devices} ok")
