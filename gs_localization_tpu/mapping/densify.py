"""Adaptive density control (clone / split / prune / opacity reset).

Reference semantics: gaussian_model.py:349-407 —
- stats: accumulate ||dL/dmean2D||_ndc per visible Gaussian + a visit count;
  the CUDA rasterizer reports mean2D grads in NDC*(0.5W) units
  (backward.cu:463-480), so pixel-space grads are scaled by (W/2, H/2) here.
- clone: avg grad >= threshold and max scale <= percent_dense*extent — copy.
- split: avg grad >= threshold and max scale > percent_dense*extent — replace
  by N=2 samples ~ N(0, scale) rotated to world, scale /= (0.8*N).
- prune: opacity < min_opacity, screen radius > max_screen (when enabled),
  world size > 0.1*extent.
- reset_opacity: opacity <- min(opacity, 0.01) (gaussian_model.py:210-213).

TPU-native design: the reference concatenates/deletes tensors (dynamic
shapes, gaussian_model.py:258-327). Here capacity is static: dead slots are
masked via ``live``; new Gaussians are scattered into free slots with a
rank->slot mapping, and Adam moments for new/replaced slots are zeroed via a
tree_map (the analog of the reference's optimizer-state surgery).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.gaussians import GaussianParams, inverse_sigmoid
from ..raster.preprocess import build_cov3d  # noqa: F401  (rotation reuse)


@struct.dataclass
class DensifyState:
    grad_accum: jnp.ndarray   # (N,) sum of ndc-grad norms
    denom: jnp.ndarray        # (N,) visit counts
    max_radii: jnp.ndarray    # (N,) float max screen radius

    @classmethod
    def create(cls, capacity: int) -> "DensifyState":
        return cls(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
            max_radii=jnp.zeros((capacity,), jnp.float32),
        )


def update_stats(
    state: DensifyState,
    means2d_grad_pix: jnp.ndarray,   # (N, 2) pixel-space grad (means2d_offset)
    visibility: jnp.ndarray,         # (N,) bool
    radii: jnp.ndarray,              # (N,) int32
    width: int,
    height: int,
) -> DensifyState:
    ndc_grad = means2d_grad_pix * jnp.array([0.5 * width, 0.5 * height])
    norm = jnp.linalg.norm(ndc_grad, axis=-1)
    vis = visibility.astype(jnp.float32)
    return state.replace(
        grad_accum=state.grad_accum + norm * vis,
        denom=state.denom + vis,
        max_radii=jnp.maximum(state.max_radii, radii.astype(jnp.float32) * vis),
    )


class DensifyReport(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    dropped: jnp.ndarray     # new gaussians that didn't fit in capacity


def _rotate_samples(quat: jnp.ndarray, samples: jnp.ndarray) -> jnp.ndarray:
    """Rotate local samples into world by the (unnormalized) quats."""
    n = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / jnp.maximum(n, 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return jnp.einsum("nij,nj->ni", R, samples)


def _zero_rows(tree: Any, mask: jnp.ndarray, capacity: int) -> Any:
    """Zero rows of every (capacity, ...)-leading array in a pytree."""

    def fn(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            m = mask.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree_util.tree_map(fn, tree)


def densify_and_prune(
    gaussians: GaussianParams,
    state: DensifyState,
    opt_state: Any,
    rng_key: jax.Array,
    grad_threshold: float = 2e-4,
    min_opacity: float = 0.005,
    extent: float = 1.0,
    max_screen_size: Optional[float] = None,
    percent_dense: float = 0.01,
    split_n: int = 2,
) -> tuple[GaussianParams, DensifyState, Any, DensifyReport]:
    """One densification round. Returns updated params/stats/optimizer state.

    ``opt_state`` is any pytree whose (capacity, ...)-leading arrays are Adam
    moments aligned with the parameter arrays (they get zeroed for new and
    replaced slots, mirroring gaussian_model.py:258-327).
    """
    cap = gaussians.capacity
    live = gaussians.live
    grads = jnp.where(state.denom > 0, state.grad_accum / jnp.maximum(state.denom, 1), 0.0)
    max_scale = jnp.max(gaussians.get_scaling, axis=1)

    hot = live & (grads >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # ---- prune (on the pre-densify population, reference order is
    # clone -> split -> prune, but prune criteria don't involve grads and new
    # gaussians can't be pruned in the same round: order-equivalent) ---------
    prune = live & (gaussians.get_opacity[:, 0] < min_opacity)
    if max_screen_size is not None:
        prune = prune | (live & (state.max_radii > max_screen_size)) \
                      | (live & (max_scale > 0.1 * extent))
    # split originals are removed (replaced by their 2 children)
    remove = prune | split_mask
    live_after = live & ~remove

    # ---- build the new-gaussian list (fixed capacity) ---------------------
    # children per split: split_n (2); clones: 1 copy.
    # new set = [clones] + [split children x split_n]
    std = gaussians.get_scaling
    keys = jax.random.split(rng_key, split_n)
    new_masks = []
    new_sources = []
    new_xyz_list = []
    new_scaling_list = []
    # clones: copy in place values
    new_masks.append(clone_mask)
    new_sources.append(jnp.arange(cap))
    new_xyz_list.append(gaussians.xyz)
    new_scaling_list.append(gaussians.scaling)
    for s in range(split_n):
        samples = jax.random.normal(keys[s], (cap, 3)) * std
        offs = _rotate_samples(gaussians.rotation, samples)
        new_masks.append(split_mask)
        new_sources.append(jnp.arange(cap))
        new_xyz_list.append(gaussians.xyz + offs)
        new_scaling_list.append(jnp.log(jnp.maximum(std / (0.8 * split_n), 1e-10)))

    all_mask = jnp.concatenate(new_masks)            # (3*cap,)
    all_src = jnp.concatenate(new_sources)
    all_xyz = jnp.concatenate(new_xyz_list)
    all_scaling = jnp.concatenate(new_scaling_list)

    # rank of each new gaussian among selected
    sel_rank = jnp.cumsum(all_mask.astype(jnp.int32)) - 1
    # free slots (after removal), in index order
    free = ~live_after
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    num_free = jnp.sum(free.astype(jnp.int32))
    # slot_of_rank[r] = index of r-th free slot
    slot_of_rank = jnp.full((3 * cap,), cap, jnp.int32)
    slot_of_rank = slot_of_rank.at[
        jnp.where(free, free_rank, 3 * cap)  # non-free -> out of range -> drop
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    fits = all_mask & (sel_rank < num_free)
    target = jnp.where(fits, slot_of_rank[jnp.clip(sel_rank, 0, 3 * cap - 1)], cap)

    def scatter(dest, values):
        return dest.at[target].set(values, mode="drop")

    new_g = gaussians.replace(
        xyz=scatter(gaussians.xyz, all_xyz),
        features_dc=scatter(gaussians.features_dc, gaussians.features_dc[all_src]),
        features_rest=scatter(gaussians.features_rest, gaussians.features_rest[all_src]),
        scaling=scatter(gaussians.scaling, all_scaling),
        rotation=scatter(gaussians.rotation, gaussians.rotation[all_src]),
        opacity=scatter(gaussians.opacity, gaussians.opacity[all_src]),
        live=live_after.at[target].set(True, mode="drop"),
    )

    # ---- optimizer state: zero moments for touched slots -------------------
    touched = jnp.zeros((cap,), bool).at[target].set(True, mode="drop")
    touched = touched | remove
    new_opt_state = _zero_rows(opt_state, touched, cap)

    new_state = DensifyState.create(cap)
    report = DensifyReport(
        num_cloned=jnp.sum(clone_mask.astype(jnp.int32)),
        num_split=jnp.sum(split_mask.astype(jnp.int32)),
        num_pruned=jnp.sum(prune.astype(jnp.int32)),
        dropped=jnp.sum((all_mask & ~fits).astype(jnp.int32)),
    )
    return new_g, new_state, new_opt_state, report


def reset_opacity(
    gaussians: GaussianParams, opt_state: Any, ceiling: float = 0.01
) -> tuple[GaussianParams, Any]:
    """opacity <- min(opacity, ceiling); zero the opacity Adam moments."""
    new_opacity = inverse_sigmoid(
        jnp.minimum(gaussians.get_opacity, ceiling)
    )
    # zero only leaves matching the opacity shape: handled by caller passing
    # the opacity-subtree; to stay generic we zero moments of all params'
    # opacity field via tree path matching.
    def zero_opacity(tree):
        def fn(path, leaf):
            names = [getattr(p, "name", "") for p in path]
            if "opacity" in names:
                return jnp.zeros_like(leaf)
            return leaf
        return jax.tree_util.tree_map_with_path(fn, tree)

    return gaussians.replace(opacity=new_opacity), zero_opacity(opt_state)
