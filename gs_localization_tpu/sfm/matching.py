"""Descriptor matching: mutual nearest neighbor with ratio test.

The role of hloc's matchers (/root/reference/hloc/match_features.py NN
configs; SuperGlue is the learned alternative). One (K, D) x (D, K) matmul
per pair — batches of pairs vmap onto the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    matches0: jnp.ndarray   # (K,) index into features1, -1 = unmatched
    scores: jnp.ndarray     # (K,) similarity of the accepted match (0 if none)


@functools.partial(jax.jit, static_argnames=())
def match_mutual_nn(
    desc0: jnp.ndarray, desc1: jnp.ndarray,
    valid0: jnp.ndarray | None = None, valid1: jnp.ndarray | None = None,
    ratio_thresh: float = 0.95, min_score: float = 0.0,
) -> Matches:
    """Mutual-NN matching on L2-normalized descriptors (cosine similarity).

    ``ratio_thresh`` is applied on distances (Lowe ratio) via the two best
    similarities: accept iff d1/d2 < ratio where d = sqrt(2 - 2*sim).
    """
    sim = jnp.dot(desc0, desc1.T, preferred_element_type=jnp.float32)
    if valid0 is not None:
        sim = jnp.where(valid0[:, None], sim, -jnp.inf)
    if valid1 is not None:
        sim = jnp.where(valid1[None, :], sim, -jnp.inf)

    best01 = jnp.argmax(sim, axis=1)
    best10 = jnp.argmax(sim, axis=0)
    s_best = jnp.max(sim, axis=1)
    # second best for the ratio test
    k0 = desc0.shape[0]
    sim_wo_best = sim.at[jnp.arange(k0), best01].set(-jnp.inf)
    s_second = jnp.max(sim_wo_best, axis=1)

    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s_best, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s_second, 1e-12))
    mutual = best10[best01] == jnp.arange(k0)
    ok = mutual & (d1 / d2 < ratio_thresh) & (s_best > min_score) \
        & jnp.isfinite(s_best)
    return Matches(
        matches0=jnp.where(ok, best01, -1),
        scores=jnp.where(ok, s_best, 0.0),
    )
