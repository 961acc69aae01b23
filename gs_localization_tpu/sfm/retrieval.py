"""Global-descriptor retrieval: top-k database images per query.

Equivalent of hloc's pairs_from_retrieval
(/root/reference/hloc/pairs_from_retrieval.py:48-100): dot-product scores
between L2-normalized global descriptors with self/invalid masking. On TPU
the whole scoring is a single (Q, D) x (D, N) matmul.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def top_k_retrieval(
    query_desc: np.ndarray,          # (Q, D)
    db_desc: np.ndarray,             # (N, D)
    k: int = 10,
    query_names: Optional[Sequence[str]] = None,
    db_names: Optional[Sequence[str]] = None,
    mask_self: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (indices (Q, k), scores (Q, k)); optionally also name pairs."""
    q = jnp.asarray(query_desc, jnp.float32)
    d = jnp.asarray(db_desc, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    scores = jnp.dot(q, d.T, preferred_element_type=jnp.float32)
    if mask_self and query_names is not None and db_names is not None:
        same = np.array(
            [[qn == dn for dn in db_names] for qn in query_names], bool
        )
        scores = jnp.where(jnp.asarray(same), -jnp.inf, scores)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return np.asarray(top_idx), np.asarray(top_scores)


def pairs_from_retrieval(
    query_desc, db_desc, query_names, db_names, k=10, mask_self=True,
) -> List[Tuple[str, str]]:
    idx, _ = top_k_retrieval(query_desc, db_desc, k, query_names, db_names,
                             mask_self)
    return [(qn, db_names[j]) for qi, qn in enumerate(query_names)
            for j in idx[qi]]
