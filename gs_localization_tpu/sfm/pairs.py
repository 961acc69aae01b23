"""Image-pair generation: covisibility / exhaustive / sequential.

Equivalents of hloc's pairs_from_covisibility (rank DB images by shared 3D
points, keep top-k — /root/reference/hloc/pairs_from_covisibility.py:12-56),
pairs_from_exhaustive, and a sequential-window generator. Retrieval-based
pairs live in sfm/retrieval.py.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def pairs_from_covisibility(
    images: Dict[int, "ColmapImage"], top_k: int = 30,
) -> List[Tuple[str, str]]:
    """Rank, for each image, the others by number of shared 3D point ids."""
    ids = sorted(images.keys())
    point_sets = {
        i: set(int(p) for p in images[i].point3d_ids if p >= 0) for i in ids
    }
    pairs = []
    for i in ids:
        scores = []
        for j in ids:
            if i == j:
                continue
            shared = len(point_sets[i] & point_sets[j])
            if shared > 0:
                scores.append((shared, j))
        scores.sort(reverse=True)
        for _, j in scores[:top_k]:
            pairs.append((images[i].name, images[j].name))
    return pairs


def pairs_exhaustive(names: List[str]) -> List[Tuple[str, str]]:
    return [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]


def pairs_sequential(names: List[str], window: int = 5,
                     loop: bool = False) -> List[Tuple[str, str]]:
    n = len(names)
    pairs = []
    for i in range(n):
        for d in range(1, window + 1):
            j = i + d
            if j < n:
                pairs.append((names[i], names[j]))
            elif loop:
                pairs.append((names[i], names[j % n]))
    return pairs
