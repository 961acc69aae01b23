"""Training-state checkpoint/resume.

The reference has two mechanisms (SURVEY.md §5): full training state
``torch.save((gaussians.capture(), iteration))`` incl. Adam moments and
densification accumulators (gaussian_model.py:61-93), and model-only PLY
snapshots. PLY lives in data/ply.py; this module is the full-state one,
using flax serialization (msgpack) — no filesystem layout opinions beyond
one file per checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from flax import serialization

from .train import MapTrainState


def save_checkpoint(path: str, state: MapTrainState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template: MapTrainState) -> MapTrainState:
    """Restore into a state with the same structure/capacity as ``template``
    (build it with init_training on a same-capacity GaussianParams)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)
