"""YAML config loading with ``inherit_from`` chains.

Semantics match the reference
(/root/reference/gs_localization/pipelines/tools/config_utils.py:4-50):
a config may name a parent via ``inherit_from``; parents load recursively and
child keys recursively override parent keys.
"""

from __future__ import annotations

from typing import Any, Dict

import yaml


def merge_config(child: Dict[str, Any], parent: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``child`` over ``parent`` (child wins)."""
    out = dict(parent)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(v, out[k])
        else:
            out[k] = v
    return out


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    parent_path = cfg.pop("inherit_from", None)
    if parent_path:
        import os

        if not os.path.isabs(parent_path):
            parent_path = os.path.join(os.path.dirname(path), parent_path)
        parent = load_config(parent_path)
        cfg = merge_config(cfg, parent)
    return cfg
