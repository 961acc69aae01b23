"""Central checkpoint manifest + import walkthrough (see WEIGHTS.md).

The reference ships learned-feature capability by vendoring torch weights
in-tree (/root/reference/hloc/third_party/*) or torch.hub-downloading them
at first use. This repo is built in a zero-egress environment, so it ships
the ARCHITECTURES (from scratch, twin-parity-tested) plus converters from
each official checkpoint format — and this module is the one documented
path from a user-supplied checkpoint file to ready JAX params:

    from gs_localization_tpu.sfm import weights
    params = weights.load("superpoint", "/weights/superpoint_v1.pth")

or, for everything at once (any manifest file found in the directory):

    python -m gs_localization_tpu.sfm.weights --check /weights

which converts every recognized file, prints the parameter count and a
sha256 (record it the first time; pin it thereafter), and exits non-zero
if a present file fails to convert. Sources are the official release URLs
(not mirrored here); WEIGHTS.md lists them next to each row.
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import os
import sys
from typing import Any, Callable, Dict, Optional

import numpy as np


def _torch_sd(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint as a flat name->numpy dict (CPU).

    Safe-by-default: ``weights_only=True`` (no arbitrary unpickling of a
    downloaded file). A few official checkpoints wrap their tensors in
    pickled objects; for those, set GSLOC_ALLOW_PICKLE=1 after checking
    the file's provenance/hash (WEIGHTS.md step 2).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if os.environ.get("GSLOC_ALLOW_PICKLE") != "1":
            raise RuntimeError(
                f"{path} is not a plain tensor checkpoint "
                f"(weights_only load failed: {e}). If you trust the file, "
                "re-run with GSLOC_ALLOW_PICKLE=1.") from e
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items() if hasattr(v, "shape")}


@dataclasses.dataclass(frozen=True)
class WeightSpec:
    file: str            # expected filename (the official release name)
    source: str          # where the user downloads it (official URL/repo)
    convert: Callable[[str], Any]   # path -> JAX params pytree
    note: str = ""


def _sp(path):
    from .superpoint import convert_torch_weights
    return convert_torch_weights(_torch_sd(path))


def _sg(path):
    from .superglue import convert_torch_weights_superglue
    return convert_torch_weights_superglue(_torch_sd(path))


def _lg(path):
    from .lightglue import convert_torch_weights_lightglue
    return convert_torch_weights_lightglue(_torch_sd(path))


def _loftr(path):
    from .loftr import convert_torch_weights_loftr
    return convert_torch_weights_loftr(_torch_sd(path))


def _d2(path):
    from .d2net import convert_torch_weights_d2net
    return convert_torch_weights_d2net(_torch_sd(path))


def _r2d2(path):
    from .r2d2 import convert_torch_weights_r2d2
    return convert_torch_weights_r2d2(_torch_sd(path))


def _disk(path):
    from .disk import convert_torch_weights_disk
    return convert_torch_weights_disk(_torch_sd(path))


def _netvlad(path):
    from .netvlad import load_netvlad_mat
    return load_netvlad_mat(path)


def _dir(path):
    from .dir import convert_torch_weights_dir
    return convert_torch_weights_dir(_torch_sd(path))


def _openibl(path):
    from .openibl import convert_torch_weights_openibl
    return convert_torch_weights_openibl(_torch_sd(path))


def _eigen(path):
    from .eigenplaces import convert_torch_weights_eigenplaces
    return convert_torch_weights_eigenplaces(_torch_sd(path), arch="resnet50")


def _dpt(path):
    from ..ops.dpt import convert_torch_weights_dpt
    return convert_torch_weights_dpt(_torch_sd(path))


def _midas(path):
    from ..ops.midas import convert_torch_weights_midas
    return convert_torch_weights_midas(_torch_sd(path))


MANIFEST: Dict[str, WeightSpec] = {
    "superpoint": WeightSpec(
        "superpoint_v1.pth",
        "github.com/magicleap/SuperGluePretrainedNetwork "
        "(models/weights/superpoint_v1.pth)",
        _sp),
    "superglue_outdoor": WeightSpec(
        "superglue_outdoor.pth",
        "github.com/magicleap/SuperGluePretrainedNetwork "
        "(models/weights/superglue_outdoor.pth)",
        _sg, "the reference's SfM matcher (sinkhorn 5/50)"),
    "superglue_indoor": WeightSpec(
        "superglue_indoor.pth",
        "github.com/magicleap/SuperGluePretrainedNetwork "
        "(models/weights/superglue_indoor.pth)",
        _sg),
    "lightglue": WeightSpec(
        "superpoint_lightglue.pth",
        "github.com/cvg/LightGlue (release asset superpoint_lightglue.pth)",
        _lg),
    "loftr_outdoor": WeightSpec(
        "outdoor_ds.ckpt",
        "github.com/zju3dv/LoFTR (release weights, outdoor_ds.ckpt)",
        _loftr),
    "d2net": WeightSpec(
        "d2_tf.pth",
        "dsmn.ml/files/d2-net/d2_tf.pth (github.com/mihaidusmanu/d2-net)",
        _d2),
    "r2d2": WeightSpec(
        "r2d2_WASF_N16.pt",
        "github.com/naver/r2d2 (models/r2d2_WASF_N16.pt)",
        _r2d2),
    "disk": WeightSpec(
        "depth-save.pth",
        "github.com/cvlab-epfl/disk (depth-save.pth release)",
        _disk),
    "netvlad": WeightSpec(
        "Pitts30K_struct.mat",
        "cvg-data.inf.ethz.ch/hloc/netvlad/Pitts30K_struct.mat "
        "(hloc's mirror of the matconvnet VGG16+NetVLAD whitened model)",
        _netvlad, "the reference's retrieval model (hloc netvlad conf)"),
    "dir": WeightSpec(
        "Resnet101-AP-GeM-LM18.pt",
        "github.com/naver/deep-image-retrieval (Resnet101-AP-GeM-LM18)",
        _dir),
    "openibl": WeightSpec(
        "vgg16_netvlad.pth",
        "github.com/yxgeee/OpenIBL (hub vgg16_netvlad)",
        _openibl),
    "eigenplaces": WeightSpec(
        "ResNet50_2048_eigenplaces.pth",
        "github.com/gmberton/EigenPlaces (hub ResNet50, fc_output_dim 2048)",
        _eigen),
    "dpt_hybrid": WeightSpec(
        "dpt_hybrid-midas-501f0c75.pt",
        "github.com/isl-org/MiDaS (release dpt_hybrid-midas-501f0c75.pt)",
        _dpt, "the reference's monocular depth prior "
              "(utils/depth_utils.py DPT_Hybrid)"),
    "midas_v21": WeightSpec(
        "midas_v21-f6b98070.pt",
        "github.com/isl-org/MiDaS (release midas_v21-f6b98070.pt)",
        _midas, "fallback depth prior (smaller, ResNeXt101 backbone)"),
}


def load(name: str, path: Optional[str] = None) -> Any:
    """Convert the named official checkpoint into JAX params.

    ``path`` defaults to ``$GSLOC_WEIGHTS_DIR/<manifest filename>``.
    """
    spec = MANIFEST[name]
    if path is None:
        wdir = os.environ.get("GSLOC_WEIGHTS_DIR")
        if not wdir:
            raise FileNotFoundError(
                f"no path given and GSLOC_WEIGHTS_DIR unset — expected "
                f"{spec.file} (from {spec.source}); see WEIGHTS.md")
        path = os.path.join(wdir, spec.file)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — download {spec.file} from {spec.source} "
            "(see WEIGHTS.md)")
    return spec.convert(path)


def _n_params(tree) -> int:
    import jax

    return sum(int(np.prod(np.shape(l)))
               for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "shape"))


def check_dir(wdir: str) -> Dict[str, str]:
    """Convert every manifest file present in ``wdir``; return
    name -> 'ok (N params, sha256 ...)' / 'missing' / 'FAILED: ...'."""
    out = {}
    for name, spec in MANIFEST.items():
        path = os.path.join(wdir, spec.file)
        if not os.path.exists(path):
            out[name] = "missing"
            continue
        try:
            params = load(name, path)
            sha = hashlib.sha256(open(path, "rb").read()).hexdigest()[:16]
            out[name] = f"ok ({_n_params(params):,} params, sha256 {sha}…)"
        except Exception as e:  # surface, don't abort the sweep
            out[name] = f"FAILED: {type(e).__name__}: {e}"
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", metavar="DIR",
                    help="convert every recognized checkpoint in DIR")
    ap.add_argument("--list", action="store_true",
                    help="print the manifest (file, source) table")
    args = ap.parse_args(argv)
    if args.list or not args.check:
        for name, spec in MANIFEST.items():
            print(f"{name:20s} {spec.file:36s} {spec.source}")
        return
    results = check_dir(args.check)
    failed = False
    for name, status in results.items():
        print(f"{name:20s} {MANIFEST[name].file:36s} {status}")
        failed |= status.startswith("FAILED")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
