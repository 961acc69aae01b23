"""hloc-style conf registry for extractors / matchers / retrieval.

Mirrors the conf names of the reference's hloc
(/root/reference/hloc/extract_features.py:38-138 'confs',
/root/reference/hloc/match_features.py:23-81 'confs') so users migrating
from hloc find the same entry points. Learned confs need user-supplied
weights (zero-egress pods) passed as ``params``; classical confs
(harris, sift) run without any weights.

  extractor = get_extractor("superpoint_max", params=sp_params)
  feats = extractor(image)                # -> Features

  matcher = get_matcher("superglue", params=sg_params)
  res = matcher(feats0, feats1, shape0, shape1)   # -> SuperGlueResult
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from .features import Features, extract_harris_features, rgb_to_gray

# extractor conf name -> (module kind, default kwargs). Mirrors hloc's
# superpoint_{aachen,max,inloc}, r2d2, d2net-ss, sift, disk confs.
EXTRACTOR_CONFS: Dict[str, Dict[str, Any]] = {
    "harris": {"kind": "harris", "num_keypoints": 1024},
    "superpoint_aachen": {"kind": "superpoint", "num_keypoints": 4096,
                          "nms_radius": 3},
    "superpoint_max": {"kind": "superpoint", "num_keypoints": 4096,
                       "nms_radius": 3},
    "superpoint_inloc": {"kind": "superpoint", "num_keypoints": 4096,
                         "nms_radius": 4},
    "r2d2": {"kind": "r2d2", "num_keypoints": 5000},
    "d2net-ss": {"kind": "d2net", "num_keypoints": 5000},
    "sift": {"kind": "sift", "num_keypoints": 4096},
    "dog": {"kind": "sift", "num_keypoints": 4096},
    "disk": {"kind": "disk", "num_keypoints": 5000, "nms_window_size": 5},
}

MATCHER_CONFS: Dict[str, Dict[str, Any]] = {
    "superglue": {"kind": "superglue", "sinkhorn_iterations": 50},
    "superglue-fast": {"kind": "superglue", "sinkhorn_iterations": 5},
    "superpoint+lightglue": {"kind": "lightglue"},
    "lightglue": {"kind": "lightglue"},
    "NN-ratio": {"kind": "nn", "ratio_thresh": 0.8},
    "NN-mutual": {"kind": "nn", "ratio_thresh": 1.0},
    # host-side spatial-consistency filter; no learned weights
    # (reference conf match_features.py:77, matchers/adalam.py)
    "adalam": {"kind": "adalam"},
}

RETRIEVAL_CONFS: Dict[str, Dict[str, Any]] = {
    "netvlad": {"kind": "netvlad"},
    "dir": {"kind": "dir"},
    "openibl": {"kind": "openibl"},
    "eigenplaces": {"kind": "eigenplaces"},
    "cosplace": {"kind": "eigenplaces"},     # same architecture family
    "tiny": {"kind": "tiny"},
}

# dense-matcher confs: quantization pitches of the keypoint aggregation,
# mirroring hloc's match_dense confs (/root/reference/hloc/match_dense.py:
# 38-64 — 'loftr' 1/1, 'loftr_aachen' 2/8, 'loftr_superpoint' 4/4)
DENSE_CONFS: Dict[str, Dict[str, Any]] = {
    "loftr": {"kind": "loftr", "max_error": 1.0, "cell_size": 1.0},
    "loftr_aachen": {"kind": "loftr", "max_error": 2.0, "cell_size": 8.0},
    "loftr_superpoint": {"kind": "loftr", "max_error": 4.0, "cell_size": 4.0},
}


def get_extractor(conf: str, params: Optional[Any] = None,
                  **overrides) -> Callable[[jnp.ndarray], Features]:
    """Returns ``extractor(image_rgb_or_gray) -> Features``."""
    if conf not in EXTRACTOR_CONFS:
        raise KeyError(f"unknown extractor conf '{conf}'; "
                       f"have {sorted(EXTRACTOR_CONFS)}")
    cfg = {**EXTRACTOR_CONFS[conf], **overrides}
    kind = cfg.pop("kind")
    if kind == "harris":
        return lambda img: extract_harris_features(
            _gray(img), num_keypoints=cfg["num_keypoints"])
    if kind == "sift":
        from .sift import extract_sift

        return lambda img: extract_sift(
            _gray(img), num_keypoints=cfg["num_keypoints"])
    if params is None:
        raise ValueError(f"conf '{conf}' needs converted weights (params)")
    if kind == "superpoint":
        from .superpoint import extract_superpoint

        return lambda img: extract_superpoint(
            params, _gray(img), num_keypoints=cfg["num_keypoints"],
            nms_radius=cfg.get("nms_radius", 4))
    if kind == "r2d2":
        from .r2d2 import extract_r2d2

        return lambda img: extract_r2d2(
            params, _rgb(img), num_keypoints=cfg["num_keypoints"])
    if kind == "d2net":
        from .d2net import extract_d2net

        return lambda img: extract_d2net(
            params, _rgb(img), num_keypoints=cfg["num_keypoints"])
    if kind == "disk":
        from .disk import extract_disk

        return lambda img: extract_disk(
            params, _rgb(img), num_keypoints=cfg["num_keypoints"],
            window_size=cfg.get("nms_window_size", 5))
    raise KeyError(kind)


def get_matcher(conf: str, params: Optional[Any] = None, **overrides):
    """Returns ``matcher(f0, f1, (w0, h0), (w1, h1)) -> SuperGlueResult``."""
    if conf not in MATCHER_CONFS:
        raise KeyError(f"unknown matcher conf '{conf}'; "
                       f"have {sorted(MATCHER_CONFS)}")
    cfg = {**MATCHER_CONFS[conf], **overrides}
    kind = cfg.pop("kind")
    if kind == "adalam":
        from .adalam import AdalamConfig, adalam_match

        acfg = AdalamConfig(**cfg) if cfg else AdalamConfig()
        return lambda f0, f1, s0, s1: adalam_match(f0, f1, s0, s1,
                                                   config=acfg)
    if kind == "nn":
        from .matching import match_mutual_nn

        return lambda f0, f1, s0=None, s1=None: match_mutual_nn(
            f0.descriptors, f1.descriptors, f0.scores > 0, f1.scores > 0,
            ratio_thresh=cfg["ratio_thresh"])
    if params is None:
        raise ValueError(f"conf '{conf}' needs converted weights (params)")
    if kind == "superglue":
        from .superglue import superglue_match

        return lambda f0, f1, s0, s1: superglue_match(
            params, f0.keypoints, f0.scores, f0.descriptors,
            f1.keypoints, f1.scores, f1.descriptors,
            s0[0], s0[1], s1[0], s1[1],
            sinkhorn_iters=cfg["sinkhorn_iterations"])
    if kind == "lightglue":
        from .lightglue import lightglue_match

        return lambda f0, f1, s0, s1: lightglue_match(
            params, f0.keypoints, f0.descriptors,
            f1.keypoints, f1.descriptors, s0[0], s0[1], s1[0], s1[1])
    raise KeyError(kind)


def get_dense_matcher(conf: str, params: Optional[Any] = None,
                      **overrides):
    """Returns ``(matcher(img0, img1) -> (kpts0, kpts1, scores), cfg)``
    where cfg carries the aggregation pitches (max_error, cell_size) to pass
    to ``sfm.match_dense.aggregate_dense_matches`` / SfmInitConfig."""
    if conf not in DENSE_CONFS:
        raise KeyError(f"unknown dense conf '{conf}'; "
                       f"have {sorted(DENSE_CONFS)}")
    cfg = {**DENSE_CONFS[conf], **overrides}
    kind = cfg.pop("kind")
    if params is None:
        raise ValueError(f"conf '{conf}' needs converted weights (params)")
    assert kind == "loftr"
    from .loftr import loftr_match

    def matcher(img0, img1):
        m = loftr_match(params, _gray(img0), _gray(img1))
        return m.kpts0, m.kpts1, m.scores

    return matcher, cfg


def get_global_descriptor(conf: str, params: Optional[Any] = None):
    """Returns ``fn(image_rgb) -> (D,) descriptor`` for retrieval."""
    if conf not in RETRIEVAL_CONFS:
        raise KeyError(f"unknown retrieval conf '{conf}'")
    kind = RETRIEVAL_CONFS[conf]["kind"]
    if kind == "tiny":
        from .features import tiny_image_descriptor

        return lambda img: tiny_image_descriptor(jnp.asarray(img))
    if params is None:
        raise ValueError(f"'{conf}' needs converted weights (params)")
    if kind == "dir":
        from .dir import dir_descriptor

        return lambda img: dir_descriptor(params, _rgb(img))
    if kind == "openibl":
        from .openibl import openibl_descriptor

        return lambda img: openibl_descriptor(params, _rgb(img))
    if kind == "eigenplaces":
        from .eigenplaces import eigenplaces_descriptor

        return lambda img: eigenplaces_descriptor(params, _rgb(img))
    from .netvlad import netvlad_descriptor

    return lambda img: netvlad_descriptor(params, jnp.asarray(img))


def _gray(img):
    img = jnp.asarray(img)
    return rgb_to_gray(img) if img.ndim == 3 else img


def _rgb(img):
    img = jnp.asarray(img)
    if img.ndim == 2:
        return jnp.stack([img, img, img], -1)
    return img
