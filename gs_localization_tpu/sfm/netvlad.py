"""NetVLAD global descriptor in JAX.

Re-implements hloc's NetVLAD extractor (the retrieval backbone the reference
SfM stage uses for top-10 query pairing —
/root/reference/hloc/extractors/netvlad.py; call site
/root/reference/gs_localization/sfm/7scenes_sfm_full_dslam.py:268-273):
a VGG16 stack truncated after conv5_3 (pre-ReLU), channel-pre-normalized
features, a 64-cluster NetVLAD pooling layer (softmax cluster scores,
residuals to centers, intra-normalization), flatten + L2, and a 4096-d
whitening projection + final L2.

All heavy math is conv/matmul (MXU); one jit covers extraction and a
(Q, 4096) x (4096, N) matmul scores retrieval (sfm/retrieval.py).

Weights are NOT bundled (zero-egress): ``load_netvlad_mat`` parses the same
``Pitts30K_struct.mat`` MatConvNet export hloc downloads, reproducing its
sign/transpose conventions (centers stored negated; netvlad.py:96-107).
Architecture parity is tested against a from-scratch torch twin
(tests/test_netvlad.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLUSTERS = 64
FEATURE_DIM = 512
OUTPUT_DIM = 4096

# VGG16 conv plan: (out_channels, pool_before) for the 13 convs; ReLU after
# every conv EXCEPT the last (hloc drops the final ReLU+MaxPool).
VGG16_CONVS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
POOL_BEFORE = (False, False, True, False, True, False, False, True,
               False, False, True, False, False)


def _conv3x3(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + bias


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def backbone_features(params, image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) image in [0, 1] -> (H/16 * W/16, 512) conv5_3 features."""
    x = jnp.clip(image * 255.0, 0.0, 255.0) - params["mean"]
    x = x[None]
    for i, _ in enumerate(VGG16_CONVS):
        if POOL_BEFORE[i]:
            x = _maxpool2(x)
        p = params["features"][i]
        x = _conv3x3(x, p["kernel"], p["bias"])
        if i < len(VGG16_CONVS) - 1:
            x = jax.nn.relu(x)
    return x[0].reshape(-1, FEATURE_DIM)


def netvlad_pool(params, feats: jnp.ndarray) -> jnp.ndarray:
    """(N, 512) features -> (512*64,) VLAD descriptor (pre-whitening)."""
    # channel pre-normalization (F.normalize over dim=1 in reference)
    f = feats * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(feats * feats, -1, keepdims=True), 1e-24))
    scores = jax.nn.softmax(f @ params["score_w"], axis=-1)   # (N, K)
    # desc[d, k] = sum_n scores[n, k] * (f[n, d] - centers[d, k])
    desc = jnp.einsum("nd,nk->dk", f, scores) \
        - params["centers"] * jnp.sum(scores, 0)[None, :]
    # intra-normalization over D per cluster
    desc = desc * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(desc * desc, 0, keepdims=True), 1e-24))
    v = desc.reshape(-1)                                      # D-major flatten
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


@jax.jit
def netvlad_descriptor(params: Dict[str, Any], image: jnp.ndarray):
    """(H, W, 3) image in [0, 1] -> (4096,) whitened global descriptor."""
    feats = backbone_features(params, image)
    v = netvlad_pool(params, feats)
    w = v @ params["whiten"]["w"] + params["whiten"]["b"]
    return w / jnp.maximum(jnp.linalg.norm(w), 1e-12)


def init_params(rng: np.random.Generator) -> Dict[str, Any]:
    """Random-weight params (architecture tests / smoke use)."""
    feats, cin = [], 3
    for cout in VGG16_CONVS:
        k = (rng.standard_normal((3, 3, cin, cout)) *
             np.sqrt(2.0 / (9 * cin))).astype(np.float32)
        feats.append({"kernel": jnp.asarray(k),
                      "bias": jnp.zeros(cout, jnp.float32)})
        cin = cout
    return {
        "mean": jnp.asarray(
            rng.uniform(100, 140, 3).astype(np.float32)),
        "features": feats,
        "score_w": jnp.asarray(0.1 * rng.standard_normal(
            (FEATURE_DIM, NUM_CLUSTERS)).astype(np.float32)),
        "centers": jnp.asarray(0.1 * rng.standard_normal(
            (FEATURE_DIM, NUM_CLUSTERS)).astype(np.float32)),
        "whiten": {
            "w": jnp.asarray(0.01 * rng.standard_normal(
                (FEATURE_DIM * NUM_CLUSTERS, OUTPUT_DIM)).astype(np.float32)),
            "b": jnp.zeros(OUTPUT_DIM, jnp.float32)},
    }


def load_netvlad_mat(mat_path: str) -> Dict[str, Any]:
    """Parse a MatConvNet ``*_struct.mat`` export (hloc's checkpoint format).

    Follows hloc's conventions exactly: conv weights are stored S x S x IN x
    OUT (already HWIO), netvlad layer 30 holds (score_w D x K, -centers
    D x K), whitening layer 33 holds (1 x 1 x IN x OUT, OUT), image mean in
    net.meta.normalization.averageImage.
    """
    from scipy.io import loadmat

    mat = loadmat(mat_path, struct_as_record=False, squeeze_me=True)
    layers = mat["net"].layers
    feats = []
    for layer in layers:
        if getattr(layer, "type", "") == "conv" and len(feats) < 13:
            w, b = layer.weights[0], layer.weights[1]
            if w.ndim != 4 or w.shape[0] != 3:
                continue
            feats.append({"kernel": jnp.asarray(np.asarray(w), jnp.float32),
                          "bias": jnp.asarray(np.asarray(b).reshape(-1),
                                              jnp.float32)})
    if len(feats) != 13:
        raise ValueError(f"expected 13 conv layers, found {len(feats)}")
    score_w = np.asarray(layers[30].weights[0], np.float32)      # (D, K)
    centers = -np.asarray(layers[30].weights[1], np.float32)     # (D, K)
    ww = np.asarray(layers[33].weights[0], np.float32)
    wb = np.asarray(layers[33].weights[1], np.float32).reshape(-1)
    mean = np.asarray(mat["net"].meta.normalization.averageImage,
                      np.float32).reshape(-1)[:3]
    return {
        "mean": jnp.asarray(mean),
        "features": feats,
        "score_w": jnp.asarray(score_w),
        "centers": jnp.asarray(centers),
        "whiten": {"w": jnp.asarray(ww.reshape(-1, OUTPUT_DIM)),
                   "b": jnp.asarray(wb)},
    }


def batch_descriptors(params, images) -> np.ndarray:
    """Stack of same-size images -> (B, 4096) descriptors (host-side)."""
    return np.stack([np.asarray(netvlad_descriptor(params, jnp.asarray(im)))
                     for im in images])
