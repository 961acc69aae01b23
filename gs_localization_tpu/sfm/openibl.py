"""OpenIBL (SFRS vgg16_netvlad) global descriptor in JAX.

Re-implements hloc's OpenIBL extractor
(/root/reference/hloc/extractors/openibl.py:1-26), whose net is the
``yxgeee/OpenIBL`` torch.hub ``vgg16_netvlad`` model (not vendored in the
reference tree, so — like LoFTR — parity is against a from-scratch torch
twin, tests/test_openibl.py):

- input: the hloc wrapper normalizes with mean ~[0.485, 0.458, 0.408] and
  std = 1/255 per channel, i.e. ``(img01 - mean) * 255``;
- backbone: torchvision VGG16 ``features`` truncated before the last
  ReLU + MaxPool (OpenIBL ``vgg16.py`` drops ``features[-2:]``), so the map
  ends at the conv5_3 output WITHOUT a trailing ReLU;
- pooling: 64-cluster NetVLAD — per-pixel channel L2 normalization, 1x1
  conv (no bias) -> softmax cluster scores, residuals to centroids,
  intra-normalization per cluster, **cluster-major** flatten, final L2.
  Output dim 512 * 64 = 32768 (no whitening, unlike the MatConvNet NetVLAD
  in netvlad.py which flattens D-major and projects to 4096).

All heavy math is convs + einsum contractions (MXU).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLUSTERS = 64
FEATURE_DIM = 512

# hloc wrapper constants (extractors/openibl.py:17-18)
RGB_MEAN = np.array(
    [0.48501960784313836, 0.4579568627450961, 0.4076039215686255],
    np.float32)
RGB_STD = np.float32(1.0 / 255.0)

# torchvision VGG16 conv plan: (out_channels); maxpool before convs at these
# indices. Identical topology to netvlad.py's MatConvNet VGG16 but the
# truncation differs: OpenIBL keeps relu5_2 and stops after conv5_3.
VGG16_CONVS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
POOL_BEFORE = (False, False, True, False, True, False, False, True,
               False, False, True, False, False)


def _conv3x3(x, kernel_oihw, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel_oihw, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + bias


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def backbone_features(params: Dict[str, Any], image: jnp.ndarray
                      ) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] -> (H/16 * W/16, 512) conv5_3 features."""
    x = (jnp.asarray(image, jnp.float32) - RGB_MEAN) / RGB_STD
    x = x[None]
    for i, _ in enumerate(VGG16_CONVS):
        if POOL_BEFORE[i]:
            x = _maxpool2(x)
        p = params["features"][i]
        x = _conv3x3(x, p["kernel"], p["bias"])
        if i < len(VGG16_CONVS) - 1:          # no ReLU after conv5_3
            x = jax.nn.relu(x)
    return x[0].reshape(-1, FEATURE_DIM)


def vlad_pool(params: Dict[str, Any], feats: jnp.ndarray) -> jnp.ndarray:
    """(N, 512) -> (64 * 512,) SFRS-style VLAD (cluster-major flatten)."""
    f = feats * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(feats * feats, -1, keepdims=True), 1e-24))
    scores = jax.nn.softmax(f @ params["score_w"], axis=-1)       # (N, K)
    # vlad[k, d] = sum_n scores[n, k] * (f[n, d] - centroids[k, d])
    vlad = jnp.einsum("nk,nd->kd", scores, f) \
        - params["centroids"] * jnp.sum(scores, 0)[:, None]
    vlad = vlad * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(vlad * vlad, -1, keepdims=True), 1e-24))
    v = vlad.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


@jax.jit
def openibl_descriptor(params: Dict[str, Any], image: jnp.ndarray
                       ) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] -> (32768,) L2-normalized descriptor."""
    return vlad_pool(params, backbone_features(params, image))


def init_params(rng: np.random.Generator) -> Dict[str, Any]:
    """Random-weight params (architecture tests / smoke use)."""
    feats, cin = [], 3
    for cout in VGG16_CONVS:
        k = (rng.standard_normal((cout, cin, 3, 3)) *
             np.sqrt(2.0 / (9 * cin))).astype(np.float32)
        feats.append({"kernel": jnp.asarray(k),
                      "bias": jnp.zeros(cout, jnp.float32)})
        cin = cout
    return {
        "features": feats,
        "score_w": jnp.asarray(0.1 * rng.standard_normal(
            (FEATURE_DIM, NUM_CLUSTERS)).astype(np.float32)),
        "centroids": jnp.asarray(0.1 * rng.standard_normal(
            (NUM_CLUSTERS, FEATURE_DIM)).astype(np.float32)),
    }


def convert_torch_weights_openibl(state_dict: Dict[str, Any]
                                  ) -> Dict[str, Any]:
    """OpenIBL ``vgg16_netvlad`` state dict -> JAX params.

    Expected keys: ``base_model.{i}.{weight,bias}`` for the 13 convs at the
    torchvision ``features`` sequential indices, ``net_vlad.conv.weight``
    (K, C, 1, 1, the soft-assign 1x1 conv, no bias) and
    ``net_vlad.centroids`` (K, C). Tensors are hard-asserted.
    """
    def to_np(t):
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            np.float32)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    # torchvision features indices of the 13 convs
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    feats = []
    for i in conv_idx:
        for prefix in (f"base_model.{i}", f"base.{i}", f"features.{i}"):
            if f"{prefix}.weight" in sd:
                break
        w = sd[f"{prefix}.weight"]
        b = sd[f"{prefix}.bias"]
        assert w.ndim == 4 and w.shape[2:] == (3, 3), (prefix, w.shape)
        feats.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
    conv_w = sd["net_vlad.conv.weight"]
    assert conv_w.shape == (NUM_CLUSTERS, FEATURE_DIM, 1, 1), conv_w.shape
    centroids = sd["net_vlad.centroids"]
    assert centroids.shape == (NUM_CLUSTERS, FEATURE_DIM), centroids.shape
    return {
        "features": feats,
        "score_w": jnp.asarray(conv_w[:, :, 0, 0].T),   # (C, K)
        "centroids": jnp.asarray(centroids),
    }
