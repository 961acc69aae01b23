"""EigenPlaces / CosPlace global descriptors in JAX.

Re-implements hloc's EigenPlaces extractor
(/root/reference/hloc/extractors/eigenplaces.py:1-57), whose nets come from
the ``gmberton/EigenPlaces`` / ``gmberton/CosPlace`` torch.hub models (not
vendored, so parity is against a from-scratch torch twin —
tests/test_eigenplaces.py — the LoFTR standard).

Both families share one architecture (EigenPlaces network.py /
CosPlace cosplace_model):

  backbone: torchvision ResNet truncated after layer4 (children()[:-2]) —
            structurally identical to the dirtorch ResNet already
            implemented in sfm/dir.py, which this module reuses;
  head:     L2-normalize channels -> GeM pool (learnable p, default 3) ->
            Linear(features_dim, fc_output_dim) -> L2 normalize;
  input:    ImageNet mean/std (the hloc wrapper applies it).

The only difference from DIR's ResNet-AP-GeM head (dir.py) is the channel
L2 normalization BEFORE GeM and the absence of PCA whitening.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .dir import ARCHS, backbone_forward, gem_pool

# backbone feature dims after layer4
FEATURES_DIM = {"resnet18": 512, "resnet50": 2048, "resnet101": 2048,
                "resnet152": 2048}


def eigenplaces_descriptor(params: Dict[str, Any], image: jnp.ndarray
                           ) -> jnp.ndarray:
    """(H, W, 3) RGB in [0, 1] -> (fc_output_dim,) L2-normalized descriptor.

    ``backbone_forward`` applies the ImageNet normalization (dir.py:92).
    """
    feat = backbone_forward(params, image)                 # (h, w, C)
    feat = feat * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(feat * feat, -1, keepdims=True), 1e-24))
    d = gem_pool(feat, params["gemp"])                     # (C,)
    d = d @ params["fc_w"].T + params["fc_b"]
    return d / jnp.maximum(jnp.linalg.norm(d), 1e-12)


def convert_torch_weights_eigenplaces(state_dict: Dict[str, Any],
                                      arch: str = "resnet101"
                                      ) -> Dict[str, Any]:
    """EigenPlaces/CosPlace hub state dict -> JAX params.

    The hub module stores the truncated ResNet as a flat ``backbone``
    Sequential (indices 0 conv1, 1 bn1, 4..7 layer1..4) and the head as
    ``aggregation`` Sequential (1 = GeM with scalar ``p``, 3 = Linear).
    This remaps those keys to the dirtorch-style layout dir.py's converter
    expects, then delegates to it.
    """
    from .dir import convert_torch_weights_dir

    def to_np(t):
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            np.float32)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    fixed: Dict[str, Any] = {}
    seq_to_name = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                   "6": "layer3", "7": "layer4"}
    for k, v in sd.items():
        if k.startswith("backbone."):
            rest = k[len("backbone."):]
            idx, _, tail = rest.partition(".")
            assert idx in seq_to_name, f"unexpected backbone key '{k}'"
            fixed[seq_to_name[idx] + "." + tail] = v
    fixed["fc.weight"] = sd["aggregation.3.weight"]
    fixed["fc.bias"] = sd["aggregation.3.bias"]
    gemp = sd.get("aggregation.1.p", np.array([3.0], np.float32))
    fixed["adpool.p"] = gemp
    return convert_torch_weights_dir(fixed, arch=arch, pca=None)


def init_params(rng: np.random.Generator, arch: str = "resnet18",
                fc_output_dim: int = 256) -> Dict[str, Any]:
    """Random-weight params (architecture tests / smoke use)."""
    kind, depths = ARCHS[arch]
    expansion = 4 if kind == "bottleneck" else 1

    def conv(cout, cin, k):
        return jnp.asarray((rng.standard_normal((cout, cin, k, k)) *
                            np.sqrt(2.0 / (k * k * cin))).astype(np.float32))

    def bnp(c):
        return {"scale": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(
                    np.float32)),
                "bias": jnp.asarray(0.1 * rng.standard_normal(c).astype(
                    np.float32)),
                "mean": jnp.asarray(0.1 * rng.standard_normal(c).astype(
                    np.float32)),
                "var": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(
                    np.float32))}

    layers = []
    cin = 64
    width = 64
    for li, depth in enumerate(depths):
        stage = []
        cout = width * expansion
        for bi in range(depth):
            stride = 2 if (li > 0 and bi == 0) else 1
            blk: Dict[str, Any] = {"stride": stride}
            if kind == "bottleneck":
                blk["conv1"] = conv(width, cin, 1)
                blk["bn1"] = bnp(width)
                blk["conv2"] = conv(width, width, 3)
                blk["bn2"] = bnp(width)
                blk["conv3"] = conv(cout, width, 1)
                blk["bn3"] = bnp(cout)
            else:
                blk["conv1"] = conv(width, cin, 3)
                blk["bn1"] = bnp(width)
                blk["conv2"] = conv(width, width, 3)
                blk["bn2"] = bnp(width)
            if stride != 1 or cin != cout:
                blk["down_w"] = conv(cout, cin, 1)
                blk["down_bn"] = bnp(cout)
            stage.append(blk)
            cin = cout
        layers.append(stage)
        width *= 2
    c_feat = FEATURES_DIM[arch]
    return {
        "block": kind,
        "conv1": conv(64, 3, 7),
        "bn1": bnp(64),
        "layers": layers,
        "fc_w": jnp.asarray((0.02 * rng.standard_normal(
            (fc_output_dim, c_feat))).astype(np.float32)),
        "fc_b": jnp.zeros(fc_output_dim, jnp.float32),
        "gemp": 3.0,
        "pca": None,
    }
