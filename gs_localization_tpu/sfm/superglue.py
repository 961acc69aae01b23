"""SuperGlue attentional matcher in JAX.

Implements the public SuperGlue architecture (Sarlin et al., CVPR 2020) the
reference uses for SfM matching through hloc (conf ``superglue`` with
sinkhorn_iterations=5 for 7-Scenes, /root/reference/gs_localization/sfm/
7scenes_sfm_full_dslam.py:236-237; model behavior
/root/reference/hloc/third_party/SuperGluePretrainedNetwork/models/
superglue.py): keypoint MLP encoder, 18 alternating self/cross attention
layers (4 heads, dim 256), final projection, log-space Sinkhorn optimal
transport with a learned dustbin, and mutual-max + threshold match
extraction.

Written functionally over a params pytree (no module framework): every step
is a dense matmul / softmax over (N, D) arrays, which is exactly the MXU
shape — one jit covers the whole matcher, vmap batches pairs.

Weights are NOT bundled (zero-egress); ``convert_torch_weights_superglue``
maps the official ``superglue_indoor.pth``/``superglue_outdoor.pth``
state_dict onto the pytree. Without weights the classical mutual-NN matcher
(sfm/matching.py) serves the same role in the pipelines.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DIM = 256
NUM_HEADS = 4
KENC_CHANNELS = (3, 32, 64, 128, 256, DIM)
NUM_GNN_LAYERS = 18        # ['self', 'cross'] * 9


class SuperGlueResult(NamedTuple):
    matches0: jnp.ndarray          # (N0,) int32 index into kpts1, -1 = none
    matches1: jnp.ndarray          # (N1,) int32
    matching_scores0: jnp.ndarray  # (N0,)
    matching_scores1: jnp.ndarray  # (N1,)


# ----------------------------------------------------------- param helpers
def _bn(p, x):
    """Inference-mode batchnorm over the channel (last) axis."""
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _mlp(layers, x):
    """[{'w','b','bn'?}...]; BN+ReLU between layers, plain last layer."""
    for lyr in layers[:-1]:
        x = x @ lyr["w"] + lyr["b"]
        if "bn" in lyr:
            x = _bn(lyr["bn"], x)
        x = jax.nn.relu(x)
    last = layers[-1]
    return x @ last["w"] + last["b"]


def _mha(p, x, source):
    """4-head attention: queries from x (N, D), keys/values from source.

    The reference views the (B, D, N) projection as (B, head_dim, H, N)
    (superglue.py:104-106: channel = d_i * H + h) and merges back in the
    same layout — so the channel axis splits DIM-major, not head-major.
    """
    n, d = x.shape
    hd = d // NUM_HEADS
    q = (x @ p["q"]["w"] + p["q"]["b"]).reshape(n, hd, NUM_HEADS)
    k = (source @ p["k"]["w"] + p["k"]["b"]).reshape(-1, hd, NUM_HEADS)
    v = (source @ p["v"]["w"] + p["v"]["b"]).reshape(-1, hd, NUM_HEADS)
    logits = jnp.einsum("ndh,mdh->hnm", q, k) / np.sqrt(hd)
    prob = jax.nn.softmax(logits, axis=-1)
    msg = jnp.einsum("hnm,mdh->ndh", prob, v).reshape(n, d)
    return msg @ p["merge"]["w"] + p["merge"]["b"]


def normalize_keypoints(kpts: jnp.ndarray, width: int, height: int):
    """Center + scale by 0.7 * max(size) (superglue.py:65-72 semantics)."""
    size = jnp.array([width, height], jnp.float32)
    center = size / 2
    scaling = jnp.max(size) * 0.7
    return (kpts - center) / scaling


# ------------------------------------------------------------ sinkhorn OT
def log_sinkhorn(Z: jnp.ndarray, log_mu: jnp.ndarray, log_nu: jnp.ndarray,
                 iters: int) -> jnp.ndarray:
    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(Z + u[:, None], axis=0)
        return (u, v), None

    (u, v), _ = jax.lax.scan(
        body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)), None,
        length=iters)
    return Z + u[:, None] + v[None, :]


def log_optimal_transport(scores: jnp.ndarray, alpha: jnp.ndarray,
                          iters: int) -> jnp.ndarray:
    """(M, N) score matrix -> (M+1, N+1) log assignment with dustbins."""
    m, n = scores.shape
    bins0 = jnp.full((m, 1), alpha)
    bins1 = jnp.full((1, n), alpha)
    couplings = jnp.block([[scores, bins0],
                           [bins1, jnp.full((1, 1), alpha)]])
    norm = -jnp.log(float(m + n))
    log_mu = jnp.concatenate(
        [jnp.full((m,), norm), jnp.array([np.log(n) + norm])])
    log_nu = jnp.concatenate(
        [jnp.full((n,), norm), jnp.array([np.log(m) + norm])])
    Z = log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm


# --------------------------------------------------------------- forward
@functools.partial(jax.jit, static_argnames=(
    "width0", "height0", "width1", "height1", "sinkhorn_iters",
    "match_threshold"))
def superglue_match(
    params: Dict[str, Any],
    kpts0: jnp.ndarray, scores0: jnp.ndarray, desc0: jnp.ndarray,
    kpts1: jnp.ndarray, scores1: jnp.ndarray, desc1: jnp.ndarray,
    width0: int, height0: int, width1: int, height1: int,
    sinkhorn_iters: int = 100,
    match_threshold: float = 0.2,
) -> SuperGlueResult:
    """Match two keypoint sets. desc* are (N, 256) L2-normalized."""
    # 1. keypoint encoder added to visual descriptors
    enc0 = jnp.concatenate(
        [normalize_keypoints(kpts0, width0, height0), scores0[:, None]], -1)
    enc1 = jnp.concatenate(
        [normalize_keypoints(kpts1, width1, height1), scores1[:, None]], -1)
    d0 = desc0 + _mlp(params["kenc"], enc0)
    d1 = desc1 + _mlp(params["kenc"], enc1)

    # 2. alternating self/cross attentional GNN with residual MLP
    for i, lyr in enumerate(params["layers"]):
        if i % 2 == 0:           # self
            s0, s1 = d0, d1
        else:                    # cross
            s0, s1 = d1, d0
        m0 = _mha(lyr["attn"], d0, s0)
        m1 = _mha(lyr["attn"], d1, s1)
        d0 = d0 + _mlp(lyr["mlp"], jnp.concatenate([d0, m0], -1))
        d1 = d1 + _mlp(lyr["mlp"], jnp.concatenate([d1, m1], -1))

    # 3. final projection + score matrix
    md0 = d0 @ params["final_proj"]["w"] + params["final_proj"]["b"]
    md1 = d1 @ params["final_proj"]["w"] + params["final_proj"]["b"]
    scores = (md0 @ md1.T) / np.sqrt(DIM)

    # 4. optimal transport with dustbins
    Z = log_optimal_transport(scores, params["bin_score"], sinkhorn_iters)
    Zin = Z[:-1, :-1]

    # 5. mutual max + threshold
    idx0 = jnp.argmax(Zin, axis=1)
    idx1 = jnp.argmax(Zin, axis=0)
    n0, n1 = Zin.shape
    mutual0 = jnp.arange(n0) == idx1[idx0]
    mutual1 = jnp.arange(n1) == idx0[idx1]
    ms0 = jnp.where(mutual0, jnp.exp(jnp.max(Zin, axis=1)), 0.0)
    ms1 = jnp.where(mutual1, ms0[idx1], 0.0)
    valid0 = mutual0 & (ms0 > match_threshold)
    valid1 = mutual1 & valid0[idx1]
    return SuperGlueResult(
        matches0=jnp.where(valid0, idx0, -1).astype(jnp.int32),
        matches1=jnp.where(valid1, idx1, -1).astype(jnp.int32),
        matching_scores0=ms0,
        matching_scores1=ms1,
    )


def matches_as_pairs(res: SuperGlueResult) -> np.ndarray:
    """(M, 2) array of (kp0, kp1) index pairs (host-side)."""
    m0 = np.asarray(res.matches0)
    keep = m0 >= 0
    return np.stack([np.nonzero(keep)[0], m0[keep]], 1)


# ------------------------------------------------------------ init/convert
def init_params(rng: np.random.Generator, scale: float = 0.1
                ) -> Dict[str, Any]:
    """Random parameters (architecture tests / fine-tuning from scratch)."""
    def dense(cin, cout):
        return {"w": jnp.asarray(
                    scale * rng.standard_normal((cin, cout)), jnp.float32),
                "b": jnp.zeros((cout,), jnp.float32)}

    def bn(c):
        return {"gamma": jnp.ones((c,), jnp.float32),
                "beta": jnp.zeros((c,), jnp.float32),
                "mean": jnp.zeros((c,), jnp.float32),
                "var": jnp.ones((c,), jnp.float32)}

    def mlp(channels):
        out = []
        for i in range(1, len(channels)):
            lyr = dense(channels[i - 1], channels[i])
            if i < len(channels) - 1:
                lyr["bn"] = bn(channels[i])
            out.append(lyr)
        return out

    layers = []
    for _ in range(NUM_GNN_LAYERS):
        layers.append({
            "attn": {"q": dense(DIM, DIM), "k": dense(DIM, DIM),
                     "v": dense(DIM, DIM), "merge": dense(DIM, DIM)},
            "mlp": mlp((2 * DIM, 2 * DIM, DIM)),
        })
    return {
        "kenc": mlp(KENC_CHANNELS),
        "layers": layers,
        "final_proj": dense(DIM, DIM),
        "bin_score": jnp.asarray(1.0, jnp.float32),
    }


def convert_torch_weights_superglue(state_dict: Dict[str, Any]
                                    ) -> Dict[str, Any]:
    """Map the official superglue_{indoor,outdoor}.pth state_dict onto the
    params pytree. torch Conv1d stores (out, in, 1); we use (in, out)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(prefix):
        w = sd[f"{prefix}.weight"]
        if w.ndim == 3:
            w = w[:, :, 0]
        return {"w": jnp.asarray(w.T, jnp.float32),
                "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

    def bn(prefix):
        return {"gamma": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
                "beta": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"], jnp.float32),
                "var": jnp.asarray(sd[f"{prefix}.running_var"], jnp.float32)}

    def mlp(prefix, n_channels):
        # torch Sequential indices: conv, bn, relu triplets + final conv
        out, idx = [], 0
        for i in range(1, n_channels):
            lyr = dense(f"{prefix}.{idx}")
            if i < n_channels - 1:
                lyr["bn"] = bn(f"{prefix}.{idx + 1}")
                idx += 3
            out.append(lyr)
        return out

    layers = []
    for i in range(NUM_GNN_LAYERS):
        g = f"gnn.layers.{i}"
        layers.append({
            "attn": {
                "q": dense(f"{g}.attn.proj.0"),
                "k": dense(f"{g}.attn.proj.1"),
                "v": dense(f"{g}.attn.proj.2"),
                "merge": dense(f"{g}.attn.merge"),
            },
            "mlp": mlp(f"{g}.mlp", len((2 * DIM, 2 * DIM, DIM))),
        })
    return {
        "kenc": mlp("kenc.encoder", len(KENC_CHANNELS)),
        "layers": layers,
        "final_proj": dense("final_proj"),
        "bin_score": jnp.asarray(float(sd["bin_score"]), jnp.float32),
    }


def load_superglue(path: str) -> Dict[str, Any]:
    """Load official weights from a user-supplied .pth file (gated: torch
    is only needed here)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_torch_weights_superglue(
        {k: v.numpy() for k, v in sd.items()})
