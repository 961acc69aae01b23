"""LightGlue attentional matcher in JAX.

Implements the public LightGlue architecture (Lindenberger et al., ICCV 2023)
that hloc exposes as the ``lightglue`` matcher conf
(/root/reference/hloc/matchers/lightglue.py, conf
/root/reference/hloc/match_features.py 'superpoint+lightglue'): learnable
Fourier rotary positional encoding of keypoints, 9 transformer layers of
self-attention (rotary) + bidirectional cross-attention with concat-FFN
residuals, and a sigmoid-matchability double-softmax assignment head.

TPU-first notes: the reference's adaptive depth/width pruning
(depth_confidence / width_confidence) is a dynamic-shape CPU/GPU latency
trick; under XLA we run the full static 9-layer stack (all-pairs matmuls are
MXU work, and vmap batches pairs), which is the exact "max accuracy" setting
(confidence thresholds disabled) of the reference implementation.

Weights are NOT bundled (zero-egress); ``convert_torch_weights_lightglue``
maps the official ``superpoint_lightglue.pth`` state_dict (both the published
``self_attn.{i}.*`` naming and the renamed ``transformers.{i}.*`` naming)
onto the params pytree. Architecture parity is tested against a from-scratch
torch twin with random weights (tests/test_lightglue.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .superglue import SuperGlueResult

DIM = 256
NUM_HEADS = 4
HEAD_DIM = DIM // NUM_HEADS
NUM_LAYERS = 9


# ----------------------------------------------------------------- helpers
def _linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _layernorm(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def _ffn(p, x, message):
    """residual = Linear(2d,2d) -> LayerNorm -> GELU -> Linear(2d,d)."""
    h = _linear(p["fc1"], jnp.concatenate([x, message], -1))
    h = _layernorm(p["ln"], h)
    h = jax.nn.gelu(h, approximate=False)
    return x + _linear(p["fc2"], h)


def normalize_keypoints(kpts: jnp.ndarray, width: int, height: int):
    """Shift by size/2, scale by max(size)/2 (LightGlue convention)."""
    size = jnp.array([width, height], jnp.float32)
    return (kpts - size / 2) / (jnp.max(size) / 2)


def fourier_rotary_encoding(p, kpts_norm: jnp.ndarray):
    """(N, 2) -> (2, N, HEAD_DIM) cos/sin tables, repeat-interleaved x2."""
    proj = kpts_norm @ p["Wr"]["w"]                      # (N, HEAD_DIM//2)
    cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)
    return jnp.stack([cos, sin], 0)                      # (2, N, HEAD_DIM)


def _rotate_half(x):
    """(..., 2k) -> interleaved (-x2, x1) pairs."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], -1).reshape(*x1.shape[:-1], -1)


def _apply_rotary(enc, t):
    """t: (N, H, HEAD_DIM); enc: (2, N, HEAD_DIM)."""
    cos, sin = enc[0][:, None, :], enc[1][:, None, :]
    return t * cos + _rotate_half(t) * sin


def _self_block(p, x, enc):
    n, d = x.shape
    qkv = _linear(p["Wqkv"], x).reshape(n, NUM_HEADS, 3, HEAD_DIM)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = _apply_rotary(enc, q)
    k = _apply_rotary(enc, k)
    logits = jnp.einsum("nhd,mhd->hnm", q, k) / np.sqrt(HEAD_DIM)
    attn = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("hnm,mhd->nhd", attn, v).reshape(n, d)
    return _ffn(p["ffn"], x, _linear(p["out_proj"], ctx))


def _cross_block(p, x0, x1):
    scale = HEAD_DIM ** -0.25
    qk0 = _linear(p["to_qk"], x0).reshape(-1, NUM_HEADS, HEAD_DIM) * scale
    qk1 = _linear(p["to_qk"], x1).reshape(-1, NUM_HEADS, HEAD_DIM) * scale
    v0 = _linear(p["to_v"], x0).reshape(-1, NUM_HEADS, HEAD_DIM)
    v1 = _linear(p["to_v"], x1).reshape(-1, NUM_HEADS, HEAD_DIM)
    sim = jnp.einsum("nhd,mhd->hnm", qk0, qk1)
    m0 = jnp.einsum("hnm,mhd->nhd", jax.nn.softmax(sim, -1), v1)
    m1 = jnp.einsum("hnm,nhd->mhd", jax.nn.softmax(sim, 1), v0)
    m0 = _linear(p["to_out"], m0.reshape(x0.shape[0], DIM))
    m1 = _linear(p["to_out"], m1.reshape(x1.shape[0], DIM))
    return _ffn(p["ffn"], x0, m0), _ffn(p["ffn"], x1, m1)


def sigmoid_log_double_softmax(sim: jnp.ndarray, z0: jnp.ndarray,
                               z1: jnp.ndarray) -> jnp.ndarray:
    """(M, N) sim + per-point matchability logits -> (M+1, N+1) log scores."""
    m, n = sim.shape
    cert = jax.nn.log_sigmoid(z0)[:, None] + jax.nn.log_sigmoid(z1)[None, :]
    s0 = jax.nn.log_softmax(sim, axis=1)
    s1 = jax.nn.log_softmax(sim, axis=0)
    scores = jnp.zeros((m + 1, n + 1), sim.dtype)
    scores = scores.at[:m, :n].set(s0 + s1 + cert)
    scores = scores.at[:m, n].set(jax.nn.log_sigmoid(-z0))
    scores = scores.at[m, :n].set(jax.nn.log_sigmoid(-z1))
    return scores


def match_assignment(p, d0, d1):
    md0 = _linear(p["final_proj"], d0) / DIM ** 0.25
    md1 = _linear(p["final_proj"], d1) / DIM ** 0.25
    sim = md0 @ md1.T
    z0 = _linear(p["matchability"], d0)[:, 0]
    z1 = _linear(p["matchability"], d1)[:, 0]
    return sigmoid_log_double_softmax(sim, z0, z1)


# ----------------------------------------------------------------- forward
@functools.partial(jax.jit, static_argnames=(
    "width0", "height0", "width1", "height1", "match_threshold"))
def lightglue_match(
    params: Dict[str, Any],
    kpts0: jnp.ndarray, desc0: jnp.ndarray,
    kpts1: jnp.ndarray, desc1: jnp.ndarray,
    width0: int, height0: int, width1: int, height1: int,
    match_threshold: float = 0.1,
) -> SuperGlueResult:
    """Match two keypoint sets; desc* are (N, 256) SuperPoint descriptors."""
    enc0 = fourier_rotary_encoding(params["posenc"],
                                   normalize_keypoints(kpts0, width0, height0))
    enc1 = fourier_rotary_encoding(params["posenc"],
                                   normalize_keypoints(kpts1, width1, height1))
    d0 = _linear(params["input_proj"], desc0)
    d1 = _linear(params["input_proj"], desc1)
    for lyr in params["layers"]:
        d0 = _self_block(lyr["self_attn"], d0, enc0)
        d1 = _self_block(lyr["self_attn"], d1, enc1)
        d0, d1 = _cross_block(lyr["cross_attn"], d0, d1)
    Z = match_assignment(params["log_assignment"], d0, d1)

    Zin = Z[:-1, :-1]
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


# ------------------------------------------------------------ init/convert
def init_params(rng: np.random.Generator, scale: float = 0.05
                ) -> Dict[str, Any]:
    def dense(cin, cout, bias=True):
        p = {"w": jnp.asarray(scale * rng.standard_normal((cin, cout)),
                              jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p

    def ln(c):
        return {"gamma": jnp.ones((c,), jnp.float32),
                "beta": jnp.zeros((c,), jnp.float32)}

    def ffn():
        return {"fc1": dense(2 * DIM, 2 * DIM), "ln": ln(2 * DIM),
                "fc2": dense(2 * DIM, DIM)}

    layers = []
    for _ in range(NUM_LAYERS):
        layers.append({
            "self_attn": {"Wqkv": dense(DIM, 3 * DIM),
                          "out_proj": dense(DIM, DIM), "ffn": ffn()},
            "cross_attn": {"to_qk": dense(DIM, DIM), "to_v": dense(DIM, DIM),
                           "to_out": dense(DIM, DIM), "ffn": ffn()},
        })
    return {
        "posenc": {"Wr": dense(2, HEAD_DIM // 2, bias=False)},
        "input_proj": dense(DIM, DIM),
        "layers": layers,
        "log_assignment": {"matchability": dense(DIM, 1),
                           "final_proj": dense(DIM, DIM)},
    }


def convert_torch_weights_lightglue(state_dict: Dict[str, Any]
                                    ) -> Dict[str, Any]:
    """Map the official superpoint_lightglue.pth state_dict to the pytree.

    Accepts both the published ``self_attn.{i}.*`` / ``cross_attn.{i}.*``
    key style and the in-code ``transformers.{i}.self_attn.*`` style; only
    the FINAL layer's assignment head is used (full-depth inference).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    for i in range(NUM_LAYERS):
        for old, new in ((f"self_attn.{i}.", f"transformers.{i}.self_attn."),
                         (f"cross_attn.{i}.", f"transformers.{i}.cross_attn.")):
            sd = {k.replace(old, new) if k.startswith(old) else k: v
                  for k, v in sd.items()}

    def dense(prefix, bias=True):
        w = sd[f"{prefix}.weight"]
        p = {"w": jnp.asarray(w.T, jnp.float32)}
        if bias:
            p["b"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return p

    def ln(prefix):
        return {"gamma": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
                "beta": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

    def ffn(prefix):
        return {"fc1": dense(f"{prefix}.0"), "ln": ln(f"{prefix}.1"),
                "fc2": dense(f"{prefix}.3")}

    def wqkv(prefix):
        """torch packs qkv as (3*DIM, DIM) with q/k/v striped per head
        in our (N, H, 3, HEAD_DIM) reshape order: rows are
        [h0q,h0k,h0v? ...] — torch's Wqkv is a plain Linear producing
        (..., 3*dim) reshaped to (n, h, 3, hd) in the official code, so a
        transpose is the whole mapping."""
        return dense(prefix)

    layers = []
    for i in range(NUM_LAYERS):
        t = f"transformers.{i}"
        layers.append({
            "self_attn": {"Wqkv": wqkv(f"{t}.self_attn.Wqkv"),
                          "out_proj": dense(f"{t}.self_attn.out_proj"),
                          "ffn": ffn(f"{t}.self_attn.ffn")},
            "cross_attn": {"to_qk": dense(f"{t}.cross_attn.to_qk"),
                           "to_v": dense(f"{t}.cross_attn.to_v"),
                           "to_out": dense(f"{t}.cross_attn.to_out"),
                           "ffn": ffn(f"{t}.cross_attn.ffn")},
        })
    last = NUM_LAYERS - 1
    return {
        "posenc": {"Wr": dense("posenc.Wr", bias=False)},
        "input_proj": dense("input_proj"),
        "layers": layers,
        "log_assignment": {
            "matchability": dense(f"log_assignment.{last}.matchability"),
            "final_proj": dense(f"log_assignment.{last}.final_proj")},
    }


def load_lightglue(path: str) -> Dict[str, Any]:
    """Load official weights from a user-supplied .pth file."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_weights_lightglue(
        {k: v.numpy() for k, v in sd.items()})
