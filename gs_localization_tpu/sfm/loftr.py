"""LoFTR detector-free dense matcher in JAX.

Re-implements the LoFTR architecture (Sun et al., CVPR 2021) that hloc
exposes through its dense-matching path (/root/reference/hloc/matchers/
loftr.py + /root/reference/hloc/match_dense.py confs 'loftr*'): a
ResNet-FPN(8,2) backbone over grayscale, 2D sine positional encoding,
a coarse linear-attention transformer (['self','cross'] x 4) on 1/8-res
256-d features, dual-softmax coarse matching (temperature 0.1, mutual-NN,
threshold 0.2), and fine refinement — 5x5 windows of 1/2-res 128-d features
around each coarse match, one more self/cross transformer, and a spatial-
softmax expectation for sub-pixel offsets.

TPU-first notes: linear attention IS the TPU-friendly choice (two matmuls,
no NxN score matrix); coarse matching is one (L, C) x (C, S) matmul; the
variable match count becomes a fixed-capacity top-k (max_matches), so the
whole matcher jits once per image shape. Weights are NOT bundled
(zero-egress): ``convert_torch_weights_loftr`` maps the official
``outdoor_ds.ckpt``/``indoor_ds_new.ckpt`` state_dict naming
(backbone.*, loftr_coarse.layers.*, fine_preprocess.*, loftr_fine.*).
Architecture verified against a from-scratch torch twin
(tests/test_loftr.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

D_COARSE = 256
D_FINE = 128
NHEAD = 8
COARSE_LAYERS = 4          # x ['self', 'cross']
FINE_WINDOW = 5
TEMPERATURE = 0.1
BLOCK_DIMS = (128, 196, 256)
INITIAL_DIM = 128


# ------------------------------------------------------------ conv helpers
def _conv(x, kernel, stride=1, pad=None):
    k = kernel.shape[0]
    if pad is None:
        pad = k // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _basic_block(p, x, stride):
    y = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], stride)))
    y = _bn(p["bn2"], _conv(y, p["conv2"], 1))
    if "down" in p:
        x = _bn(p["down_bn"], _conv(x, p["down"], stride, pad=0))
    return jax.nn.relu(x + y)


def backbone_fpn(p, image: jnp.ndarray):
    """(H, W) grayscale -> (coarse (H/8, W/8, 256), fine (H/2, W/2, 128))."""
    x = image[None, :, :, None]
    x0 = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], 2, pad=3)))  # 1/2
    x1 = _basic_block(p["layer1"][0], x0, 1)
    x1 = _basic_block(p["layer1"][1], x1, 1)                          # 1/2
    x2 = _basic_block(p["layer2"][0], x1, 2)
    x2 = _basic_block(p["layer2"][1], x2, 1)                          # 1/4
    x3 = _basic_block(p["layer3"][0], x2, 2)
    x3 = _basic_block(p["layer3"][1], x3, 1)                          # 1/8

    x3_out = _conv(x3, p["layer3_outconv"], 1, pad=0)
    up3 = jax.image.resize(x3_out, (1, x2.shape[1], x2.shape[2],
                                    x3_out.shape[-1]), "bilinear")
    x2_out = _conv(x2, p["layer2_outconv"], 1, pad=0) + up3
    x2_out = _conv(
        jax.nn.leaky_relu(
            _bn(p["layer2_outconv2_bn"],
                _conv(x2_out, p["layer2_outconv2_a"], 1)), 0.01),
        p["layer2_outconv2_b"], 1)
    up2 = jax.image.resize(x2_out, (1, x1.shape[1], x1.shape[2],
                                    x2_out.shape[-1]), "bilinear")
    x1_out = _conv(x1, p["layer1_outconv"], 1, pad=0) + up2
    x1_out = _conv(
        jax.nn.leaky_relu(
            _bn(p["layer1_outconv2_bn"],
                _conv(x1_out, p["layer1_outconv2_a"], 1)), 0.01),
        p["layer1_outconv2_b"], 1)
    return x3_out[0], x1_out[0]


def sine_pos_encoding(h: int, w: int, d_model: int = D_COARSE) -> np.ndarray:
    """(h, w, d) fixed 2D sine encoding (LoFTR PositionEncodingSine,
    post-bugfix normalization)."""
    pe = np.zeros((d_model, h, w), np.float32)
    ypos = np.cumsum(np.ones((h, w), np.float32), 0)[None]
    xpos = np.cumsum(np.ones((h, w), np.float32), 1)[None]
    div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                 * (-np.log(10000.0) / (d_model // 2)))[:, None, None]
    pe[0::4] = np.sin(xpos * div)
    pe[1::4] = np.cos(xpos * div)
    pe[2::4] = np.sin(ypos * div)
    pe[3::4] = np.cos(ypos * div)
    return pe.transpose(1, 2, 0)


# --------------------------------------------------- linear attention layer
def _linear_attention(q, k, v, eps=1e-6):
    """(L, H, D) x (S, H, D) x (S, H, D) -> (L, H, D), elu+1 feature map."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    s = v.shape[0]
    v = v / s
    KV = jnp.einsum("shd,shv->hdv", K, v)
    Z = 1.0 / (jnp.einsum("lhd,hd->lh", Q, jnp.sum(K, 0)) + eps)
    return jnp.einsum("lhd,hdv,lh->lhv", Q, KV, Z) * s


def _layernorm(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def _encoder_layer(p, x, source, d_model):
    hd = d_model // NHEAD
    L, S = x.shape[0], source.shape[0]
    q = (x @ p["q"]).reshape(L, NHEAD, hd)
    k = (source @ p["k"]).reshape(S, NHEAD, hd)
    v = (source @ p["v"]).reshape(S, NHEAD, hd)
    msg = _linear_attention(q, k, v).reshape(L, d_model)
    msg = _layernorm(p["norm1"], msg @ p["merge"])
    msg = jnp.concatenate([x, msg], -1)
    msg = jax.nn.relu(msg @ p["mlp1"])
    msg = _layernorm(p["norm2"], msg @ p["mlp2"])
    return x + msg


def _transformer(layers, f0, f1, d_model):
    for i, lyr in enumerate(layers):
        if i % 2 == 0:      # self
            f0 = _encoder_layer(lyr, f0, f0, d_model)
            f1 = _encoder_layer(lyr, f1, f1, d_model)
        else:               # cross
            f0n = _encoder_layer(lyr, f0, f1, d_model)
            f1 = _encoder_layer(lyr, f1, f0, d_model)
            f0 = f0n
    return f0, f1


class LoftrMatches(NamedTuple):
    kpts0: jnp.ndarray     # (M, 2) sub-pixel in image0
    kpts1: jnp.ndarray     # (M, 2) coarse centers in image1
    scores: jnp.ndarray    # (M,) dual-softmax confidence; 0 = dead slot


@functools.partial(jax.jit, static_argnames=("max_matches",
                                             "match_threshold"))
def loftr_match(params: Dict[str, Any], image0: jnp.ndarray,
                image1: jnp.ndarray, max_matches: int = 512,
                match_threshold: float = 0.2) -> LoftrMatches:
    """Dense-match two grayscale images ((H, W) in [0, 1], H,W % 8 == 0).

    Like hloc's wrapper we refine in image0 (matchers/loftr.py:24-33 swaps
    so the sub-pixel expectation lands on the FIRST image's keypoints).
    """
    c0, f0 = backbone_fpn(params["backbone"], image0)
    c1, f1 = backbone_fpn(params["backbone"], image1)
    hc0, wc0, _ = c0.shape
    hc1, wc1, _ = c1.shape

    pe0 = jnp.asarray(sine_pos_encoding(hc0, wc0))
    pe1 = jnp.asarray(sine_pos_encoding(hc1, wc1))
    fc0 = (c0 + pe0).reshape(-1, D_COARSE)
    fc1 = (c1 + pe1).reshape(-1, D_COARSE)
    fc0, fc1 = _transformer(params["coarse"], fc0, fc1, D_COARSE)

    # dual-softmax coarse matching
    n0 = fc0 / D_COARSE ** 0.5
    n1 = fc1 / D_COARSE ** 0.5
    sim = (n0 @ n1.T) / TEMPERATURE
    conf = jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 0)
    idx1 = jnp.argmax(conf, axis=1)
    idx0 = jnp.argmax(conf, axis=0)
    mutual = jnp.arange(conf.shape[0]) == idx0[idx1]
    best = jnp.max(conf, axis=1)
    # border removal (border_rm=2 coarse cells)
    yy0 = jnp.arange(hc0 * wc0) // wc0
    xx0 = jnp.arange(hc0 * wc0) % wc0
    inb0 = (xx0 >= 2) & (xx0 < wc0 - 2) & (yy0 >= 2) & (yy0 < hc0 - 2)
    yy1 = idx1 // wc1
    xx1 = idx1 % wc1
    inb1 = (xx1 >= 2) & (xx1 < wc1 - 2) & (yy1 >= 2) & (yy1 < hc1 - 2)
    keep = mutual & (best > match_threshold) & inb0 & inb1
    score = jnp.where(keep, best, 0.0)
    vals, sel = jax.lax.top_k(score, max_matches)    # coarse cells in img0
    m_idx0 = sel
    m_idx1 = idx1[sel]

    # ---- fine refinement on image0 keypoints -----------------------------
    W = FINE_WINDOW
    fp = params["fine_preprocess"]
    # coarse-cell centers at fine (1/2) resolution: cell * 4
    cy0 = (m_idx0 // wc0) * 4
    cx0 = (m_idx0 % wc0) * 4
    cy1 = (m_idx1 // wc1) * 4
    cx1 = (m_idx1 % wc1) * 4

    def unfold(fmap, cy, cx):
        hf, wf, c = fmap.shape
        off = jnp.arange(W) - W // 2

        def one(yc, xc):
            ys = jnp.clip(yc + off, 0, hf - 1)
            xs = jnp.clip(xc + off, 0, wf - 1)
            return fmap[ys[:, None], xs[None, :], :].reshape(W * W, c)

        return jax.vmap(one)(cy, cx)                 # (M, WW, C)

    w0 = unfold(f0, cy0, cx0)
    w1 = unfold(f1, cy1, cx1)
    cwin0 = fc0[m_idx0] @ fp["down_proj_w"] + fp["down_proj_b"]  # (M, 128)
    cwin1 = fc1[m_idx1] @ fp["down_proj_w"] + fp["down_proj_b"]

    def merge(wf, cw):
        cat = jnp.concatenate(
            [wf, jnp.broadcast_to(cw[:, None, :], wf.shape)], -1)
        return cat @ fp["merge_w"] + fp["merge_b"]

    w0 = merge(w0, cwin0)
    w1 = merge(w1, cwin1)
    w0, w1 = jax.vmap(
        lambda a, b: _transformer(params["fine"], a, b, D_FINE))(w0, w1)

    # fine matching: center of w1 against all of w0, expectation in w0
    center = w1[:, W * W // 2, :]                    # (M, 128)
    sim_f = jnp.einsum("mc,mwc->mw", center, w0) / (D_FINE ** 0.5)
    prob = jax.nn.softmax(sim_f / 1.0, axis=-1)      # (M, WW)
    gy = (jnp.arange(W * W) // W - W // 2).astype(jnp.float32)
    gx = (jnp.arange(W * W) % W - W // 2).astype(jnp.float32)
    dx = prob @ gx
    dy = prob @ gy

    valid = vals > 0
    # fine grid step = 2 px (1/2-res features); coarse centers at 8*cell+3.5
    kx0 = (m_idx0 % wc0).astype(jnp.float32) * 8 + 3.5 + dx * 2
    ky0 = (m_idx0 // wc0).astype(jnp.float32) * 8 + 3.5 + dy * 2
    kx1 = (m_idx1 % wc1).astype(jnp.float32) * 8 + 3.5
    ky1 = (m_idx1 // wc1).astype(jnp.float32) * 8 + 3.5
    return LoftrMatches(
        kpts0=jnp.where(valid[:, None], jnp.stack([kx0, ky0], 1), -1.0),
        kpts1=jnp.where(valid[:, None], jnp.stack([kx1, ky1], 1), -1.0),
        scores=jnp.where(valid, vals, 0.0),
    )


# ------------------------------------------------------------ init/convert
def init_params(rng: np.random.Generator, scale: float = 0.05
                ) -> Dict[str, Any]:
    def conv(k, cin, cout):
        return jnp.asarray((rng.standard_normal((k, k, cin, cout))
                            * np.sqrt(2.0 / (k * k * cin))
                            ).astype(np.float32))

    def bn(c):
        return {"gamma": jnp.ones(c, jnp.float32),
                "beta": jnp.zeros(c, jnp.float32),
                "mean": jnp.zeros(c, jnp.float32),
                "var": jnp.ones(c, jnp.float32)}

    def block(cin, cout, stride):
        p = {"conv1": conv(3, cin, cout), "bn1": bn(cout),
             "conv2": conv(3, cout, cout), "bn2": bn(cout)}
        if stride != 1 or cin != cout:
            p["down"] = conv(1, cin, cout)
            p["down_bn"] = bn(cout)
        return p

    d1, d2, d3 = BLOCK_DIMS
    backbone = {
        "conv1": conv(7, 1, INITIAL_DIM), "bn1": bn(INITIAL_DIM),
        "layer1": [block(INITIAL_DIM, d1, 1), block(d1, d1, 1)],
        "layer2": [block(d1, d2, 2), block(d2, d2, 1)],
        "layer3": [block(d2, d3, 2), block(d3, d3, 1)],
        "layer3_outconv": conv(1, d3, d3),
        "layer2_outconv": conv(1, d2, d3),
        "layer2_outconv2_a": conv(3, d3, d3),
        "layer2_outconv2_bn": bn(d3),
        "layer2_outconv2_b": conv(3, d3, d2),
        "layer1_outconv": conv(1, d1, d2),
        "layer1_outconv2_a": conv(3, d2, d2),
        "layer1_outconv2_bn": bn(d2),
        "layer1_outconv2_b": conv(3, d2, d1),
    }

    def dense(cin, cout):
        return jnp.asarray(
            (scale * rng.standard_normal((cin, cout))).astype(np.float32))

    def ln(c):
        return {"gamma": jnp.ones(c, jnp.float32),
                "beta": jnp.zeros(c, jnp.float32)}

    def enc_layer(d):
        return {"q": dense(d, d), "k": dense(d, d), "v": dense(d, d),
                "merge": dense(d, d), "norm1": ln(d),
                "mlp1": dense(2 * d, 2 * d), "mlp2": dense(2 * d, d),
                "norm2": ln(d)}

    return {
        "backbone": backbone,
        "coarse": [enc_layer(D_COARSE) for _ in range(2 * COARSE_LAYERS)],
        "fine_preprocess": {
            "down_proj_w": dense(D_COARSE, D_FINE),
            "down_proj_b": jnp.zeros(D_FINE, jnp.float32),
            "merge_w": dense(2 * D_FINE, D_FINE),
            "merge_b": jnp.zeros(D_FINE, jnp.float32)},
        "fine": [enc_layer(D_FINE) for _ in range(2)],
    }


def convert_torch_weights_loftr(state_dict: Dict[str, Any]
                                ) -> Dict[str, Any]:
    """Map the official LoFTR checkpoint (matcher.* or flat prefixes)."""
    sd = {}
    for k, v in state_dict.items():
        k = k[len("matcher."):] if k.startswith("matcher.") else k
        sd[k] = np.asarray(v)

    def conv(prefix):
        return jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))

    def bn(prefix):
        return {"gamma": jnp.asarray(sd[f"{prefix}.weight"]),
                "beta": jnp.asarray(sd[f"{prefix}.bias"]),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                "var": jnp.asarray(sd[f"{prefix}.running_var"])}

    def block(prefix, has_down):
        p = {"conv1": conv(f"{prefix}.conv1"), "bn1": bn(f"{prefix}.bn1"),
             "conv2": conv(f"{prefix}.conv2"), "bn2": bn(f"{prefix}.bn2")}
        if has_down:
            p["down"] = conv(f"{prefix}.downsample.0")
            p["down_bn"] = bn(f"{prefix}.downsample.1")
        return p

    bb = "backbone"
    backbone = {
        "conv1": conv(f"{bb}.conv1"), "bn1": bn(f"{bb}.bn1"),
        "layer1": [block(f"{bb}.layer1.0", False),
                   block(f"{bb}.layer1.1", False)],
        "layer2": [block(f"{bb}.layer2.0", True),
                   block(f"{bb}.layer2.1", False)],
        "layer3": [block(f"{bb}.layer3.0", True),
                   block(f"{bb}.layer3.1", False)],
        "layer3_outconv": conv(f"{bb}.layer3_outconv"),
        "layer2_outconv": conv(f"{bb}.layer2_outconv"),
        "layer2_outconv2_a": conv(f"{bb}.layer2_outconv2.0"),
        "layer2_outconv2_bn": bn(f"{bb}.layer2_outconv2.1"),
        "layer2_outconv2_b": conv(f"{bb}.layer2_outconv2.3"),
        "layer1_outconv": conv(f"{bb}.layer1_outconv"),
        "layer1_outconv2_a": conv(f"{bb}.layer1_outconv2.0"),
        "layer1_outconv2_bn": bn(f"{bb}.layer1_outconv2.1"),
        "layer1_outconv2_b": conv(f"{bb}.layer1_outconv2.3"),
    }

    def dense_t(prefix):
        return jnp.asarray(sd[f"{prefix}.weight"].T)

    def ln(prefix):
        return {"gamma": jnp.asarray(sd[f"{prefix}.weight"]),
                "beta": jnp.asarray(sd[f"{prefix}.bias"])}

    def enc_layer(prefix):
        return {"q": dense_t(f"{prefix}.q_proj"),
                "k": dense_t(f"{prefix}.k_proj"),
                "v": dense_t(f"{prefix}.v_proj"),
                "merge": dense_t(f"{prefix}.merge"),
                "norm1": ln(f"{prefix}.norm1"),
                "mlp1": dense_t(f"{prefix}.mlp.0"),
                "mlp2": dense_t(f"{prefix}.mlp.2"),
                "norm2": ln(f"{prefix}.norm2")}

    return {
        "backbone": backbone,
        "coarse": [enc_layer(f"loftr_coarse.layers.{i}")
                   for i in range(2 * COARSE_LAYERS)],
        "fine_preprocess": {
            "down_proj_w": dense_t("fine_preprocess.down_proj"),
            "down_proj_b": jnp.asarray(sd["fine_preprocess.down_proj.bias"]),
            "merge_w": dense_t("fine_preprocess.merge_feat"),
            "merge_b": jnp.asarray(sd["fine_preprocess.merge_feat.bias"])},
        "fine": [enc_layer(f"loftr_fine.layers.{i}") for i in range(2)],
    }
