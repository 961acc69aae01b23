"""LightGlue-in-JAX parity vs a from-scratch torch twin (random weights)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm import lightglue as lg

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x)).float()


def _lin(p, x):
    return F.linear(x, _t(p["w"]).t(), _t(p["b"]) if "b" in p else None)


def _torch_twin(params, kpts0, desc0, kpts1, desc1, size):
    """Official-formula LightGlue forward in torch, sharing our params."""
    W, H = size

    def norm_kpts(k):
        s = torch.tensor([W, H]).float()
        return (_t(k) - s / 2) / (s.max() / 2)

    def posenc(kn):
        proj = kn @ _t(params["posenc"]["Wr"]["w"])
        return (torch.repeat_interleave(torch.cos(proj), 2, -1),
                torch.repeat_interleave(torch.sin(proj), 2, -1))

    def rotate_half(x):
        x = x.unflatten(-1, (-1, 2))
        x1, x2 = x.unbind(-1)
        return torch.stack((-x2, x1), dim=-1).flatten(start_dim=-2)

    def apply_rot(enc, t):
        cos, sin = enc[0].unsqueeze(1), enc[1].unsqueeze(1)
        return t * cos + rotate_half(t) * sin

    def ffn(p, x, msg):
        h = _lin(p["fc1"], torch.cat([x, msg], -1))
        h = F.layer_norm(h, (h.shape[-1],), _t(p["ln"]["gamma"]),
                         _t(p["ln"]["beta"]))
        return x + _lin(p["fc2"], F.gelu(h))

    def self_block(p, x, enc):
        n = x.shape[0]
        qkv = _lin(p["Wqkv"], x).reshape(n, lg.NUM_HEADS, 3, lg.HEAD_DIM)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k = apply_rot(enc, q), apply_rot(enc, k)
        logits = torch.einsum("nhd,mhd->hnm", q, k) / lg.HEAD_DIM ** 0.5
        ctx = torch.einsum("hnm,mhd->nhd", logits.softmax(-1), v)
        return ffn(p["ffn"], x, _lin(p["out_proj"], ctx.reshape(n, -1)))

    def cross_block(p, x0, x1):
        sc = lg.HEAD_DIM ** -0.25
        qk0 = _lin(p["to_qk"], x0).reshape(-1, lg.NUM_HEADS, lg.HEAD_DIM) * sc
        qk1 = _lin(p["to_qk"], x1).reshape(-1, lg.NUM_HEADS, lg.HEAD_DIM) * sc
        v0 = _lin(p["to_v"], x0).reshape(-1, lg.NUM_HEADS, lg.HEAD_DIM)
        v1 = _lin(p["to_v"], x1).reshape(-1, lg.NUM_HEADS, lg.HEAD_DIM)
        sim = torch.einsum("nhd,mhd->hnm", qk0, qk1)
        m0 = torch.einsum("hnm,mhd->nhd", sim.softmax(-1), v1)
        m1 = torch.einsum("hnm,nhd->mhd", sim.softmax(1), v0)
        m0 = _lin(p["to_out"], m0.reshape(x0.shape[0], -1))
        m1 = _lin(p["to_out"], m1.reshape(x1.shape[0], -1))
        return ffn(p["ffn"], x0, m0), ffn(p["ffn"], x1, m1)

    enc0, enc1 = posenc(norm_kpts(kpts0)), posenc(norm_kpts(kpts1))
    d0, d1 = _lin(params["input_proj"], _t(desc0)), _lin(
        params["input_proj"], _t(desc1))
    for lyr in params["layers"]:
        d0 = self_block(lyr["self_attn"], d0, enc0)
        d1 = self_block(lyr["self_attn"], d1, enc1)
        d0, d1 = cross_block(lyr["cross_attn"], d0, d1)

    la = params["log_assignment"]
    md0 = _lin(la["final_proj"], d0) / lg.DIM ** 0.25
    md1 = _lin(la["final_proj"], d1) / lg.DIM ** 0.25
    sim = md0 @ md1.t()
    z0 = _lin(la["matchability"], d0)[:, 0]
    z1 = _lin(la["matchability"], d1)[:, 0]
    m, n = sim.shape
    cert = F.logsigmoid(z0)[:, None] + F.logsigmoid(z1)[None, :]
    scores = torch.zeros(m + 1, n + 1)
    scores[:m, :n] = sim.log_softmax(1) + sim.log_softmax(0) + cert
    scores[:m, n] = F.logsigmoid(-z0)
    scores[m, :n] = F.logsigmoid(-z1)
    return scores.numpy()


def _inputs(rng, n0=20, n1=24):
    kpts0 = rng.uniform(0, 640, (n0, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, 480, (n1, 2)).astype(np.float32)
    d0 = rng.standard_normal((n0, lg.DIM)).astype(np.float32)
    d1 = rng.standard_normal((n1, lg.DIM)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    return kpts0, d0, kpts1, d1


class TestLightGlue:
    def test_assignment_parity_vs_torch_twin(self, rng):
        params = lg.init_params(rng)
        kpts0, d0, kpts1, d1 = _inputs(rng)
        enc0 = lg.fourier_rotary_encoding(
            params["posenc"], lg.normalize_keypoints(kpts0, 640, 480))
        x0 = lg._linear(params["input_proj"], jnp.asarray(d0))
        x1 = lg._linear(params["input_proj"], jnp.asarray(d1))
        enc1 = lg.fourier_rotary_encoding(
            params["posenc"], lg.normalize_keypoints(kpts1, 640, 480))
        for lyr in params["layers"]:
            x0 = lg._self_block(lyr["self_attn"], x0, enc0)
            x1 = lg._self_block(lyr["self_attn"], x1, enc1)
            x0, x1 = lg._cross_block(lyr["cross_attn"], x0, x1)
        Z = np.asarray(lg.match_assignment(params["log_assignment"], x0, x1))
        Zt = _torch_twin(params, kpts0, d0, kpts1, d1, (640, 480))
        np.testing.assert_allclose(Z, Zt, rtol=2e-3, atol=2e-4)

    def test_match_extraction_mutual(self, rng):
        params = lg.init_params(rng)
        kpts0, d0, kpts1, d1 = _inputs(rng, 16, 16)
        res = lg.lightglue_match(params, kpts0, d0, kpts1, d1,
                                 640, 480, 640, 480, match_threshold=0.0)
        m0 = np.asarray(res.matches0)
        m1 = np.asarray(res.matches1)
        for i, j in enumerate(m0):
            if j >= 0:
                assert m1[j] == i          # mutual consistency
        assert np.all(np.asarray(res.matching_scores0) >= 0)

    def test_inner_scores_are_proper_log_probs(self, rng):
        sim = jnp.asarray(rng.standard_normal((8, 11)), jnp.float32)
        z0 = jnp.asarray(rng.standard_normal(8), jnp.float32)
        z1 = jnp.asarray(rng.standard_normal(11), jnp.float32)
        Z = np.asarray(lg.sigmoid_log_double_softmax(sim, z0, z1))
        assert Z.shape == (9, 12)
        assert np.all(Z[:8, :11] <= 1e-6)   # log-probabilities
        # dustbin rows are logsigmoid(-z)
        np.testing.assert_allclose(
            Z[:8, 11], np.log(1 / (1 + np.exp(np.asarray(z0)))), rtol=1e-5)

    def test_torch_weight_conversion(self, rng):
        sd = {}
        def lin(prefix, cin, cout, bias=True):
            sd[f"{prefix}.weight"] = rng.standard_normal(
                (cout, cin)).astype(np.float32)
            if bias:
                sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)
        lin("posenc.Wr", 2, lg.HEAD_DIM // 2, bias=False)
        lin("input_proj", lg.DIM, lg.DIM)
        for i in range(lg.NUM_LAYERS):
            lin(f"self_attn.{i}.Wqkv", lg.DIM, 3 * lg.DIM)
            lin(f"self_attn.{i}.out_proj", lg.DIM, lg.DIM)
            lin(f"self_attn.{i}.ffn.0", 2 * lg.DIM, 2 * lg.DIM)
            lin(f"self_attn.{i}.ffn.1", 1, 2 * lg.DIM)  # LayerNorm w/b
            sd[f"self_attn.{i}.ffn.1.weight"] = np.ones(2 * lg.DIM, np.float32)
            lin(f"self_attn.{i}.ffn.3", 2 * lg.DIM, lg.DIM)
            lin(f"cross_attn.{i}.to_qk", lg.DIM, lg.DIM)
            lin(f"cross_attn.{i}.to_v", lg.DIM, lg.DIM)
            lin(f"cross_attn.{i}.to_out", lg.DIM, lg.DIM)
            lin(f"cross_attn.{i}.ffn.0", 2 * lg.DIM, 2 * lg.DIM)
            sd[f"cross_attn.{i}.ffn.1.weight"] = np.ones(2 * lg.DIM,
                                                         np.float32)
            sd[f"cross_attn.{i}.ffn.1.bias"] = np.zeros(2 * lg.DIM,
                                                        np.float32)
            lin(f"cross_attn.{i}.ffn.3", 2 * lg.DIM, lg.DIM)
            lin(f"log_assignment.{i}.matchability", lg.DIM, 1)
            lin(f"log_assignment.{i}.final_proj", lg.DIM, lg.DIM)
        p = lg.convert_torch_weights_lightglue(sd)
        assert len(p["layers"]) == lg.NUM_LAYERS
        assert p["posenc"]["Wr"]["w"].shape == (2, lg.HEAD_DIM // 2)
        kpts0, d0, kpts1, d1 = _inputs(rng, 12, 10)
        res = lg.lightglue_match(p, kpts0, d0, kpts1, d1, 640, 480, 640, 480)
        assert res.matches0.shape == (12,)
