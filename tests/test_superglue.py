"""SuperGlue-in-JAX architecture tests (no pretrained weights needed)."""

import numpy as np
import jax
import jax.numpy as jnp

from gs_localization_tpu.sfm import superglue as sg


def _identity_params(rng):
    """Params that reduce the net to mutual-NN-via-OT on raw descriptors:
    zero keypoint encoding, zero GNN deltas, identity final projection."""
    p = sg.init_params(rng)
    zero_last = {"w": jnp.zeros_like(p["kenc"][-1]["w"]),
                 "b": jnp.zeros_like(p["kenc"][-1]["b"])}
    p["kenc"][-1] = zero_last
    for lyr in p["layers"]:
        lyr["mlp"][-1] = {"w": jnp.zeros_like(lyr["mlp"][-1]["w"]),
                          "b": jnp.zeros_like(lyr["mlp"][-1]["b"])}
    p["final_proj"] = {"w": jnp.eye(sg.DIM, dtype=jnp.float32),
                       "b": jnp.zeros((sg.DIM,), jnp.float32)}
    p["bin_score"] = jnp.asarray(0.5, jnp.float32)
    return p


def _random_inputs(rng, n0=24, n1=24):
    kpts0 = rng.uniform(0, 640, (n0, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, 640, (n1, 2)).astype(np.float32)
    s0 = rng.uniform(0.3, 1.0, n0).astype(np.float32)
    s1 = rng.uniform(0.3, 1.0, n1).astype(np.float32)
    d = rng.standard_normal((max(n0, n1), sg.DIM)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return kpts0, s0, d[:n0], kpts1, s1, d[:n1]


class TestSinkhorn:
    def test_marginals(self, rng):
        m, n = 13, 17
        scores = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
        Z = sg.log_optimal_transport(scores, jnp.asarray(0.7), iters=60)
        P = np.exp(np.asarray(Z)) / (m + n)   # undo the +norm rescale
        # row marginals: 1/(m+n) for real rows, n/(m+n) for the dustbin
        np.testing.assert_allclose(P.sum(1)[:m], np.full(m, 1 / (m + n)),
                                   atol=1e-4)
        np.testing.assert_allclose(P.sum(1)[m], n / (m + n), atol=1e-4)
        np.testing.assert_allclose(P.sum(0)[:n], np.full(n, 1 / (m + n)),
                                   atol=1e-4)
        np.testing.assert_allclose(P.sum(0)[n], m / (m + n), atol=1e-4)


class TestSuperGlue:
    def test_identity_params_recover_permutation(self, rng):
        p = _identity_params(rng)
        n = 20
        kpts0, s0, d0, _, _, _ = _random_inputs(rng, n, n)
        # strong descriptors: pair i <-> perm[i]
        perm = rng.permutation(n)
        d0 = d0 * 8.0   # boost dot products past the dustbin
        d1 = d0[np.argsort(perm)]
        kpts1 = kpts0[np.argsort(perm)]
        res = sg.superglue_match(p, kpts0, s0, d0, kpts1, s0, d1,
                                 640, 480, 640, 480, sinkhorn_iters=50)
        np.testing.assert_array_equal(np.asarray(res.matches0), perm)
        # matches1 is the inverse permutation
        np.testing.assert_array_equal(np.asarray(res.matches1),
                                      np.argsort(perm))
        assert np.all(np.asarray(res.matching_scores0) > 0.2)

    def test_unmatched_go_to_dustbin(self, rng):
        p = _identity_params(rng)
        n = 16
        kpts0, s0, d0, kpts1, s1, d1 = _random_inputs(rng, n, n)
        d0 = d0 * 8.0
        d1 = np.roll(d0, 0, axis=0).copy()
        # make the last 4 of image1 garbage (orthogonal-ish noise)
        g = rng.standard_normal((4, sg.DIM)).astype(np.float32)
        d1[-4:] = 8.0 * g / np.linalg.norm(g, axis=1, keepdims=True)
        res = sg.superglue_match(p, kpts0, s0, d0, kpts1, s1, d1,
                                 640, 480, 640, 480, sinkhorn_iters=50)
        m0 = np.asarray(res.matches0)
        assert np.all(m0[:-4] == np.arange(n - 4))

    def test_permutation_equivariance_random_params(self, rng):
        p = sg.init_params(rng, scale=0.05)
        kpts0, s0, d0, kpts1, s1, d1 = _random_inputs(rng, 18, 22)
        res = sg.superglue_match(p, kpts0, s0, d0, kpts1, s1, d1,
                                 640, 480, 640, 480, sinkhorn_iters=30,
                                 match_threshold=0.0)
        perm = rng.permutation(22)
        inv = np.argsort(perm)
        res_p = sg.superglue_match(
            p, kpts0, s0, d0, kpts1[perm], s1[perm], d1[perm],
            640, 480, 640, 480, sinkhorn_iters=30, match_threshold=0.0)
        m0 = np.asarray(res.matches0)
        m0p = np.asarray(res_p.matches0)
        # a match to j becomes a match to inv[j]
        expect = np.where(m0 >= 0, inv[np.clip(m0, 0, None)], -1)
        np.testing.assert_array_equal(m0p, expect)

    def test_torch_weight_conversion_shapes(self, rng):
        # fabricate an official-layout state_dict and convert it
        sd = {}
        ch = sg.KENC_CHANNELS
        idx = 0
        for i in range(1, len(ch)):
            sd[f"kenc.encoder.{idx}.weight"] = (0.05 * rng.standard_normal(
                (ch[i], ch[i - 1], 1))).astype(np.float32)
            sd[f"kenc.encoder.{idx}.bias"] = np.zeros(ch[i], np.float32)
            if i < len(ch) - 1:
                for suf, val in [("weight", np.ones(ch[i])),
                                 ("bias", np.zeros(ch[i])),
                                 ("running_mean", np.zeros(ch[i])),
                                 ("running_var", np.ones(ch[i]))]:
                    sd[f"kenc.encoder.{idx + 1}.{suf}"] = val.astype(
                        np.float32)
                idx += 3
        D = sg.DIM
        for li in range(sg.NUM_GNN_LAYERS):
            g = f"gnn.layers.{li}"
            for j in range(3):
                sd[f"{g}.attn.proj.{j}.weight"] = (0.05 * rng.standard_normal(
                    (D, D, 1))).astype(np.float32)
                sd[f"{g}.attn.proj.{j}.bias"] = np.zeros(D, np.float32)
            sd[f"{g}.attn.merge.weight"] = (0.05 * rng.standard_normal(
                (D, D, 1))).astype(np.float32)
            sd[f"{g}.attn.merge.bias"] = np.zeros(D, np.float32)
            mch = (2 * D, 2 * D, D)
            idx2 = 0
            for i in range(1, len(mch)):
                sd[f"{g}.mlp.{idx2}.weight"] = (0.05 * rng.standard_normal(
                    (mch[i], mch[i - 1], 1))).astype(np.float32)
                sd[f"{g}.mlp.{idx2}.bias"] = np.zeros(mch[i], np.float32)
                if i < len(mch) - 1:
                    for suf, val in [("weight", np.ones(mch[i])),
                                     ("bias", np.zeros(mch[i])),
                                     ("running_mean", np.zeros(mch[i])),
                                     ("running_var", np.ones(mch[i]))]:
                        sd[f"{g}.mlp.{idx2 + 1}.{suf}"] = val.astype(
                            np.float32)
                    idx2 += 3
        sd["final_proj.weight"] = rng.standard_normal(
            (D, D, 1)).astype(np.float32)
        sd["final_proj.bias"] = np.zeros(D, np.float32)
        sd["bin_score"] = np.asarray(1.0, np.float32)

        p = sg.convert_torch_weights_superglue(sd)
        kpts0, s0, d0, kpts1, s1, d1 = _random_inputs(rng, 10, 12)
        res = sg.superglue_match(p, 0.05 * kpts0, s0, 0.05 * d0,
                                 0.05 * kpts1, s1, 0.05 * d1,
                                 640, 480, 640, 480, sinkhorn_iters=10)
        assert res.matches0.shape == (10,)
        assert res.matches1.shape == (12,)
        assert np.isfinite(np.asarray(res.matching_scores0)).all()
