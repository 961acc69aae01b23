"""NetVLAD-in-JAX parity vs a from-scratch torch twin (random weights)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm import netvlad as nv

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_twin(params, img_np):
    """Twin of hloc's NetVLAD._forward with the same params."""
    x = torch.from_numpy(img_np).permute(2, 0, 1)[None].float()
    x = torch.clamp(x * 255.0, 0.0, 255.0)
    x = x - torch.from_numpy(np.asarray(params["mean"])).view(1, 3, 1, 1)
    for i in range(13):
        if nv.POOL_BEFORE[i]:
            x = F.max_pool2d(x, 2, 2)
        p = params["features"][i]
        w = torch.from_numpy(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1)).float()
        b = torch.from_numpy(np.asarray(p["bias"])).float()
        x = F.conv2d(x, w, b, padding=1)
        if i < 12:
            x = F.relu(x)
    b_, c, _, _ = x.shape
    desc = x.view(b_, c, -1)                         # (1, 512, N)
    desc = F.normalize(desc, dim=1)

    # NetVLADLayer
    score_w = torch.from_numpy(
        np.asarray(params["score_w"])).float().t().unsqueeze(-1)  # K x D x 1
    centers = torch.from_numpy(np.asarray(params["centers"])).float()
    scores = F.conv1d(desc, score_w)                 # (1, K, N)
    scores = F.softmax(scores, dim=1)
    diff = desc.unsqueeze(2) - centers.unsqueeze(0).unsqueeze(-1)
    vlad = (scores.unsqueeze(1) * diff).sum(dim=-1)  # (1, D, K)
    vlad = F.normalize(vlad, dim=1)
    vlad = vlad.view(1, -1)
    vlad = F.normalize(vlad, dim=1)

    w = torch.from_numpy(np.asarray(params["whiten"]["w"])).float()
    b = torch.from_numpy(np.asarray(params["whiten"]["b"])).float()
    out = vlad @ w + b
    out = F.normalize(out, dim=1)
    return out[0].numpy()


class TestNetVLAD:
    def test_parity_vs_torch_twin(self, rng):
        params = nv.init_params(rng)
        img = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
        ours = np.asarray(nv.netvlad_descriptor(params, jnp.asarray(img)))
        theirs = _torch_twin(params, img)
        assert ours.shape == (4096,)
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-5)

    def test_descriptor_is_unit_norm_and_discriminative(self, rng):
        params = nv.init_params(rng)
        a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
        da = np.asarray(nv.netvlad_descriptor(params, jnp.asarray(a)))
        db = np.asarray(nv.netvlad_descriptor(params, jnp.asarray(b)))
        da2 = np.asarray(nv.netvlad_descriptor(
            params, jnp.asarray(np.clip(a + 0.01, 0, 1))))
        assert np.linalg.norm(da) == pytest.approx(1.0, abs=1e-4)
        assert float(da @ da2) > float(da @ db)  # near-dup scores higher

    def test_retrieval_integration(self, rng):
        from gs_localization_tpu.sfm.retrieval import pairs_from_retrieval

        params = nv.init_params(rng)
        imgs = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
                for _ in range(4)]
        # query 0 is a slightly-noised copy of db image 2
        q = np.clip(imgs[2] + 0.01 * rng.standard_normal((32, 32, 3)),
                    0, 1).astype(np.float32)
        db_desc = nv.batch_descriptors(params, imgs)
        q_desc = nv.batch_descriptors(params, [q])
        pairs = pairs_from_retrieval(q_desc, db_desc, ["q0"],
                                     ["db0", "db1", "db2", "db3"], k=1)
        assert pairs == [("q0", "db2")]
