"""OpenIBL (SFRS vgg16_netvlad) JAX parity vs a from-scratch torch twin.

The reference's net is torch.hub (yxgeee/OpenIBL), not vendored — so the
twin reproduces the published architecture (VGG16 features[:-2] + NetVLAD
with cluster-major flatten) with random weights, same standard as LoFTR.
"""

import numpy as np
import pytest

from gs_localization_tpu.sfm import openibl

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_twin(params, img_np):
    """hloc wrapper + OpenIBL vgg16_netvlad forward in torch."""
    x = torch.from_numpy(img_np).permute(2, 0, 1)[None].double()
    mean = torch.from_numpy(openibl.RGB_MEAN).double().view(1, 3, 1, 1)
    x = (x - mean) / float(openibl.RGB_STD)

    n_convs = len(openibl.VGG16_CONVS)
    for i in range(n_convs):
        if openibl.POOL_BEFORE[i]:
            x = F.max_pool2d(x, 2, 2)
        p = params["features"][i]
        w = torch.from_numpy(np.asarray(p["kernel"])).double()
        b = torch.from_numpy(np.asarray(p["bias"])).double()
        x = F.conv2d(x, w, b, padding=1)
        if i < n_convs - 1:
            x = F.relu(x)

    # NetVLAD (OpenIBL netvlad.py): normalize_input over C, 1x1 conv scores,
    # residuals to centroids, intra-norm over C, flatten (K-major), L2
    N, C, H, W = x.shape
    x = F.normalize(x, p=2, dim=1)
    conv_w = torch.from_numpy(
        np.asarray(params["score_w"]).T[:, :, None, None]).double()
    soft = F.softmax(F.conv2d(x, conv_w).view(N, -1, H * W), dim=1)
    xf = x.view(N, C, -1)                                  # (1, C, M)
    cent = torch.from_numpy(np.asarray(params["centroids"])).double()
    vlad = torch.einsum("nkm,ncm->nkc", soft, xf) \
        - soft.sum(-1)[..., None] * cent[None]
    vlad = F.normalize(vlad, p=2, dim=2)
    vlad = vlad.reshape(N, -1)
    vlad = F.normalize(vlad, p=2, dim=1)
    return vlad[0].numpy()


class TestOpenIBL:
    @pytest.fixture()
    def rng(self):
        return np.random.default_rng(7)

    def test_parity_vs_torch_twin(self, rng):
        params = openibl.init_params(rng)
        img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
        ours = np.asarray(openibl.openibl_descriptor(params, img))
        ref = _torch_twin(params, img.astype(np.float64))
        assert ours.shape == (openibl.NUM_CLUSTERS * openibl.FEATURE_DIM,)
        np.testing.assert_allclose(ours, ref, atol=2e-4)
        np.testing.assert_allclose(np.linalg.norm(ours), 1.0, atol=1e-5)

    def test_converter_roundtrip(self, rng):
        """Build a torch-style state dict, convert, match init_params run."""
        params = openibl.init_params(rng)
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        sd = {}
        for i, p in zip(conv_idx, params["features"]):
            sd[f"base_model.{i}.weight"] = torch.from_numpy(
                np.asarray(p["kernel"]))
            sd[f"base_model.{i}.bias"] = torch.from_numpy(
                np.asarray(p["bias"]))
        sd["net_vlad.conv.weight"] = torch.from_numpy(
            np.asarray(params["score_w"]).T[:, :, None, None])
        sd["net_vlad.centroids"] = torch.from_numpy(
            np.asarray(params["centroids"]))
        conv = openibl.convert_torch_weights_openibl(sd)
        img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        a = np.asarray(openibl.openibl_descriptor(params, img))
        b = np.asarray(openibl.openibl_descriptor(conv, img))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_registry_entry(self, rng):
        from gs_localization_tpu.sfm.registry import get_global_descriptor

        fn = get_global_descriptor("openibl", params=openibl.init_params(rng))
        d = np.asarray(fn(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)))
        assert d.shape == (32768,)
