"""DIR (ResNet-AP-GeM) parity against the VENDORED dirtorch modules.

The reference vendors the full net at
/root/reference/hloc/third_party/deep-image-retrieval (used by
hloc/extractors/dir.py). Parity here loads those modules directly — random
init through ``reset_weights`` + randomized BN running stats — so a
transcription bug in our twin cannot self-confirm.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm import dir as dirmod

torch = pytest.importorskip("torch")

REF = Path("/root/reference/hloc/third_party/deep-image-retrieval")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not available")


def _reference_net(arch: str, seed: int = 0):
    sys.path.insert(0, str(REF))
    from dirtorch.nets.rmac_resnet import resnet18_rmac, resnet101_rmac

    torch.manual_seed(seed)
    maker = {"resnet18": resnet18_rmac, "resnet101": resnet101_rmac}[arch]
    net = maker(out_dim=2048).eval()
    # reset_weights gives BN identity running stats; randomize them (and the
    # fc + gem p) so the parity test exercises every converted tensor.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.2, generator=g)
        net.fc.weight.normal_(0, 0.02, generator=g)
        net.fc.bias.normal_(0, 0.02, generator=g)
        net.adpool.p.fill_(2.5)
    return net


def _run_reference(net, img_hwc: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(img_hwc).permute(2, 0, 1)[None].float()
    x = x - x.new_tensor(dirmod.RGB_MEAN)[:, None, None]
    x = x / x.new_tensor(dirmod.RGB_STD)[:, None, None]
    with torch.no_grad():
        return net(x).numpy().reshape(-1)


class TestDIRvsReference:
    @pytest.mark.parametrize("arch,hw", [("resnet18", (96, 128)),
                                         ("resnet101", (64, 64))])
    def test_descriptor_parity(self, arch, hw):
        net = _reference_net(arch)
        params = dirmod.convert_torch_weights_dir(net.state_dict(), arch=arch)
        assert params["gemp"] == pytest.approx(2.5)
        img = np.random.default_rng(0).uniform(
            0, 1, (*hw, 3)).astype(np.float32)
        ours = np.asarray(dirmod.dir_descriptor(params, jnp.asarray(img)))
        theirs = _run_reference(net, img)
        assert ours.shape == theirs.shape == (2048,)
        np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)

    def test_converter_rejects_wrong_layout(self):
        net = _reference_net("resnet18")
        sd = {k.replace("layer1", "stage1"): v
              for k, v in net.state_dict().items()}
        with pytest.raises(AssertionError):
            dirmod.convert_torch_weights_dir(sd, arch="resnet18")


class TestWhiten:
    def test_matches_dirtorch_transform(self):
        sys.path.insert(0, str(REF))
        from dirtorch.utils.common import whiten_features

        rng = np.random.default_rng(1)
        D, K = 32, 24
        X = rng.standard_normal((5, D)).astype(np.float32)

        class PCA:
            mean_ = rng.standard_normal(D).astype(np.float32)
            components_ = rng.standard_normal((K, D)).astype(np.float32)
            explained_variance_ = rng.uniform(0.5, 2.0, K).astype(np.float32)
            whiten = True

        ref = whiten_features(X.copy(), PCA, whitenp=0.25, whitenv=None,
                              whitenm=1.0)
        pca = dirmod.load_pca_from_sklearn(PCA)
        ours = np.asarray(dirmod.whiten(jnp.asarray(X), pca, whitenp=0.25))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestRegistry:
    def test_dir_conf(self):
        from gs_localization_tpu.sfm.registry import (
            RETRIEVAL_CONFS, get_global_descriptor)

        assert "dir" in RETRIEVAL_CONFS
        net = _reference_net("resnet18")
        params = dirmod.convert_torch_weights_dir(net.state_dict(),
                                                  arch="resnet18")
        fn = get_global_descriptor("dir", params=params)
        img = np.random.default_rng(2).uniform(
            0, 1, (64, 96, 3)).astype(np.float32)
        d = np.asarray(fn(img))
        assert d.shape == (2048,)
        np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-4)
