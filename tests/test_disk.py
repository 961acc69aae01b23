"""DISK-in-JAX parity vs a torch twin of the thin U-Net spec.

kornia / the original DISK repo are not vendored in the reference tree, so
— as with LoFTR/LightGlue/MiDaS — the twin pins the published architecture
(sfm/disk.py docstring) and the converter's key-layout contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.sfm import disk as dk

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _build_torch_disk(seed=0):
    """Torch thin U-Net with checkpoint-shaped module paths
    (unet.path_down.{i}..., unet.path_up.{i}...)."""
    g = torch.Generator().manual_seed(seed)

    class ConvUnit(nn.Module):
        def __init__(self, cin, cout, first=False):
            super().__init__()
            self.first = first
            if not first:
                self.norm = nn.InstanceNorm2d(cin, affine=False)
                self.gate = nn.PReLU(cin)
            self.conv = nn.Conv2d(cin, cout, dk.KERNEL,
                                  padding=dk.KERNEL // 2, bias=True)
            with torch.no_grad():
                self.conv.weight.normal_(0, 0.2, generator=g)
                self.conv.bias.normal_(0, 0.1, generator=g)
                if not first:
                    self.gate.weight.normal_(0.25, 0.05, generator=g)

        def forward(self, x):
            if not self.first:
                x = self.gate(self.norm(x))
            return self.conv(x)

    class DownBlock(nn.Module):
        def __init__(self, cin, cout, first=False):
            super().__init__()
            self.unit = ConvUnit(cin, cout, first=first)
            self.first = first

        def forward(self, x):
            if not self.first:
                x = F.avg_pool2d(x, 2)
            return self.unit(x)

    class UpBlock(nn.Module):
        def __init__(self, cbot, chor, cout):
            super().__init__()
            self.unit = ConvUnit(cbot + chor, cout)

        def forward(self, bot, hor):
            up = F.interpolate(bot, scale_factor=2, mode="nearest")
            return self.unit(torch.cat([up, hor], dim=1))

    class Unet(nn.Module):
        def __init__(self):
            super().__init__()
            downs, cin = [], 3
            for i, cout in enumerate(dk.DOWN):
                downs.append(DownBlock(cin, cout, first=(i == 0)))
                cin = cout
            self.path_down = nn.ModuleList(downs)
            ups, bot = [], dk.DOWN[-1]
            for i, cout in enumerate(dk.UP):
                ups.append(UpBlock(bot, dk.DOWN[len(dk.DOWN) - 2 - i], cout))
                bot = cout
            self.path_up = nn.ModuleList(ups)

        def forward(self, x):
            skips = []
            for blk in self.path_down:
                x = blk(x)
                skips.append(x)
            y = skips[-1]
            for i, blk in enumerate(self.path_up):
                y = blk(y, skips[len(dk.DOWN) - 2 - i])
            return y

    class TorchDISK(nn.Module):
        def __init__(self):
            super().__init__()
            self.unet = Unet()

    return TorchDISK()


class TestDISK:
    def test_forward_parity_from_converted_weights(self):
        net = _build_torch_disk()
        params = dk.convert_torch_weights_disk(net.state_dict())
        img = np.random.default_rng(0).uniform(
            0, 1, (48, 64, 3)).astype(np.float32)
        ours = np.asarray(dk.unet_forward(params, jnp.asarray(img)))
        with torch.no_grad():
            theirs = net.unet(
                torch.from_numpy(img).permute(2, 0, 1)[None].float()
            )[0].permute(1, 2, 0).numpy()
        assert ours.shape == (48, 64, 129)
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)

    def test_converter_rejects_wrong_layout(self):
        net = _build_torch_disk()
        sd = net.state_dict()
        bad = {k.replace("path_down", "encoder"): v for k, v in sd.items()}
        with pytest.raises(AssertionError):
            dk.convert_torch_weights_disk(bad)

    def test_extract_keypoints(self, rng):
        params = dk.init_params(rng)
        img = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
        feats = dk.extract_disk(params, jnp.asarray(img), num_keypoints=256,
                                window_size=5)
        kp = np.asarray(feats.keypoints)
        sc = np.asarray(feats.scores)
        de = np.asarray(feats.descriptors)
        live = sc > 0
        assert live.sum() > 0
        assert kp[live, 0].max() < 80 and kp[live, 1].max() < 64
        # scores are sorted descending among live slots
        assert (np.diff(sc[live]) <= 1e-6).all()
        # descriptors unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(de[live], axis=1), 1.0, atol=1e-5)
        # NMS: no two keypoints within the 5x5 window
        pts = kp[live]
        d = np.abs(pts[:, None] - pts[None]).max(-1)
        d[np.arange(len(pts)), np.arange(len(pts))] = 99
        assert d.min() >= 2  # window 5 -> radius 2

    def test_registry_conf(self, rng):
        from gs_localization_tpu.sfm.registry import get_extractor
        params = dk.init_params(rng)
        ex = get_extractor("disk", params=params, num_keypoints=128)
        feats = ex(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        assert np.asarray(feats.keypoints).shape == (128, 2)
