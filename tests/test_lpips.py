"""LPIPS-in-JAX parity vs a from-scratch torch twin (random weights)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_localization_tpu.ops import lpips as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_lpips(params, x_np, y_np):
    """Twin of lpipsPyTorch's LPIPS.forward with the same params."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None].float()
        x = (x - shift) / scale
        out, conv_i = [], 0
        for entry in L.VGG16_LAYOUT:
            if entry[0] == "P":
                x = F.max_pool2d(x, 2, 2)
                continue
            p = params["features"][conv_i]
            w = torch.from_numpy(
                np.asarray(p["kernel"]).transpose(3, 2, 0, 1)).float()
            b = torch.from_numpy(np.asarray(p["bias"])).float()
            x = F.relu(F.conv2d(x, w, b, padding=1))
            if conv_i in L.VGG16_TAPS:
                norm = torch.sqrt((x ** 2).sum(1, keepdim=True))
                out.append(x / (norm + 1e-10))
            conv_i += 1
        return out

    fx, fy = taps(x_np), taps(y_np)
    total = torch.zeros(())
    for tx, ty, w in zip(fx, fy, params["lin"]):
        d = (tx - ty) ** 2
        wt = torch.from_numpy(np.asarray(w)).float().view(1, -1, 1, 1)
        total = total + (d * wt).sum(1).mean()
    return float(total)


class TestLPIPS:
    def test_parity_vs_torch_twin(self, rng):
        params = L.init_params(rng)
        x = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
        y = np.clip(x + 0.1 * rng.standard_normal(x.shape), 0, 1
                    ).astype(np.float32)
        ours = float(L.lpips(params, jnp.asarray(x), jnp.asarray(y)))
        theirs = _torch_lpips(params, x, y)
        assert ours == pytest.approx(theirs, rel=2e-4, abs=1e-5)

    def test_zero_for_identical(self, rng):
        params = L.init_params(rng)
        x = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        assert float(L.lpips(params, jnp.asarray(x), jnp.asarray(x))) == 0.0

    def test_monotone_in_noise(self, rng):
        params = L.init_params(rng)
        x = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
        noise = rng.standard_normal(x.shape).astype(np.float32)
        d1 = float(L.lpips(params, jnp.asarray(x),
                           jnp.asarray(np.clip(x + 0.05 * noise, 0, 1))))
        d2 = float(L.lpips(params, jnp.asarray(x),
                           jnp.asarray(np.clip(x + 0.3 * noise, 0, 1))))
        assert d2 > d1 > 0

    def test_converter_shapes(self, rng):
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512,
                 512]
        sd, cin = {}, 3
        for i, c in zip(conv_idx, chans):
            sd[f"{i}.weight"] = rng.standard_normal((c, cin, 3, 3)).astype(
                np.float32)
            sd[f"{i}.bias"] = np.zeros(c, np.float32)
            cin = c
        lin_sd = {f"{t}.1.weight":
                  rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
                  for t, c in enumerate(L.VGG16_TAP_CHANNELS)}
        p = L.convert_torch_weights_lpips(sd, lin_sd)
        assert len(p["features"]) == 13
        assert p["features"][0]["kernel"].shape == (3, 3, 3, 64)
        assert [w.shape[0] for w in p["lin"]] == list(L.VGG16_TAP_CHANNELS)
        x = rng.uniform(0, 1, (35, 41, 3)).astype(np.float32)  # odd dims
        val = float(L.lpips(p, jnp.asarray(x), jnp.asarray(1 - x)))
        assert np.isfinite(val) and val > 0
