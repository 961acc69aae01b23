"""Differentiable tile-based 3DGS rasterizer for TPU.

Pipeline (all static shapes, XLA/Pallas friendly):

1. ``preprocess``  — vectorized per-Gaussian projection: frustum cull, EWA 2D
   covariance, conic, 3-sigma tile rect, SH color. Pure jnp, differentiable
   w.r.t. Gaussian parameters and the camera (pose gradients come for free).
2. ``binning``     — depth sort + searchsorted pair expansion + one stable
   int32 sort by tile id => per-tile front-to-back lists at static capacity.
   Replaces the reference's CUB 64-bit radix sort + dynamic allocation
   (rasterizer_impl.cu:197-339) with a fixed-capacity, sync-free design.
3. ``blend``       — per-tile alpha compositing. The sequential front-to-back
   loop is re-expressed as log-space cumulative transmittance + weighted sums,
   so the inner loop becomes cumsum + matmul (MXU) instead of a scalar loop.
4. ``rasterize``   — public API gluing 1-3, returning rgb/depth/alpha images.

The blend math matches the reference kernel semantics exactly
(forward.cu:263-379): alpha = min(0.99, opa*exp(power)), skip alpha < 1/255,
monotone transmittance cutoff at T < 1e-4, out = C + T*bg, depth = sum w_i d_i.
"""

from .rasterize import (RasterizerConfig, rasterize, render,
                        stream_regime_guard)
