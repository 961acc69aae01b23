"""gs_localization_tpu — TPU-native visual localization via 3D Gaussian Splatting.

A brand-new JAX/XLA/Pallas framework with the capabilities of
RPL-CS-UCL/gs_localization (LoGS, ICRA 2025), designed TPU-first:

- ``core``     : Gaussian parameter pytrees, camera math, SE(3), spherical harmonics.
- ``raster``   : differentiable tile rasterizer (vectorized preprocess, sort-based
                 binning, Pallas blend kernels) with gradients w.r.t. Gaussian
                 parameters AND camera pose.
- ``mapping``  : 3DGS map training (losses, optax optimizers, densify/prune).
- ``loc``      : gradient-descent pose refinement (batched over queries).
- ``data``     : COLMAP / PLY / dataset interop.
- ``parallel`` : device-mesh sharding (DP over cameras/queries, Gaussian & tile
                 sharding) via jax.sharding + shard_map.
- ``sfm``      : SfM/retrieval/PnP initialization front-end + importers.
"""

__version__ = "0.1.0"
