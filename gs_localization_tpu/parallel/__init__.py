"""Multi-chip sharding (SURVEY.md §2.9).

Three parallel axes, composable on an N-D mesh:

- ``data``  — cameras (map training) / queries (localization) shard across
  devices, Gaussians replicated, gradients pmean'd (dp.py).
- ``gauss`` — the map itself (params + optimizer state) shards across
  devices; one compact all-gather of screen-space splats per render,
  owner-computes backward with no gauss-axis collectives (gauss_shard.py).
- ``tile``  — one frame's tile grid shards across devices; forward is
  collective-free, per-Gaussian grads psum over tiles in the VJP
  (tile_shard.py).
"""

from .dp import (
    dp_train_grads, dryrun_train_step, make_mesh, shard_queries_refine,
)
from .gauss_shard import (
    gauss_sharded_loss_and_grads, make_mesh_2d, rasterize_gauss_sharded,
)
from .tile_shard import rasterize_tile_sharded
