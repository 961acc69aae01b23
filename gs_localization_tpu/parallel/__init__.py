"""Multi-chip sharding (SURVEY.md §2.9).

Round-1 scope: data parallelism over cameras (map training) and over queries
(localization) via shard_map on a 1-D mesh, with per-Gaussian gradients
psum'd over the data axis. Gaussian-axis ("TP") and tile-axis ("SP") sharded
rendering land next.
"""

from .dp import (
    dp_train_grads, dryrun_train_step, make_mesh, shard_queries_refine,
)
