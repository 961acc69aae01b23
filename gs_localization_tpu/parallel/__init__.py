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
- ``runtime`` — multi-host bring-up: ``jax.distributed.initialize``,
  global meshes, per-host data sharding (runtime.py).

Submodules are re-exported LAZILY (PEP 562): multi-host bring-up must run
``runtime.initialize_runtime()`` before anything touches a JAX backend,
and the compute modules' imports build jit closures. ``import
gs_localization_tpu.parallel`` therefore stays side-effect free.
"""

_EXPORTS = {
    "dp_train_grads": "dp",
    "dryrun_train_step": "dp",
    "make_mesh": "dp",
    "shard_queries_refine": "dp",
    "gauss_sharded_loss_and_grads": "gauss_shard",
    "make_mesh_2d": "gauss_shard",
    "rasterize_gauss_sharded": "gauss_shard",
    "rasterize_tile_sharded": "tile_shard",
    "runtime": None,
    "dp": None,
    "gauss_shard": None,
    "tile_shard": None,
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    import importlib

    if name not in _EXPORTS:
        raise AttributeError(name)
    mod_name = _EXPORTS[name] or name
    mod = importlib.import_module(f".{mod_name}", __name__)
    return mod if _EXPORTS[name] is None else getattr(mod, name)
