"""Multi-host runtime: process bring-up, global meshes, per-host data.

The reference is strictly single-process (SURVEY.md §2.6); BASELINE.md's
N-host configs and SURVEY §2.9's mesh-layer row require a real multi-process
controller: ``jax.distributed.initialize``, process-index-aware mesh
construction over the GLOBAL device set, and per-host sharding of the data
each process actually loads (cameras for training, queries for
localization). This module is that layer. Everything below composes with
the single-process sharding code in dp/gauss_shard/tile_shard unchanged —
a ``Mesh`` over ``jax.devices()`` spans hosts, ``shard_map`` runs the same
SPMD program per process, and XLA routes the collectives (ICI within a
slice, DCN across — or Gloo on CPU for the 2-process dryrun,
benchmarks/dryrun_multiprocess.py).

Bring-up contract (every process runs the same program):

    from gs_localization_tpu.parallel import runtime
    runtime.initialize_runtime()          # env-driven; no-op single-process
    mesh = runtime.global_mesh(("data",))
    lo, hi = runtime.host_local_slice(n_queries, mesh)
    local = load_queries(lo, hi)          # each host touches only its shard
    batch = runtime.make_global_batch(local, mesh, "data")
    res = shard_queries_refine(mesh, gaussians, *batch)   # global SPMD
    errs = runtime.process_allgather(local_errs)          # host-side merge

Env variables (used when args are None — the common launcher pattern):
  GSLOC_COORDINATOR   "host:port" of process 0
  GSLOC_NUM_PROCESSES total process count
  GSLOC_PROCESS_ID    this process's index
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

_INITIALIZED = False


def initialize_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_devices_per_process: Optional[int] = None,
) -> bool:
    """Connect this process to the multi-host runtime (idempotent).

    Returns True when running multi-process, False for the single-process
    fallback (no env, no args — e.g. every test and the one-chip CLI).

    ``cpu_devices_per_process`` configures the CPU-backend dryrun topology:
    N virtual devices per process and Gloo cross-process collectives (the
    CPU stand-in for ICI/DCN). On real TPU pods leave it None — PJRT
    discovers local devices and the ICI topology itself.
    """
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get(
        "GSLOC_COORDINATOR")
    if num_processes is None and "GSLOC_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GSLOC_NUM_PROCESSES"])
    if process_id is None and "GSLOC_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GSLOC_PROCESS_ID"])

    if coordinator_address is None or num_processes is None or \
            int(num_processes) <= 1:
        return False
    if process_id is None:
        raise ValueError(
            "multi-process bring-up needs a process index: pass "
            "process_id= or set GSLOC_PROCESS_ID")
    if _INITIALIZED:
        return True

    import jax

    if cpu_devices_per_process:
        # must land before the first backend touch in this process
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )
    _INITIALIZED = True
    return True


def global_mesh(axis_names: Sequence[str] = ("data",),
                axis_sizes: Optional[Sequence[int]] = None):
    """Mesh over ALL processes' devices (process-major device order).

    ``axis_sizes`` defaults to putting every global device on the first
    axis. Axis products must equal the global device count.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devs),) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == len(devs), (axis_sizes, len(devs))
    return Mesh(devs.reshape(tuple(axis_sizes)), tuple(axis_names))


def host_local_slice(n_items: int, mesh, axis: Optional[str] = None
                     ) -> Tuple[int, int]:
    """[lo, hi) of the GLOBAL batch this process must load.

    For a batch sharded over ``axis`` (default: the mesh's first axis),
    each device owns a contiguous block of ``n_items / axis_size``;
    ``jax.devices()`` order is process-major, so a process's block union is
    itself contiguous. Training/localization loaders call this so each
    host reads only its own images from disk.
    """
    import jax

    axis = axis or mesh.axis_names[0]
    size = mesh.shape[axis]
    assert n_items % size == 0, (
        f"batch {n_items} not divisible by mesh axis '{axis}' = {size} — "
        "pad the batch (pipelines pad with a repeated query)")
    block = n_items // size
    axis_idx = mesh.axis_names.index(axis)
    proc = jax.process_index()
    # distinct positions of this process's devices along the sharded axis
    ids = np.unique(
        [np.unravel_index(flat, mesh.devices.shape)[axis_idx]
         for flat in range(mesh.devices.size)
         if mesh.devices.flat[flat].process_index == proc])
    lo, hi = int(ids.min()) * block, (int(ids.max()) + 1) * block
    assert len(ids) * block == hi - lo, (
        "this process's devices are not contiguous along the sharded axis;"
        " reorder the mesh so hosts own contiguous blocks")
    return lo, hi


def make_global_batch(local_pytree, mesh, axis: str = "data"):
    """Process-local arrays (this host's [lo, hi) block, leading dim) ->
    global jax.Arrays sharded over ``axis``. Works on any pytree (batched
    Camera dataclasses included — static fields pass through)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        # global dim 0 = local dim 0 * (process blocks along this axis)
        gshape = (x.shape[0] * _process_factor(mesh, axis),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x, gshape)

    return jax.tree_util.tree_map(one, local_pytree)


def _process_factor(mesh, axis: str) -> int:
    """How many distinct process blocks tile the sharded axis."""
    axis_idx = mesh.axis_names.index(axis)
    procs = {}
    for flat in range(mesh.devices.size):
        pos = np.unravel_index(flat, mesh.devices.shape)[axis_idx]
        procs.setdefault(mesh.devices.flat[flat].process_index, set()).add(pos)
    sizes = {len(v) for v in procs.values()}
    assert len(sizes) == 1, "uneven process blocks along the sharded axis"
    return mesh.shape[axis] // sizes.pop()


def process_allgather(x):
    """Host-side gather of per-process numpy data (metrics merge)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(np.asarray(x))
