"""Multi-host (pod-slice) support.

TPU-native replacement for the reference's multi-machine mode -- Julia
``addprocs(machine_specs)`` + the node-leader reduce/broadcast tree
(``docs/src/perf.md:3``, ``src/utils.jl:51-64``).  Here multi-machine =
multi-process JAX: every host calls :func:`initialize`, builds the same
global mesh over all chips, and feeds its local rows; the sweep's single
statistics ``psum`` rides ICI within a slice and DCN across slices -- the
two-level tree the reference hand-rolls is what XLA's collective lowering
does automatically.

Typical pod-slice launch (same script on every host):

    import dpmmsubclusters_tpu as dpmm
    from dpmmsubclusters_tpu.parallel import distributed

    distributed.initialize()          # env-driven on TPU pods
    x_local = load_my_shard(jax.process_index())
    result = dpmm.fit_distributed(x_local, alpha=10.0, iters=100)
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax

from .mesh import DATA_AXIS, make_data_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize JAX's multi-process runtime.

    On TPU pods all arguments are discovered from the environment; for
    multi-process CPU/GPU testing pass them explicitly
    (counterpart of the user-level ``addprocs`` in the reference's docs).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh():
    """1-D data mesh over every chip of every process."""
    return make_data_mesh()


def shard_points_global(x_local: np.ndarray, mesh, chunk: int):
    """Place per-host rows into one globally-sharded [N_global, D] array.

    Every process passes only ITS rows (like the reference's
    ``DistributedArrays.distribute`` where each worker holds a block,
    ``src/dp-parallel-sampling.jl:42``).  Rows are padded per-process to a
    multiple of (local_device_count * chunk).

    Returns (points, valid, n_global) global jax.Arrays.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    import math

    n_local, d = x_local.shape
    n_dev_local = jax.local_device_count()
    # rows must also block into [N/128, 128] lane-major streams
    mult = n_dev_local * math.lcm(chunk, 128)
    n_local_pad = ((max(n_local, 1) + mult - 1) // mult) * mult

    xp = np.zeros((n_local_pad, d), np.float32)
    xp[:n_local] = x_local
    vp = np.zeros((n_local_pad,), bool)
    vp[:n_local] = True

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    points = jax.make_array_from_process_local_data(sharding, xp)
    valid = jax.make_array_from_process_local_data(
        sharding, vp.reshape(n_local_pad // 128, 128)
    )

    # global count of real rows
    n_global = float(
        jax.device_get(
            jax.jit(
                lambda v: jax.numpy.sum(v.astype(jax.numpy.float32)),
                out_shardings=NamedSharding(mesh, P()),
            )(valid)
        )
    )
    return points, valid, n_global
