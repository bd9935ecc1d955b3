"""Multi-host (multi-process) initialization + global mesh helpers.

The reference is strictly single-process on the device side (SURVEY.md
§2.9: its only "distributed" machinery is host multiprocessing for
I/O). The TPU-native scale-out story is:

  * one JAX process per host, connected via ``jax.distributed``
    (coordination service over DCN),
  * a single GLOBAL mesh over all hosts' devices; shardings are the
    same NamedSharding annotations used single-host (parallel/shard.py),
  * XLA GSPMD inserts the collectives — psum/reduce-scatter over ICI
    within a slice, DCN only for host fan-out and the coordination
    service.

The same code paths run unchanged: ``dist_gba`` already reduces the
camera system with ``psum`` over the 'edge' axis; on a multi-host mesh
that psum spans hosts.

Testing without a cluster: two LOCAL processes, each exposing N virtual
CPU devices (``xla_force_host_platform_device_count``), form a real
2-process jax.distributed cluster — collectives actually cross the
process boundary (tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_count: Optional[int] = None,
):
    """Initialize ``jax.distributed`` for multi-process execution.

    All arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so
    launchers can configure purely via environment. On TPU pods the
    arguments are auto-detected and may all be None. No-op if the
    process is already initialized.
    """
    import jax

    if getattr(jax.distributed, "global_state", None) is not None and (
        jax.distributed.global_state.client is not None
    ):
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_count is not None:
        kwargs["local_device_count"] = local_device_count
    jax.distributed.initialize(**kwargs)


def global_mesh(n_data: int = 1, n_edge: Optional[int] = None):
    """Build the (data, edge) mesh over ALL processes' devices.

    ``jax.devices()`` returns the global device list once
    jax.distributed is initialized; the mesh layout matches
    parallel/shard.make_mesh so single-host code is unchanged.
    """
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_edge is None:
        n_edge = len(devs) // n_data
    arr = np.array(devs[: n_data * n_edge]).reshape(n_data, n_edge)
    return Mesh(arr, ("data", "edge"))


def process_local_batch(global_batch: int) -> int:
    """Per-process share of a data-parallel batch."""
    import jax

    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
