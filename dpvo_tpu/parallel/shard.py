"""Sharding annotations for multi-chip execution.

The reference has no distributed machinery (SURVEY.md §2.9 — its only
"parallelism" is host multiprocessing). The TPU-native mapping puts a
logical mesh over two axes:

  data : independent clips (training) / sequences (batch eval)
  edge : the patch-graph edge dimension — correlation, the update
         operator, and BA Hessian assembly are edge-parallel; XLA GSPMD
         turns the segment-sum reductions into psums over ICI.

Annotations are no-ops outside a mesh context, so the same code runs
single-chip.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: dict = {"mesh": None}


def make_mesh(n_data: int = 1, n_edge: Optional[int] = None) -> Mesh:
    """Build a (data, edge) mesh over the available devices."""
    devs = jax.devices()
    if n_edge is None:
        n_edge = len(devs) // n_data
    devs = np.array(devs[: n_data * n_edge]).reshape(n_data, n_edge)
    return Mesh(devs, ("data", "edge"))


@contextmanager
def mesh_context(mesh: Optional[Mesh]):
    """Enable edge/data sharding annotations inside jit traces."""
    prev = _ACTIVE["mesh"]
    _ACTIVE["mesh"] = mesh
    try:
        yield
    finally:
        _ACTIVE["mesh"] = prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE["mesh"]


def edge_shard(x):
    """Constrain the leading (edge) axis across the 'edge' mesh axis."""
    mesh = _ACTIVE["mesh"]
    if mesh is None or "edge" not in mesh.axis_names:
        return x
    spec = P("edge", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-axis sharding for train-step inputs."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
