"""Distributed bundle adjustment over a device mesh.

The one genuinely distributed algorithm in this system (SURVEY.md §2.9):
global BA over the full history. Edges are sharded across the 'edge'
mesh axis; each device assembles its partial normal equations with
segment sums (ba/solver.py assemble_normal_eqs — the deterministic
replacement for the reference's atomicAdd kernel, ba_cuda.cu:335-373),
partials are reduced with ``psum`` over ICI, and the (small, 6N x 6N)
camera system is solved redundantly on every device — the camera block
is tiny next to the edge workload, exactly the regime the Schur
reduction targets.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dpvo_tpu.ba.solver import BAProblem, assemble_normal_eqs, schur_solve


def dist_ba_delta(
    mesh: Mesh,
    poses,
    patch_ctr,
    intrinsics,
    target,
    weight,
    valid,
    ii,
    jj,
    kd,
    t0,
    nfree,
    bounds,
    lmbda,
    *,
    W: int,
    Md: int,
    ep: float = 1.0,
    lm: float = 1e-4,
    res_clip: float = 128.0,
) -> Tuple[jax.Array, jax.Array]:
    """One distributed Gauss-Newton step. Edge arrays are sharded on the
    'edge' axis; everything else is replicated. Returns (dX [W,6],
    dZ [Md]) replicated."""

    edge = P("edge")
    edge2 = P("edge", None)
    rep = P()

    def local(poses, patch_ctr, intrinsics, target, weight, valid, ii, jj, kd, t0, nfree, bounds, lmbda):
        prob = BAProblem(poses, patch_ctr, intrinsics, target, weight, valid, ii, jj, kd, t0, nfree)
        B6, E6, C, u, v6 = assemble_normal_eqs(prob, bounds, W=W, Md=Md, res_clip=res_clip)
        # reduce partial normal equations over the interconnect
        B6 = jax.lax.psum(B6, "edge")
        E6 = jax.lax.psum(E6, "edge")
        C = jax.lax.psum(C, "edge")
        u = jax.lax.psum(u, "edge")
        v6 = jax.lax.psum(v6, "edge")
        return schur_solve(B6, E6, C, u, v6, lmbda, nfree, W=W, ep=ep, lm=lm)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(rep, rep, rep, edge2, edge2, edge, edge, edge, edge, rep, rep, rep, rep),
        out_specs=(rep, rep),
        check_rep=False,
    )
    return fn(poses, patch_ctr, intrinsics, target, weight, valid, ii, jj, kd, t0, nfree, bounds, lmbda)
