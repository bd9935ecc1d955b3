"""Small dense SPD solve as a single Pallas kernel.

XLA's cho_factor/cho_solve on a 96x96 system costs ~7ms on TPU (a long
chain of tiny sequential HLO ops, each paying dispatch overhead). The
window-BA pose system is 6W x 6W with W <= 16, damped SPD by
construction (ba/solver.py:schur_solve), so an in-VMEM Gauss-Jordan
elimination without pivoting is numerically fine and runs in ~10us:
n sweeps of rank-1 updates on one [n, n+pad] VMEM tile.

Used for the sliding-window solve; the global-BA system (6*512) falls
back to XLA Cholesky (solver.py picks based on size).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gj_kernel(n: int, ncols: int):
    def kernel(a_ref, out_ref, work):
        work[:] = a_ref[:]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1)

        def body(k, _):
            oh_r = (row_ids == k).astype(jnp.float32)        # [n,1]
            oh_c = (col_ids == k).astype(jnp.float32)        # [1,ncols]
            A = work[:]
            rowk = jnp.sum(A * oh_r, axis=0, keepdims=True)  # [1,ncols]
            akk = jnp.sum(rowk * oh_c)
            inv = 1.0 / akk
            colk = jnp.sum(A * oh_c, axis=1, keepdims=True)  # [n,1]
            factor = colk * inv * (1.0 - oh_r)
            work[:] = A - factor * rowk
            return 0

        jax.lax.fori_loop(0, n, body, 0)
        out_ref[:] = work[:]

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def spd_solve(S, y, interpret: bool = False):
    """Solve S x = y for damped-SPD S [n,n] (n multiple of 8), y [n].

    Differentiable: the VJP is another solve with the same (symmetric)
    matrix — y_bar = S^{-1} x_bar, S_bar = -y_bar x^T (the standard
    linear-solve adjoint; ref ba.py:13-38 CholeskySolver.backward).
    """
    return _spd_solve_impl(S, y, interpret)


def _spd_fwd(S, y, interpret):
    x = _spd_solve_impl(S, y, interpret)
    return x, (S, x)


def _spd_bwd(interpret, res, g):
    S, x = res
    yb = _spd_solve_impl(S, g, interpret)
    return (-jnp.outer(yb, x), yb)


spd_solve.defvjp(_spd_fwd, _spd_bwd)


@partial(jax.jit, static_argnames=("interpret",))
def _spd_solve_impl(S, y, interpret: bool = False):
    n = S.shape[0]
    ncols = -(-(n + 1) // 128) * 128
    A = jnp.zeros((n, ncols), jnp.float32)
    A = A.at[:, :n].set(S.astype(jnp.float32))
    A = A.at[:, n].set(y.astype(jnp.float32))

    out = pl.pallas_call(
        _gj_kernel(n, ncols),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ncols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, ncols), jnp.float32)],
        interpret=interpret,
    )(A)
    # after Jordan elimination the system is diagonal
    return out[:, n] / jnp.diagonal(out[:, :n])
