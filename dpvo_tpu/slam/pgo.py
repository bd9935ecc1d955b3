"""Sim(3) pose-graph optimization — Levenberg-Marquardt in pure JAX.

Re-design of the reference PGO (dpvo/loop_closure/optim_utils.py:152-243
+ the Eigen sparse solver fastba/ba.cpp:102-180): variables are the
tangent logs of inverse Sim(3) poses; constraints are the odometry chain
plus loop-closure Sim(3) measurements; residual
    r = Log(C * Exp(G_i) * Exp(G_j)^{-1})
with Jacobians by forward-mode autodiff (the reference uses
torch.autograd.functional.jacobian the same way), assembled into a dense
7n x 7n system solved on the MXU — at a few hundred keyframes this is
well inside single-chip Cholesky territory.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.lie import se3, sim3


def _residual_one(C, gi, gj):
    """r = Log(C * Exp(gi) * Exp(gj)^-1)  (ref optim_utils.py:158-161)."""
    out = sim3.mul(sim3.mul(C, sim3.exp(gi)), sim3.inv(sim3.exp(gj)))
    return sim3.log(out)


_res_vmap = jax.vmap(_residual_one)
_jac_vmap = jax.vmap(jax.jacfwd(_residual_one, argnums=(1, 2)))


@partial(jax.jit, static_argnames=("n",))
def _pgo_step(Ginv, constants, iii, jjj, valid, lmbda, ep, freen, *, n: int):
    """One LM iteration: returns (delta [n,7], total residual)."""
    gi = Ginv[iii]
    gj = Ginv[jjj]
    r = _res_vmap(constants, gi, gj)  # [R,7]
    r = r * valid[:, None]
    Ji, Jj = _jac_vmap(constants, gi, gj)  # [R,7,7] each
    Ji = Ji * valid[:, None, None]
    Jj = Jj * valid[:, None, None]

    free_i = iii < freen
    free_j = jjj < freen

    def seg(a, b, fa, fb):
        return jnp.where(fa & fb, a * n + b, n * n)

    def blk(Ja, Jb):
        return jnp.einsum("rki,rkj->rij", Ja, Jb)

    H = jnp.zeros((n * n + 1, 7, 7))
    H = H.at[seg(iii, iii, free_i, free_i)].add(blk(Ji, Ji))
    H = H.at[seg(iii, jjj, free_i, free_j)].add(blk(Ji, Jj))
    H = H.at[seg(jjj, iii, free_j, free_i)].add(blk(Jj, Ji))
    H = H.at[seg(jjj, jjj, free_j, free_j)].add(blk(Jj, Jj))
    H = H[: n * n].reshape(n, n, 7, 7).transpose(0, 2, 1, 3).reshape(7 * n, 7 * n)

    g = jnp.zeros((n + 1, 7))
    g = g.at[jnp.where(free_i, iii, n)].add(jnp.einsum("rki,rk->ri", Ji, r))
    g = g.at[jnp.where(free_j, jjj, n)].add(jnp.einsum("rki,rk->ri", Jj, r))
    g = g[:n].reshape(7 * n)

    # LM damping + gauge/fixed handling
    H = H + (lmbda * jnp.diag(jnp.diag(H)) + ep * jnp.eye(7 * n))
    free_row = (jnp.arange(n) < freen).repeat(7)
    H = H * (free_row[:, None] & free_row[None, :]) + jnp.diag((~free_row).astype(H.dtype))
    g = g * free_row

    L, lower = jax.scipy.linalg.cho_factor(H)
    delta = -jax.scipy.linalg.cho_solve((L, lower), g)
    bad = jnp.any(jnp.isnan(delta))
    delta = jnp.where(bad, 0.0, delta)
    return delta.reshape(n, 7), jnp.sum(r**2) / jnp.maximum(jnp.sum(valid) * 7, 1)


def run_pgo(
    pred_poses: np.ndarray,
    loop_sim3: np.ndarray,
    loop_ii: np.ndarray,
    loop_jj: np.ndarray,
    iters: int = 30,
    ep: float = 0.0,
    lmbda: float = 1e-6,
) -> np.ndarray:
    """LM loop (ref perform_updates, optim_utils.py:211-243).

    pred_poses [n,7]: current SE(3) world-to-camera estimates.
    loop_sim3 [L,8]: measured Sim(3) constraints C s.t. ideally
        C * G_i * G_j^-1 = Id with G = inv-pose embeddings.
    Returns corrected Sim(3) poses [n,8] (inverse-pose convention
    re-inverted, i.e., same convention as pred_poses but with scale).
    """
    n = pred_poses.shape[0]
    pred = jnp.asarray(pred_poses)
    Ginv = sim3.log(sim3.inv(sim3.from_se3(pred)))  # [n,7]

    # odometry-chain constants (ref optim_utils.py:170-180)
    kk = np.arange(1, n)
    ll = kk - 1
    Ti = sim3.inv(sim3.from_se3(pred[kk]))
    Tj = sim3.inv(sim3.from_se3(pred[ll]))
    dSij = sim3.mul(Tj, sim3.inv(Ti))

    constants = jnp.concatenate([dSij, jnp.asarray(loop_sim3)], axis=0)
    iii = jnp.concatenate([jnp.asarray(kk), jnp.asarray(loop_ii)]).astype(jnp.int32)
    jjj = jnp.concatenate([jnp.asarray(ll), jnp.asarray(loop_jj)]).astype(jnp.int32)
    valid = jnp.ones(constants.shape[0])

    freen = n  # all nodes free (fix_opt_window=False default)
    lm = lmbda
    res_hist = []
    for itr in range(iters):
        delta, res = _pgo_step(Ginv, constants, iii, jjj, valid, jnp.float32(lm),
                               jnp.float32(ep), jnp.int32(freen), n=n)
        res_hist.append(float(res))
        G_new = Ginv + delta
        _, res_new = _pgo_step(G_new, constants, iii, jjj, valid, jnp.float32(lm),
                               jnp.float32(ep), jnp.int32(freen), n=n)
        if float(res_new) < res_hist[-1]:
            Ginv = G_new
            lm /= 2
        else:
            lm *= 2
        if res_hist[-1] < 1e-5 and itr >= 4 and res_hist[-5] / max(res_hist[-1], 1e-12) < 1.5:
            break

    return np.asarray(sim3.inv(sim3.exp(Ginv)))


def apply_loop_closure(pred_poses: np.ndarray, loop_sim3, loop_ii, loop_jj) -> np.ndarray:
    """run_DPVO_PGO equivalent (optim_utils.py:202-209): optimize, then
    re-anchor so the pose just past the last loop is unchanged, and
    return corrected poses for frames up to that anchor."""
    est = run_pgo(pred_poses, loop_sim3, loop_ii, loop_jj)  # [n,8] Sim3
    safe_i = int(np.max(loop_ii)) + 1
    anchor = sim3.mul(sim3.from_se3(jnp.asarray(pred_poses[safe_i])), sim3.inv(jnp.asarray(est[safe_i])))
    out = sim3.mul(anchor[None], jnp.asarray(est))
    return np.asarray(out[:safe_i])
