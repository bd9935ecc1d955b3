"""Schur-complement bundle adjustment — fixed-shape, masked, pure JAX.

TPU-native re-design of the reference's fused CUDA BA
(dpvo/fastba/ba_cuda.cu:232-582) and its differentiable Python mirror
(dpvo/ba.py:88-297). Where the CUDA kernel scatters per-edge
contributions with atomicAdd into dense B/E/C/v/u, we build the same
blocks with ``jax.ops.segment_sum`` over a static-capacity edge array —
deterministic, race-free, and fully fusable by XLA. The Schur complement
and damped Cholesky solve map onto the MXU.

System (ref dpvo/ba.py:107-110):
      [ B  E ] [ dX ]   [ v ]
      [ E^T C ] [ dZ ] = [ u ]
  B: pose-pose blocks over the free window; C: diagonal depth Hessian;
  S = B - E Q E^T with Q = (C + lambda)^{-1}; damped S += I(lm*S + ep)
  (ref ba_cuda.cu:519-563).

Shape discipline (all static):
  W   : padded free-pose window  (free poses are t0 .. t0+nfree-1, nfree traced)
  Md  : padded depth-variable count (dense depth index per edge via kd)
  E   : padded edge count, ``valid`` masks padding
Degenerate cases need no branches: nfree == 0 makes the pose system an
identity solve with zero rhs (dX = 0), matching the reference's
structure_only path; unused depth vars have C = u = 0 so dZ = 0.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dpvo_tpu.geom import projective as pops
from dpvo_tpu.lie import se3


class BAProblem(NamedTuple):
    """One bundle-adjustment problem with static shapes."""

    poses: jax.Array        # [N,7]
    patch_ctr: jax.Array    # [Md,3]  (x, y, inverse depth) at patch centers
    intrinsics: jax.Array   # [N,4]
    target: jax.Array       # [E,2]
    weight: jax.Array       # [E,2]
    valid: jax.Array        # [E] bool
    ii: jax.Array           # [E] int32 source frame
    jj: jax.Array           # [E] int32 target frame
    kd: jax.Array           # [E] int32 dense depth-var index in [0, Md)
    t0: jax.Array           # scalar int32: first free pose
    nfree: jax.Array        # scalar int32: number of free poses (<= W)


def _center_residuals(prob: BAProblem, bounds, res_clip: float):
    """Reprojection residual + analytic Jacobians at patch centers.

    Mirrors the residual/gating block of the fused CUDA kernel
    (ba_cuda.cu:276-333): gate on ||r|| < res_clip, Z > 0.2, and the
    +/-64px border around the image bounds.
    """
    patches = prob.patch_ctr[:, :, None, None]  # [Md,3,1,1]
    coords, val, (Ji, Jj, Jz) = pops.transform(
        prob.poses, patches, prob.intrinsics, prob.ii, prob.jj, prob.kd, jacobian=True
    )
    xy = coords[:, 0, 0, :]  # [E,2]
    r = prob.target - xy

    in_bounds = (
        (xy[:, 0] > bounds[0]) & (xy[:, 1] > bounds[1]) & (xy[:, 0] < bounds[2]) & (xy[:, 1] < bounds[3])
    )
    ok = (jnp.linalg.norm(r, axis=-1) < res_clip) & (val > 0.5) & in_bounds & prob.valid
    w = prob.weight * ok[:, None].astype(prob.weight.dtype)  # [E,2]
    return r, w, Ji, Jj, Jz


def assemble_normal_eqs(
    prob: BAProblem,
    bounds,
    *,
    W: int,
    Md: int,
    res_clip: float = 128.0,
):
    """Edge-parallel normal-equation assembly: returns (B6 [6W,6W],
    E6 [6W,Md], C [Md], u [Md], v6 [6W]).

    This is the distributable half of the solver: each edge contributes
    independently via segment sums, so sharding the edge axis and
    psum-ing the outputs over ICI yields the distributed global BA
    (parallel/dist_ba.py) — the TPU equivalent of the reference's
    atomicAdd scatter kernel (ba_cuda.cu:335-373).
    """
    r, w, Ji, Jj, Jz = _center_residuals(prob, bounds, res_clip)
    r = r.astype(jnp.float32)
    w = w.astype(jnp.float32)
    Ji, Jj, Jz = (x.astype(jnp.float32) for x in (Ji, Jj, Jz))

    pi = prob.ii - prob.t0  # local free-pose index (may be <0: fixed)
    pj = prob.jj - prob.t0
    free_i = (pi >= 0) & (pi < prob.nfree)
    free_j = (pj >= 0) & (pj < prob.nfree)

    def seg_pp(pa, fa, pb, fb):
        s = pa * W + pb
        return jnp.where(fa & fb, s, W * W)

    def seg_p(pa, fa):
        return jnp.where(fa, pa, W)

    def seg_pd(pa, fa):
        s = pa * Md + prob.kd
        return jnp.where(fa, s, W * Md)

    # --- pose-pose Hessian blocks (ref ba.py:190-229) ---
    def hblock(Ja, Jb):
        return jnp.einsum("er,eri,erj->eij", w, Ja, Jb)

    B = jnp.zeros((W * W + 1, 6, 6), jnp.float32)
    B = B.at[seg_pp(pi, free_i, pi, free_i)].add(hblock(Ji, Ji))
    B = B.at[seg_pp(pi, free_i, pj, free_j)].add(hblock(Ji, Jj))
    B = B.at[seg_pp(pj, free_j, pi, free_i)].add(hblock(Jj, Ji))
    B = B.at[seg_pp(pj, free_j, pj, free_j)].add(hblock(Jj, Jj))
    B = B[: W * W].reshape(W, W, 6, 6)

    # --- pose-depth coupling E (ref ba.py:234-235) ---
    def eblock(Ja):
        return jnp.einsum("er,eri,er->ei", w, Ja, Jz[:, :, 0])

    Em = jnp.zeros((W * Md + 1, 6), jnp.float32)
    Em = Em.at[seg_pd(pi, free_i)].add(eblock(Ji))
    Em = Em.at[seg_pd(pj, free_j)].add(eblock(Jj))
    Em = Em[: W * Md].reshape(W, Md, 6)

    # --- diagonal depth Hessian C and gradients (ref ba.py:240-248) ---
    wJz = w * Jz[:, :, 0] ** 2
    C = jnp.zeros((Md,), jnp.float32).at[prob.kd].add(jnp.sum(wJz, axis=-1))
    u = jnp.zeros((Md,), jnp.float32).at[prob.kd].add(jnp.sum(w * Jz[:, :, 0] * r, axis=-1))

    v = jnp.zeros((W + 1, 6), jnp.float32)
    v = v.at[seg_p(pi, free_i)].add(jnp.einsum("er,eri->ei", w * r, Ji))
    v = v.at[seg_p(pj, free_j)].add(jnp.einsum("er,eri->ei", w * r, Jj))
    v = v[:W]

    B6 = B.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    E6 = Em.transpose(0, 2, 1).reshape(6 * W, Md)
    return B6, E6, C, u, v.reshape(6 * W)


def schur_solve(
    B6, E6, C, u, v6, lmbda, nfree, *, W: int, ep: float = 1.0, lm: float = 1e-4
) -> Tuple[jax.Array, jax.Array]:
    """Damped Schur-complement solve (ref ba_cuda.cu:519-563)."""
    Q = 1.0 / (C + lmbda)  # [Md]
    EQ = E6 * Q[None, :]
    S = B6 - EQ @ E6.T
    y = v6 - EQ @ u

    # damping: S_ii += lm * S_ii + ep  (ba_cuda.cu:546)
    S = S + jnp.diag(lm * jnp.diag(S) + ep)

    # mask out padded / fixed rows -> identity block, zero rhs
    free_row = (jnp.arange(W) < nfree).repeat(6)
    S = S * (free_row[:, None] & free_row[None, :]) + jnp.diag((~free_row).astype(jnp.float32))
    y = y * free_row

    L, lower = jax.scipy.linalg.cho_factor(S)
    dX6 = jax.scipy.linalg.cho_solve((L, lower), y)
    # tolerate Cholesky failure with a zero update (ref ba.py:17-27)
    bad = jnp.any(jnp.isnan(dX6)) | jnp.any(jnp.isinf(dX6))
    dX6 = jnp.where(bad, 0.0, dX6)

    dZ = Q * (u - E6.T @ dX6)
    dZ = jnp.where(bad, 0.0, dZ)
    return dX6.reshape(W, 6), dZ


@partial(jax.jit, static_argnames=("W", "Md", "ep", "lm", "res_clip"))
def ba_delta(
    prob: BAProblem,
    bounds,
    lmbda,
    *,
    W: int,
    Md: int,
    ep: float = 1.0,
    lm: float = 1e-4,
    res_clip: float = 128.0,
) -> Tuple[jax.Array, jax.Array]:
    """One Gauss-Newton step: returns (dX [W,6], dZ [Md])."""
    B6, E6, C, u, v6 = assemble_normal_eqs(prob, bounds, W=W, Md=Md, res_clip=res_clip)
    return schur_solve(B6, E6, C, u, v6, lmbda, prob.nfree, W=W, ep=ep, lm=lm)


def apply_pose_retr(poses, dX, t0, nfree, W: int):
    """poses[t0+l] <- Exp(dX[l]) * poses[t0+l] for l < nfree (masked)."""
    N = poses.shape[0]
    idx = t0 + jnp.arange(W)
    mask = (jnp.arange(W) < nfree)[:, None]
    cur = poses.at[idx].get(mode="clip")
    new = se3.retr(cur, dX)
    # mode="drop": padded window slots beyond the buffer are discarded
    # (avoids duplicate scatter indices clobbering the last real pose)
    return poses.at[idx].set(jnp.where(mask, new, cur), mode="drop")


def apply_depth_retr(depths, dZ, clamp_mode: str = "runtime"):
    """depths [Md] + dZ with the reference clamps.

    runtime:  d>20 -> 1.0; d = max(d, 1e-4)  (ba_cuda.cu:218-221)
    train:    clip(d, 1e-3, 10)              (ba.py:291)
    """
    d = depths + dZ
    if clamp_mode == "runtime":
        d = jnp.where(d > 20.0, 1.0, d)
        return jnp.maximum(d, 1e-4)
    return jnp.clip(d, 1e-3, 10.0)


@partial(jax.jit, static_argnames=("W", "Md", "iterations", "ep", "lm", "res_clip", "clamp_mode"))
def ba(
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
    iterations: int = 2,
    ep: float = 1.0,
    lm: float = 1e-4,
    res_clip: float = 128.0,
    clamp_mode: str = "runtime",
):
    """Run `iterations` damped Gauss-Newton steps; returns (poses', depths')."""
    depths = patch_ctr[:, 2]
    for _ in range(iterations):
        prob = BAProblem(
            poses, jnp.concatenate([patch_ctr[:, :2], depths[:, None]], -1), intrinsics,
            target, weight, valid, ii, jj, kd, t0, nfree,
        )
        dX, dZ = ba_delta(prob, bounds, lmbda, W=W, Md=Md, ep=ep, lm=lm, res_clip=res_clip)
        poses = apply_pose_retr(poses, dX, t0, nfree, W)
        depths = apply_depth_retr(depths, dZ, clamp_mode)
    return poses, depths
