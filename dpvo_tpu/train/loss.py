"""Training loss: flow supervision + scale-aligned relative-pose error.

Re-derivation of the reference loss (train.py:86-117): per unroll step,
(1) min-over-patch-pixel reprojection error on valid short-baseline
edges, (2) after step 2, rotation+translation error of all relative
pose pairs after Umeyama scale alignment of the predicted trajectory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpvo_tpu.lie import se3


def kabsch_scale(A, B):
    """Closed-form scale aligning B to A (ref train.py:31-41)."""
    EA = A.mean(0)
    EB = B.mean(0)
    varA = jnp.mean(jnp.sum((A - EA) ** 2, axis=1))
    H = (A - EA).T @ (B - EB) / A.shape[0]
    d = jnp.linalg.svd(H, compute_uv=False)
    return varA / jnp.maximum(jnp.sum(d), 1e-8)


def pose_error(Gs, Ps, n: int):
    """Relative SE(3) errors over all frame pairs (ref train.py:90-113).

    Gs: predicted poses [F,7] (world-to-camera); Ps: ground truth; only
    the first n (static) poses participate.
    """
    P1 = se3.inv(Gs[:n])
    P2 = se3.inv(Ps[:n])

    t1 = P1[:, :3]
    t2 = P2[:, :3]
    # The reference clamps only the top (train.py:105 .clamp(max=10)); on
    # low-parallax clips the closed-form scale can also collapse toward 0
    # (tiny gt-translation variance / noisy predicted translations), which
    # makes the translation term explode — clamp both sides.
    s = jax.lax.stop_gradient(jnp.clip(kabsch_scale(t2, t1), 0.1, 10.0))
    P1 = se3.scale(P1, jnp.full((n,), s))

    ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    k = (ii != jj).reshape(-1)
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)

    dP = se3.mul(se3.inv(P1[ii]), P1[jj])
    dG = se3.mul(se3.inv(P2[ii]), P2[jj])
    e1 = se3.log(se3.mul(dP, se3.inv(dG)))
    tr = jnp.linalg.norm(e1[:, :3], axis=-1)
    ro = jnp.linalg.norm(e1[:, 3:6], axis=-1)
    kf = k.astype(tr.dtype)
    denom = jnp.maximum(kf.sum(), 1.0)
    return jnp.sum(tr * kf) / denom, jnp.sum(ro * kf) / denom


def flow_error(valid, coords, coords_gt, P: int):
    """Masked min-over-patch-pixel flow error (ref train.py:87-88)."""
    e = jnp.linalg.norm(coords - coords_gt, axis=-1)  # [Es,P,P]
    e_min = jnp.min(e.reshape(e.shape[0], P * P), axis=-1)
    v = (valid > 0.5).astype(e_min.dtype)
    return jnp.sum(e_min * v) / jnp.maximum(jnp.sum(v), 1.0), e_min, v


def clip_loss(traj, poses_gt, P: int, flow_weight=0.1, pose_weight=10.0, structure_only=False):
    """Sum the per-step losses over the unroll (ref train.py:85-120)."""
    loss = 0.0
    metrics = {}
    for i, (valid, coords, coords_gt, Gs, n) in enumerate(traj):
        fe, e_min, v = flow_error(valid, coords, coords_gt, P)
        loss = loss + flow_weight * fe
        tr, ro = pose_error(Gs, poses_gt, n)
        if not structure_only and i >= 2:
            loss = loss + pose_weight * (tr + ro)
        if i == len(traj) - 1:
            px1 = jnp.sum((e_min < 0.25) * v) / jnp.maximum(jnp.sum(v), 1.0)
            metrics = {"flow": fe, "tr": tr, "ro": ro, "px1": px1}
    return loss, metrics
