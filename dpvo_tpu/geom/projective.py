"""Projective geometry ops for patch-based VO — pure JAX.

Re-derivation of the reference's projective layer
(dpvo/projective_ops.py:19-130) in functional, fixed-shape form:

  iproj      pixel + inverse depth  -> homogeneous (xn, yn, 1, d)
  proj       homogeneous point      -> pixel (+ inverse depth)
  transform  reproject patch k from frame i into frame j through
             G_ij = poses[j] * inv(poses[i]); optionally return the
             analytic 2x6 pose Jacobians and 2x1 depth Jacobian
  point_cloud, flow_mag  — keyframing / loop-closure edge scoring

Shapes are edge-major (no batch axis — vmap if needed):
  poses       [N, 7]
  patches     [Mtot, 3, P, P]    (x, y, inverse-depth planes)
  intrinsics  [N, 4]             (fx, fy, cx, cy)
  ii, jj, kk  [E] int32          source frame / target frame / patch
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from dpvo_tpu.lie import se3, sim3

MIN_DEPTH_Z = 0.2  # reference clamps Z below this (projective_ops.py:6,43)


def iproj(patches, intrinsics):
    """Inverse projection (ref projective_ops.py:19-29).

    patches [E,3,P,P] (x,y,d planes), intrinsics [E,4] ->
    homogeneous [E,P,P,4] = (xn, yn, 1, d).
    """
    x, y, d = patches[:, 0], patches[:, 1], patches[:, 2]  # [E,P,P]
    fx, fy, cx, cy = [intrinsics[:, k, None, None] for k in range(4)]
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X, intrinsics, depth: bool = False):
    """Pinhole projection (ref projective_ops.py:32-50).

    X [E,P,P,4], intrinsics [E,4] -> [E,P,P,2 or 3].
    """
    Z = X[..., 2]
    fx, fy, cx, cy = [intrinsics[:, k, None, None] for k in range(4)]
    d = 1.0 / jnp.maximum(Z, 0.1)
    x = fx * (d * X[..., 0]) + cx
    y = fy * (d * X[..., 1]) + cy
    if depth:
        return jnp.stack([x, y, d], axis=-1)
    return jnp.stack([x, y], axis=-1)


def transform(
    poses,
    patches,
    intrinsics,
    ii,
    jj,
    kk,
    jacobian: bool = False,
    valid: bool = False,
    tonly: bool = False,
    depth=None,
):
    """Reproject patch kk from frame ii into frame jj (ref :53-113).

    Returns coords [E,P,P,2]; with ``valid`` also an [E] float mask
    (Z > 0.2 at patch center); with ``jacobian`` also the analytic
    (Ji [E,2,6], Jj [E,2,6], Jz [E,2,1]) evaluated at the patch center
    — identical closed forms to the reference (projective_ops.py:71-108
    and fastba/ba_cuda.cu:313-333, up to the shared adjoint transport).

    Poses may be SE(3) [N,7] or Sim(3) [N,8] (t, q, s); the Sim(3)
    branch mirrors the reference's 7-column Ja (projective_ops.py:90-96)
    and returns Ji/Jj of shape [E,2,7].
    """
    is_sim3 = poses.shape[-1] == 8
    grp = sim3 if is_sim3 else se3
    pk = patches[kk]
    if depth is not None:
        # runtime stores live inverse depth separately (state.dvec, one
        # scalar per patch) — override the stale depth plane. Static
        # index update on an edge-sized tensor: fuses, no scatter.
        pk = pk.at[:, 2].set(depth[kk][:, None, None])
    X0 = iproj(pk, intrinsics[ii])  # [E,P,P,4]

    Gij = grp.mul(poses[jj], grp.inv(poses[ii]))  # [E,7 or 8]
    if tonly:
        # translation-only variant used by flow_mag (ref :62-63)
        unit_q = se3.q_of(Gij) * 0 + jnp.asarray([0, 0, 0, 1.0], Gij.dtype)
        if is_sim3:
            Gij = sim3.make(sim3.t_of(Gij), unit_q, jnp.ones_like(sim3.s_of(Gij)))
        else:
            Gij = se3.make(se3.t_of(Gij), unit_q)

    X1 = grp.act4(Gij[:, None, None, :], X0)  # [E,P,P,4]
    x1 = proj(X1, intrinsics[jj])

    P = patches.shape[-1]
    c = P // 2
    Xc, Yc, Zc, Hc = [X1[:, c, c, k] for k in range(4)]
    val = (Zc > MIN_DEPTH_Z).astype(x1.dtype)

    if not jacobian:
        if valid:
            return x1, val
        return x1

    fx, fy = intrinsics[jj, 0], intrinsics[jj, 1]
    o = jnp.zeros_like(Hc)
    d = jnp.where(jnp.abs(Zc) > MIN_DEPTH_Z, 1.0 / jnp.where(jnp.abs(Zc) > MIN_DEPTH_Z, Zc, 1.0), 0.0)

    # Ja: d X1 / d xi_j for the 4 homogeneous coords (ref :83-96);
    # the Sim(3) variant carries a 7th (scale) column = (X, Y, Z, 0)
    if is_sim3:
        Ja = jnp.stack(
            [
                Hc, o, o, o, Zc, -Yc, Xc,
                o, Hc, o, -Zc, o, Xc, Yc,
                o, o, Hc, Yc, -Xc, o, Zc,
                o, o, o, o, o, o, o,
            ],
            axis=-1,
        ).reshape(-1, 4, 7)
    else:
        Ja = jnp.stack(
            [
                Hc, o, o, o, Zc, -Yc,
                o, Hc, o, -Zc, o, Xc,
                o, o, Hc, Yc, -Xc, o,
                o, o, o, o, o, o,
            ],
            axis=-1,
        ).reshape(-1, 4, 6)

    # Jp: d proj / d X1 (ref :98-101)
    Jp = jnp.stack(
        [
            fx * d, o, -fx * Xc * d * d, o,
            o, fy * d, -fy * Yc * d * d, o,
        ],
        axis=-1,
    ).reshape(-1, 2, 4)

    Jj = Jp @ Ja  # [E,2,6 or 7]
    Ji = -grp.adjT(Gij[:, None, :], Jj)  # (ref :104)

    # Jz: d proj / d inverse-depth = Jp @ (G_ij matrix column 3) (ref :106)
    Tcol = grp.to_matrix(Gij)[..., :, 3]  # [E,4]
    Jz = (Jp @ Tcol[..., None])  # [E,2,1]

    return x1, val, (Ji, Jj, Jz)


def point_cloud(poses, patches, intrinsics, ix, depth=None):
    """Lift patches to world-frame homogeneous points (ref :115-117)."""
    if depth is not None:
        patches = patches.at[:, 2].set(depth[:, None, None])
    X = iproj(patches, intrinsics[ix])
    return se3.act4(se3.inv(poses[ix])[:, None, None, :], X)


def flow_mag(poses, patches, intrinsics, ii, jj, kk, beta: float = 0.3,
             depth=None):
    """Blended full/translation-only flow magnitude (ref :120-130).

    Used by keyframing (dpvo/dpvo.py:586-599) and proximity-LC edge
    filtering (dpvo/patchgraph.py:80-83). Returns ([E,P,P], [E] bool).
    """
    coords0 = transform(poses, patches, intrinsics, ii, ii, kk, depth=depth)
    coords1, val = transform(poses, patches, intrinsics, ii, jj, kk, valid=True,
                             depth=depth)
    coords2 = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True,
                        depth=depth)

    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    return beta * flow1 + (1 - beta) * flow2, val > 0.5
