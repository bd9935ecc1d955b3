"""Sim(3) similarity transforms as (t, q, s) 8-vectors — pure JAX.

TPU-native replacement for the reference lietorch Sim3
(dpvo/lietorch/include/sim3.h, rxso3.h). Storage matches the reference
embedding: ``(tx, ty, tz, qx, qy, qz, qw, s)``; manifold dim 7 with
tangent layout ``(tau, phi, sigma)`` (dpvo/lietorch/groups.py:289-311).

Used by the Sim3 branch of the projective transform (loop-closure
residuals) and by the pose-graph optimizer (dpvo/loop_closure/
optim_utils.py). Group action: x' = s R x + t.

The exp/log W-matrix coefficients follow the standard closed forms
(Strasdat, "Local Accuracy and Global Consistency for Efficient Visual
SLAM", Appx; same forms the reference's sim3.h implements), written
branch-free with `where`-safe denominators.
"""

from __future__ import annotations

import jax.numpy as jnp

from dpvo_tpu.lie import so3

# small-angle/-scale switch for _calc_W: the closed forms divide
# cancellation-prone differences (1 - cos theta, e^sigma - 1) by
# theta^2/sigma; in f32 those differences lose all precision below
# ~0.03, where the first-order series are already ~1e-5 accurate
_EPS = 0.03


def identity(shape=(), dtype=jnp.float32):
    g = jnp.zeros(shape + (8,), dtype)
    g = g.at[..., 6].set(1.0)
    return g.at[..., 7].set(1.0)


def t_of(g):
    return g[..., :3]


def q_of(g):
    return g[..., 3:7]


def s_of(g):
    return g[..., 7]


def make(t, q, s):
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def from_se3(g7, s=None):
    """Embed an SE(3) 7-vector with unit (or given) scale."""
    if s is None:
        s = jnp.ones(g7.shape[:-1], g7.dtype)
    return jnp.concatenate([g7, s[..., None]], axis=-1)


def to_se3(g):
    """Drop scale (PGO output path: rescale then treat as SE3)."""
    return g[..., :7]


def mul(g1, g2):
    t = t_of(g1) + s_of(g1)[..., None] * so3.quat_rotate(q_of(g1), t_of(g2))
    q = so3.quat_mul(q_of(g1), q_of(g2))
    s = s_of(g1) * s_of(g2)
    return make(t, q, s)


def inv(g):
    qi = so3.quat_inv(q_of(g))
    si = 1.0 / s_of(g)
    ti = -si[..., None] * so3.quat_rotate(qi, t_of(g))
    return make(ti, qi, si)


def act(g, p):
    return s_of(g)[..., None] * so3.quat_rotate(q_of(g), p) + t_of(g)


def act4(g, X):
    """Homogeneous action on (x, y, z, w=inverse depth): (sRx + w t, w)."""
    xyz = s_of(g)[..., None] * so3.quat_rotate(q_of(g), X[..., :3]) + X[..., 3:4] * t_of(g)
    return jnp.concatenate([xyz, X[..., 3:4]], axis=-1)


def _calc_W(phi, sigma):
    """W matrix of the Sim(3) exponential: t = W tau.

    W = A [phi]x + B [phi]x^2 + C I with the (A,B,C) closed forms,
    Taylor-expanded near theta=0 and/or sigma=0.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    scale = jnp.exp(sigma)

    small_t = theta < _EPS
    small_s = jnp.abs(sigma) < _EPS
    th = jnp.where(small_t, 1.0, theta)
    th_sq = th * th
    sg = jnp.where(small_s, 1.0, sigma)
    sg_sq = sg * sg

    # C = (e^sigma - 1)/sigma
    C = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (scale - 1.0) / sg)

    # both small / theta small / sigma small / general — combine pairwise
    a = scale * jnp.sin(th)
    b = scale * jnp.cos(th)
    c = th_sq + sg_sq

    A_gen = (a * sg + (1.0 - b) * th) / (th * c)
    B_gen = (C - ((b - 1.0) * sg + a * th) / c) / th_sq
    A_ssmall = (1.0 - jnp.cos(th)) / th_sq
    B_ssmall = (th - jnp.sin(th)) / (th_sq * th)
    A_tsmall = ((sg - 1.0) * scale + 1.0) / sg_sq
    B_tsmall = ((0.5 * sg_sq - sg + 1.0) * scale - 1.0 - 0.5 * sg_sq) / (sg_sq * sg)
    A_both = 0.5 + sigma / 6.0
    B_both = 1.0 / 6.0 + sigma / 24.0

    A = jnp.where(small_s, jnp.where(small_t, A_both, A_ssmall), jnp.where(small_t, A_tsmall, A_gen))
    B = jnp.where(small_s, jnp.where(small_t, B_both, B_ssmall), jnp.where(small_t, B_tsmall, B_gen))

    Px = so3.hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Px.shape)
    return A[..., None, None] * Px + B[..., None, None] * (Px @ Px) + C[..., None, None] * I


def exp(xi):
    """sim(3) -> Sim(3). xi = (tau, phi, sigma) [...,7]."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3.exp(phi)
    s = jnp.exp(sigma)
    W = _calc_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return make(t, q, s)


def log(g):
    """Sim(3) -> sim(3): invert exp via W^{-1} t (3x3 solve)."""
    phi = so3.log(q_of(g))
    sigma = jnp.log(s_of(g))
    W = _calc_W(phi, sigma)
    tau = jnp.linalg.solve(W, t_of(g)[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma[..., None]], axis=-1)


def retr(g, xi):
    return mul(exp(xi), g)


def to_matrix(g):
    R = so3.to_matrix(q_of(g)) * s_of(g)[..., None, None]
    t = t_of(g)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bot = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


def adjT(g, a):
    """Apply Adj(g)^T to a 7-dim cotangent (tau, phi, sigma) row-vector.

    Adj for Sim(3) with tangent order (tau, phi, sigma):
        [ s R     [t]x R    -t ]
        [ 0        R         0 ]
        [ 0        0         1 ]
    (matches lietorch sim3.h Adj). Used for the Sim3 branch of the BA
    Jacobians (dpvo/projective_ops.py:90-96,104).
    """
    R = so3.to_matrix(q_of(g))
    tx = so3.hat(t_of(g))
    s = s_of(g)[..., None]
    t = t_of(g)
    a1, a2, a3 = a[..., :3], a[..., 3:6], a[..., 6:7]
    b1 = s * jnp.einsum("...ij,...j->...i", R.mT, a1)
    b2 = jnp.einsum("...ij,...j->...i", R.mT, jnp.einsum("...ij,...j->...i", tx.mT, a1)) + jnp.einsum(
        "...ij,...j->...i", R.mT, a2
    )
    b3 = -jnp.sum(t * a1, axis=-1, keepdims=True) + a3
    return jnp.concatenate([b1, b2, b3], axis=-1)
