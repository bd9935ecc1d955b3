"""SE(3) rigid transforms as (t, q) 7-vectors — pure JAX.

TPU-native replacement for the reference lietorch SE3
(dpvo/lietorch/include/se3.h, dpvo/lietorch/groups.py:266-286). Storage
matches the reference: ``(tx, ty, tz, qx, qy, qz, qw)`` in the last
axis. The convention throughout the VO system: ``poses[i]`` maps world
coordinates into camera-i coordinates, and relative motion is
``G_ij = poses[j] * inv(poses[i])`` (dpvo/projective_ops.py:60).

All ops broadcast over leading axes and are differentiable; the
small-angle branches of exp/log use `where`-both-sides so gradients are
finite at theta == 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from dpvo_tpu.lie import so3

_EPS = 1e-8


def identity(shape=(), dtype=jnp.float32):
    g = jnp.zeros(shape + (7,), dtype)
    return g.at[..., 6].set(1.0)


def t_of(g):
    return g[..., :3]


def q_of(g):
    return g[..., 3:7]


def make(t, q):
    return jnp.concatenate([t, q], axis=-1)


def mul(g1, g2):
    """Compose: (t1,q1) * (t2,q2) = (t1 + R1 t2, q1 q2)."""
    t = t_of(g1) + so3.quat_rotate(q_of(g1), t_of(g2))
    q = so3.quat_mul(q_of(g1), q_of(g2))
    return make(t, q)


def inv(g):
    qi = so3.quat_inv(q_of(g))
    return make(-so3.quat_rotate(qi, t_of(g)), qi)


def act(g, p):
    """Apply to 3-D points [...,3]."""
    return so3.quat_rotate(q_of(g), p) + t_of(g)


def act4(g, X):
    """Apply to homogeneous points [...,4] = (x, y, z, w).

    Matches lietorch act4 (se3.h): X' = (R x + w t, w). Used on the
    (xn, yn, 1, d) inverse-depth parameterization where w is inverse
    depth (dpvo/projective_ops.py:19-29).
    """
    xyz = so3.quat_rotate(q_of(g), X[..., :3]) + X[..., 3:4] * t_of(g)
    return jnp.concatenate([xyz, X[..., 3:4]], axis=-1)


def _coeffs(theta_sq):
    """Taylor-safe (A, B, C) = (sin th/th, (1-cos th)/th^2, (th - sin th)/th^3)."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    # switch at 0.05 rad: below it the closed forms hit f32 catastrophic
    # cancellation (1 - cos(2e-4) rounds to 0 -> B = 0 -> inf downstream
    # in log's A/(2B)) while the series are already ~theta^4 accurate
    small = theta < 0.05
    safe_sq = jnp.where(small, 1.0, theta_sq)
    safe_th = jnp.sqrt(safe_sq)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_th) / safe_th)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_th)) / safe_sq)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (safe_th - jnp.sin(safe_th)) / (safe_sq * safe_th))
    return A, B, C


def exp(xi):
    """se(3) -> SE(3). xi = (tau, phi) [...,6] -> (t, q) [...,7].

    t = V(phi) tau with V = I + B [phi]_x + C [phi]_x^2
    (closed form as in fastba/ba_cuda.cu expSE3 / lietorch se3.h Exp).
    """
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3.exp(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    _, B, C = _coeffs(theta_sq)
    p1 = jnp.cross(phi, tau)
    p2 = jnp.cross(phi, p1)
    t = tau + B * p1 + C * p2
    return make(t, q)


def log(g):
    """SE(3) -> se(3): (t,q) -> (tau, phi) with tau = V^{-1} t."""
    phi = so3.log(q_of(g))
    t = t_of(g)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    A, B, _ = _coeffs(theta_sq)
    # V^{-1} = I - 1/2 [phi] + coef [phi]^2,  coef = (1 - A/(2B)) / theta^2
    small = theta < 0.05  # f32: see _coeffs
    safe_sq = jnp.where(small, 1.0, theta_sq)
    coef = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - A / (2.0 * B)) / safe_sq)
    p1 = jnp.cross(phi, t)
    p2 = jnp.cross(phi, p1)
    tau = t - 0.5 * p1 + coef * p2
    return jnp.concatenate([tau, phi], axis=-1)


def retr(g, xi):
    """Manifold retraction: Exp(xi) * g (lietorch groups.py:153-156)."""
    return mul(exp(xi), g)


def adj_matrix(g):
    """Adjoint [...,6,6]: Adj(g) = [[R, [t]x R], [0, R]].

    Convention matches lietorch se3.h Adj: for a body-frame twist b,
    Adj(g) b is the twist in the g-transformed frame.
    """
    R = so3.to_matrix(q_of(g))
    tx = so3.hat(t_of(g))
    top = jnp.concatenate([R, tx @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def adjT(g, a):
    """Apply Adj(g)^T to a cotangent row-vector a [...,6].

    Used to convert the pose-j Jacobian into the pose-i Jacobian:
    Ji = -adjT(G_ij, Jj) (dpvo/projective_ops.py:104, ba_cuda.cu adjSE3).
    """
    R = so3.to_matrix(q_of(g))
    tx = so3.hat(t_of(g))
    a1, a2 = a[..., :3], a[..., 3:6]
    b1 = jnp.einsum("...ij,...j->...i", R.mT, a1)  # R^T a1
    b2 = jnp.einsum("...ij,...j->...i", R.mT, jnp.einsum("...ij,...j->...i", tx.mT, a1)) + jnp.einsum(
        "...ij,...j->...i", R.mT, a2
    )
    return jnp.concatenate([b1, b2], axis=-1)


def to_matrix(g):
    """(t,q) -> homogeneous [...,4,4]."""
    R = so3.to_matrix(q_of(g))
    t = t_of(g)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bot = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


def from_matrix(T):
    return make(T[..., :3, 3], so3.from_matrix(T[..., :3, :3]))


def scale(g, s):
    """Scale translation (used for gauge normalization,
    dpvo/patchgraph.py:93-100). s broadcasts over leading axes."""
    return make(t_of(g) * jnp.asarray(s)[..., None], q_of(g))


def normalize(g):
    return make(t_of(g), so3.normalize(q_of(g)))
