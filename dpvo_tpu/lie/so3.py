"""SO(3) as unit quaternions — pure JAX.

TPU-native replacement for the reference lietorch SO3 group
(dpvo/lietorch/include/so3.h, dpvo/lietorch/src/lietorch_gpu.cu): the
reference dispatches Eigen-templated CUDA kernels per op; here every op
is a few fused VPU-friendly jnp expressions, differentiable by JAX
autodiff, and batchable with vmap/broadcasting.

Storage convention matches the reference: quaternion ``(x, y, z, w)``
in the last axis (dpvo/lietorch/groups.py:245-257).

Small-angle branches use the `where`-both-sides trick so gradients stay
finite at theta == 0.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(q1, q2):
    """Hamilton product, (x,y,z,w) convention."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_inv(q):
    """Conjugate (assumes unit quaternion)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v [...,3] by unit quaternions q [...,4].

    Uses the 15-mul expansion v' = v + 2 w (u x v) + 2 u x (u x v).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def exp(phi):
    """so(3) -> SO(3): rotation vector [...,3] to quaternion [...,4].

    q = (sin(theta/2)/theta * phi, cos(theta/2))  — matches the closed
    form in the reference (fastba/ba_cuda.cu expSO3). Both branches are
    written so gradients flow through theta_sq only (finite at 0).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    safe_th = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    # k = sin(theta/2)/theta ; series: 1/2 - theta^2/48 + theta^4/3840
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(0.5 * safe_th) / safe_th)
    # cos(theta/2) ; series: 1 - theta^2/8 + theta^4/384
    real = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(0.5 * safe_th))
    return jnp.concatenate([k * phi, real], axis=-1)


def log(q):
    """SO(3) -> so(3): quaternion to rotation vector [...,3]."""
    u = q[..., :3]
    w = q[..., 3:4]
    norm_sq = jnp.sum(u * u, axis=-1, keepdims=True)
    small = norm_sq < _EPS * _EPS
    safe_norm = jnp.sqrt(jnp.where(small, 1.0, norm_sq))
    # theta in [0, pi]; atan2 for stability; double cover handled via sign(w)
    theta = 2.0 * jnp.arctan2(safe_norm, jnp.abs(w))
    sign = jnp.where(w < 0, -1.0, 1.0)
    # small-angle: q ~ (phi/2, 1) -> phi = 2*u (series with norm_sq)
    scale = jnp.where(small, 2.0 * sign, sign * theta / safe_norm)
    return u * scale


def to_matrix(q):
    """Unit quaternion [...,4] -> rotation matrix [...,3,3]."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(R):
    """Rotation matrix [...,3,3] -> unit quaternion [...,4] (x,y,z,w).

    Shepperd's method, branch-free via selecting the largest pivot.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions
    qw = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5

    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0), w0], -1),
            jnp.stack([x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1), (m21 - m12) / (4 * x1)], -1),
            jnp.stack([(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2), (m02 - m20) / (4 * y2)], -1),
            jnp.stack([(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3, (m10 - m01) / (4 * z3)], -1),
        ],
        axis=-2,
    )  # [...,4,4]
    idx = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2).squeeze(-2)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def hat(phi):
    """[...,3] -> skew-symmetric [...,3,3]."""
    x, y, z = jnp.moveaxis(phi, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(phi.shape[:-1] + (3, 3))


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
