"""Batched NumPy SE(3) helpers for host-side data pipelines.

The data-reader paths (covisibility-graph construction, clip sampling)
run in loader threads/processes where JAX must not be touched — on the
axon platform every jax op is a TPU-tunnel round trip. Conventions
match dpvo_tpu.lie.se3: pose = (tx,ty,tz, qx,qy,qz,qw).
"""

from __future__ import annotations

import numpy as np


def quat_rotmat(q: np.ndarray) -> np.ndarray:
    """[..., 4] (x,y,z,w) -> [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), q.dtype)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def quat_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def inv(g: np.ndarray) -> np.ndarray:
    """[..., 7] -> [..., 7]."""
    q = g[..., 3:7]
    qi = q * np.array([-1.0, -1.0, -1.0, 1.0], g.dtype)
    Ri = quat_rotmat(qi)
    ti = -np.einsum("...ij,...j->...i", Ri, g[..., :3])
    return np.concatenate([ti, qi], axis=-1)


def mul(g1: np.ndarray, g2: np.ndarray) -> np.ndarray:
    """[..., 7] x [..., 7] -> [..., 7]."""
    R1 = quat_rotmat(g1[..., 3:7])
    t = g1[..., :3] + np.einsum("...ij,...j->...i", R1, g2[..., :3])
    q = quat_mul(g1[..., 3:7], g2[..., 3:7])
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return np.concatenate([t, q], axis=-1)
