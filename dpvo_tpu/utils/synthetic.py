"""Synthetic scene generator for tests and benchmarking.

Renders a textured fronto-parallel plane observed by a moving camera:
cheap to generate, fully known geometry (ground-truth poses and dense
inverse depth), realistic optical flow statistics. Used by the oracle
integration tests (runtime correctness without trained weights) and by
bench.py (end-to-end FPS on deterministic input).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from dpvo_tpu.lie import se3


def smooth_texture(key: int, size: int = 1024, octaves: int = 5) -> np.ndarray:
    """Multi-octave value noise in [0,255], RGB uint8."""
    rng = np.random.default_rng(key)
    tex = np.zeros((size, size, 3), np.float32)
    for o in range(octaves):
        s = 8 * 2**o
        coarse = rng.uniform(0, 1, (s, s, 3)).astype(np.float32)
        reps = size // s
        up = np.kron(coarse, np.ones((reps, reps, 1), np.float32))
        tex += up / 2**o
    tex -= tex.min()
    tex /= tex.max()
    return (tex * 255).astype(np.uint8)


class PlaneScene:
    """Camera looking at plane z = depth (world frame), translating and
    rotating smoothly. Pose convention matches the runtime: poses map
    world -> camera."""

    def __init__(self, ht=480, wd=640, n_frames=100, depth=4.0, seed=0,
                 tstep=0.035, rstep=0.004):
        self.ht, self.wd = ht, wd
        self.depth = depth
        self.fx = self.fy = 0.8 * wd
        self.cx, self.cy = wd / 2, ht / 2
        self.intrinsics = np.array([self.fx, self.fy, self.cx, self.cy], np.float32)
        self.tex = smooth_texture(seed)
        self.tex_scale = self.tex.shape[0] / 12.0  # plane extent ~12m

        rng = np.random.default_rng(seed + 1)
        # smooth random-walk twist increments
        poses = [np.array([0, 0, 0, 0, 0, 0, 1], np.float32)]
        vel = np.zeros(6)
        for _ in range(1, n_frames):
            vel = 0.9 * vel + np.concatenate(
                [tstep * rng.normal(size=3), rstep * rng.normal(size=3)]
            )
            vel[2] *= 0.3  # limited forward motion keeps the plane visible
            g = np.asarray(se3.mul(se3.exp(np.asarray(vel, np.float32)), poses[-1]))
            poses.append(g)
        self.poses = np.stack(poses)  # [n,7] world-to-camera

    def inv_depth(self, n: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """GT inverse depth at full-res pixels (x, y) of frame n."""
        # ray through pixel in camera frame
        from dpvo_tpu.lie import so3

        rx = (x - self.cx) / self.fx
        ry = (y - self.cy) / self.fy
        g_inv = np.asarray(se3.inv(self.poses[n]))  # camera-to-world
        # direction in world = R_c2w @ (rx, ry, 1); origin = t_c2w
        d_cam = np.stack([rx, ry, np.ones_like(rx)], -1)
        Rw = np.asarray(so3.to_matrix(g_inv[3:7]))
        d_w = d_cam @ Rw.T
        o_w = g_inv[:3]
        # intersect z = depth: o_z + t d_z = depth
        t = (self.depth - o_w[2]) / np.maximum(d_w[..., 2], 1e-6)
        z_cam = t  # for unit-z camera direction, depth along camera z == t
        return 1.0 / np.maximum(z_cam, 1e-6)

    def render(self, n: int) -> np.ndarray:
        """Render frame n by texture lookup at ray/plane intersections."""
        from dpvo_tpu.lie import so3

        ys, xs = np.mgrid[0 : self.ht, 0 : self.wd]
        rx = (xs - self.cx) / self.fx
        ry = (ys - self.cy) / self.fy
        d_cam = np.stack([rx, ry, np.ones_like(rx)], -1)
        g_inv = np.asarray(se3.inv(self.poses[n]))
        Rw = np.asarray(so3.to_matrix(g_inv[3:7]))
        d_w = d_cam @ Rw.T
        o_w = g_inv[:3]
        t = (self.depth - o_w[2]) / np.maximum(d_w[..., 2], 1e-6)
        px = o_w[0] + t * d_w[..., 0]
        py = o_w[1] + t * d_w[..., 1]
        ti = np.mod((px * self.tex_scale).astype(np.int64), self.tex.shape[0])
        tj = np.mod((py * self.tex_scale).astype(np.int64), self.tex.shape[1])
        return self.tex[tj, ti]

    def gt_targets(self, poses_gt, patch_xy_q, ii, jj, kk):
        """Oracle reprojection targets at 1/4 resolution.

        patch_xy_q [Mtot, 2]: patch centers (x, y) at 1/4 res; returns the
        GT projection of patch kk (anchored in frame ii) into frame jj.
        """
        from dpvo_tpu.geom import projective as pops
        import jax.numpy as jnp

        x4 = patch_xy_q[kk, 0]
        y4 = patch_xy_q[kk, 1]
        d = self.inv_depth_list(ii, x4 * 4.0, y4 * 4.0)
        ctr = np.stack([x4, y4, d], -1).astype(np.float32)  # [E,3]
        intr_q = np.tile(self.intrinsics[None] / 4.0, (len(self.poses), 1))
        coords = pops.transform(
            jnp.asarray(poses_gt), jnp.asarray(ctr[:, :, None, None]),
            jnp.asarray(intr_q), jnp.asarray(ii), jnp.asarray(jj),
            jnp.arange(len(ii)),
        )
        return np.asarray(coords[:, 0, 0, :])

    def inv_depth_list(self, frames: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        out = np.zeros_like(x, np.float64)
        for f in np.unique(frames):
            m = frames == f
            out[m] = self.inv_depth(int(f), x[m], y[m])
        return out
