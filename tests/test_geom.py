"""Tests for projective ops: analytic Jacobians vs jax.jacfwd, and
geometric consistency on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.geom import projective as pops
from dpvo_tpu.lie import se3



import pytest

pytestmark = pytest.mark.smoke

def make_scene(key, n_frames=5, n_patches=12, P=3):
    """Random camera trajectory looking at points in front of it."""
    k1, k2, k3 = jax.random.split(key, 3)
    # small random motions compose into poses
    xs = 0.05 * jax.random.normal(k1, (n_frames, 6))
    poses = [se3.identity()]
    for i in range(1, n_frames):
        poses.append(se3.mul(se3.exp(xs[i]), poses[-1]))
    poses = jnp.stack(poses)

    intrinsics = jnp.tile(jnp.array([[120.0, 120.0, 80.0, 60.0]]), (n_frames, 1))

    # patches: pixel centers + plausible inverse depth, constant per patch
    cx = jax.random.uniform(k2, (n_patches, 1, 1), minval=20, maxval=140)
    cy = jax.random.uniform(k3, (n_patches, 1, 1), minval=20, maxval=100)
    offs = jnp.arange(P) - P // 2
    gx = cx + offs[None, None, :]
    gy = cy + offs[None, :, None]
    d = jnp.full((n_patches, P, P), 0.5)
    patches = jnp.stack([jnp.broadcast_to(gx, (n_patches, P, P)), jnp.broadcast_to(gy, (n_patches, P, P)), d], axis=1)
    return poses, patches, intrinsics


def test_transform_identity_is_noop():
    poses, patches, intr = make_scene(jax.random.PRNGKey(0))
    E = patches.shape[0]
    ii = jnp.zeros(E, jnp.int32)
    kk = jnp.arange(E, dtype=jnp.int32)
    coords = pops.transform(poses, patches, intr, ii, ii, kk)
    # reprojecting into the same frame returns the original pixel coords
    expected = jnp.stack([patches[:, 0], patches[:, 1]], axis=-1)
    assert np.allclose(coords, expected, atol=1e-3)


def test_transform_jacobians_match_autodiff():
    poses, patches, intr = make_scene(jax.random.PRNGKey(1))
    E = patches.shape[0]
    ii = jnp.zeros(E, jnp.int32)
    jj = jnp.full((E,), 2, jnp.int32)
    kk = jnp.arange(E, dtype=jnp.int32)

    coords, val, (Ji, Jj, Jz) = pops.transform(poses, patches, intr, ii, jj, kk, jacobian=True)
    assert np.all(np.asarray(val) == 1.0)
    c = patches.shape[-1] // 2

    # --- Jj: perturb pose j on the left (retraction convention) ---
    def f_posej(xi):
        p2 = poses.at[2].set(se3.retr(poses[2], xi))
        out = pops.transform(p2, patches, intr, ii, jj, kk)
        return out[:, c, c, :]

    Jj_num = jax.jacfwd(f_posej)(jnp.zeros(6))  # [E,2,6]
    assert np.allclose(Jj, Jj_num, atol=1e-3, rtol=1e-3)

    # --- Ji: perturb pose i ---
    def f_posei(xi):
        p2 = poses.at[0].set(se3.retr(poses[0], xi))
        out = pops.transform(p2, patches, intr, ii, jj, kk)
        return out[:, c, c, :]

    Ji_num = jax.jacfwd(f_posei)(jnp.zeros(6))
    assert np.allclose(Ji, Ji_num, atol=1e-3, rtol=1e-3)

    # --- Jz: perturb inverse depth of each patch ---
    def f_depth(dz):
        p = patches.at[:, 2].add(dz[:, None, None])
        out = pops.transform(poses, p, intr, ii, jj, kk)
        return out[:, c, c, :]

    Jz_num = jax.jacfwd(f_depth)(jnp.zeros(E))  # [E,2,E]
    Jz_num = jnp.stack([Jz_num[jnp.arange(E), :, jnp.arange(E)]], -1)  # diag -> [E,2,1]
    assert np.allclose(Jz, Jz_num, atol=1e-3, rtol=1e-3)


def test_flow_mag_zero_for_static_camera():
    poses, patches, intr = make_scene(jax.random.PRNGKey(2))
    poses = jnp.tile(se3.identity()[None], (poses.shape[0], 1))
    E = patches.shape[0]
    ii = jnp.zeros(E, jnp.int32)
    jj = jnp.full((E,), 3, jnp.int32)
    kk = jnp.arange(E, dtype=jnp.int32)
    mag, val = pops.flow_mag(poses, patches, intr, ii, jj, kk, beta=0.5)
    assert np.allclose(mag, 0.0, atol=1e-3)
    assert np.all(np.asarray(val))


def test_point_cloud_reprojects():
    """World points lifted from frame i project back to patch pixels."""
    poses, patches, intr = make_scene(jax.random.PRNGKey(3))
    E = patches.shape[0]
    ix = jnp.zeros(E, jnp.int32)
    X = pops.point_cloud(poses, patches, intr, ix)  # [E,P,P,4] world homog
    # project into frame ix again: X_cam = poses[ix] . X
    Xc = se3.act4(poses[ix][:, None, None, :], X)
    x = pops.proj(Xc, intr[ix])
    expected = jnp.stack([patches[:, 0], patches[:, 1]], axis=-1)
    assert np.allclose(x, expected, atol=1e-3)


def test_transform_sim3_branch():
    """Sim(3) poses [N,8]: scale-1 matches SE(3); Jacobians match
    autodiff including the 7th (scale) column (ref projective_ops.py:90-96)."""
    from dpvo_tpu.lie import sim3

    poses, patches, intr = make_scene(jax.random.PRNGKey(4))
    E = patches.shape[0]
    ii = jnp.zeros(E, jnp.int32)
    jj = jnp.full((E,), 2, jnp.int32)
    kk = jnp.arange(E, dtype=jnp.int32)
    c = patches.shape[-1] // 2

    poses8 = sim3.from_se3(poses)
    # scale-1 Sim3 coincides with SE3
    coords7 = pops.transform(poses, patches, intr, ii, jj, kk)
    coords8 = pops.transform(poses8, patches, intr, ii, jj, kk)
    assert np.allclose(coords7, coords8, atol=1e-4)

    # non-trivial scales: analytic Jacobians vs autodiff
    scales = jnp.array([1.0, 1.1, 0.9, 1.2, 0.8])
    poses8 = sim3.make(sim3.t_of(poses8), sim3.q_of(poses8), scales)
    coords, val, (Ji, Jj, Jz) = pops.transform(poses8, patches, intr, ii, jj, kk, jacobian=True)
    assert Ji.shape == (E, 2, 7) and Jj.shape == (E, 2, 7)

    def f_posej(xi):
        p2 = poses8.at[2].set(sim3.retr(poses8[2], xi))
        return pops.transform(p2, patches, intr, ii, jj, kk)[:, c, c, :]

    Jj_num = jax.jacfwd(f_posej)(jnp.zeros(7))
    assert np.allclose(Jj, Jj_num, atol=1e-3, rtol=1e-3)

    def f_posei(xi):
        p2 = poses8.at[0].set(sim3.retr(poses8[0], xi))
        return pops.transform(p2, patches, intr, ii, jj, kk)[:, c, c, :]

    Ji_num = jax.jacfwd(f_posei)(jnp.zeros(7))
    assert np.allclose(Ji, Ji_num, atol=1e-3, rtol=1e-3)
