"""Tests for the Schur-complement BA solver: convergence on synthetic
scenes (the reference verifies BA only end-to-end; we test it directly),
masking semantics, and the structure-only path."""

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.ba import ba
from dpvo_tpu.geom import projective as pops
from dpvo_tpu.lie import se3



import pytest

pytestmark = pytest.mark.smoke

def synthetic_problem(key, n_frames=6, n_points=64, noise=0.0):
    """GT trajectory + landmarks; observations = GT projections."""
    keys = jax.random.split(key, 6)
    intr = jnp.tile(jnp.array([[120.0, 120.0, 80.0, 60.0]]), (n_frames, 1))

    # GT poses: smooth forward motion + rotation jitter
    xs = jnp.concatenate(
        [0.12 * jax.random.normal(keys[0], (n_frames, 3)), 0.03 * jax.random.normal(keys[1], (n_frames, 3))], -1
    )
    poses_gt = [se3.identity()]
    for i in range(1, n_frames):
        poses_gt.append(se3.mul(se3.exp(xs[i]), poses_gt[-1]))
    poses_gt = jnp.stack(poses_gt)

    # landmarks parameterized as pixels + inverse depth in frame 0
    px = jax.random.uniform(keys[2], (n_points,), minval=30, maxval=130)
    py = jax.random.uniform(keys[3], (n_points,), minval=25, maxval=95)
    d = jax.random.uniform(keys[4], (n_points,), minval=0.3, maxval=0.8)
    patch_ctr_gt = jnp.stack([px, py, d], -1)

    # observations: each point seen in every frame
    ii, jj, kd = [], [], []
    for j in range(n_frames):
        ii.append(jnp.zeros(n_points, jnp.int32))
        jj.append(jnp.full((n_points,), j, jnp.int32))
        kd.append(jnp.arange(n_points, dtype=jnp.int32))
    ii, jj, kd = jnp.concatenate(ii), jnp.concatenate(jj), jnp.concatenate(kd)

    coords = pops.transform(poses_gt, patch_ctr_gt[:, :, None, None], intr, ii, jj, kd)
    target = coords[:, 0, 0, :]
    if noise > 0:
        target = target + noise * jax.random.normal(keys[5], target.shape)
    return poses_gt, patch_ctr_gt, intr, target, ii, jj, kd


def center_rmse(poses, patch_ctr, intr, target, ii, jj, kd):
    coords = pops.transform(poses, patch_ctr[:, :, None, None], intr, ii, jj, kd)
    return float(jnp.sqrt(jnp.mean(jnp.sum((coords[:, 0, 0, :] - target) ** 2, -1))))


def run_ba(poses, patch_ctr, intr, target, ii, jj, kd, t0, nfree, W, iters=8):
    E = ii.shape[0]
    Md = patch_ctr.shape[0]
    weight = jnp.ones((E, 2))
    valid = jnp.ones((E,), bool)
    bounds = jnp.array([-64.0, -64.0, 2 * 80.0 + 64.0, 2 * 60.0 + 64.0])
    poses2, depths2 = ba(
        poses, patch_ctr, intr, target, weight, valid, ii, jj, kd,
        jnp.int32(t0), jnp.int32(nfree), bounds, jnp.float32(1e-6),
        W=W, Md=Md, iterations=iters, clamp_mode="train",
    )
    return poses2, patch_ctr.at[:, 2].set(depths2)


def test_ba_converges_from_perturbation():
    key = jax.random.PRNGKey(0)
    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(key)
    n = poses_gt.shape[0]

    # perturb poses (not frame 0: gauge) and depths
    kp, kd2 = jax.random.split(jax.random.PRNGKey(1))
    dxi = 0.02 * jax.random.normal(kp, (n, 6)).at[0].set(0.0)
    poses0 = se3.retr(poses_gt, dxi)
    ctr0 = ctr_gt.at[:, 2].mul(1.0 + 0.2 * jax.random.normal(kd2, (ctr_gt.shape[0],)))

    e0 = center_rmse(poses0, ctr0, intr, target, ii, jj, kd)
    poses1, ctr1 = run_ba(poses0, ctr0, intr, target, ii, jj, kd, t0=1, nfree=n - 1, W=8)
    e1 = center_rmse(poses1, ctr1, intr, target, ii, jj, kd)

    assert e0 > 1.0  # the perturbation is meaningful
    assert e1 < 0.02 * e0, (e0, e1)
    assert e1 < 0.05


def test_ba_structure_only():
    """nfree=0 leaves poses untouched and still fixes depths."""
    key = jax.random.PRNGKey(2)
    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(key)
    ctr0 = ctr_gt.at[:, 2].mul(1.3)

    poses1, ctr1 = run_ba(poses_gt, ctr0, intr, target, ii, jj, kd, t0=0, nfree=0, W=8)
    assert np.allclose(poses1, poses_gt)
    e1 = center_rmse(poses1, ctr1, intr, target, ii, jj, kd)
    assert e1 < 0.05


def test_ba_invalid_edges_are_ignored():
    key = jax.random.PRNGKey(3)
    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(key)
    n = poses_gt.shape[0]
    E = ii.shape[0]
    Md = ctr_gt.shape[0]

    dxi = 0.02 * jax.random.normal(jax.random.PRNGKey(4), (n, 6)).at[0].set(0.0)
    poses0 = se3.retr(poses_gt, dxi)

    # append garbage edges, masked out
    pad = 100
    ii_p = jnp.concatenate([ii, jnp.zeros(pad, jnp.int32)])
    jj_p = jnp.concatenate([jj, jnp.ones(pad, jnp.int32)])
    kd_p = jnp.concatenate([kd, jnp.zeros(pad, jnp.int32)])
    target_p = jnp.concatenate([target, 1e6 * jnp.ones((pad, 2))])
    weight = jnp.concatenate([jnp.ones((E, 2)), 7.0 * jnp.ones((pad, 2))])
    valid = jnp.concatenate([jnp.ones(E, bool), jnp.zeros(pad, bool)])
    bounds = jnp.array([-64.0, -64.0, 224.0, 184.0])

    poses_a, depths_a = ba(
        poses0, ctr_gt, intr, target_p, weight, valid, ii_p, jj_p, kd_p,
        jnp.int32(1), jnp.int32(n - 1), bounds, jnp.float32(1e-6),
        W=8, Md=Md, iterations=2, clamp_mode="train",
    )
    poses_b, depths_b = ba(
        poses0, ctr_gt, intr, target, jnp.ones((E, 2)), jnp.ones(E, bool), ii, jj, kd,
        jnp.int32(1), jnp.int32(n - 1), bounds, jnp.float32(1e-6),
        W=8, Md=Md, iterations=2, clamp_mode="train",
    )
    # atol: the Gram-matrix assembly (B6 = Jw^T Jw on the MXU) changes
    # f32 summation order when padding rows are added; invalid-edge
    # leakage would show up at ~1e0, not ~1e-5
    assert np.allclose(poses_a, poses_b, atol=2e-4)
    assert np.allclose(depths_a, depths_b, atol=2e-4)


def test_ba_differentiable():
    """Gradients flow through the solve (training BA-in-the-loop)."""
    key = jax.random.PRNGKey(5)
    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(key, n_frames=4, n_points=16)
    n = poses_gt.shape[0]
    Md = ctr_gt.shape[0]
    bounds = jnp.array([-64.0, -64.0, 224.0, 184.0])

    def loss(tweak):
        tgt = target + tweak
        poses1, depths1 = ba(
            poses_gt, ctr_gt, intr, tgt, jnp.ones((tgt.shape[0], 2)), jnp.ones(tgt.shape[0], bool),
            ii, jj, kd, jnp.int32(1), jnp.int32(n - 1), bounds, jnp.float32(1e-4),
            W=4, Md=Md, iterations=1, clamp_mode="train",
        )
        return jnp.sum(poses1[:, :3] ** 2) + jnp.sum(depths1**2)

    g = jax.grad(loss)(jnp.zeros_like(target))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_spd_solve_matches_cholesky_interpret():
    import numpy as np

    from dpvo_tpu.ba.spd_solve import spd_solve

    rng = np.random.default_rng(5)
    n = 48
    A = rng.standard_normal((n, n))
    S = jnp.asarray(A @ A.T + n * np.eye(n), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x = np.asarray(spd_solve(S, y, interpret=True))
    want = np.linalg.solve(np.asarray(S), np.asarray(y))
    np.testing.assert_allclose(x, want, rtol=2e-3, atol=2e-3)

    # VJP: d/dy of sum(x) equals solve(S, ones)
    g = jax.grad(lambda yy: jnp.sum(spd_solve(S, yy, interpret=True)))(y)
    want_g = np.linalg.solve(np.asarray(S).T, np.ones(n))
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=2e-3, atol=2e-3)


def test_segment_sum_sorted_matches_onehot_interpret():
    """ADVICE r4: the blocked sorted segment-sum kernel (TPU-only call
    site in ba/solver.py) vs the dense one-hot reference, in interpret
    mode — so the numerics-critical kernel has CI coverage off-TPU."""
    from dpvo_tpu.ba.segsum_pallas import EB, segment_sum_sorted

    rng = np.random.default_rng(11)
    E, K, Md = 2 * EB, 20, 40
    # sorted DENSE ids (every id in [0, Md) present): the kernel's
    # contract — a sorted EB block spans <= EB distinct ids
    kd = np.sort(np.concatenate([np.arange(Md), rng.integers(0, Md, E - Md)]))
    payload = rng.standard_normal((E, K)).astype(np.float32)

    got = np.asarray(segment_sum_sorted(
        jnp.asarray(payload), jnp.asarray(kd, jnp.int32), Md=Md, interpret=True))
    oh = (kd[:, None] == np.arange(Md)[None, :]).astype(np.float32)
    want = oh.T @ payload
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
