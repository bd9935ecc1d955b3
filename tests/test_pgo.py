"""Sim(3) PGO tests: drift correction on a synthetic loop."""

import jax.numpy as jnp
import numpy as np

from dpvo_tpu.lie import se3, sim3
from dpvo_tpu.slam.pgo import apply_loop_closure, run_pgo



import pytest

pytestmark = pytest.mark.smoke

def make_drifty_loop(n=40, seed=0):
    """GT: closed square-ish loop. Estimate: GT + accumulating drift."""
    rng = np.random.default_rng(seed)
    gt = [np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32)]
    for i in range(1, n):
        xi = np.array([0.1, 0, 0, 0, 2 * np.pi / n, 0], np.float32)
        gt.append(np.asarray(se3.mul(se3.exp(jnp.asarray(xi)), jnp.asarray(gt[-1]))))
    gt = np.stack(gt)

    est = [gt[0]]
    for i in range(1, n):
        dP = np.asarray(se3.mul(jnp.asarray(gt[i]), se3.inv(jnp.asarray(gt[i - 1]))))
        noise = se3.exp(jnp.asarray(0.01 * np.array([1, 0.5, 0, 0, 0.5, 0], np.float32)))
        dP = np.asarray(se3.mul(jnp.asarray(dP), noise))
        est.append(np.asarray(se3.mul(jnp.asarray(dP), jnp.asarray(est[-1]))))
    return gt, np.stack(est)


def loop_constraint(gt, i, j):
    """Ideal Sim3 constraint C with C * Gi * Gj^-1 = Id for the
    ground-truth relation (G = inverse poses, ref optim_utils.py)."""
    Gi = sim3.inv(sim3.from_se3(jnp.asarray(gt[i])))
    Gj = sim3.inv(sim3.from_se3(jnp.asarray(gt[j])))
    C = sim3.mul(Gj, sim3.inv(Gi))
    return np.asarray(C)


def traj_positions(poses_w2c):
    return np.asarray(se3.inv(jnp.asarray(poses_w2c[:, :7])))[:, :3]


def test_pgo_corrects_drift():
    gt, est = make_drifty_loop()
    n = gt.shape[0]

    # loop measurements between the closing ends
    ii = np.array([n - 2, n - 3])
    jj = np.array([1, 2])
    C = np.stack([loop_constraint(gt, i, j) for i, j in zip(ii, jj)])

    before = np.linalg.norm(traj_positions(est) - traj_positions(gt), axis=1)
    out = run_pgo(est, C, ii, jj)  # [n,8]
    est_corr = np.asarray(out[:, :7])
    # renormalize quaternions + apply scale into translation for position
    after_pos = traj_positions(np.concatenate([est_corr[:, :3] / out[:, 7:8], est_corr[:, 3:]], 1))

    # PGO output is defined up to a global Sim(3) gauge: compare with the
    # standard Sim3-aligned ATE (same scoring the reference protocol uses)
    from dpvo_tpu.eval import ate_rmse

    assert after_pos.shape == (n, 3)
    ate_before = ate_rmse(traj_positions(est), traj_positions(gt))
    ate_after = ate_rmse(after_pos, traj_positions(gt))
    assert ate_after < 0.6 * ate_before, (ate_after, ate_before)


def test_apply_loop_closure_anchors():
    gt, est = make_drifty_loop(n=30, seed=1)
    ii = np.array([28])
    jj = np.array([1])
    C = np.stack([loop_constraint(gt, 28, 1)])
    out = apply_loop_closure(est, C, ii, jj)
    assert out.shape == (29, 8)
    assert np.all(np.isfinite(out))


def test_pgo_noop_when_consistent():
    """Consistent odometry + consistent loop -> (near) zero update."""
    gt, _ = make_drifty_loop(n=20, seed=2)
    ii = np.array([18])
    jj = np.array([1])
    C = np.stack([loop_constraint(gt, 18, 1)])
    out = run_pgo(gt, C, ii, jj)
    # scale stays ~1, poses stay ~gt (quaternions up to double cover)
    assert np.allclose(out[:, 7], 1.0, atol=1e-3)
    assert np.allclose(out[:, :3], gt[:, :3], atol=2e-3)
    qdot = np.abs(np.sum(out[:, 3:7] * gt[:, 3:7], axis=1))
    assert np.allclose(qdot, 1.0, atol=1e-4)
