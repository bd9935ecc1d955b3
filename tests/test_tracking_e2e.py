"""Network-driven end-to-end tracking test (NOT oracle).

Runs the full real inference path — trained update-operator weights,
the motion-probe init gate (ref dpvo/dpvo.py:975-978) unmodified, no
ground-truth injection — on a held-out synthetic scene and asserts the
recovered trajectory beats the identity baseline by a wide margin.

The weights fixture (tests/fixtures/tiny_synth.npz) is a small
(DIM=64/FDIM=32) network trained by apps/train.py on the synthetic clip
stream (dataset 'synthetic'); scenes here use held-out seeds and the
same flow regime the probe gate demands (~>8 full-res px/frame).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dpvo_tpu.config import Config
from dpvo_tpu.eval import ate_rmse
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_synth.npz")

HT, WD = 48, 64


def tiny_cfg(**kw):
    base = dict(
        BUFFER_SIZE=64,
        PATCHES_PER_FRAME=8,
        REMOVAL_WINDOW=10,
        OPTIMIZATION_WINDOW=6,
        PATCH_LIFETIME=5,
        KEYFRAME_INDEX=2,
        KEYFRAME_THRESH=12.5,
        MIXED_PRECISION=False,
        E_MAX=1024,
        E_INAC_MAX=1024,
        W_OPT_MAX=8,
        M_OPT_MAX=128,
        PMEM=16,
        MEM=16,
        DIM=64,
        FDIM=32,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="weights fixture not built")
def test_trained_network_tracks():
    n_frames = 24
    # held-out seed; tstep chosen so realized flow (~3x naive due to the
    # scene's momentum random walk) sits mid-distribution for the probe
    scene = PlaneScene(ht=HT, wd=WD, n_frames=n_frames, depth=6.0, seed=9001,
                       tstep=0.55, rstep=0.01)
    cfg = tiny_cfg()
    slam = DPVO(cfg, FIXTURE, ht=HT, wd=WD, seed=0)
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
    poses, tstamps = slam.terminate()

    # the REAL init gate must have passed (no oracle, no monkeypatch)
    assert slam.is_initialized

    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene.poses[:n_frames])))
    err = ate_rmse(poses[:, :3], gt_c2w[:, :3], align_scale=True)
    err_identity = ate_rmse(np.zeros_like(poses[:, :3]), gt_c2w[:, :3],
                            align_scale=True)
    motion = float(np.linalg.norm(np.diff(gt_c2w[:, :3], axis=0), axis=1).sum())
    assert motion > 1.0
    # tracks: clearly better than not moving at all, and bounded rel ATE
    assert err < 0.5 * err_identity, (err, err_identity)
    assert err < 0.15 * motion, (err, motion)
