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
    """Held-out scenes in the fixture's training flow regime (7-13 px
    per frame at 48x64 — just above the ~8 px the probe gate demands).
    Thresholds carry ~1.4-2x margin over the fixture's graded
    performance (scripts/grade_tiny.py: rel 0.07/0.09, vs-identity
    0.58/0.47); the fixture is a 3000-CPU-step DIM=64 net — the bound
    proves real (non-oracle) tracking, not flagship accuracy."""
    from dpvo_tpu.utils.synthetic import MultiPlaneScene

    n_frames = 24
    scenes = [
        PlaneScene(ht=HT, wd=WD, n_frames=n_frames, depth=5.0, seed=9002,
                   tstep=0.45, rstep=0.008),
        MultiPlaneScene(ht=HT, wd=WD, n_frames=n_frames, depth=7.0,
                        seed=9003, tstep=0.6, rstep=0.01),
    ]
    rels, ratios = [], []
    for scene in scenes:
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
        rels.append(err / motion)
        ratios.append(err / err_identity)

    # tracks: meaningfully better than not moving at all, bounded rel ATE
    assert float(np.median(rels)) < 0.15, rels
    assert float(np.median(ratios)) < 0.75, ratios
