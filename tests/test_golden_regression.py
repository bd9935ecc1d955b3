"""Golden-log regression test (the reference commits result logs as de
facto regression fixtures — logs/euroc.txt etc., SURVEY.md §4; this is
our committed analog for the in-repo tiny checkpoint).

Re-runs one scene from logs/synthetic_tiny.txt and asserts the
rel-ATE stays inside a tolerance band of the committed number, so
accuracy regressions fail CI instead of waiting for a judge round.
One scene (not all three) keeps this under ~1.5 min; the full table is
regenerated with scripts/grade_tiny.py.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dpvo_tpu.config import Config
from dpvo_tpu.eval import ate_rmse
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_synth.npz")
GOLDEN_REL = 0.079   # logs/synthetic_tiny.txt PlaneScene:9002
BAND = 2.0           # x tolerance: chaotic 24-frame solves wander, a
#                      regression signal is a MULTIPLE, not a few %


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not built")
def test_golden_rel_ate_within_band():
    HT, WD, n_frames = 48, 64, 24
    scene = PlaneScene(ht=HT, wd=WD, n_frames=n_frames, depth=5.0,
                       seed=9002, tstep=0.45, rstep=0.008)
    cfg = Config(BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=10,
                 OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5, KEYFRAME_INDEX=2,
                 KEYFRAME_THRESH=12.5, MIXED_PRECISION=False, E_MAX=1024,
                 E_INAC_MAX=1024, W_OPT_MAX=8, M_OPT_MAX=128, PMEM=16,
                 MEM=16, DIM=64, FDIM=32)
    slam = DPVO(cfg, FIXTURE, ht=HT, wd=WD, seed=0)
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
    poses, _ = slam.terminate()
    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene.poses[:n_frames])))
    motion = np.linalg.norm(np.diff(gt_c2w[:, :3], axis=0), axis=1).sum()
    rel = ate_rmse(poses[:, :3], gt_c2w[:, :3], align_scale=True) / motion
    assert rel < GOLDEN_REL * BAND, (rel, GOLDEN_REL)
