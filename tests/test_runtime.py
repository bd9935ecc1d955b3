"""End-to-end runtime tests.

The reference has no trained-weights-free correctness test; we add one:
the *oracle* integration test replaces the network's (delta, weight)
prediction with ground-truth reprojection targets from a synthetic
scene, so the full pipeline — patchify, topology, circular memories,
sliding-window BA, keyframing bookkeeping, terminate interpolation —
must recover the ground-truth trajectory (up to monocular gauge).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpvo_tpu.config import Config
from dpvo_tpu.eval import ate_rmse
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

HT, WD = 128, 160


def small_cfg(**kw):
    base = dict(
        BUFFER_SIZE=64,
        PATCHES_PER_FRAME=8,
        REMOVAL_WINDOW=10,
        OPTIMIZATION_WINDOW=6,
        PATCH_LIFETIME=5,
        KEYFRAME_INDEX=2,
        KEYFRAME_THRESH=0.0,   # keep every frame (oracle accuracy test)
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


def make_oracle(scene: PlaneScene, cfg):
    def oracle(slam, es):
        E = es.count
        patches = np.asarray(slam.state.patches)
        xy = patches[:, :2, cfg.P // 2, cfg.P // 2]  # [N*M, 2] quarter-res
        row2frame = np.asarray(slam.tstamps)
        ii_f = row2frame[es.ii[:E]]
        jj_f = row2frame[es.jj[:E]]
        tgt = scene.gt_targets(scene.poses, xy, ii_f, jj_f, es.kk[:E])
        target = np.zeros((cfg.E_MAX, 2), np.float32)
        target[:E] = tgt
        weight = np.zeros((cfg.E_MAX, 2), np.float32)
        weight[:E] = 1.0
        return target, weight

    return oracle


@pytest.fixture(scope="module")
def scene():
    return PlaneScene(ht=HT, wd=WD, n_frames=24, depth=4.0, seed=3)


def run_oracle_slam(scene, cfg, n_frames):
    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=1)
    slam.oracle = make_oracle(scene, cfg)
    slam._motion_probe = lambda: 1e9  # oracle: skip net-based init gate
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
    return slam


def test_oracle_recovers_trajectory(scene):
    cfg = small_cfg()
    n_frames = 20
    slam = run_oracle_slam(scene, cfg, n_frames)
    poses, tstamps = slam.terminate()  # camera-to-world [n,7]
    assert poses.shape == (n_frames, 7)

    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene.poses[:n_frames])))
    err = ate_rmse(poses[:, :3], gt_c2w[:, :3], align_scale=True)
    # plane is ~4m away, camera moves ~3.5cm/frame -> GT targets pin the
    # geometry; the solved trajectory should be millimetric after Sim3 align
    motion = np.linalg.norm(np.diff(gt_c2w[:, :3], axis=0), axis=1).sum()
    assert motion > 0.3
    assert err < 0.05 * motion, (err, motion)


def test_runtime_smoke_random_weights(scene):
    """Full pipeline with untrained weights: must run, keyframe, and
    terminate cleanly (trajectory quality is meaningless)."""
    cfg = small_cfg(KEYFRAME_THRESH=12.5)  # exercise keyframe culling
    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=2)
    n_frames = 16
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
    poses, tstamps = slam.terminate()
    assert poses.shape[0] == n_frames
    assert np.all(np.isfinite(poses))
    # quaternions stay normalized through retractions
    qn = np.linalg.norm(poses[:, 3:], axis=1)
    assert np.allclose(qn, 1.0, atol=1e-3)


def test_oracle_with_keyframe_culling(scene):
    """Slow-motion segment triggers culling; bookkeeping must stay
    consistent and the interpolated trajectory complete."""
    cfg = small_cfg(KEYFRAME_THRESH=3.0)
    slow = PlaneScene(ht=HT, wd=WD, n_frames=20, depth=4.0, seed=5, tstep=0.012, rstep=0.001)
    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=1)
    slam.oracle = make_oracle(slow, cfg)
    slam._motion_probe = lambda: 1e9
    for t in range(20):
        slam(t, slow.render(t), slow.intrinsics.copy())
    kept = slam.n
    poses, _ = slam.terminate()
    assert poses.shape == (20, 7)
    assert np.all(np.isfinite(poses))
    assert kept <= 20


def test_fused_steady_state_pipeline(scene):
    """The steady-state fused path (one device program per frame,
    keyframe decision consumed one frame late, deferred maintenance)
    must keep bookkeeping consistent through keyframe culls and produce
    a finite, complete trajectory (ref dpvo.py:905-1025 hot path)."""
    cfg = small_cfg(KEYFRAME_THRESH=12.5)
    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=3)
    slam._motion_probe = lambda: 1e9  # force init with random weights
    # deterministic cull cadence so the deferred-maintenance path runs
    orig = slam._keyframe_decide
    calls = {"i": 0}

    def fixed(m, **kw):
        calls["i"] += 1
        orig(0.0 if calls["i"] % 3 == 0 else 1e9, **kw)

    slam._keyframe_decide = fixed
    n_frames = 20
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
    assert len(slam._inflights) > 0  # steady state really pipelines
    n_culled = calls["i"] // 3
    assert slam.n == n_frames - n_culled - 1 + 1  # culls applied (one lags)
    poses, tstamps = slam.terminate()
    assert poses.shape[0] == n_frames
    assert np.all(np.isfinite(poses))
    qn = np.linalg.norm(poses[:, 3:], axis=1)
    assert np.allclose(qn, 1.0, atol=1e-3)


def test_fused_keyframe_sync_mode(scene):
    """KEYFRAME_SYNC=True applies the cull decision before the next
    frame (reference-exact timing); pipeline must stay consistent."""
    cfg = small_cfg(KEYFRAME_THRESH=12.5, KEYFRAME_SYNC=True)
    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=2)
    for t in range(14):
        slam(t, scene.render(t), scene.intrinsics.copy())
    poses, tstamps = slam.terminate()
    assert poses.shape[0] == 14
    assert np.all(np.isfinite(poses))


def test_fused_edge_buckets_match_full_capacity(scene):
    """Capacity-bucketed fused steps (config.E_BUCKETS) must reproduce
    the full-E_MAX program: live edges sit in a compacted prefix, so a
    smaller bucket only trims padding the math masks out anyway.

    On a single XLA CPU device the trajectories are BITWISE identical
    (re-verified 2026-08 after the [2E,6W] assembly rework);
    under this suite's 8-virtual-device flags XLA picks capacity-
    dependent reduction splits, and the ~1e-7 f32 reordering noise is
    amplified through 20 frames of random-weight BA (garbage targets =>
    ill-conditioned, chaotic solves) to ~1e-1 on a ~4-unit trajectory —
    hence the loose pose tolerance
    next to the exact structural assertions."""

    def run(buckets):
        cfg = small_cfg(KEYFRAME_THRESH=12.5, E_BUCKETS=buckets)
        slam = DPVO(cfg, None, ht=HT, wd=WD, seed=3)
        slam._motion_probe = lambda: 1e9
        orig = slam._keyframe_decide
        calls = {"i": 0}

        def fixed(m, **kw):
            calls["i"] += 1
            orig(0.0 if calls["i"] % 3 == 0 else 1e9, **kw)

        slam._keyframe_decide = fixed
        for t in range(20):
            slam(t, scene.render(t), scene.intrinsics.copy())
        poses, tstamps = slam.terminate()
        return poses, tstamps, sorted(slam._framebufs), list(slam.tstamps)

    poses_full, ts_full, caps_full, kf_full = run("off")
    poses_bkt, ts_bkt, caps_bkt, kf_bkt = run("256,512")
    assert caps_full == [1024]
    assert 256 in caps_bkt or 512 in caps_bkt  # small buckets actually ran
    # identical structure: same culls, same kept keyframes
    assert kf_bkt == kf_full
    np.testing.assert_array_equal(ts_bkt, ts_full)
    np.testing.assert_allclose(poses_bkt, poses_full, atol=0.25)


def test_fused_pipeline_depth(scene):
    """PIPELINE_DEPTH=3 keeps up to 3 fused frames in flight (keyframe
    decisions lag 3 frames); bookkeeping must stay consistent through
    culls and the trajectory complete and finite."""
    cfg = small_cfg(KEYFRAME_THRESH=12.5, PIPELINE_DEPTH=3)
    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=3)
    slam._motion_probe = lambda: 1e9
    orig = slam._keyframe_decide
    calls = {"i": 0}

    def fixed(m, **kw):
        calls["i"] += 1
        orig(0.0 if calls["i"] % 3 == 0 else 1e9, **kw)

    slam._keyframe_decide = fixed
    depth_seen = 0
    n_frames = 20
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
        depth_seen = max(depth_seen, len(slam._inflights))
    assert depth_seen == 3  # the pipeline really runs deep
    poses, tstamps = slam.terminate()
    assert poses.shape[0] == n_frames
    assert np.all(np.isfinite(poses))
    qn = np.linalg.norm(poses[:, 3:], axis=1)
    assert np.allclose(qn, 1.0, atol=1e-3)
    # decisions all consumed: one cull per 3 decides, each applied
    n_culled = calls["i"] // 3
    assert slam.n == n_frames - n_culled
