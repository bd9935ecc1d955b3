"""Long-trajectory soak test (VERDICT r3 item 6).

Runs a 250-frame oracle sequence — ~10x the other integration tests —
with proximity loop closure on and a deliberately tiny
``GBA_POSES_MAX`` so the trajectory crosses the global-BA anchor bound
many times over (the production bound is 2048 free poses,
runtime/dpvo.py clamps t0 to n - GBA_POSES_MAX; the reference frees
everything, dpvo/dpvo.py:710-716). Asserts:

  * bounded state: live edges within E_MAX, the inactive ring within
    its capacity, keyframe count within BUFFER_SIZE;
  * periodic culls exercised and terminate() still interpolates a pose
    for EVERY input frame through the relative-delta chain
    (ref dpvo.py:385-390,405-411);
  * global BA keeps running (and improving nothing it shouldn't) with
    poses older than the anchor bound frozen: the full trajectory still
    matches ground truth after Sim(3) alignment.

Scaled down for CI (a 2.5k-frame run at flagship capacities needs the
real chip for wall-clock reasons); the anchor-crossing code path is
identical — only the constants differ.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dpvo_tpu.eval import ate_rmse
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

from test_runtime import HT, WD, make_oracle, small_cfg


def test_soak_long_trajectory_anchor_bound(monkeypatch):
    from dpvo_tpu.slam import proximity

    monkeypatch.setattr(proximity, "MIN_SEPARATION", 8)

    n_frames = 250
    scene = PlaneScene(ht=HT, wd=WD, n_frames=n_frames, depth=4.0, seed=5,
                       tstep=0.02, rstep=0.003)
    cfg = small_cfg(
        BUFFER_SIZE=256,
        # production-semantics flow filter (the reference's
        # BACKEND_THRESH=64 at full res; this scene's slow random walk
        # lingers, so plenty of low-flow long-range pairs pass). A
        # pass-everything 1e9 threshold is measurably UNSTABLE over long
        # horizons: every zero-covisibility pair becomes a gated-out
        # edge, global BA + normalize ratchet the scale until depths hit
        # the clamps (repro: tests/test_soak.py with BACKEND_THRESH=1e9;
        # see PARITY.md "known behaviors").
        LOOP_CLOSURE=True, GLOBAL_OPT_FREQ=10, BACKEND_THRESH=64.0,
        MAX_EDGE_AGE=48,             # pmem when LOOP_CLOSURE (circular)
        E_MAX=4096, E_INAC_MAX=8192,
        M_OPT_MAX=1024,
        # anchor bound far below the keyframe count: every global BA
        # past keyframe ~24 optimizes only the trailing window, with
        # older poses as gauge anchors
        GBA_POSES_MAX=24, GBA_DEPTHS_MAX=2048, GBA_EDGES_MAX=16384,
        GBA_KPAIRS_MAX=1 << 17,
        KEYFRAME_THRESH=12.5,        # real culling: exercises delta chain
    )

    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=1)
    slam.oracle = make_oracle(scene, cfg)
    slam._motion_probe = lambda: 1e9
    # deterministic cadence: cull every 5th decision so the delta chain
    # grows throughout (random-weight flow magnitudes would be chaotic)
    calls = {"i": 0}
    orig = slam._keyframe_decide
    def fixed(m, **kw):
        calls["i"] += 1
        orig(0.0 if calls["i"] % 5 == 0 else 1e9, **kw)
    slam._keyframe_decide = fixed

    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
        # bounded state throughout, not just at the end
        assert len(slam.topo.ii) <= cfg.E_MAX
        assert slam.topo.inac_count <= cfg.E_INAC_MAX
        assert slam.n <= cfg.BUFFER_SIZE

    assert slam.ran_global_ba, "proximity LC never triggered global BA"
    assert slam.n > cfg.GBA_POSES_MAX + 20, "trajectory never crossed the anchor bound"
    n_culled = n_frames - slam.n
    assert n_culled >= 30, f"culling never engaged ({n_culled})"

    poses, tstamps = slam.terminate()
    # every input frame gets a pose (culled ones via the delta chain)
    assert poses.shape == (n_frames, 7)
    assert np.all(np.isfinite(poses))
    assert list(tstamps) == list(range(n_frames))

    # the whole trajectory — including anchor-frozen history — stays
    # within 15% of trajectory length after Sim(3) alignment. This
    # scenario is deliberately adversarial: at 48x64 the flow filter
    # passes nearly every pair, so global BA runs ~every frame over an
    # anchored window; measured drift is ~10% of motion (the no-LC
    # oracle window solver alone does <5% — see PARITY.md "known
    # behaviors" for the long-horizon LC accuracy gap).
    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene.poses[:n_frames])))
    motion = np.linalg.norm(np.diff(gt_c2w[:, :3], axis=0), axis=1).sum()
    err = ate_rmse(poses[:, :3], gt_c2w[:, :3], align_scale=True)
    assert err < 0.15 * motion, (err, motion)
