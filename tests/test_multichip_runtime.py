"""End-to-end multi-chip runtime parity.

`DPVO(cfg, mesh=mesh)` routes the proximity-LC global BA through the
distributed sparse solver (runtime/steps.py:668-671 -> ba/gba_sparse.
dist_gba: shard_map over the mesh 'edge' axis, camera system psum'd over
ICI). This test runs the FULL tracker — oracle targets, keyframing,
proximity loop closure, global BA — on the 8-device CPU mesh and on a
single device, and asserts the trajectories agree (the distributed
reduction only reorders float sums). SURVEY §2.9's north star:
multi-chip is the same program, not a separate code path.
"""

import jax.numpy as jnp
import numpy as np

from test_runtime import HT, WD, make_oracle, small_cfg

from dpvo_tpu.eval import ate_rmse
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene


def _run(scene, cfg, n_frames, mesh=None):
    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=1, mesh=mesh)
    slam.oracle = make_oracle(scene, cfg)
    slam._motion_probe = lambda: 1e9
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
    poses, tstamps = slam.terminate()
    return slam, poses


def test_mesh_runtime_matches_single_device(monkeypatch):
    from dpvo_tpu.parallel import make_mesh
    from dpvo_tpu.slam import proximity

    # shrink the proximity pair separation so a 20-frame oracle sequence
    # proposes loop edges (the production constant is 30 keyframes)
    monkeypatch.setattr(proximity, "MIN_SEPARATION", 8)

    n_frames = 20
    scene = PlaneScene(ht=HT, wd=WD, n_frames=n_frames, depth=4.0, seed=3)
    cfg = small_cfg(
        LOOP_CLOSURE=True, GLOBAL_OPT_FREQ=6, BACKEND_THRESH=1e9,
        M_OPT_MAX=512,  # proximity edges add old patches as depth vars
        GBA_POSES_MAX=32, GBA_DEPTHS_MAX=256, GBA_EDGES_MAX=2048,
        GBA_KPAIRS_MAX=16384,
    )

    slam1, poses1 = _run(scene, cfg, n_frames, mesh=None)
    assert slam1.ran_global_ba, "proximity LC never triggered global BA"

    mesh = make_mesh(n_data=1, n_edge=8)
    slam8, poses8 = _run(scene, cfg, n_frames, mesh=mesh)
    assert slam8.ran_global_ba == slam1.ran_global_ba

    # same program, same inputs; only the distributed reduction order
    # differs -> trajectories must agree to float-accumulation noise
    np.testing.assert_allclose(poses8[:, :3], poses1[:, :3], atol=5e-4)
    np.testing.assert_allclose(poses8[:, 3:], poses1[:, 3:], atol=5e-4)

    # and both must actually track: millimetric vs GT after Sim3 align
    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene.poses[:n_frames])))
    motion = np.linalg.norm(np.diff(gt_c2w[:, :3], axis=0), axis=1).sum()
    err = ate_rmse(poses8[:, :3], gt_c2w[:, :3], align_scale=True)
    assert err < 0.05 * motion, (err, motion)
