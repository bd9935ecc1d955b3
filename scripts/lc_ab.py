"""Loop-closure accuracy A/B on a loopy synthetic scene (VERDICT r4 #5).

Drives the oracle tracker (GT reprojection targets + pixel noise, so
drift accumulates like a real run) around an out-and-back pan whose
tail revisits the start, with LOOP_CLOSURE on vs off, same seeds.
Reports Sim(3)-aligned ATE for both. The in-tree assertion lives in
tests/test_loop_closure.py::test_loop_closure_improves_ate.

Usage: python scripts/lc_ab.py [--frames 140] [--noise 0.25]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp


def loop_trajectory(n_frames, span=2.4, ry=0.10):
    """Out-and-back lateral pan with gentle yaw: frame 0 and the last
    frames view the same plane region (w2c poses)."""
    from dpvo_tpu.utils.synthetic import _nse3_exp
    ts = np.linspace(0, 2 * np.pi, n_frames)
    xs = span * (1 - np.cos(ts)) / 2          # 0 -> span -> 0
    yaw = ry * np.sin(ts)
    poses = []
    for x, r in zip(xs, yaw):
        poses.append(_nse3_exp(np.array([-x, 0, 0, 0, r, 0])))
    return np.stack(poses).astype(np.float32)


def run(lc: bool, n_frames: int, noise: float, seed=1):
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.utils.synthetic import PlaneScene
    from test_runtime import HT, WD, make_oracle, small_cfg

    scene = PlaneScene(ht=HT, wd=WD, n_frames=n_frames, depth=4.0, seed=5,
                       poses=loop_trajectory(n_frames))
    kw = dict(BUFFER_SIZE=192, E_MAX=4096, E_INAC_MAX=8192, M_OPT_MAX=1024,
              MAX_EDGE_AGE=96, KEYFRAME_THRESH=0.0,
              GBA_POSES_MAX=256, GBA_DEPTHS_MAX=4096, GBA_EDGES_MAX=16384,
              GBA_KPAIRS_MAX=1 << 18)
    if lc:
        kw.update(LOOP_CLOSURE=True, GLOBAL_OPT_FREQ=10, BACKEND_THRESH=64.0)
    cfg = small_cfg(**kw)

    slam = DPVO(cfg, None, ht=HT, wd=WD, seed=seed)
    base_oracle = make_oracle(scene, cfg)
    rng = np.random.default_rng(seed + 77)

    def noisy_oracle(s, es):
        t, w = base_oracle(s, es)
        t = t + noise * rng.standard_normal(t.shape).astype(np.float32)
        return t, w

    slam.oracle = noisy_oracle
    slam._motion_probe = lambda: 1e9
    for t in range(n_frames):
        slam(t, scene.render(t), scene.intrinsics.copy())
    poses, _ = slam.terminate()

    from dpvo_tpu.eval import ate_rmse
    from dpvo_tpu.lie import se3
    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene.poses[:n_frames])))
    err = ate_rmse(poses[:, :3], gt_c2w[:, :3], align_scale=True)
    return err, slam


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=140)
    p.add_argument("--noise", type=float, default=0.25)
    args = p.parse_args()
    e_off, _ = run(False, args.frames, args.noise)
    print(f"LC off : ATE {e_off:.4f}")
    e_on, s_on = run(True, args.frames, args.noise)
    print(f"LC on  : ATE {e_on:.4f}  (gba rounds: {len(s_on.ran_global_ba)})")
    print(f"ratio on/off = {e_on / max(e_off, 1e-9):.3f}  ({'HELPS' if e_on < e_off else 'HURTS'})")


if __name__ == "__main__":
    main()
