"""Network-driven tracking evaluation on held-out synthetic scenes.

The in-environment analog of evaluate_tartan.py (no dataset ships with
this container): renders held-out procedural scenes with known
ground-truth trajectories, runs the REAL network path — motion-probe
init gate included, no oracle — and reports Sim3-aligned ATE per scene.

  python apps/eval_synthetic.py --network checkpoints/run_010000.npz \
      --trials 2 --n_frames 60 [--device cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="", help="npz weights / export dir")
    p.add_argument("--config", default="config/default.yaml")
    p.add_argument("--trials", type=int, default=1)
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--ht", type=int, default=240)
    p.add_argument("--wd", type=int, default=320)
    p.add_argument("--device", default="")
    p.add_argument("--opts", nargs="+", default=[])
    p.add_argument("--tstep", type=float, default=0.05,
                   help="per-frame translation scale; the motion-probe "
                        "init gate needs ~2 quarter-res px of per-frame "
                        "flow, i.e. tstep >~ 10*depth/(0.8*wd)")
    p.add_argument("--rstep", type=float, default=0.004)
    p.add_argument("--depth", type=float, default=6.0)
    args = p.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import jax.numpy as jnp

    from dpvo_tpu.config import load_config
    from dpvo_tpu.eval.ate import ate_rmse
    from dpvo_tpu.lie import se3
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.utils.synthetic import MultiPlaneScene, PlaneScene

    overrides = dict(zip(args.opts[0::2], args.opts[1::2]))
    if args.device == "cpu":
        overrides.setdefault("MIXED_PRECISION", False)
    cfg = load_config(args.config if os.path.exists(args.config) else None, overrides)

    results = {}
    # held-out seeds: the training stream draws from seeded generators
    # far from 5000+ (data/factory.py SyntheticClipDataset)
    for s in range(args.scenes):
        seed = 5000 + 17 * s
        cls = MultiPlaneScene if s % 2 else PlaneScene
        scene = cls(ht=args.ht, wd=args.wd, n_frames=args.n_frames,
                    depth=args.depth, seed=seed, tstep=args.tstep,
                    rstep=args.rstep)
        gt_c2w = np.asarray(se3.inv(jnp.asarray(scene.poses)))
        motion = float(np.linalg.norm(np.diff(gt_c2w[:, :3], axis=0), axis=1).sum())

        errs = []
        inits = []
        for trial in range(args.trials):
            slam = DPVO(cfg, args.network or None, ht=args.ht, wd=args.wd,
                        seed=trial)
            for t in range(args.n_frames):
                slam(t, scene.render(t), scene.intrinsics.copy())
            poses, tstamps = slam.terminate()
            err = ate_rmse(poses[:, :3], gt_c2w[:, :3], align_scale=True)
            errs.append(float(err))
            inits.append(bool(slam.is_initialized))
            print(f"scene {s} ({cls.__name__}, seed {seed}) trial {trial}: "
                  f"ATE {err:.4f} (path {motion:.2f} m, "
                  f"initialized={slam.is_initialized})", flush=True)
        results[f"scene{s}"] = dict(
            ate=float(np.median(errs)), path=motion,
            rel=float(np.median(errs)) / max(motion, 1e-9),
            initialized=all(inits),
        )

    rels = [v["rel"] for v in results.values()]
    ok = all(v["initialized"] for v in results.values())
    print("\n=== held-out synthetic ATE (Sim3-aligned, m) ===")
    for k, v in results.items():
        print(f"{k:10s} ATE {v['ate']:.4f}  path {v['path']:.2f}  "
              f"rel {100 * v['rel']:.1f}%  init {v['initialized']}")
    print(json.dumps({
        "metric": "synthetic_ate_rel",
        "value": round(float(np.median(rels)), 4),
        "unit": "ATE/path-length",
        "all_initialized": ok,
    }))


if __name__ == "__main__":
    main()
    os._exit(0)
