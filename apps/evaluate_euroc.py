"""EuRoC MAV evaluation — 5-trial ATE protocol.

Mirrors evaluate_euroc.py in the reference: per sequence, run the full
system `trials` times (nondeterministic patch sampling), score ATE-RMSE
with Sim(3) alignment against the groundtruth in
datasets/euroc_groundtruth/<seq>.txt, report per-sequence medians and
the AVG over sequences (the headline number in BASELINE.md).

  python apps/evaluate_euroc.py --eurocdir datasets/EuRoC \
      --network weights.npz --trials 5 [--loop_closure]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SEQUENCES = [
    "MH_01_easy", "MH_02_easy", "MH_03_medium", "MH_04_difficult", "MH_05_difficult",
    "V1_01_easy", "V1_02_medium", "V1_03_difficult",
    "V2_01_easy", "V2_02_medium", "V2_03_difficult",
]

# EuRoC cam0 intrinsics + radtan distortion (sensor.yaml; same values the
# reference hardcodes in calib/euroc.txt)
EUROC_CALIB = np.array([458.654, 457.296, 367.215, 248.375, -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])


def run_sequence(cfg, network, imagedir, stride=2, skip=0):
    import cv2

    from dpvo_tpu.runtime import DPVO

    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = EUROC_CALIB[:4]
    dist = EUROC_CALIB[4:]
    intr = np.array(EUROC_CALIB[:4], np.float32)

    files = sorted(Path(imagedir).glob("*.png"))[skip::stride]
    slam = None
    tstamps = []
    for f in files:
        img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
        img = cv2.undistort(img, K, dist)
        h, w = img.shape[:2]
        img = img[: h - h % 16, : w - w % 16]
        if slam is None:
            slam = DPVO(cfg, network, ht=img.shape[0], wd=img.shape[1])
        t = float(f.stem) / 1e9  # ns timestamps
        slam(t, img, intr.copy())
        tstamps.append(t)
    poses, _ = slam.terminate()
    return poses, np.asarray(tstamps)


def load_euroc_gt(path):
    """state_groundtruth CSV or the repo's whitespace txt: t x y z qw qx qy qz."""
    data = np.loadtxt(path, delimiter=",", skiprows=1) if str(path).endswith(".csv") else np.loadtxt(path)
    t = data[:, 0]
    if t[0] > 1e12:  # ns
        t = t / 1e9
    xyz = data[:, 1:4]
    return t, xyz


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eurocdir", default="datasets/EuRoC")
    parser.add_argument("--gtdir", default=str(Path(__file__).parents[1] / "datasets/euroc_groundtruth"))
    parser.add_argument("--network", default="")
    parser.add_argument("--config", default="config/default.yaml")
    parser.add_argument("--stride", type=int, default=2)
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--loop_closure", action="store_true")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args()

    from dpvo_tpu.config import load_config
    from dpvo_tpu.eval import associate, ate_rmse

    overrides = dict(zip(args.opts[0::2], args.opts[1::2]))
    if args.loop_closure:
        overrides["LOOP_CLOSURE"] = True
    cfg = load_config(args.config if os.path.exists(args.config) else None, overrides)

    results = {}
    for seq in SEQUENCES:
        imagedir = os.path.join(args.eurocdir, seq, "mav0", "cam0", "data")
        gt_path = os.path.join(args.gtdir, f"{seq}.txt")
        if not os.path.isdir(imagedir):
            print(f"skip {seq}: no images at {imagedir}")
            continue
        t_gt, xyz_gt = load_euroc_gt(gt_path)
        errs = []
        for trial in range(args.trials):
            poses, tstamps = run_sequence(cfg, args.network or None, imagedir, args.stride)
            ie, ig = associate(tstamps, t_gt, max_dt=0.02)
            err = ate_rmse(poses[ie, :3], xyz_gt[ig], align_scale=True)
            errs.append(err)
            print(f"{seq} trial {trial}: ATE {err:.6f}")
        results[seq] = float(np.median(errs))
        print(f"{seq}: median ATE {results[seq]:.6f}  (trials: {sorted(errs)})")

    if results:
        avg = float(np.mean(list(results.values())))
        print("\n=== EuRoC results (ATE-RMSE, m; Sim3-aligned) ===")
        for k, v in results.items():
            print(f"{k:20s} {v:.6f}")
        print(f"{'AVG':20s} {avg:.6f}")


if __name__ == "__main__":
    main()
