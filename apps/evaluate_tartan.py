"""TartanAir test-split evaluation (MH000-007, ME000-007).

Mirrors the reference evaluate_tartan.py: mono image_left stream at the
fixed TartanAir pinhole (320, 320, 320, 240), groundtruth pose_left.txt
in NED converted with the same axis permutation as
dpvo/data_readers/tartan.py:82, 5-trial median ATE + AVG + AUC.

  python apps/evaluate_tartan.py --datadir datasets/mono --trials 5
"""

import argparse
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TARTAN_INTR = np.array([320.0, 320.0, 320.0, 240.0], np.float32)

TEST_SEQS = [f"MH{i:03d}" for i in range(8)] + [f"ME{i:03d}" for i in range(8)]


def ned_to_xyz(poses_ned):
    """TartanAir NED -> camera xyz (ref data_readers/tartan.py:80-84)."""
    # columns: x y z qx qy qz qw in NED; permute (1, 2, 0)
    perm = [1, 2, 0, 4, 5, 3, 6]
    return poses_ned[:, perm]


def frame_iter(seqdir):
    import cv2

    files = sorted(glob.glob(os.path.join(seqdir, "image_left", "*.png")))
    if not files:
        files = sorted(glob.glob(os.path.join(seqdir, "*.png")))
    for t, f in enumerate(files):
        img = cv2.imread(f)[..., ::-1]  # BGR -> RGB
        h, w = img.shape[:2]
        img = img[: h - h % 16, : w - w % 16]
        yield float(t), np.ascontiguousarray(img), TARTAN_INTR.copy()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default="datasets/mono")
    p.add_argument("--network", default="")
    p.add_argument("--config", default="config/default.yaml")
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--loop_closure", action="store_true")
    p.add_argument("--opts", nargs="+", default=[])
    args = p.parse_args()

    from dpvo_tpu.config import load_config
    from dpvo_tpu.eval.protocol import evaluate_sequences

    overrides = dict(zip(args.opts[0::2], args.opts[1::2]))
    if args.loop_closure:
        overrides["LOOP_CLOSURE"] = True
    cfg = load_config(args.config if os.path.exists(args.config) else None, overrides)

    sequences, gt = {}, {}
    for seq in TEST_SEQS:
        seqdir = os.path.join(args.datadir, seq)
        if not os.path.isdir(seqdir):
            continue
        gt_file = os.path.join(seqdir, "pose_left.txt")
        if os.path.exists(gt_file):
            poses = ned_to_xyz(np.loadtxt(gt_file))
            gt[seq] = (np.arange(len(poses), dtype=np.float64), poses[:, :3])
        sequences[seq] = (lambda d=seqdir: frame_iter(d))

    evaluate_sequences(cfg, args.network or None, sequences, gt,
                       trials=args.trials, max_dt=0.5, title="TartanAir test")


if __name__ == "__main__":
    main()
