"""TUM-RGBD freiburg1 evaluation (9 sequences).

Mirrors the reference evaluate_tum.py: hardcoded fr1 intrinsics +
radtan distortion (evaluate_tum.py:30-33), rgb.txt timestamped stream,
groundtruth.txt (t x y z qx qy qz qw), 5-trial median ATE + AVG.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# fr1 (Freiburg 1) calibration as hardcoded by the reference
TUM_K = np.array([517.3, 516.5, 318.6, 255.3], np.float32)
TUM_DIST = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])

SEQS = [
    "rgbd_dataset_freiburg1_360", "rgbd_dataset_freiburg1_desk",
    "rgbd_dataset_freiburg1_desk2", "rgbd_dataset_freiburg1_floor",
    "rgbd_dataset_freiburg1_plant", "rgbd_dataset_freiburg1_room",
    "rgbd_dataset_freiburg1_rpy", "rgbd_dataset_freiburg1_teddy",
    "rgbd_dataset_freiburg1_xyz",
]


def frame_iter(seqdir, stride=1):
    import cv2

    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = TUM_K
    rgb_list = os.path.join(seqdir, "rgb.txt")
    rows = [l.split() for l in open(rgb_list) if not l.startswith("#")]
    for ts, rel in rows[::stride]:
        img = cv2.imread(os.path.join(seqdir, rel))[..., ::-1]
        img = cv2.undistort(np.ascontiguousarray(img), K, TUM_DIST)
        h, w = img.shape[:2]
        img = img[: h - h % 16, : w - w % 16]
        yield float(ts), img, TUM_K.copy()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default="datasets/TUM-RGBD")
    p.add_argument("--network", default="")
    p.add_argument("--config", default="config/default.yaml")
    p.add_argument("--stride", type=int, default=1)
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
    for seq in SEQS:
        seqdir = os.path.join(args.datadir, seq)
        if not os.path.isdir(seqdir):
            continue
        gt_file = os.path.join(seqdir, "groundtruth.txt")
        if os.path.exists(gt_file):
            data = np.loadtxt(gt_file)
            gt[seq] = (data[:, 0], data[:, 1:4])
        sequences[seq] = (lambda d=seqdir: frame_iter(d, args.stride))

    evaluate_sequences(cfg, args.network or None, sequences, gt,
                       trials=args.trials, max_dt=0.05, title="TUM-RGBD fr1")


if __name__ == "__main__":
    main()
