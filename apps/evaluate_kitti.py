"""KITTI odometry evaluation.

Mirrors the reference evaluate_kitti.py: left grayscale stream
(image_0), per-sequence calib.txt P0 parse (evaluate_kitti.py:27-57),
groundtruth poses/<seq>.txt (KITTI 3x4 row-major), 5-trial median ATE.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SEQS = [f"{i:02d}" for i in range(11)]


def load_calib(seqdir):
    for line in open(os.path.join(seqdir, "calib.txt")):
        if line.startswith("P0:"):
            P = np.fromstring(line[3:], sep=" ").reshape(3, 4)
            return np.array([P[0, 0], P[1, 1], P[0, 2], P[1, 2]], np.float32)
    raise RuntimeError("no P0 in calib.txt")


def frame_iter(seqdir, intr, stride=1):
    import cv2

    files = sorted(glob.glob(os.path.join(seqdir, "image_0", "*.png")))[::stride]
    for t, f in enumerate(files):
        img = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
        h, w = img.shape[:2]
        img = img[: h - h % 16, : w - w % 16]
        yield float(t * stride), img, intr.copy()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default="datasets/kitti/sequences")
    p.add_argument("--gtdir", default="datasets/kitti/poses")
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
        intr = load_calib(seqdir)
        gt_file = os.path.join(args.gtdir, f"{seq}.txt")
        if os.path.exists(gt_file):
            P = np.loadtxt(gt_file).reshape(-1, 3, 4)
            t = np.arange(0, len(P) * 1.0, args.stride, dtype=np.float64)[: len(P)]
            gt[seq] = (np.arange(len(P), dtype=np.float64), P[:, :, 3])
        sequences[seq] = (lambda d=seqdir, k=intr: frame_iter(d, k, args.stride))

    evaluate_sequences(cfg, args.network or None, sequences, gt,
                       trials=args.trials, max_dt=0.5, title="KITTI odometry")


if __name__ == "__main__":
    main()
