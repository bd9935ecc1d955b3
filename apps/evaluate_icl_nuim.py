"""ICL-NUIM evaluation (8 sequences, living room + office).

Mirrors the reference evaluate_icl_nuim.py: fixed ICL pinhole
(481.20, 480.0, 319.5, 239.5), TUM-format groundtruth, 5-trial median
ATE + AVG.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ICL_INTR = np.array([481.20, 480.0, 319.5, 239.5], np.float32)

SEQS = [
    "living_room_traj0_frei_png", "living_room_traj1_frei_png",
    "living_room_traj2_frei_png", "living_room_traj3_frei_png",
    "traj0_frei_png", "traj1_frei_png", "traj2_frei_png", "traj3_frei_png",
]


def frame_iter(seqdir, stride=1):
    import cv2

    files = sorted(glob.glob(os.path.join(seqdir, "rgb", "*.png")),
                   key=lambda f: int(os.path.splitext(os.path.basename(f))[0]))[::stride]
    for f in files:
        t = float(int(os.path.splitext(os.path.basename(f))[0]))
        img = cv2.imread(f)[..., ::-1]
        h, w = img.shape[:2]
        img = np.ascontiguousarray(img[: h - h % 16, : w - w % 16])
        yield t, img, ICL_INTR.copy()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default="datasets/ICL-NUIM")
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
                       trials=args.trials, max_dt=0.5, title="ICL-NUIM")


if __name__ == "__main__":
    main()
