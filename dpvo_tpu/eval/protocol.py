"""Shared evaluation protocol: N-trial median ATE per sequence + AVG/AUC.

Mirrors the reference evaluation scripts' common skeleton
(evaluate_tartan.py:47-146, evaluate_euroc.py, evaluate_tum.py, ...):
run the full system `trials` times per sequence (patch sampling is
stochastic), score ATE-RMSE with Sim(3) alignment, report the
per-sequence median, the mean over sequences ("AVG"), and TartanAir's
AUC (evaluate_tartan.py:131-146).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

from dpvo_tpu.eval.ate import associate, ate_rmse


def run_stream(cfg, network, frames: Iterable[Tuple[float, np.ndarray, np.ndarray]],
               viz: bool = False):
    """Track a (t, image, intrinsics) iterable; returns (poses, tstamps)."""
    from dpvo_tpu.runtime import DPVO

    slam = None
    for t, image, intrinsics in frames:
        if slam is None:
            slam = DPVO(cfg, network, ht=image.shape[0], wd=image.shape[1], viz=viz)
        slam(t, image, intrinsics)
    if slam is None:
        raise RuntimeError("empty stream")
    return slam.terminate()


def evaluate_sequences(
    cfg,
    network,
    sequences: Dict[str, Callable[[], Iterable]],
    gt: Dict[str, Tuple[np.ndarray, np.ndarray]],
    trials: int = 5,
    max_dt: float = 0.1,
    title: str = "results",
):
    """sequences: name -> frame-iterable factory; gt: name -> (t, xyz)."""
    results = {}
    all_trials = []
    for seq, factory in sequences.items():
        if seq not in gt:
            print(f"skip {seq}: no groundtruth")
            continue
        t_gt, xyz_gt = gt[seq]
        errs = []
        for trial in range(trials):
            poses, tstamps = run_stream(cfg, network, factory())
            ie, ig = associate(tstamps, t_gt, max_dt=max_dt)
            err = ate_rmse(poses[ie, :3], xyz_gt[ig], align_scale=True)
            errs.append(float(err))
            print(f"{seq} trial {trial}: ATE {err:.6f}", flush=True)
        results[seq] = float(np.median(errs))
        all_trials.extend(errs)
        print(f"{seq}: median ATE {results[seq]:.6f}  (trials: {sorted(errs)})")

    if results:
        vals = np.array(list(results.values()))
        avg = float(vals.mean())
        # AUC exactly as the reference (evaluate_tartan.py:137-146):
        # mean over every trial of max(1 - ATE, 0)
        auc = float(np.maximum(1.0 - np.array(all_trials), 0.0).mean())
        print(f"\n=== {title} (ATE-RMSE, m; Sim3-aligned) ===")
        for k, v in results.items():
            print(f"{k:24s} {v:.6f}")
        print(f"{'AVG':24s} {avg:.6f}")
        print(f"{'AUC':24s} {auc:.6f}")
    return results
