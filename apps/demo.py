"""Live VO demo on an image directory or video.

Mirrors the reference CLI (demo.py:106-121) including FPS and peak
device-memory reporting (demo.py:27-85).

  python apps/demo.py --imagedir data/frames --calib calib/iphone.txt \
      --network weights.npz --config config/default.yaml \
      --save_trajectory --plot --save_ply --save_colmap --opts KEY VAL
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imagedir", type=str, required=True, help="image dir or video path")
    parser.add_argument("--calib", type=str, required=True)
    parser.add_argument("--network", type=str, default="")
    parser.add_argument("--config", type=str, default="config/default.yaml")
    parser.add_argument("--stride", type=int, default=2)
    parser.add_argument("--skip", type=int, default=0)
    parser.add_argument("--buffer", type=int, default=2048)
    parser.add_argument("--viz", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--save_ply", action="store_true")
    parser.add_argument("--save_colmap", action="store_true")
    parser.add_argument("--save_trajectory", action="store_true")
    parser.add_argument("--name", type=str, default="result")
    parser.add_argument("--opts", nargs="+", default=[])
    parser.add_argument("--device", type=str, default="",
                        help="jax platform override (e.g. 'cpu'); on this "
                             "platform env JAX_PLATFORMS is ignored, only a "
                             "pre-init config update switches backends")
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    from dpvo_tpu.config import load_config
    from dpvo_tpu.data.stream import spawn_reader
    from dpvo_tpu.eval.export import plot_trajectory, save_colmap, save_ply, save_trajectory_tum
    from dpvo_tpu.runtime import DPVO

    overrides = dict(zip(args.opts[0::2], args.opts[1::2]))
    overrides.setdefault("BUFFER_SIZE", args.buffer)
    if args.device == "cpu":
        # the XLA CPU backend has no bf16 dot thunk
        overrides.setdefault("MIXED_PRECISION", False)
    cfg = load_config(args.config if os.path.exists(args.config) else None, overrides)

    queue, proc = spawn_reader(args.imagedir, args.calib, args.stride, args.skip)

    slam = None
    n_frames = 0
    t_start = None
    while True:
        t, image, intrinsics = queue.get()
        if t < 0:
            break
        if slam is None:
            ht, wd = image.shape[:2]
            slam = DPVO(cfg, args.network or None, ht=ht, wd=wd, viz=args.viz)
        if t_start is None and n_frames == 10:
            t_start = time.perf_counter()  # skip compile warmup
        slam(t, image, intrinsics)
        n_frames += 1

    proc.join()
    if t_start is not None:
        fps = (n_frames - 10) / (time.perf_counter() - t_start)
        print(f"average FPS (post-warmup): {fps:.2f}")
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0) / 2**20
        print(f"peak device memory: {peak:.1f} MiB")
    except Exception:
        pass

    poses, tstamps = slam.terminate()

    os.makedirs("saved_trajectories", exist_ok=True)
    if args.save_trajectory:
        save_trajectory_tum(f"saved_trajectories/{args.name}.txt", poses, tstamps)
    if args.plot:
        plot_trajectory(f"trajectory_plots/{args.name}.pdf", poses, title=args.name)
    if args.save_ply or args.save_colmap:
        pts, clr = slam.point_cloud()
        if args.save_ply:
            save_ply(f"{args.name}.ply", pts, clr)
        if args.save_colmap:
            save_colmap(
                f"colmap_saves/{args.name}", slam.poses_np(), np.asarray(slam.state.intrinsics[0]) * 4,
                pts, clr, slam.ht, slam.wd,
            )
    print(f"tracked {n_frames} frames -> {len(poses)} poses")


if __name__ == "__main__":
    main()
