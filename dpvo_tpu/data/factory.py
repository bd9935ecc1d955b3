"""Dataset factory + batching (ref dpvo/data_readers/factory.py).

Provides a background-process loader that yields ready batches, keeping
decode/augment off the accelerator feed path (the reference uses torch
DataLoader workers; here a spawn'd producer with a queue).
"""

from __future__ import annotations

import queue as _queue
import threading
from typing import Iterator

import numpy as np


class SyntheticClipDataset:
    """Procedural clips (textured-plane scenes) for smoke training and
    environments without TartanAir on disk."""

    def __init__(self, n_frames=8, ht=128, wd=160, seed=0):
        self.n_frames = n_frames
        self.ht, self.wd = ht, wd
        self.rng = np.random.default_rng(seed)

    def sample(self):
        from dpvo_tpu.utils.synthetic import MultiPlaneScene

        seed = int(self.rng.integers(1 << 30))
        # randomized motion magnitude stands in for the reference's
        # flow-bounded covisibility sampling (base.py:84-169 fmin/fmax)
        scene = MultiPlaneScene(
            ht=self.ht, wd=self.wd, n_frames=self.n_frames,
            depth=float(self.rng.uniform(5.0, 12.0)), seed=seed,
            tstep=float(self.rng.uniform(0.025, 0.09)),
            rstep=float(self.rng.uniform(0.002, 0.01)),
        )
        images = np.stack([scene.render(t) for t in range(self.n_frames)]).astype(np.float32)
        ys, xs = np.mgrid[0 : self.ht, 0 : self.wd]
        disps = np.stack(
            [scene.inv_depth(t, xs.astype(np.float64), ys.astype(np.float64)) for t in range(self.n_frames)]
        ).astype(np.float32)
        return images, scene.poses.copy(), disps, scene.intrinsics.copy()


def dataset_factory(names, datapath="datasets/TartanAir", n_frames=15, ht=None, wd=None, seed=0):
    if "tartan" in names:
        from dpvo_tpu.data.tartan import TartanAirDataset

        ds = TartanAirDataset(datapath, n_frames=n_frames, seed=seed)
        if ds.scenes:
            return ds
        print(f"warning: no TartanAir scenes under {datapath}; using synthetic clips")
    return SyntheticClipDataset(n_frames=n_frames, ht=ht or 128, wd=wd or 160, seed=seed)


def batch_iterator(dataset, batch_size: int = 1, augment: bool = True, seed: int = 0,
                   prefetch: int = 2) -> Iterator[dict]:
    """Background-threaded batcher yielding jnp-ready dicts."""
    rng = np.random.default_rng(seed)
    q: _queue.Queue = _queue.Queue(maxsize=prefetch)

    def produce():
        from dpvo_tpu.data.augmentation import augment_clip

        while True:
            imgs, poses, disps, intrs = [], [], [], []
            for _ in range(batch_size):
                im, po, ds, it = dataset.sample()
                if augment:
                    im, ds, it = augment_clip(im, ds, it, rng, out_hw=ds.shape[1:3])
                imgs.append(im)
                poses.append(po)
                disps.append(ds)
                intrs.append(it)
            # compact dtypes: the feed path may cross a slow host->device
            # link (axon tunnel ~25 MB/s); images are uint8-range and
            # disps tolerate f16 — vo_forward casts on device
            q.put({
                "images": np.clip(np.stack(imgs), 0, 255).astype(np.uint8),
                "poses": np.stack(poses).astype(np.float32),
                "disps": np.stack(disps).astype(np.float16),
                "intrinsics": np.stack(intrs).astype(np.float32),
            })

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        yield q.get()
