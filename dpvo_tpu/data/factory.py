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

    def __init__(self, n_frames=8, ht=128, wd=160, seed=0,
                 flow_t=(2.0, 28.0), flow_r=(0.5, 8.0)):
        self.n_frames = n_frames
        self.ht, self.wd = ht, wd
        self.rng = np.random.default_rng(seed)
        # target per-frame optical-flow ranges in px at (ht, wd); see
        # sample(). Narrow these for curriculum runs (e.g. a band just
        # above the motion-probe gate when training tiny fixtures).
        self.flow_t = flow_t
        self.flow_r = flow_r

    def sample(self):
        from dpvo_tpu.utils.synthetic import MultiPlaneScene

        seed = int(self.rng.integers(1 << 30))
        # flow-targeted motion: the reference samples clips whose
        # inter-frame optical flow lies in [fmin=10, fmax=75] px
        # (base.py:84-169); here we draw a target per-frame full-res
        # flow in px and derive the twist scales from it, so training
        # covers the motion-probe gate (~8 full-res px, dpvo.py:221)
        # and keyframe-thresh regimes at ANY training resolution.
        depth = float(self.rng.uniform(5.0, 12.0))
        fx = 0.8 * self.wd
        flow_t = float(self.rng.uniform(*self.flow_t))  # translational px/frame
        flow_r = float(self.rng.uniform(*self.flow_r))  # rotational px/frame
        scene = MultiPlaneScene(
            ht=self.ht, wd=self.wd, n_frames=self.n_frames,
            depth=depth, seed=seed,
            # the scene's momentum random walk (vel = .9 vel + N(0, step))
            # amplifies realized flow ~3x over the naive step->flow map
            tstep=flow_t * depth / fx / 3.0,
            rstep=flow_r / fx / 3.0,
        )
        images = np.stack([scene.render(t) for t in range(self.n_frames)]).astype(np.float32)
        ys, xs = np.mgrid[0 : self.ht, 0 : self.wd]
        disps = np.stack(
            [scene.inv_depth(t, xs.astype(np.float64), ys.astype(np.float64)) for t in range(self.n_frames)]
        ).astype(np.float32)
        return images, scene.poses.copy(), disps, scene.intrinsics.copy()


def dataset_factory(names, datapath="datasets/TartanAir", n_frames=15, ht=None, wd=None, seed=0,
                    **synth_kw):
    if "tartan" in names:
        from dpvo_tpu.data.tartan import TartanAirDataset

        ds = TartanAirDataset(datapath, n_frames=n_frames, seed=seed)
        if ds.scenes:
            return ds
        print(f"warning: no TartanAir scenes under {datapath}; using synthetic clips")
    return SyntheticClipDataset(n_frames=n_frames, ht=ht or 128, wd=wd or 160, seed=seed,
                                **synth_kw)


def batch_iterator(dataset, batch_size: int = 1, augment: bool = True, seed: int = 0,
                   prefetch: int = 2, reservoir: int = 0) -> Iterator[dict]:
    """Background-threaded batcher yielding jnp-ready dicts.

    reservoir > 0 decouples the accelerator step rate from clip
    production on weak hosts (this container has ONE core; a clip costs
    ~1.2 s to render+augment): a producer thread continuously refreshes
    a pool of the newest `reservoir` clips and batches sample from it
    with replacement, so a fast consumer re-sees recent clips instead of
    stalling (the reference leans on torch DataLoader worker fan-out
    instead, factory.py + train.py num_workers)."""
    rng = np.random.default_rng(seed)

    def make_clip():
        from dpvo_tpu.data.augmentation import augment_clip

        im, po, ds, it = dataset.sample()
        if augment:
            im, ds, it = augment_clip(im, ds, it, rng, out_hw=ds.shape[1:3])
        return (np.clip(im, 0, 255).astype(np.uint8), po.astype(np.float32),
                ds.astype(np.float16), it.astype(np.float32))

    # compact dtypes throughout: the feed path may cross a slow
    # host->device link (axon tunnel ~25 MB/s); images are uint8-range
    # and disps tolerate f16 — vo_forward casts on device
    def pack(clips):
        return {
            "images": np.stack([c[0] for c in clips]),
            "poses": np.stack([c[1] for c in clips]),
            "disps": np.stack([c[2] for c in clips]),
            "intrinsics": np.stack([c[3] for c in clips]),
        }

    if reservoir > 0:
        import collections

        pool = collections.deque(maxlen=reservoir)
        lock = threading.Lock()
        warm = threading.Event()

        def refresh():
            while True:
                c = make_clip()
                with lock:
                    pool.append(c)
                    if len(pool) >= min(4, reservoir):
                        warm.set()

        threading.Thread(target=refresh, daemon=True).start()
        warm.wait()
        while True:
            with lock:
                picks = [pool[rng.integers(len(pool))] for _ in range(batch_size)]
            yield pack(picks)
        return

    q: _queue.Queue = _queue.Queue(maxsize=prefetch)

    def produce():
        while True:
            q.put(pack([make_clip() for _ in range(batch_size)]))

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        yield q.get()
