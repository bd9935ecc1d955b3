"""Training augmentation (ref dpvo/data_readers/augmentation.py).

Color jitter / random grayscale / random invert (aug.py:12-17) and
random rescale up to sqrt(2) with center crop + intrinsics adjustment
(aug.py:21-53). NumPy/cv2, applied on the host data path.
"""

from __future__ import annotations

import cv2
import numpy as np


def color_jitter(images: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """images [F,H,W,3] float in [0,255]."""
    out = images
    # brightness / contrast / saturation jitter (ref ColorJitter 0.25/0.4)
    b = rng.uniform(0.75, 1.25)
    c = rng.uniform(0.75, 1.25)
    s = rng.uniform(0.6, 1.4)
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * c + mean * b
    gray = out.mean(-1, keepdims=True)
    out = gray + (out - gray) * s
    if rng.uniform() < 0.1:  # random grayscale
        out = np.repeat(out.mean(-1, keepdims=True), 3, axis=-1)
    if rng.uniform() < 0.1:  # random invert
        out = 255.0 - out
    return np.clip(out, 0, 255)


def random_scale_crop(images, disps, intrinsics, rng, out_hw=None, max_scale=2**0.5):
    """Random rescale + center crop with intrinsics adjustment
    (ref aug.py:21-53). Returns (images, disps, intrinsics)."""
    F, H, W = disps.shape
    out_h, out_w = out_hw or (H, W)
    min_scale = max(out_h / H, out_w / W)
    scale = rng.uniform(min_scale, max(max_scale, min_scale + 1e-3))
    nh, nw = int(round(H * scale)), int(round(W * scale))

    imgs = np.stack([cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR) for im in images])
    dsp = np.stack([cv2.resize(d, (nw, nh), interpolation=cv2.INTER_LINEAR) for d in disps])
    intr = intrinsics * scale

    y0 = (nh - out_h) // 2
    x0 = (nw - out_w) // 2
    imgs = imgs[:, y0 : y0 + out_h, x0 : x0 + out_w]
    dsp = dsp[:, y0 : y0 + out_h, x0 : x0 + out_w]
    intr = intr - np.array([0, 0, x0, y0], intr.dtype)
    return imgs, dsp, intr


def augment_clip(images, disps, intrinsics, rng, out_hw=None):
    images = color_jitter(images, rng)
    return random_scale_crop(images, disps, intrinsics, rng, out_hw=out_hw)
