"""Asynchronous 3-D trajectory / point-cloud viewer.

TPU-native equivalent of the reference DPViewer extension
(DPViewer/dpviewer/viewer.cpp:19-82): the reference runs a Pangolin GL
loop on its own C++ thread with zero-copy CUDA-GL interop; here the
renderer runs in a separate *process* (rendering never blocks the
tracking loop; there is no device-side display path on TPU hosts, so
state snapshots are shipped through a queue instead of shared device
memory).

Backends, best-effort:
  - OpenCV window (``cv2.imshow``) when a display is available:
    live camera image + a top-down (x, z) trajectory/point scatter.
  - Headless: frames are written to ``<outdir>/viewer_%05d.png``.

API mirrors the reference viewer (dpvo/dpvo.py:914-915, :413-414):
    v = Viewer()
    v.update_image(image_bgr)
    v.update_state(poses, points, colors)
    v.join()
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as pyqueue
from typing import Optional

import numpy as np


def _render_topdown(canvas, poses, points, colors):
    """Draw a top-down (x, z) view onto the uint8 canvas."""
    H, W, _ = canvas.shape
    pts = []
    if points is not None and len(points):
        pts.append(points[:, [0, 2]])
    if poses is not None and len(poses):
        pts.append(poses[:, [0, 2]])
    if not pts:
        return canvas
    all_xy = np.concatenate(pts, 0)
    ok = np.isfinite(all_xy).all(axis=1)
    if not ok.any():
        return canvas
    lo = np.percentile(all_xy[ok], 2, axis=0)
    hi = np.percentile(all_xy[ok], 98, axis=0)
    span = np.maximum(hi - lo, 1e-3)
    scale = 0.9 * min(W / span[0], H / span[1])
    org = np.array([W, H]) / 2 - scale * (lo + hi) / 2

    def to_px(xy):
        p = (xy * scale + org).astype(np.int32)
        return np.clip(p[:, 0], 0, W - 1), np.clip(p[:, 1], 0, H - 1)

    if points is not None and len(points):
        px, py = to_px(points[:, [0, 2]])
        c = colors if colors is not None else np.full((len(px), 3), 200, np.uint8)
        canvas[py, px] = c[: len(px)]
    if poses is not None and len(poses):
        px, py = to_px(poses[:, [0, 2]])
        canvas[np.clip(py, 1, H - 2), px] = (0, 255, 0)
        canvas[np.clip(py + 1, 0, H - 1), px] = (0, 255, 0)
    return canvas


def _viewer_loop(q: mp.Queue, outdir: str):
    try:
        import cv2
        have_cv = True
    except Exception:
        have_cv = False
    show = have_cv and bool(os.environ.get("DISPLAY"))
    os.makedirs(outdir, exist_ok=True)

    image = None
    poses = points = colors = None
    idx = 0
    while True:
        try:
            msg = q.get(timeout=0.1)
        except pyqueue.Empty:
            continue
        if msg is None:
            break
        kind, payload = msg
        if kind == "image":
            image = payload
        else:
            poses, points, colors = payload

        canvas = np.zeros((480, 640, 3), np.uint8)
        canvas = _render_topdown(canvas, poses, points, colors)
        if image is not None:
            import numpy as _np
            thumb = image
            h = 160
            w = int(thumb.shape[1] * h / thumb.shape[0])
            if have_cv:
                import cv2
                thumb = cv2.resize(thumb, (w, h))
            else:
                sy = max(thumb.shape[0] // h, 1)
                thumb = thumb[::sy, ::sy][:h, :w]
                h, w = thumb.shape[:2]
            canvas[:h, :w] = thumb[..., :3]
        if show:
            import cv2
            cv2.imshow("dpvo_tpu", canvas)
            cv2.waitKey(1)
        else:
            if have_cv and idx % 10 == 0:
                import cv2
                cv2.imwrite(os.path.join(outdir, f"viewer_{idx:05d}.png"), canvas)
        idx += 1


class Viewer:
    """Non-blocking viewer handle (ref DPViewer/dpviewer/viewer.cpp)."""

    def __init__(self, outdir: str = "viewer_out"):
        ctx = mp.get_context("spawn")
        self.q = ctx.Queue(maxsize=8)
        self.proc = ctx.Process(target=_viewer_loop, args=(self.q, outdir), daemon=True)
        self.proc.start()

    def _put(self, msg):
        try:
            self.q.put_nowait(msg)
        except pyqueue.Full:
            pass  # drop frames rather than stall tracking

    def update_image(self, image: np.ndarray):
        self._put(("image", np.asarray(image)))

    def update_state(self, poses, points=None, colors=None):
        self._put(("state", (np.asarray(poses),
                             None if points is None else np.asarray(points),
                             None if colors is None else np.asarray(colors))))

    def join(self):
        try:
            self.q.put(None, timeout=1.0)
        except Exception:
            pass
        self.proc.join(timeout=5.0)
        if self.proc.is_alive():
            self.proc.terminate()
