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
    live camera image + a software-rendered 3-D view (follow camera,
    z-sorted point splats, keyframe frusta, trajectory polyline) with
    a top-down (x, z) inset.
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


def _centers_c2w(poses_w2c: np.ndarray):
    """w2c (t, q) poses -> camera centers + c2w rotation matrices."""
    from dpvo_tpu.utils import npse3

    g = npse3.inv(np.asarray(poses_w2c, np.float64))
    return g[:, :3], npse3.quat_rotmat(g[:, 3:7])


def _render_3d(canvas, poses, points, colors, point_px: int = 1):
    """Software-rendered perspective view: a follow camera sits behind
    and above the newest pose, looking along the smoothed trajectory
    (the same shot as the reference's Pangolin follow mode,
    DPViewer/dpviewer/viewer.cpp renderloop). Pure NumPy projection +
    z-ordered splats; cv2 only draws lines."""
    import cv2

    H, W, _ = canvas.shape
    if poses is None or len(poses) == 0:
        return canvas
    ctr, rots = _centers_c2w(poses)
    ok = np.isfinite(ctr).all(axis=1)
    if not ok.any():
        return canvas
    ctr = ctr[ok]
    rots = rots[ok]

    # scene scale from the trajectory + cloud spread
    ref_pts = ctr if points is None or not len(points) else np.concatenate(
        [ctr, points[np.isfinite(points).all(axis=1)]], 0)
    scale = max(float(np.percentile(
        np.linalg.norm(ref_pts - ctr[-1], axis=1), 90)), 1e-3)

    # follow camera: behind (-z of newest cam) and above, looking at it
    fwd = rots[-1][:, 2]  # newest camera's viewing direction (c2w z)
    up_w = np.array([0.0, -1.0, 0.0])  # image y points down in cam frame
    eye = ctr[-1] - 1.8 * scale * fwd + 0.9 * scale * up_w
    look = ctr[-1] + 0.4 * scale * fwd
    z = look - eye
    z /= np.linalg.norm(z) + 1e-12
    x = np.cross(z, up_w)
    x /= np.linalg.norm(x) + 1e-12
    y = np.cross(z, x)
    Rv = np.stack([x, y, z])  # world -> view rows

    f = 0.9 * min(H, W)
    cx, cy = W / 2, H / 2

    def project(Xw):
        Xc = (Xw - eye) @ Rv.T
        zc = Xc[:, 2]
        vis = zc > 1e-3 * scale
        zs = np.where(vis, zc, 1.0)
        u = f * Xc[:, 0] / zs + cx
        v = f * Xc[:, 1] / zs + cy
        inb = vis & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        return u, v, zc, inb

    # points: z-sorted far-to-near so near splats overwrite far ones
    if points is not None and len(points):
        P = points[np.isfinite(points).all(axis=1)]
        C = (colors[np.isfinite(points).all(axis=1)]
             if colors is not None and len(colors) == len(points)
             else np.full((len(P), 3), 200, np.uint8))
        u, v, zc, inb = project(P)
        order = np.argsort(-zc[inb])
        ui = u[inb].astype(np.int32)[order]
        vi = v[inb].astype(np.int32)[order]
        ci = C[inb][order]
        for d in range(point_px):
            canvas[np.clip(vi + d, 0, H - 1), ui] = ci
            canvas[vi, np.clip(ui + d, 0, W - 1)] = ci

    # trajectory polyline
    u, v, zc, inb = project(ctr)
    pts2d = np.stack([u, v], 1).astype(np.int32)
    for a in range(len(ctr) - 1):
        if inb[a] and inb[a + 1]:
            cv2.line(canvas, tuple(pts2d[a]), tuple(pts2d[a + 1]),
                     (0, 255, 0), 1, cv2.LINE_AA)

    # keyframe frusta (every Nth + the newest, ref draws all)
    step = max(len(ctr) // 12, 1)
    w_half, h_half, depth = 0.10 * scale, 0.075 * scale, 0.16 * scale
    corners_c = np.array([
        [0, 0, 0],
        [-w_half, -h_half, depth], [w_half, -h_half, depth],
        [w_half, h_half, depth], [-w_half, h_half, depth],
    ])
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    for i in list(range(0, len(ctr), step)) + [len(ctr) - 1]:
        col = (0, 160, 255) if i == len(ctr) - 1 else (180, 120, 0)
        Xw = ctr[i] + corners_c @ rots[i].T
        u, v, zc, inb = project(Xw)
        p2 = np.stack([u, v], 1).astype(np.int32)
        for a, b in edges:
            if inb[a] and inb[b]:
                cv2.line(canvas, tuple(p2[a]), tuple(p2[b]), col, 1, cv2.LINE_AA)
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
        if have_cv and poses is not None and len(poses):
            try:
                canvas = _render_3d(canvas, poses, points, colors)
            except Exception:
                canvas = _render_topdown(canvas, poses, points, colors)
            # top-down inset, lower-right quadrant
            inset = _render_topdown(np.zeros((160, 212, 3), np.uint8),
                                    poses, points, colors)
            canvas[-160:, -212:] = np.maximum(canvas[-160:, -212:] // 3, inset)
        else:
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
            self.proc.join(timeout=2.0)
