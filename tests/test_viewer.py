"""Viewer rendering: the 3-D software projector and the process loop
(ref DPViewer/dpviewer/viewer.cpp renderloop)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dpvo_tpu.apps.viewer import Viewer, _render_3d, _render_topdown


def _synthetic_state(n=20, m=400, seed=0):
    rng = np.random.default_rng(seed)
    # forward-moving camera (w2c: t = -R c with identity R)
    centers = np.stack([0.1 * np.arange(n), np.zeros(n), 0.05 * np.arange(n)], 1)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (n, 1))
    poses[:, :3] = -centers
    points = centers[-1] + rng.normal(size=(m, 3)) * [1.0, 0.5, 1.5] + [0, 0, 2.0]
    colors = rng.integers(0, 255, (m, 3)).astype(np.uint8)
    return poses.astype(np.float32), points.astype(np.float32), colors


def test_render_3d_draws_scene():
    poses, points, colors = _synthetic_state()
    canvas = _render_3d(np.zeros((480, 640, 3), np.uint8), poses, points, colors)
    # points, trajectory (green) and frusta (orange/blue) all land pixels
    assert (canvas > 0).any(axis=2).sum() > 300
    g = (canvas[:, :, 1] > 200) & (canvas[:, :, 0] < 50)
    assert g.sum() > 10, "trajectory polyline missing"


def test_render_3d_handles_degenerate_input():
    one = np.array([[0, 0, 0, 0, 0, 0, 1.0]], np.float32)
    canvas = _render_3d(np.zeros((120, 160, 3), np.uint8), one, None, None)
    assert canvas.shape == (120, 160, 3)
    bad = np.full((3, 7), np.nan, np.float32)
    canvas = _render_3d(np.zeros((120, 160, 3), np.uint8), bad, None, None)
    assert np.isfinite(canvas).all()


def test_viewer_process_roundtrip(tmp_path):
    poses, points, colors = _synthetic_state()
    v = Viewer(outdir=str(tmp_path))
    img = np.zeros((48, 64, 3), np.uint8)
    for k in range(12):
        v.update_image(img)
        v.update_state(poses[: k + 2], points, colors)
    v.join()
    assert not v.proc.is_alive()
