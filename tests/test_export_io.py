"""Trajectory/point-cloud export + frame stream I/O.

Covers dpvo_tpu/eval/export.py (ref dpvo/plot_utils.py) and
dpvo_tpu/data/stream.py (ref dpvo/stream.py).
"""

import numpy as np
import pytest

from dpvo_tpu.eval.export import save_colmap, save_ply, save_trajectory_tum



import pytest

pytestmark = pytest.mark.smoke

def _poses(n=5):
    rng = np.random.default_rng(0)
    p = np.zeros((n, 7), np.float32)
    p[:, :3] = rng.normal(size=(n, 3))
    q = rng.normal(size=(n, 4))
    p[:, 3:] = q / np.linalg.norm(q, axis=1, keepdims=True)
    return p


def test_save_trajectory_tum_roundtrip(tmp_path):
    poses = _poses()
    ts = np.arange(5, dtype=np.float64) * 0.1
    f = tmp_path / "traj.txt"
    save_trajectory_tum(str(f), poses, ts)
    back = np.loadtxt(f)
    assert back.shape == (5, 8)
    np.testing.assert_allclose(back[:, 0], ts)
    np.testing.assert_allclose(back[:, 1:], poses, atol=1e-6)


def test_save_ply_filters_nonfinite(tmp_path):
    pts = np.array([[0, 0, 1], [np.nan, 0, 0], [1, 2, 3], [1e9, 0, 0]], np.float32)
    clr = np.full((4, 3), 128, np.uint8)
    f = tmp_path / "cloud.ply"
    save_ply(str(f), pts, clr)
    txt = f.read_text()
    assert "element vertex 2" in txt  # NaN + out-of-range rows dropped
    assert txt.count("128 128 128") == 2


def test_save_colmap_model(tmp_path):
    poses = _poses(3)
    intr = np.array([100.0, 100.0, 60.0, 40.0], np.float32)
    pts = np.random.default_rng(1).normal(size=(10, 3)).astype(np.float32)
    clr = np.full((10, 3), 200, np.uint8)
    save_colmap(str(tmp_path / "colmap"), poses, intr, pts, clr, ht=80, wd=120)
    for name in ("cameras.txt", "images.txt", "points3D.txt"):
        assert (tmp_path / "colmap" / name).exists(), name
    cams = (tmp_path / "colmap" / "cameras.txt").read_text()
    assert "PINHOLE" in cams and "120 80" in cams


def test_stream_reader_process(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from dpvo_tpu.data.stream import iter_images, load_calib

    for i in range(3):
        img = np.full((70, 90, 3), i * 40, np.uint8)
        cv2.imwrite(str(tmp_path / f"{i:03d}.png"), img)
    calib = tmp_path / "calib.txt"
    calib.write_text("50.0 50.0 45.0 35.0\n")

    K, dist = load_calib(str(calib))
    assert K[0, 0] == 50.0 and dist is None

    out = list(iter_images(str(tmp_path), str(calib)))
    assert len(out) == 3
    t, img, intr = out[1]
    assert t == 1
    assert img.shape == (64, 80, 3)  # cropped to %16
    assert img[0, 0, 0] == 40
    np.testing.assert_allclose(intr, [50, 50, 45, 35])
