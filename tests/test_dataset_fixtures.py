"""Dataset-layout plumbing tests (VERDICT r4 #8): tiny generated
EuRoC / TUM-RGBD / KITTI directory skeletons drive the evaluate_*
parsers — the only code that could otherwise never execute in this
container (no datasets on disk). Mirrors the layouts the reference
readers consume (evaluate_euroc.py, evaluate_tum.py,
evaluate_kitti.py:27-57).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))

cv2 = pytest.importorskip("cv2")

from test_runtime import small_cfg  # noqa: E402


def _frames(rng, n, hw=(128, 160)):
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (hw[0] + 64, hw[1] + 64, 3)).astype(np.uint8),
        (7, 7), 2.0)
    for i in range(n):
        M = np.float32([[1, 0, 3.0 * i], [0, 1, 1.5 * i]])
        yield cv2.warpAffine(base, M, (hw[1], hw[0]))


def test_euroc_layout_and_run(tmp_path):
    import evaluate_euroc as ee

    seq = tmp_path / "MH_01_easy" / "mav0" / "cam0" / "data"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t0 = 1403636579763555584
    for i, img in enumerate(_frames(rng, 6)):
        cv2.imwrite(str(seq / f"{t0 + i * 50_000_000}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2GRAY))
    gt = tmp_path / "gt.txt"
    rows = np.zeros((6, 8))
    rows[:, 0] = (t0 + np.arange(6) * 50_000_000) / 1e9
    rows[:, 1] = np.arange(6) * 0.1
    rows[:, 7] = 1.0
    np.savetxt(gt, rows)

    t, xyz = ee.load_euroc_gt(gt)
    assert t.shape == (6,) and xyz.shape == (6, 3)
    np.testing.assert_allclose(xyz[:, 0], np.arange(6) * 0.1)

    cfg = small_cfg()
    poses, ts = ee.run_sequence(cfg, None, str(seq), stride=1)
    assert poses.shape == (6, 7) and np.all(np.isfinite(poses))
    assert ts[0] == pytest.approx(t0 / 1e9)


def test_tum_layout(tmp_path):
    import evaluate_tum as et

    seq = tmp_path / "rgbd_dataset_freiburg1_desk"
    (seq / "rgb").mkdir(parents=True)
    rng = np.random.default_rng(1)
    lines = ["# color images", "# timestamp filename"]
    for i, img in enumerate(_frames(rng, 5)):
        rel = f"rgb/{1305031452.79 + i * 0.033:.6f}.png"
        cv2.imwrite(str(seq / rel), img[..., ::-1])
        lines.append(f"{1305031452.79 + i * 0.033:.6f} {rel}")
    (seq / "rgb.txt").write_text("\n".join(lines) + "\n")

    frames = list(et.frame_iter(str(seq), stride=1))
    assert len(frames) == 5
    ts, img, intr = frames[0]
    assert ts == pytest.approx(1305031452.79)
    assert img.shape[0] % 16 == 0 and img.shape[1] % 16 == 0
    np.testing.assert_allclose(intr, et.TUM_K)


def test_kitti_layout(tmp_path):
    import evaluate_kitti as ek

    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i, img in enumerate(_frames(rng, 5)):
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2GRAY))
    P0 = "P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0"
    (seq / "calib.txt").write_text(P0 + "\nP1: 1 0 0 0 0 1 0 0 0 0 1 0\n")

    intr = ek.load_calib(str(seq))
    np.testing.assert_allclose(intr, [718.856, 718.856, 607.1928, 185.2157])
    frames = list(ek.frame_iter(str(seq), intr, stride=1))
    assert len(frames) == 5
    t, img, i0 = frames[3]
    assert t == 3.0 and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] % 16 == 0 and img.shape[1] % 16 == 0
