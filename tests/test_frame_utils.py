"""Round-trip tests for the flow/depth file readers (ref
data_readers/frame_utils.py)."""

import numpy as np

from dpvo_tpu.data import frame_utils as fu



import pytest

pytestmark = pytest.mark.smoke

def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.standard_normal((24, 32, 2)).astype(np.float32)
    fn = str(tmp_path / "a.flo")
    fu.writeFlow(fn, flow)
    back = fu.readFlow(fn)
    np.testing.assert_array_equal(back, flow)
    # read_gen dispatch
    np.testing.assert_array_equal(fu.read_gen(fn), flow)


def test_pfm_read(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((10, 14)).astype("<f4")
    fn = tmp_path / "d.pfm"
    with open(fn, "wb") as f:
        f.write(b"Pf\n14 10\n-1.0\n")
        np.flipud(img).astype("<f4").tofile(f)
    back = fu.readPFM(str(fn))
    np.testing.assert_allclose(back, img)


def test_dpt_and_cam(tmp_path):
    rng = np.random.default_rng(2)
    depth = rng.uniform(0.1, 10.0, (12, 16)).astype(np.float32)
    fn = str(tmp_path / "z.dpt")
    with open(fn, "wb") as f:
        np.array([202021.25], np.float32).tofile(f)
        np.array([16, 12], np.int32).tofile(f)
        depth.tofile(f)
    np.testing.assert_array_equal(fu.readDPT(fn), depth)

    M = np.diag([320.0, 320.0, 1.0])
    N = np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])])
    cn = str(tmp_path / "c.cam")
    with open(cn, "wb") as f:
        np.array([202021.25], np.float32).tofile(f)
        M.astype(np.float64).tofile(f)
        N.astype(np.float64).tofile(f)
    M2, N2 = fu.cam_read(cn)
    np.testing.assert_array_equal(M2, M)
    np.testing.assert_array_equal(N2, N)


def test_kitti_flow_roundtrip(tmp_path):
    import cv2

    rng = np.random.default_rng(3)
    flow = rng.uniform(-100, 100, (8, 10, 2)).astype(np.float32)
    valid = (rng.uniform(size=(8, 10)) > 0.3).astype(np.uint16)
    enc = np.zeros((8, 10, 3), np.uint16)
    enc[..., 2] = np.clip(flow[..., 0] * 64 + 2**15, 0, 65535)  # BGR: u in R
    enc[..., 1] = np.clip(flow[..., 1] * 64 + 2**15, 0, 65535)
    enc[..., 0] = valid
    fn = str(tmp_path / "k.png")
    cv2.imwrite(fn, enc)
    back, v = fu.readFlowKITTI(fn)
    np.testing.assert_allclose(back, np.round(flow * 64) / 64, atol=1 / 64)
    np.testing.assert_array_equal(v, valid)
