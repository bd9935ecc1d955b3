"""TUM loader + pose-distance helpers (ref data_readers/rgbd_utils.py)."""

import numpy as np

from dpvo_tpu.data import rgbd_utils as ru



import pytest

pytestmark = pytest.mark.smoke

def _write_tum_dir(tmp_path, n=12):
    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, dep_lines, pose_lines = [], [], []
    for i in range(n):
        t = 100.0 + 0.05 * i
        rgb_lines.append(f"{t:.4f} rgb/{i:04d}.png")
        dep_lines.append(f"{t + 0.001:.4f} depth/{i:04d}.png")
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        pose_lines.append(" ".join(
            f"{v:.6f}" for v in [t + 0.002, *rng.normal(size=3), *q]))
    (tmp_path / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("# depth\n" + "\n".join(dep_lines) + "\n")
    (tmp_path / "groundtruth.txt").write_text(
        "# ground truth\n" + "\n".join(pose_lines) + "\n")
    return n


def test_loadtum(tmp_path):
    n = _write_tum_dir(tmp_path)
    images, depths, poses, intr, tstamps = ru.loadtum(str(tmp_path))
    assert len(images) == -(-n // 5)  # 1-in-5 subsampling
    assert images[0].endswith("rgb/0000.png")
    assert depths[0].endswith("depth/0000.png")
    assert len(poses[0]) == 7
    assert intr == []  # no calibration.txt


def test_loadtum_missing_pose(tmp_path):
    out = ru.loadtum(str(tmp_path))
    assert out[0] is None


def test_all_pairs_distance_matrix_matches_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dpvo_tpu.lie import se3

    rng = np.random.default_rng(1)
    n = 6
    poses = np.concatenate(
        [0.5 * rng.normal(size=(n, 3)), rng.normal(size=(n, 4))], axis=1)
    poses[:, 3:] /= np.linalg.norm(poses[:, 3:], axis=1, keepdims=True)

    D = ru.all_pairs_distance_matrix(poses, beta=2.5)
    assert D.shape == (n, n)
    np.testing.assert_allclose(np.diag(D), 0.0, atol=1e-5)

    # cross-check one off-diagonal entry against the JAX lie library
    ps = poses.copy()
    ps[:, :3] *= 2.5
    rel = se3.mul(se3.inv(jnp.asarray(ps[1])), jnp.asarray(ps[4]))
    want = float(jnp.linalg.norm(se3.log(rel)))
    np.testing.assert_allclose(D[1, 4], want, rtol=1e-4)
    np.testing.assert_allclose(D[1, 4], D[4, 1], rtol=1e-4)


def test_rotmat_quat_roundtrip():
    from dpvo_tpu.utils import npse3

    rng = np.random.default_rng(2)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = npse3.quat_rotmat(q)
        q2 = npse3.rotmat_to_quat(R)
        # double cover: q and -q encode the same rotation
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-9
