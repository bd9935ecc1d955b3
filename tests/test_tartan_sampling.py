"""Covisibility frame-graph sampling tests (ref base.py:64-169,
rgbd_utils.py:103-141): NumPy SE3 helpers, induced-flow geometry, and
the flow-bounded clip walk on a fake on-disk TartanAir scene."""

import os

import numpy as np
import pytest

from dpvo_tpu.data import tartan
from dpvo_tpu.utils import npse3
from dpvo_tpu.utils.synthetic import MultiPlaneScene


def test_npse3_matches_jax_se3():
    import jax.numpy as jnp

    from dpvo_tpu.lie import se3

    rng = np.random.default_rng(0)
    t = rng.normal(size=(5, 3))
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    g = np.concatenate([t, q], -1)
    g2 = np.roll(g, 1, axis=0)

    assert np.allclose(npse3.inv(g), np.asarray(se3.inv(jnp.asarray(g))), atol=1e-6)
    ref = np.asarray(se3.mul(jnp.asarray(g), jnp.asarray(g2)))
    got = npse3.mul(g, g2)
    # quaternion double cover: compare up to sign
    sgn = np.sign(np.sum(ref[:, 3:] * got[:, 3:], -1, keepdims=True))
    got = np.concatenate([got[:, :3], got[:, 3:] * sgn], -1)
    assert np.allclose(got, ref, atol=1e-6)


def test_induced_flow_lateral_translation():
    """Pure lateral translation t at inverse depth d -> flow = fx*t*d."""
    fx = 100.0
    intr = np.array([fx, fx, 64.0, 48.0])
    poses = np.zeros((2, 7))
    poses[:, 6] = 1.0
    poses[1, 0] = 0.5  # camera shifts; w2c translation +0.5 in x
    xn = np.array([0.0, 0.1, -0.2])
    yn = np.zeros(3)
    disps = np.full((2, 3), 0.25)
    flow, val = tartan._induced_flow(poses, xn, yn, disps, intr, np.array([0]), np.array([1]))
    assert val.all()
    assert np.allclose(flow, fx * 0.5 * 0.25, atol=1e-6)


@pytest.fixture(scope="module")
def fake_scene_dir(tmp_path_factory):
    """Write a MultiPlaneScene to disk in TartanAir layout."""
    import cv2

    root = tmp_path_factory.mktemp("tartan") / "scene/scene/Easy/P001"
    (root / "image_left").mkdir(parents=True)
    (root / "depth_left").mkdir()

    ht, wd, n = 240, 320, 40
    # rstep large enough that every frame's rotation is unique (the test
    # recovers sampled indices by matching quaternions)
    scene = MultiPlaneScene(ht=ht, wd=wd, n_frames=n, depth=8.0, seed=5,
                            tstep=0.06, rstep=0.012)
    ys, xs = np.mgrid[0:ht, 0:wd]
    for i in range(n):
        cv2.imwrite(str(root / "image_left" / f"{i:06d}_left.png"),
                    cv2.cvtColor(scene.render(i), cv2.COLOR_RGB2BGR))
        depth_m = 1.0 / scene.inv_depth(i, xs.astype(np.float64), ys.astype(np.float64))
        np.save(root / "depth_left" / f"{i:06d}_left_depth.npy",
                (depth_m * tartan.DEPTH_SCALE).astype(np.float32))
    # pose_left.txt holds camera-to-world in NED order; invert the
    # ned_to_xyz permutation [1,2,0,4,5,3,6]
    c2w = npse3.inv(scene.poses.astype(np.float64))
    ned = c2w[:, [2, 0, 1, 5, 3, 4, 6]]
    np.savetxt(root / "pose_left.txt", ned)
    return str(root.parents[3]), scene


def test_sample_walk_respects_flow_bounds(fake_scene_dir, monkeypatch):
    root, scene = fake_scene_dir
    monkeypatch.setattr(tartan, "FX", scene.fx)
    monkeypatch.setattr(tartan, "FY", scene.fy)
    monkeypatch.setattr(tartan, "CX", scene.cx)
    monkeypatch.setattr(tartan, "CY", scene.cy)

    ds = tartan.TartanAirDataset(root, n_frames=8, fmin=8.0, fmax=96.0, seed=1)
    assert len(ds.scenes) == 1

    graph = ds._scene_graph(ds.scenes[0])
    assert set(graph.keys()) == set(range(40))

    # rebuild the full matrix to score the sampled pairs
    D = np.full((40, 40), np.inf)
    for i, (js, dists) in graph.items():
        D[i, js] = dists

    in_bounds = total = 0
    for _ in range(10):
        images, poses, disps, intr = ds.sample()
        assert images.shape[0] == 8 and np.isfinite(disps).all()
        # recover sampled indices from returned poses (sample() returns
        # world-to-camera == scene.poses; normalization only scales t)
        w2c_all = scene.poses.astype(np.float64)
        # depth normalization rescales translations; match on rotations
        idx = [int(np.argmin(np.minimum(
            np.linalg.norm(w2c_all[:, 3:] - p[3:], axis=1),
            np.linalg.norm(w2c_all[:, 3:] + p[3:], axis=1)))) for p in poses]
        for a, b in zip(idx[:-1], idx[1:]):
            if a == b:
                continue
            total += 1
            in_bounds += bool(8.0 < D[a, b] < 96.0)
    assert total > 0
    assert in_bounds / total >= 0.8, (in_bounds, total)
