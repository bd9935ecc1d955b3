"""Sparse (O(edges)-memory) global BA vs the dense one-hot solver.

The dense path (ba/solver.py) is golden-tested against the reference
semantics; the sparse path (ba/gba_sparse.py) must produce the same
Gauss-Newton iterates on identical problems — it assembles the identical
reduced system, only without materializing [Eg, Md] one-hots.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.ba import ba
from dpvo_tpu.ba.gba_sparse import build_sparse_indices, gba

from test_ba import center_rmse, synthetic_problem


def _run_both(key, W=8, t0=1, pad=37, kp_max=1 << 14, noise=0.5):
    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(key, noise=noise)
    n = poses_gt.shape[0]
    nfree = n - 1
    Md = ctr_gt.shape[0]
    E = ii.shape[0]

    kp, kdd = jax.random.split(jax.random.PRNGKey(7))
    poses0 = jax.lax.stop_gradient(
        jnp.asarray(poses_gt).at[1:, :3].add(0.05 * jax.random.normal(kp, (n - 1, 3)))
    )
    qn = poses0[:, 3:] / jnp.linalg.norm(poses0[:, 3:], axis=-1, keepdims=True)
    poses0 = jnp.concatenate([poses0[:, :3], qn], -1)
    ctr0 = ctr_gt.at[:, 2].mul(1.0 + 0.15 * jax.random.normal(kdd, (Md,)))

    # pad the edge set (padding edges masked invalid) to exercise masks
    def padE(a, fill=0):
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    iiP, jjP, kdP = padE(ii), padE(jj), padE(kd)
    targetP = padE(target)
    weightP = jnp.concatenate([jnp.ones((E, 2)), jnp.zeros((pad, 2))])
    validP = jnp.concatenate([jnp.ones((E,), bool), jnp.zeros((pad,), bool)])
    bounds = jnp.array([-64.0, -64.0, 2 * 80.0 + 64.0, 2 * 60.0 + 64.0])

    dense = ba(
        poses0, ctr0, intr, targetP, weightP, validP, iiP, jjP, kdP,
        jnp.int32(t0), jnp.int32(nfree), bounds, jnp.float32(1e-4),
        W=W, Md=Md, iterations=2, clamp_mode="runtime",
    )

    idx = build_sparse_indices(
        np.asarray(ii), np.asarray(jj), np.asarray(kd), t0, nfree,
        W=W, R_MAX=4096, KP_MAX=kp_max,
    )
    sparse = gba(
        poses0, ctr0, intr, targetP, weightP, validP, iiP, jjP, kdP,
        jnp.int32(t0), jnp.int32(nfree), bounds, jnp.float32(1e-4),
        {k: jnp.asarray(v) for k, v in idx.items()}, W=W, Md=Md, iterations=2,
    )
    prob = (poses0, ctr0, intr, target, ii, jj, kd)  # unpadded, for metrics
    return dense, sparse, prob


def test_sparse_matches_dense():
    dense, sparse, _ = _run_both(jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(sparse[0]), np.asarray(dense[0]), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(sparse[1]), np.asarray(dense[1]), atol=2e-4, rtol=1e-3
    )


def test_sparse_converges():
    (dp, dd), (sp, sd), (poses0, ctr0, intr, target, ii, jj, kd) = _run_both(
        jax.random.PRNGKey(4), noise=0.0
    )
    e0 = center_rmse(poses0, ctr0, intr, target, ii, jj, kd)
    e1 = center_rmse(sp, ctr0.at[:, 2].set(sd), intr, target, ii, jj, kd)
    assert e1 < 0.35 * e0, (e0, e1)


def test_pair_truncation_degrades_gracefully():
    """Dropping E Q E^T couplings must keep the step finite and useful."""
    (dp, dd), (sp, sd), (poses0, ctr0, intr, target, ii, jj, kd) = _run_both(
        jax.random.PRNGKey(5), kp_max=64, noise=0.0
    )
    assert np.isfinite(np.asarray(sp)).all()
    e0 = center_rmse(poses0, ctr0, intr, target, ii, jj, kd)
    e1 = center_rmse(sp, ctr0.at[:, 2].set(sd), intr, target, ii, jj, kd)
    assert e1 < e0, (e0, e1)


def test_dist_gba_matches_single_device():
    """dist_gba on an 8-device CPU mesh must reproduce the single-device
    sparse solver (SURVEY §2.9: runtime global BA over ICI)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from dpvo_tpu.ba.gba_sparse import dist_gba
    from dpvo_tpu.parallel import make_mesh

    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(
        jax.random.PRNGKey(9), noise=0.3
    )
    n = poses_gt.shape[0]
    Md = ctr_gt.shape[0]
    E = ii.shape[0]
    W, t0, nfree = 8, 1, n - 1
    kp = jax.random.PRNGKey(17)
    poses0 = jnp.asarray(poses_gt).at[1:, :3].add(
        0.04 * jax.random.normal(kp, (n - 1, 3)))
    weight = jnp.ones((E, 2))
    valid = jnp.ones((E,), bool)
    bounds = jnp.array([-64.0, -64.0, 224.0, 184.0])

    idx = build_sparse_indices(
        np.asarray(ii), np.asarray(jj), np.asarray(kd), t0, nfree,
        W=W, R_MAX=4096, KP_MAX=1 << 14,
    )
    idx_j = {k: jnp.asarray(v) for k, v in idx.items()}
    args = (poses0, ctr_gt, intr, target, weight, valid, ii, jj, kd,
            jnp.int32(t0), jnp.int32(nfree), bounds, jnp.float32(1e-4))

    single = gba(*args, idx_j, W=W, Md=Md, iterations=2)
    mesh = make_mesh(n_data=1, n_edge=8)
    dist = dist_gba(mesh, *args, idx_j, W=W, Md=Md, iterations=2)

    # f32 two-iteration GN: the sharded psum reduction order differs
    # from the single-device sum, so agreement is a few ULP per step
    # amplified through the second iteration (~1e-4 relative)
    np.testing.assert_allclose(np.asarray(dist[0]), np.asarray(single[0]),
                               atol=5e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dist[1]), np.asarray(single[1]),
                               atol=5e-5, rtol=2e-4)


def test_pair_chunk_overrun_no_double_count(monkeypatch):
    """A pair array whose length is NOT a multiple of the chunk size and
    whose tail holds TRUE pairs (any non-final dist_gba shard; or a
    truncated-to-capacity single-device index set, as built here) must
    not double-subtract couplings: dynamic_slice clamps an overrunning
    last chunk's start, re-reading earlier live pairs unless
    gba_sparse._iteration pads the arrays to a chunk multiple."""
    import dpvo_tpu.ba.gba_sparse as gs

    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(
        jax.random.PRNGKey(3), noise=0.2)
    n = poses_gt.shape[0]
    t0, nfree, W = 1, n - 1, 8
    Md = ctr_gt.shape[0]
    E = ii.shape[0]
    # slice the pair arrays to 61 LIVE pairs end to end — the layout a
    # non-final dist_gba shard sees (capacity truncation no longer
    # produces this shape: since the consistency fix it drops whole
    # depth groups and leaves a dead tail); 61 is not a multiple of 7
    idx = build_sparse_indices(
        np.asarray(ii), np.asarray(jj), np.asarray(kd), t0, nfree,
        W=W, R_MAX=4096, KP_MAX=1 << 14,
    )
    assert int(idx["kpmask"].sum()) > 61, "test premise: enough live pairs"
    idx = {**idx, "p1": idx["p1"][:61], "p2": idx["p2"][:61],
           "kpmask": idx["kpmask"][:61]}
    assert bool(idx["kpmask"].all()), "test premise: tail must be live"
    args = (
        jnp.asarray(poses_gt), ctr_gt, intr, target,
        jnp.ones((E, 2)), jnp.ones((E,), bool), ii, jj, kd,
        jnp.int32(t0), jnp.int32(nfree),
        jnp.array([-64.0, -64.0, 224.0, 184.0]), jnp.float32(1e-4),
        {k: jnp.asarray(v) for k, v in idx.items()},
    )
    kw = dict(W=W, Md=Md, iterations=2)
    # unjitted so each call traces fresh under the patched chunk size
    exact = gs.gba.__wrapped__(*args, **kw)          # 61 <= default chunk
    monkeypatch.setattr(gs, "_PAIR_CHUNK_SIZE", 7)   # 61 % 7 != 0
    chunked = gs.gba.__wrapped__(*args, **kw)
    np.testing.assert_allclose(np.asarray(chunked[0]), np.asarray(exact[0]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(chunked[1]), np.asarray(exact[1]),
                               atol=1e-6, rtol=1e-6)
