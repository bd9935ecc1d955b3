"""Training-path tests: unroll runs, gradients flow, loss behaves, and
the distributed BA matches the single-device solver on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpvo_tpu.ba.solver import BAProblem, ba_delta
from dpvo_tpu.config import Config
from dpvo_tpu.models.vonet import build_schedule, vo_forward
from dpvo_tpu.parallel import dist_ba_delta, make_mesh, mesh_context
from dpvo_tpu.runtime.weights import init_params
from dpvo_tpu.train import make_optimizer, make_train_step
from dpvo_tpu.utils.synthetic import PlaneScene

HT, WD = 64, 96


def tiny_cfg():
    return Config(
        PATCHES_PER_FRAME=4, DIM=32, FDIM=16, MIXED_PRECISION=False,
        BUFFER_SIZE=16, E_MAX=512, M_OPT_MAX=64, PMEM=8, MEM=8,
    )


def make_batch(B=1, F=6, seed=0):
    scene = PlaneScene(ht=HT, wd=WD, n_frames=F, depth=4.0, seed=seed)
    images = np.stack([scene.render(t) for t in range(F)]).astype(np.float32)
    ys, xs = np.mgrid[0:HT, 0:WD]
    disps = np.stack([scene.inv_depth(t, xs.astype(np.float64), ys.astype(np.float64)) for t in range(F)])
    batch = {
        "images": jnp.asarray(images)[None].repeat(B, 0),
        "poses": jnp.asarray(scene.poses)[None].repeat(B, 0),
        "disps": jnp.asarray(disps, jnp.float32)[None].repeat(B, 0),
        "intrinsics": jnp.asarray(scene.intrinsics)[None].repeat(B, 0),
    }
    return batch


def test_build_schedule_static():
    steps = build_schedule(F=6, M=4, STEPS=8, init_frames=4)
    assert steps[0].n == 4
    assert len(steps[0].kk) == 4 * 4 * 4  # patches(16) x frames(4)
    # frames join one per step from step 4
    assert steps[4].new_frame == 4 and steps[4].n == 5
    assert steps[5].new_frame == 5 and steps[5].n == 6
    assert steps[-1].n == 6
    # growth is monotone and schedule arrays self-consistent
    for st in steps:
        assert np.all(st.ii == st.kk // 4)
        assert len(st.kk) == len(st.jj)


def test_vo_forward_runs_and_is_differentiable():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), ht=HT, wd=WD)
    batch = make_batch(F=5)

    def loss(params):
        traj = vo_forward(
            params, cfg, batch["images"][0], batch["poses"][0], batch["disps"][0],
            batch["intrinsics"][0], jax.random.PRNGKey(1), STEPS=5,
        )
        from dpvo_tpu.train import clip_loss

        l, m = clip_loss(traj, batch["poses"][0], cfg.P)
        return l

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in flat)
    assert gnorm > 0


def test_train_step_structure_only_and_full():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), ht=HT, wd=WD)
    tx, _ = make_optimizer(lr=1e-4, total_steps=100)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, STEPS=4)
    batch = make_batch(F=4)

    p1, o1, m1 = step(params, opt_state, batch, jax.random.PRNGKey(2), structure_only=True)
    assert np.isfinite(float(m1["loss"]))
    p2, o2, m2 = step(p1, o1, batch, jax.random.PRNGKey(3), structure_only=False)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["gnorm"]) > 0


def test_dist_ba_matches_single_device():
    """Edge-sharded psum-reduced BA == single-device BA (8-dev CPU mesh)."""
    from tests.test_ba import synthetic_problem

    poses_gt, ctr_gt, intr, target, ii, jj, kd = synthetic_problem(jax.random.PRNGKey(7))
    n = poses_gt.shape[0]
    E = ii.shape[0]
    Md = ctr_gt.shape[0]
    W = 8
    bounds = jnp.array([-64.0, -64.0, 224.0, 184.0])
    weight = jnp.ones((E, 2))
    valid = jnp.ones((E,), bool)

    prob = BAProblem(poses_gt, ctr_gt, intr, target, weight, valid, ii, jj, kd,
                     jnp.int32(1), jnp.int32(n - 1))
    dX_ref, dZ_ref = ba_delta(prob, bounds, jnp.float32(1e-4), W=W, Md=Md)

    mesh = make_mesh(n_data=1, n_edge=8)
    dX, dZ = dist_ba_delta(
        mesh, poses_gt, ctr_gt, intr, target, weight, valid, ii, jj, kd,
        jnp.int32(1), jnp.int32(n - 1), bounds, jnp.float32(1e-4), W=W, Md=Md,
    )
    assert np.allclose(dX, dX_ref, atol=1e-4)
    assert np.allclose(dZ, dZ_ref, atol=1e-4)


def test_train_step_on_mesh():
    """Full train step jitted over the (data, edge) mesh with sharded
    batch — the multi-chip path the driver dry-runs."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), ht=HT, wd=WD)
    tx, _ = make_optimizer(lr=1e-4, total_steps=100)
    opt_state = tx.init(params)
    batch = make_batch(B=2, F=4)

    mesh = make_mesh(n_data=2, n_edge=4)
    from dpvo_tpu.parallel import data_sharding, replicated

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        with mesh_context(mesh):
            step = make_train_step(cfg, tx, STEPS=4)
            batch_sh = {k: jax.device_put(v, data_sharding(mesh, v.ndim)) for k, v in batch.items()}
            params_sh = jax.device_put(params, replicated(mesh))
            opt_sh = jax.device_put(opt_state, replicated(mesh))
            p, o, m = step(params_sh, opt_sh, batch_sh, jax.random.PRNGKey(5), structure_only=False)
    assert np.isfinite(float(m["loss"]))


def test_val_step_runs():
    """Forward-only validation hook: finite metrics, params untouched."""
    from dpvo_tpu.train import make_val_step

    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), ht=HT, wd=WD)
    batch = make_batch(B=2, F=5)
    val = make_val_step(cfg, STEPS=4)
    m = val(params, batch, jax.random.PRNGKey(3))
    assert set(m) >= {"loss", "flow", "tr", "ro", "px1"}
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_training_learns_on_fixed_batch():
    """Overfit sanity: repeated steps on one fixed batch must reduce the
    loss substantially — catches sign/wiring bugs in the loss, BA
    unroll, or optimizer before burning real accelerator time."""
    import optax

    from dpvo_tpu.train.loss import clip_loss

    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), ht=HT, wd=WD)
    batch = make_batch(B=1, F=5, seed=3)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(3e-4))
    step = make_train_step(cfg, tx, STEPS=4)
    opt_state = tx.init(params)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(25):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, sub,
                                          structure_only=False)
        losses.append(float(metrics["loss"]))
    first = np.median(losses[:5])
    last = np.median(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.7 * first, (first, last, losses[::5])
