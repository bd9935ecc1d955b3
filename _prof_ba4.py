import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.runtime.dpvo import _es_dict
from dpvo_tpu.utils.synthetic import PlaneScene
from dpvo_tpu.ba import solver as ba_solver

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=45, depth=4.0, seed=7)
frames = [scene.render(t) for t in range(45)]
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9
for t in range(40):
    slam(t, frames[t], scene.intrinsics.copy())
slam._flush_pending()
jax.block_until_ready(slam.state.poses)
steps = slam.steps
params = slam.params
es = {k: jnp.asarray(v) for k, v in _es_dict(slam.topo.edge_set()).items()}
t0n = jnp.int32(max(slam.n - cfg.OPTIMIZATION_WINDOW, 1))
nfree = jnp.int32(slam.n - int(t0n))
P = cfg.P

def chain(fn, k):
    def g(x):
        def body(c, _):
            return fn(c), ()
        return lax.scan(body, x, None, length=k)[0]
    return jax.jit(g)

def measure(name, fn):
    ts = {}
    for k in (2, 12):
        f = chain(fn, k)
        r = f(slam.state); jax.block_until_ready(r.poses)
        t1 = time.perf_counter()
        r = f(slam.state); jax.block_until_ready(r.poses)
        ts[k] = time.perf_counter() - t1
    print(f"{name}: {(ts[12]-ts[2])/10*1e3:.2f} ms", flush=True)

def fused_variant(update_patches, update_poses):
    def f(state):
        net, target, weight, _ = steps._edge_forward(params, state, es)
        state = state._replace(net=net, target=target, weight=weight)
        ctr = state.patches[es["dense2patch"], :, P // 2, P // 2]
        fx, fy, cx, cy = state.intrinsics[0]
        bounds = jnp.stack([-cfg.BA_BORDER, -cfg.BA_BORDER, 2 * cx + cfg.BA_BORDER, 2 * cy + cfg.BA_BORDER])
        poses, depths = ba_solver.ba(
            state.poses, ctr, state.intrinsics, target, weight, es["valid"],
            es["ii"], es["jj"], es["kd"], t0n, nfree, bounds, jnp.float32(cfg.BA_LMBDA),
            W=cfg.W_OPT_MAX, Md=cfg.M_OPT_MAX, iterations=cfg.BA_ITERS,
            ep=cfg.BA_EP, lm=cfg.BA_LM, res_clip=cfg.BA_RESIDUAL_CLIP, clamp_mode="runtime")
        if update_patches:
            patches = state.patches.at[es["dense2patch"], 2].set(depths[:, None, None], mode="drop")
            state = state._replace(patches=patches)
        else:
            state = state._replace(target=state.target + depths.sum() * 1e-20)
        if update_poses:
            state = state._replace(poses=poses)
        else:
            state = state._replace(target=state.target + poses.sum() * 1e-20)
        return state
    return f

measure("fused full", fused_variant(True, True))
measure("fused no-patch-update", fused_variant(False, True))
measure("fused no-pose-no-patch", fused_variant(False, False))
