"""True device-time budget with scalar-fetch timing."""
import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.runtime.dpvo import _es_dict
from dpvo_tpu.utils.synthetic import PlaneScene
from dpvo_tpu.ba import solver as ba_solver
from dpvo_tpu.geom import projective as pops
from dpvo_tpu.ops import corr_stack
from dpvo_tpu.ops.corr_pallas import corr_features_pallas
from dpvo_tpu.ops.corr import corr_features_xla

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=70, depth=4.0, seed=7)
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9
for t in range(66):
    slam(t, scene.render(t), scene.intrinsics.copy())
print("setup done", flush=True)

es = slam.topo.edge_set()
esd = {k: jnp.asarray(v) for k, v in _es_dict(es).items()}
state = slam.state
params = slam.params
t0i, nfree = jnp.int32(50), jnp.int32(12)
steps = slam.steps

def timeit(name, fn, n=5):
    out = fn(); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    _ = float(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

# full update via scalar probe: sum of poses after update
@jax.jit
def upd_scalar(state, esd):
    s2 = steps._update(params, state, esd, t0i, nfree)
    return jnp.sum(s2.poses)
timeit("update (op+corr+BA)", lambda: upd_scalar(state, esd))

@jax.jit
def noba_scalar(state, esd):
    s2 = steps._update_noba(params, state, esd)
    return jnp.sum(s2.target)
timeit("update_noba (op+corr)", lambda: noba_scalar(state, esd))

# corr alone (XLA region, current runtime path)
@jax.jit
def corr_scalar(state, esd):
    coords = pops.transform(state.poses, state.patches, state.intrinsics, esd["ii"], esd["jj"], esd["kk"])
    c = corr_stack(state.gmap, (state.fmap1, state.fmap2), coords.astype(jnp.float32), esd["ii1"], esd["jj1"], radius=3, chunk=4096, impl="region")
    return jnp.sum(c.astype(jnp.float32))
timeit("corr XLA region (in-state)", lambda: corr_scalar(state, esd))

# corr pallas (needs NHWC fmaps)
f1n = jnp.asarray(np.asarray(state.fmap1).transpose(0,2,3,1))
f2n = jnp.asarray(np.asarray(state.fmap2).transpose(0,2,3,1))
@jax.jit
def corr_pallas_scalar(state, esd):
    coords = pops.transform(state.poses, state.patches, state.intrinsics, esd["ii"], esd["jj"], esd["kk"])
    c = corr_features_pallas(state.gmap, f1n, f2n, coords.astype(jnp.float32), esd["ii1"], esd["jj1"], esd["valid"])
    return jnp.sum(c.astype(jnp.float32))
timeit("corr PALLAS (in-state)", lambda: corr_pallas_scalar(state, esd))

# BA alone
@jax.jit
def ba_scalar(state, esd):
    ctr = state.patches[esd["dense2patch"], :, 1, 1]
    fx, fy, cx, cy = state.intrinsics[0]
    bounds = jnp.stack([-64.0, -64.0, 2*cx+64.0, 2*cy+64.0])
    poses, depths = ba_solver.ba(
        state.poses, ctr, state.intrinsics, state.target, state.weight, esd["valid"],
        esd["ii"], esd["jj"], esd["kd"], t0i, nfree, bounds, jnp.float32(1e-4),
        W=cfg.W_OPT_MAX, Md=cfg.M_OPT_MAX, iterations=2, ep=1.0, lm=1e-4,
        res_clip=128.0, clamp_mode="runtime")
    return jnp.sum(poses)
timeit("BA 2 iters", lambda: ba_scalar(state, esd))

# transform alone
@jax.jit
def tr_scalar(state, esd):
    coords = pops.transform(state.poses, state.patches, state.intrinsics, esd["ii"], esd["jj"], esd["kk"])
    return jnp.sum(coords)
timeit("pops.transform", lambda: tr_scalar(state, esd))

# patchify
img = jnp.asarray(scene.render(60))
@jax.jit
def pf_scalar(img):
    fmap, gmap_p, imap_p, patches, clr = steps._patchify(params, img, jax.random.PRNGKey(0))
    return jnp.sum(fmap.astype(jnp.float32))
timeit("patchify (2 encoders + gathers)", lambda: pf_scalar(img))

# ingest
@jax.jit
def ing_scalar(state):
    s2 = steps._ingest(state, jnp.int32(60), state.fmap1[0], state.gmap[:80], state.imap[:80],
                       state.patches[:80], jnp.zeros((80,3)), jnp.asarray(scene.intrinsics/4, jnp.float32),
                       jnp.float32(1.0), jnp.bool_(True), jnp.bool_(True), jax.random.PRNGKey(0))
    return jnp.sum(s2.poses)
timeit("ingest", lambda: ing_scalar(state))
