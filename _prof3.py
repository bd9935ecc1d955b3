import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.config import Config
from dpvo_tpu.geom import projective as pops
from dpvo_tpu.ops import corr_stack
from dpvo_tpu.ba import solver as ba_solver
from dpvo_tpu.runtime.state import make_state
from dpvo_tpu.runtime.steps import StepFunctions
from dpvo_tpu.runtime.weights import init_params

cfg = Config()
ht, wd = 480, 640
steps = StepFunctions(cfg, ht, wd)
state = make_state(cfg, ht, wd)
params = init_params(cfg, jax.random.PRNGKey(0))
E = cfg.E_MAX
rng = np.random.default_rng(0)
h4, w4 = ht//4, wd//4

# fill plausible state
key = jax.random.PRNGKey(1)
state = state._replace(
    fmap1=jax.random.normal(key, state.fmap1.shape, state.fmap1.dtype),
    fmap2=jax.random.normal(key, state.fmap2.shape, state.fmap2.dtype),
    gmap=jax.random.normal(key, state.gmap.shape, state.gmap.dtype),
    imap=jax.random.normal(key, state.imap.shape, state.imap.dtype),
    intrinsics=jnp.tile(jnp.asarray([[128.,128.,80.,60.]]), (cfg.BUFFER_SIZE,1)),
)
patches = np.zeros((cfg.BUFFER_SIZE*cfg.PATCHES_PER_FRAME, 3, 3, 3), np.float32)
patches[:,0] = rng.uniform(2, w4-2, (patches.shape[0],1,1))
patches[:,1] = rng.uniform(2, h4-2, (patches.shape[0],1,1))
patches[:,2] = 0.5
state = state._replace(patches=jnp.asarray(patches))

n = 25
M = cfg.PATCHES_PER_FRAME
kk = rng.integers(0, n*M, E).astype(np.int32)
jj = rng.integers(0, n, E).astype(np.int32)
ii = (kk // M).astype(np.int32)
ii1 = (kk % (M*steps.pmem)).astype(np.int32)
jj1 = (jj % cfg.MEM).astype(np.int32)
valid = np.ones(E, bool)

def bench(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(5):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/5*1000:8.2f} ms")
    return out

f_transform = jax.jit(lambda s, ii, jj, kk: pops.transform(s.poses, s.patches, s.intrinsics, ii, jj, kk))
coords = bench("transform (reproject)", f_transform, state, jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk))

f_corr = jax.jit(lambda s, c, i1, j1: corr_stack(s.gmap, (s.fmap1, s.fmap2), c.astype(jnp.float32), i1, j1, radius=3, chunk=2048))
corr = bench("corr_stack (2 lvl)", f_corr, state, coords, jnp.asarray(ii1), jnp.asarray(jj1))

kk_seg = np.unique(kk, return_inverse=True)[1].astype(np.int32)
ij_seg = np.unique(ii.astype(np.int64)*(1<<20)+jj, return_inverse=True)[1].astype(np.int32)
ixn = rng.integers(0, E, E).astype(np.int32); jxn = rng.integers(0, E, E).astype(np.int32)
mask = np.ones(E, bool)

f_upd = jax.jit(lambda p, s, ctx, corr: steps.update_op.apply(
    p["update"], s.net, ctx, corr, jnp.asarray(ixn), jnp.asarray(jxn),
    jnp.asarray(mask), jnp.asarray(mask), jnp.asarray(kk_seg), jnp.asarray(ij_seg),
    jnp.asarray(valid), num_segments=cfg.E_MAX))
ctx = state.imap[jnp.asarray(ii1)]
out = bench("update operator", f_upd, params, state, ctx, corr.astype(state.net.dtype))

uniq = np.unique(kk); kd = kk_seg
d2p = np.full(cfg.M_OPT_MAX, cfg.BUFFER_SIZE*M, np.int64); d2p[:len(uniq)] = uniq
target = np.asarray(coords[:, 1, 1, :]) + rng.normal(0, 1, (E,2)).astype(np.float32)
f_ba = jax.jit(lambda s, tgt, w: ba_solver.ba(
    s.poses, s.patches[jnp.asarray(d2p),:,1,1], s.intrinsics, tgt, w, jnp.asarray(valid),
    jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kd), jnp.int32(13), jnp.int32(12),
    jnp.asarray([-64.,-64.,224.,184.]), jnp.float32(1e-4),
    W=cfg.W_OPT_MAX, Md=cfg.M_OPT_MAX, iterations=2))
out = bench("BA (window, 2 iters)", f_ba, state, jnp.asarray(target), jnp.ones((E,2)))

# full fused update
es = dict(ii=jnp.asarray(ii), jj=jnp.asarray(jj), kk=jnp.asarray(kk), valid=jnp.asarray(valid),
          ii1=jnp.asarray(ii1), jj1=jnp.asarray(jj1), kk_seg=jnp.asarray(kk_seg), ij_seg=jnp.asarray(ij_seg),
          ix=jnp.asarray(ixn), jx=jnp.asarray(jxn), mask_ix=jnp.asarray(mask), mask_jx=jnp.asarray(mask),
          kd=jnp.asarray(kd), dense2patch=jnp.asarray(d2p))
def run_update(s):
    return steps._update(params, s, es, jnp.int32(13), jnp.int32(12))
f_full = jax.jit(run_update)
s2 = f_full(state); jax.block_until_ready(s2)
t0=time.perf_counter()
for _ in range(5):
    s2 = f_full(state)
jax.block_until_ready(s2)
print(f"{'FULL update step':28s} {(time.perf_counter()-t0)/5*1000:8.2f} ms")
