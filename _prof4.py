import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.config import Config
from dpvo_tpu.runtime.state import make_state
from dpvo_tpu.runtime.steps import StepFunctions
from dpvo_tpu.runtime.weights import init_params

cfg = Config(); ht, wd = 480, 640
steps = StepFunctions(cfg, ht, wd)
state = make_state(cfg, ht, wd)
params = init_params(cfg, jax.random.PRNGKey(0))
E = cfg.E_MAX; rng = np.random.default_rng(0); h4, w4 = ht//4, wd//4
key = jax.random.PRNGKey(1)
state = state._replace(
    fmap1=jax.random.normal(key, state.fmap1.shape, state.fmap1.dtype),
    fmap2=jax.random.normal(key, state.fmap2.shape, state.fmap2.dtype),
    gmap=jax.random.normal(key, state.gmap.shape, state.gmap.dtype),
    imap=jax.random.normal(key, state.imap.shape, state.imap.dtype),
    intrinsics=jnp.tile(jnp.asarray([[128.,128.,80.,60.]]), (cfg.BUFFER_SIZE,1)))
patches = np.zeros((cfg.BUFFER_SIZE*cfg.PATCHES_PER_FRAME, 3, 3, 3), np.float32)
patches[:,0] = rng.uniform(2, w4-2, (patches.shape[0],1,1))
patches[:,1] = rng.uniform(2, h4-2, (patches.shape[0],1,1))
patches[:,2] = 0.5
state = state._replace(patches=jnp.asarray(patches))
n = 25; M = cfg.PATCHES_PER_FRAME
kk = rng.integers(0, n*M, E).astype(np.int32)
jj = rng.integers(0, n, E).astype(np.int32)
ii = (kk // M).astype(np.int32)
ii1 = (kk % (M*steps.pmem)).astype(np.int32)
jj1 = (jj % cfg.MEM).astype(np.int32)
valid = np.ones(E, bool)
kk_seg = np.unique(kk, return_inverse=True)[1].astype(np.int32)
ij_seg = np.unique(ii.astype(np.int64)*(1<<20)+jj, return_inverse=True)[1].astype(np.int32)
ixn = rng.integers(0, E, E).astype(np.int32); jxn = rng.integers(0, E, E).astype(np.int32)
mask = np.ones(E, bool)
uniq = np.unique(kk); kd = kk_seg
d2p = np.full(cfg.M_OPT_MAX, cfg.BUFFER_SIZE*M, np.int64); d2p[:len(uniq)] = uniq
es = dict(ii=jnp.asarray(ii), jj=jnp.asarray(jj), kk=jnp.asarray(kk), valid=jnp.asarray(valid),
          ii1=jnp.asarray(ii1), jj1=jnp.asarray(jj1), kk_seg=jnp.asarray(kk_seg), ij_seg=jnp.asarray(ij_seg),
          ix=jnp.asarray(ixn), jx=jnp.asarray(jxn), mask_ix=jnp.asarray(mask), mask_jx=jnp.asarray(mask),
          kd=jnp.asarray(kd), dense2patch=jnp.asarray(d2p))
target = jnp.asarray(rng.uniform(10, 100, (E,2)).astype(np.float32))

def bench2(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(5): out = f(*a)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/5*1000:8.2f} ms")

f_ef = jax.jit(lambda s: steps._edge_forward(params, s, es))
bench2("edge_forward alone", f_ef, state)
f_noba = jax.jit(lambda s: steps._update_noba(params, s, es))
bench2("edge_forward + state write", f_noba, state)
f_baonly = jax.jit(lambda s: steps._ba_only(s, es, target, jnp.ones((E,2)), jnp.int32(13), jnp.int32(12)))
bench2("ba_only fused (BA + scatter)", f_baonly, state)
f_full = jax.jit(lambda s: steps._update(params, s, es, jnp.int32(13), jnp.int32(12)))
bench2("FULL update", f_full, state)
