import numpy as np, jax, jax.numpy as jnp, time
from dpvo_tpu.ops.corr_pallas import corr_features_pallas
from dpvo_tpu.ops.corr import corr_features_xla

rng = np.random.default_rng(0)
Np, C, P = 80*36, 128, 3
mem, H2, W2 = 36, 120, 160
E = 36864
n_frames = 22  # distinct target frames like steady state
gmap = jnp.asarray(rng.standard_normal((Np, C, P, P)), jnp.bfloat16)
fmap1 = jnp.asarray(rng.standard_normal((mem, H2, W2, C)), jnp.bfloat16)
fmap2 = jnp.asarray(rng.standard_normal((mem, H2//4, W2//4, C)), jnp.bfloat16)
base = rng.uniform(0, 155, (E, 1, 1, 2))
offs = np.stack(np.meshgrid(np.arange(-1,2), np.arange(-1,2), indexing="ij"), -1)[None].astype(np.float64)
coords = jnp.asarray(base + offs[..., ::-1] + rng.uniform(0,1,(E,1,1,2)), jnp.float32)
ii1 = jnp.asarray(rng.integers(0, Np, E), jnp.int32)
jj1 = jnp.asarray(np.sort(rng.integers(0, n_frames, E)), jnp.int32)
valid = jnp.ones(E, bool)

def timeit(name, fn, n=10):
    out = fn(*ARGS); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*ARGS)
    _ = float(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

ARGS = (gmap, fmap1, fmap2, coords, ii1, jj1, valid)
f = jax.jit(lambda *a: jnp.sum(corr_features_pallas(*a).astype(jnp.float32)))
timeit("pallas corr 2lvl E=36864", f)
g = jax.jit(lambda *a: jnp.sum(corr_features_xla(*a, impl="region").astype(jnp.float32)))
timeit("xla region corr 2lvl", g)
