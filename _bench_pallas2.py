import numpy as np, jax, jax.numpy as jnp, time
from dpvo_tpu.ops.corr_pallas import _corr_level
from dpvo_tpu.ops import corr_stack

rng = np.random.default_rng(0)
Np, C, P = 80*36, 128, 3
mem, H2, W2 = 36, 120, 160
E = 36864
gmap = jnp.asarray(rng.standard_normal((Np, C, P, P)), jnp.bfloat16)
fmap1 = jnp.asarray(rng.standard_normal((mem, H2, W2, C)), jnp.bfloat16)
coords = jnp.asarray(rng.uniform(5, 100, (E, 3, 3, 2)), jnp.float32)
ii1 = jnp.asarray(rng.integers(0, Np, E), jnp.int32)
jj1 = jnp.asarray(np.sort(rng.integers(0, 22, E)), jnp.int32)
valid = jnp.ones(E, bool)

def timeit(name, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

# sanity: old corr_stack NCHW (should be ~47ms lvl1-ish -> was 98 for 2lvl)
fm_nchw = fmap1.transpose(0, 3, 1, 2)
h = jax.jit(lambda: corr_stack(gmap, (fm_nchw,), coords, ii1, jj1, 3, 4096, levels=(1,), impl="region"))
timeit("xla region corr lvl1 (sanity)", h)

# pallas level alone, pre-sorted inputs (no sort/gather overhead)
gr = gmap.transpose(0, 2, 3, 1).reshape(Np, 9, C)
f1 = gr[ii1]
cs = coords.reshape(E, 9, 2)
f_lvl = jax.jit(lambda: _corr_level(fmap1, f1, cs, jj1, valid, 3, False))
timeit("pallas _corr_level lvl1", f_lvl)

# the sort + gathers alone
def prep():
    key = jnp.where(valid, jj1, jnp.int32(2**30))
    order = jnp.argsort(key)
    inv = jnp.zeros((E,), jnp.int32).at[order].set(jnp.arange(E, dtype=jnp.int32))
    f1s = gr[ii1[order]]
    css = cs[order]
    return f1s, css, inv
f_prep = jax.jit(prep)
timeit("sort+gathers", f_prep)

# final inv gather
res = jnp.zeros((E, 9, 128), jnp.bfloat16)
inv = jnp.asarray(rng.permutation(E), jnp.int32)
f_inv = jax.jit(lambda: res[inv])
timeit("output ungather", f_inv)
