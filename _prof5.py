import time, numpy as np, jax, jax.numpy as jnp

def tleaf(t):
    return jax.tree_util.tree_leaves(t)[0]

def bench(name, f, *a, n=5):
    for _ in range(2):
        float(jnp.sum(tleaf(f(*a))))  # warm + real sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    float(jnp.sum(tleaf(out)))  # force real completion via readback
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

# calibrate
x = jnp.zeros((256, 1024, 256), jnp.float32)  # 256MB
f = jax.jit(lambda x: x + 1.0)
bench("copy 256MB (r+w 0.5GB)", f, x, n=10)
a = jnp.zeros((4096, 4096), jnp.bfloat16)
bench("matmul 4096^3 (137 GFLOP)", jax.jit(lambda a: a @ a), a, n=10)

# gather micro
E, P2, D2, C = 36864, 9, 64, 128
mem, HW = 36, 19200
rng = np.random.default_rng(0)
fmap = jnp.asarray(rng.normal(size=(mem*HW, C)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, mem*HW, (E, P2, D2)).astype(np.int32))
f1 = jnp.asarray(rng.normal(size=(E, P2, C)).astype(np.float32)).astype(jnp.bfloat16)

@jax.jit
def g(fmap, idx, f1):
    f2 = fmap[idx]
    return jnp.einsum("epc,epdc->epd", f1, f2, preferred_element_type=jnp.float32)
bench("corr-like gather+einsum 1lvl", g, fmap, idx, f1)

@jax.jit
def g_chunk(fmap, idx, f1):
    def chunk(args):
        i, f1c = args
        return jnp.einsum("epc,epdc->epd", f1c, fmap[i], preferred_element_type=jnp.float32)
    nc = E // 2048
    return jax.lax.map(chunk, (idx.reshape(nc,2048,P2,D2), f1.reshape(nc,2048,P2,C))).reshape(E,P2,D2)
bench("corr-like gather chunked", g_chunk, fmap, idx, f1)

# one-hot matmul alternative: contract over HW via MXU? HW too big. skip.
