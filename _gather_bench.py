import time, numpy as np, jax, jax.numpy as jnp

E, P2, D2, C = 36864, 9, 64, 128
mem, HW = 36, 19200
rng = np.random.default_rng(0)
fmap = jnp.asarray(rng.normal(size=(mem, HW, C)).astype(np.float32)).astype(jnp.bfloat16)
jj1 = jnp.asarray(rng.integers(0, mem, E).astype(np.int32))
lin = jnp.asarray(rng.integers(0, HW, (E, P2, D2)).astype(np.int32))
f1 = jnp.asarray(rng.normal(size=(E, P2, C)).astype(np.float32)).astype(jnp.bfloat16)

def bench(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(3): out = f(*a)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/3*1000:8.2f} ms")

@jax.jit
def v_double(fmap, jj1, lin, f1):
    f2 = fmap[jj1[:, None, None], lin]          # [E,P2,D2,C]
    return jnp.einsum("epc,epdc->epd", f1, f2, preferred_element_type=jnp.float32)

@jax.jit
def v_flat(fmap, jj1, lin, f1):
    flat = fmap.reshape(mem*HW, C)
    idx = jj1[:, None, None]*HW + lin           # [E,P2,D2]
    f2 = flat[idx]                               # [E,P2,D2,C]
    return jnp.einsum("epc,epdc->epd", f1, f2, preferred_element_type=jnp.float32)

@jax.jit
def v_take(fmap, jj1, lin, f1):
    flat = fmap.reshape(mem*HW, C)
    idx = (jj1[:, None, None]*HW + lin).reshape(-1)
    f2 = jnp.take(flat, idx, axis=0).reshape(E, P2, D2, C)
    return jnp.einsum("epc,epdc->epd", f1, f2, preferred_element_type=jnp.float32)

@jax.jit
def v_chunked(fmap, jj1, lin, f1):
    flat = fmap.reshape(mem*HW, C)
    def chunk(args):
        jj1c, linc, f1c = args
        idx = jj1c[:, None, None]*HW + linc
        f2 = flat[idx]
        return jnp.einsum("epc,epdc->epd", f1c, f2, preferred_element_type=jnp.float32)
    nc = E // 2048
    out = jax.lax.map(chunk, (jj1.reshape(nc, -1), lin.reshape(nc, 2048, P2, D2), f1.reshape(nc, 2048, P2, C)))
    return out.reshape(E, P2, D2)

bench("double-index gather", v_double, fmap, jj1, lin, f1)
bench("flat single-index gather", v_flat, fmap, jj1, lin, f1)
bench("jnp.take flat", v_take, fmap, jj1, lin, f1)
bench("flat chunked lax.map", v_chunked, fmap, jj1, lin, f1)
