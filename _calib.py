import time, numpy as np, jax, jax.numpy as jnp

def bench(name, f, *a, n=10):
    out = f(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    return dt

# HBM bandwidth: copy 512MB
x = jnp.zeros((256, 1024, 1024), jnp.bfloat16)  # 512MB
f_copy = jax.jit(lambda x: x + 1.0)
dt = bench("copy", f_copy, x)
print(f"copy 512MB r+w: {dt*1000:.2f} ms -> {1.0/dt:.0f} GB/s effective")

# MXU: 4096^3 matmul bf16 = 137 GFLOP
a = jnp.zeros((4096, 4096), jnp.bfloat16)
f_mm = jax.jit(lambda a: a @ a)
dt = bench("matmul", f_mm, a)
print(f"matmul 4096^3: {dt*1000:.2f} ms -> {2*4096**3/dt/1e12:.1f} TFLOP/s")

# the suspicious gather, with a dependency chain to defeat any funny business
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

out = g(fmap, idx, f1); jax.block_until_ready(out)
t0=time.perf_counter()
s = 0.0
for _ in range(10):
    s = s + g(fmap, idx, f1).sum()   # force full reduction each iter
float(s)
dt = (time.perf_counter()-t0)/10
print(f"gather+einsum (w/ reduction read): {dt*1000:.2f} ms")
