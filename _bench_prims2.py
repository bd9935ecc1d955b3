"""Primitive cost model with scalar-fetch timing (relay-safe)."""
import numpy as np, jax, jax.numpy as jnp, time

rng = np.random.default_rng(0)
E = 36864

def timeit(name, fn, n=10):
    # fn returns an array; we reduce to scalar inside jit already
    out = fn(); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(out)  # dependent scalar fetch forces completion
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.3f} ms", flush=True)

net = jnp.asarray(rng.standard_normal((E, 384)), jnp.bfloat16)
netf = net.astype(jnp.float32)
perm = jnp.asarray(rng.permutation(E), jnp.int32)

timeit("noop scalar (dispatch+fetch floor)", jax.jit(lambda: jnp.float32(1.0) + perm[0]))
timeit("gather net[perm] (28MB) +sum", jax.jit(lambda: jnp.sum(net[perm].astype(jnp.float32))))
timeit("sum only net", jax.jit(lambda: jnp.sum(netf)))
timeit("argsort+sum", jax.jit(lambda: jnp.sum(jnp.argsort(perm))))
seg = jnp.asarray(np.sort(rng.integers(0, 2048, E)), jnp.int32)
timeit("segment_sum E->2048 +sum", jax.jit(lambda: jnp.sum(jax.ops.segment_sum(netf, seg, num_segments=2048))))
segE = jnp.asarray(np.sort(rng.integers(0, E, E)), jnp.int32)
timeit("segment_sum E->E +sum", jax.jit(lambda: jnp.sum(jax.ops.segment_sum(netf, segE, num_segments=E))))
imap = jnp.asarray(rng.standard_normal((2880, 384)), jnp.bfloat16)
ii = jnp.asarray(rng.integers(0, 2880, E), jnp.int32)
timeit("gather imap[ii] +sum", jax.jit(lambda: jnp.sum(imap[ii].astype(jnp.float32))))
w = jnp.asarray(rng.standard_normal((384, 384)), jnp.bfloat16)
timeit("matmul [E,384]x[384,384] +sum", jax.jit(lambda: jnp.sum((net @ w).astype(jnp.float32))))
big = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
timeit("matmul 4096^3 +sum (134GF)", jax.jit(lambda: jnp.sum((big @ big).astype(jnp.float32))))
img = jnp.asarray(rng.standard_normal((1, 480, 640, 3)), jnp.bfloat16)
k7 = jnp.asarray(rng.standard_normal((7, 7, 3, 32)), jnp.bfloat16)
timeit("conv7x7s2 +sum", jax.jit(lambda: jnp.sum(jax.lax.conv_general_dilated(img, k7, (2,2), "SAME", dimension_numbers=("NHWC","HWIO","NHWC")).astype(jnp.float32))))
fm = jnp.asarray(rng.standard_normal((36, 128, 120, 160)), jnp.bfloat16)
timeit("transpose 177MB +sum", jax.jit(lambda: jnp.sum(fm.transpose(0,2,3,1).astype(jnp.float32))))
# gather of fmap regions, old corr style
fmapf = jnp.asarray(rng.standard_normal((36, 19200, 128)), jnp.bfloat16)
lin = jnp.asarray(rng.integers(0, 19200, (4096, 9, 64)), jnp.int32)
jj = jnp.asarray(rng.integers(0, 36, 4096), jnp.int32)
timeit("pointwise fmap gather [4096,9,64,128]", jax.jit(lambda: jnp.sum(fmapf[jj[:,None,None], lin].astype(jnp.float32))))
# host->device upload 2MB (realistic edge_set)
a = np.zeros((36864, 14), np.float32)
def up():
    return jnp.sum(jnp.asarray(a))
timeit("upload 2MB +sum", jax.jit(up))
