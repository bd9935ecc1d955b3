import numpy as np, jax, jax.numpy as jnp, time

rng = np.random.default_rng(0)
E = 36864

def timeit(name, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.3f} ms", flush=True)

net = jnp.asarray(rng.standard_normal((E, 384)), jnp.bfloat16)
perm = jnp.asarray(rng.permutation(E), jnp.int32)
sortedperm = jnp.asarray(np.arange(E), jnp.int32)

timeit("gather net[perm]  (28MB rows)", jax.jit(lambda: net[perm]))
timeit("gather net[iota] (identity perm)", jax.jit(lambda: net[sortedperm]))
timeit("jnp.take axis0", jax.jit(lambda: jnp.take(net, perm, axis=0)))
timeit("argsort [E] i32", jax.jit(lambda: jnp.argsort(perm)))
timeit("sort [E] f32", jax.jit(lambda: jnp.sort(net[:, 0].astype(jnp.float32))))
seg = jnp.asarray(np.sort(rng.integers(0, 2048, E)), jnp.int32)
timeit("segment_sum E->2048 x384", jax.jit(lambda: jax.ops.segment_sum(net.astype(jnp.float32), seg, num_segments=2048)))
timeit("scatter-add rows", jax.jit(lambda: jnp.zeros((2048, 384), jnp.float32).at[seg].add(net.astype(jnp.float32))))
x = jnp.asarray(rng.standard_normal((E, 384)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((384, 384)), jnp.bfloat16)
timeit("matmul [E,384]x[384,384] bf16", jax.jit(lambda: x @ w))
big = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
timeit("matmul 4096^3 bf16 (134 GFLOP)", jax.jit(lambda: big @ big))
# conv like encoder first layer
img = jnp.asarray(rng.standard_normal((1, 480, 640, 3)), jnp.bfloat16)
k7 = jnp.asarray(rng.standard_normal((7, 7, 3, 32)), jnp.bfloat16)
conv = jax.jit(lambda: jax.lax.conv_general_dilated(img, k7, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
timeit("conv7x7s2 480x640x3->32", conv)
# small-row gather: imap ctx
imap = jnp.asarray(rng.standard_normal((2880, 384)), jnp.bfloat16)
ii = jnp.asarray(rng.integers(0, 2880, E), jnp.int32)
timeit("gather imap[ii] [2880->E,384]", jax.jit(lambda: imap[ii]))
# transpose
fm = jnp.asarray(rng.standard_normal((36, 128, 120, 160)), jnp.bfloat16)
timeit("transpose NCHW->NHWC 177MB", jax.jit(lambda: fm.transpose(0, 2, 3, 1)))
# where/select full state
timeit("where on [E,384]", jax.jit(lambda: jnp.where((perm > 5)[:, None], net, 0.0)))
# dynamic_update_slice
buf = jnp.asarray(rng.standard_normal((163840, 3, 3, 3)), jnp.float32)
patch = jnp.asarray(rng.standard_normal((80, 3, 3, 3)), jnp.float32)
timeit("dyn_update_slice patches", jax.jit(lambda: jax.lax.dynamic_update_slice(buf, patch, (800, 0, 0, 0))))
