import time, numpy as np, jax, jax.numpy as jnp
exec(open('_prof4.py').read().split('def bench2')[0])

def bench3(name, f, *a, n=5):
    out = f(*a); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0=time.perf_counter()
    for _ in range(n): out = f(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

f_ef = jax.jit(lambda s: steps._edge_forward(params, s, es))
bench3("edge_forward (region corr)", f_ef, state)
f_full = jax.jit(lambda s: steps._update(params, s, es, jnp.int32(13), jnp.int32(12)))
bench3("FULL update (region corr)", f_full, state)
f_baonly = jax.jit(lambda s: steps._ba_only(s, es, target, jnp.ones((E,2)), jnp.int32(13), jnp.int32(12)))
bench3("ba_only", f_baonly, state)
