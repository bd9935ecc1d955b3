import time, numpy as np, jax, jax.numpy as jnp
exec(open('_prof4.py').read().split('def bench2')[0])
f_full = jax.jit(lambda s: steps._update(params, s, es, jnp.int32(13), jnp.int32(12)))
s2 = f_full(state)
float(jnp.sum(s2.poses))
t0=time.perf_counter()
for _ in range(3):
    s2 = f_full(state)
float(jnp.sum(s2.poses))
print(f"FULL update (real sync): {(time.perf_counter()-t0)/3*1000:.1f} ms")

jax.profiler.start_trace("/tmp/jax_trace")
for _ in range(2):
    s2 = f_full(state)
float(jnp.sum(s2.poses))
jax.profiler.stop_trace()
print("trace done")
