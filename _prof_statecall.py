import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.config import Config
from dpvo_tpu.runtime.state import make_state

cfg = Config()
state = make_state(cfg, 480, 640)
nb = len(jax.tree_util.tree_leaves(state))
print("state leaves:", nb, "bytes:", sum(x.nbytes for x in jax.tree_util.tree_leaves(state))/1e6, "MB")

def timeit(name, fn, arg, n=10):
    out = fn(arg); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

@jax.jit
def f_nodonate(s):
    return s._replace(poses=s.poses + 1)
timeit("state->state no donate", f_nodonate, state)

from functools import partial
@partial(jax.jit, donate_argnums=(0,))
def f_donate(s):
    return s._replace(poses=s.poses + 1)
timeit("state->state donated", f_donate, state)

@partial(jax.jit, donate_argnums=(0,))
def f_donate_touch(s):
    return s._replace(net=jnp.where((jnp.arange(s.net.shape[0]) < 5)[:, None], 0.0, s.net).astype(s.net.dtype))
timeit("state->state donated, net where", f_donate_touch, state)

x = jnp.zeros((8, 8))
@jax.jit
def g(x):
    return x + 1
timeit("tiny x->x", g, x)

# scalar out of state
@jax.jit
def h(s):
    return jnp.sum(s.poses)
out = h(state); _ = float(out)
t0 = time.perf_counter()
for _ in range(10):
    _ = float(h(state))
print(f"{'state->scalar (sync each)':40s} {(time.perf_counter()-t0)/10*1000:8.2f} ms")
