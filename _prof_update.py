import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.runtime.dpvo import _es_dict
from dpvo_tpu.utils.synthetic import PlaneScene

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=70, depth=4.0, seed=7)
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9
for t in range(66):
    slam(t, scene.render(t), scene.intrinsics.copy())

es = slam.topo.edge_set()
esd = {k: jnp.asarray(v) for k, v in _es_dict(es).items()}  # pre-device
state = slam.state
t0i, nfree = jnp.int32(50), jnp.int32(12)
print("E =", es.count)

def timeit(name, fn, st, n=10):
    st = fn(st)
    jax.block_until_ready(st.poses)
    t0 = time.perf_counter()
    for _ in range(n):
        st = fn(st)
    jax.block_until_ready(st.poses)
    _ = np.asarray(st.poses).ravel()[0]  # real fetch
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")
    return st

state = timeit("full update (dev es)", lambda st: slam.steps.update(slam.params, st, esd, t0i, nfree), state)
state = timeit("full update (host es)", lambda st: slam.steps.update(slam.params, st, _es_dict(es), t0i, nfree), state)
state = timeit("update_noba", lambda st: slam.steps.update_noba(slam.params, st, esd), state)
state = timeit("ba_only", lambda st: slam.steps.ba_only(st, esd, jnp.zeros((cfg.E_MAX,2)), jnp.ones((cfg.E_MAX,2)), t0i, nfree), state)
