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
print("E =", len(slam.topo.ii), flush=True)

def t(name, fn, n=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(n): fn()
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

t("topo.edge_set()", lambda: slam.topo.edge_set())
es = slam.topo.edge_set()
t("_es_dict (dict build)", lambda: _es_dict(es))
esd = _es_dict(es)
t("upload es (14 arrays)", lambda: jax.block_until_ready(jax.tree_util.tree_map(jnp.asarray, esd)))
t("edges_forw+back", lambda: (slam.topo.edges_forw(), slam.topo.edges_back()))
# full frame wall time split
t0 = time.perf_counter()
for k in range(5):
    slam(66 + k, scene.render(60), scene.intrinsics.copy())
jax.block_until_ready(slam.state.poses)
print(f"full frame: {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)
