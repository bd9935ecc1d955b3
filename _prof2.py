import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=45, depth=4.0, seed=7)
frames = [scene.render(t) for t in range(45)]
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9

for t in range(15):
    slam(t, frames[t], scene.intrinsics.copy())
jax.block_until_ready(slam.state.poses)
print("after warmup: n =", slam.n, "edges =", len(slam.topo.ii))

# fine timing of one representative frame path
def tsync(name, fn, *a, **k):
    t0 = time.perf_counter(); out = fn(*a, **k); jax.block_until_ready(out)
    print(f"  {name:24s} {(time.perf_counter()-t0)*1000:8.2f} ms")
    return out

t = 15
image = frames[t]
t0=time.perf_counter()
img_d = jax.device_put(jnp.asarray(image)); img_d.block_until_ready()
print(f"  upload image          {(time.perf_counter()-t0)*1000:8.2f} ms")
out = tsync("patchify", slam.steps.patchify, slam.params, img_d, slam._next_key())

es = slam.topo.edge_set()
t0=time.perf_counter()
from dpvo_tpu.runtime.dpvo import _es_dict
esd = {k: jax.device_put(v) for k, v in _es_dict(es).items()}
jax.block_until_ready(list(esd.values()))
print(f"  upload edge arrays    {(time.perf_counter()-t0)*1000:8.2f} ms")

t0n = max(slam.n - cfg.OPTIMIZATION_WINDOW, 1)
st = tsync("update (full round)", slam.steps.update, slam.params, slam.state, esd, jnp.int32(t0n), jnp.int32(slam.n - t0n))
slam.state = st

# whole-frame wall
times=[]
for t in range(16, 40):
    t0=time.perf_counter(); slam(t, frames[t], scene.intrinsics.copy()); jax.block_until_ready(slam.state.poses)
    times.append(time.perf_counter()-t0)
print(f"steady frame: mean {np.mean(times)*1000:.1f} ms  min {np.min(times)*1000:.1f}  -> fps {1/np.mean(times):.1f}")
print("edges:", len(slam.topo.ii), "n:", slam.n)
