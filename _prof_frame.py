import time, numpy as np, jax, jax.numpy as jnp
from collections import defaultdict
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
import dpvo_tpu.runtime.dpvo as dmod
from dpvo_tpu.utils.synthetic import PlaneScene

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=80, depth=4.0, seed=7)
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9

acc = defaultdict(float); cnt = defaultdict(int)
def wrap(obj, name, sync=False):
    orig = getattr(obj, name)
    def f(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        if sync: jax.block_until_ready(out)
        acc[name] += time.perf_counter() - t0; cnt[name] += 1
        return out
    setattr(obj, name, f)

# steps-level (each is one device dispatch; sync to attribute correctly)
for nm in ("patchify", "ingest", "update", "update_noba", "ba_only", "zero_edges",
           "probe", "flowmag_pair", "compact_edges", "store_inactive", "keyframe_shift"):
    wrap(slam.steps, nm, sync=True)
wrap(slam.topo, "edge_set")
wrap(slam.topo, "remove")

for t in range(60):
    slam(t, scene.render(t), scene.intrinsics.copy())
for k in list(acc): acc[k] = 0.0; cnt[k] = 0
t0 = time.perf_counter()
N = 20
for t in range(60, 60 + N):
    slam(t, scene.render(t), scene.intrinsics.copy())
jax.block_until_ready(slam.state.poses)
tot = time.perf_counter() - t0
print(f"frame: {tot/N*1000:.1f} ms  ({N/tot:.2f} fps)")
for k in sorted(acc, key=lambda k: -acc[k]):
    if cnt[k]:
        print(f"  {k:16s} {acc[k]/N*1000:8.1f} ms/frame ({cnt[k]/N:.1f} calls, {acc[k]/cnt[k]*1000:6.1f} ms/call)")
print("unaccounted:", round((tot - sum(acc.values()))/N*1000, 1), "ms/frame")
