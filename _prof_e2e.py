import time, numpy as np, jax, jax.numpy as jnp
from collections import defaultdict
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=80, depth=4.0, seed=7)
frames = [scene.render(t) for t in range(80)]
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9

acc = defaultdict(float)
cnt = defaultdict(int)

# monkeypatch timing around phases
orig_patchify = slam.steps.patchify
def timed_patchify(*a, **k):
    t0 = time.perf_counter(); out = orig_patchify(*a, **k)
    jax.block_until_ready(out[0]); acc['patchify'] += time.perf_counter()-t0; cnt['patchify']+=1
    return out
slam.steps.patchify = timed_patchify

orig_ingest = slam.steps.ingest
def timed_ingest(*a, **k):
    t0 = time.perf_counter(); out = orig_ingest(*a, **k)
    jax.block_until_ready(out.poses); acc['ingest'] += time.perf_counter()-t0; cnt['ingest']+=1
    return out
slam.steps.ingest = timed_ingest

orig_update = slam.update
def timed_update():
    t0 = time.perf_counter(); orig_update()
    jax.block_until_ready(slam.state.poses); acc['update'] += time.perf_counter()-t0; cnt['update']+=1
slam.update = timed_update

orig_kf = slam.keyframe
def timed_kf():
    t0 = time.perf_counter(); orig_kf()
    jax.block_until_ready(slam.state.poses); acc['keyframe'] += time.perf_counter()-t0; cnt['keyframe']+=1
slam.keyframe = timed_kf

orig_es = slam.topo.edge_set
def timed_es(*a, **k):
    t0 = time.perf_counter(); out = orig_es(*a, **k)
    acc['edge_set(host)'] += time.perf_counter()-t0; cnt['edge_set(host)']+=1
    return out
slam.topo.edge_set = timed_es

# warmup 40 frames
for t in range(40):
    slam(t, frames[t], scene.intrinsics.copy())
for k in list(acc): acc[k]=0.0; cnt[k]=0
t0 = time.perf_counter()
for t in range(40, 80):
    slam(t, frames[t], scene.intrinsics.copy())
jax.block_until_ready(slam.state.poses)
total = time.perf_counter()-t0
print(f"total {total/40*1000:.1f} ms/frame  ({40/total:.2f} fps)")
for k in sorted(acc, key=lambda k:-acc[k]):
    print(f"  {k:16s} {acc[k]/40*1000:8.2f} ms/frame  ({cnt[k]} calls, {acc[k]/max(cnt[k],1)*1000:.2f} ms/call)")
print(f"  edges: {len(slam.topo.ii)}, n={slam.n}, m={slam.m}")
