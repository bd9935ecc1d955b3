import time, numpy as np, jax, jax.numpy as jnp
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=90, depth=4.0, seed=7)
frames = [scene.render(t) for t in range(90)]
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9
orig_decide = slam._keyframe_decide
cnt = {"i": 0}
def fixed(m):
    cnt["i"] += 1
    orig_decide(0.0 if cnt["i"] % 4 == 0 else 1e9)
slam._keyframe_decide = fixed

import dpvo_tpu.runtime.dpvo as dmod
acc = {}
orig_ff = slam._fused_frame
def timed_ff(image, intrinsics, fac):
    cfgl = slam.cfg
    M = cfgl.PATCHES_PER_FRAME
    t0 = time.perf_counter()
    slam.topo.add_frame()
    kk_f, jj_f = slam.topo.edges_forw()
    kk_b, jj_b = slam.topo.edges_back()
    start, count = slam._append(np.concatenate([kk_f, kk_b]), np.concatenate([jj_f, jj_b]), defer_zero=True)
    es = slam.topo.edge_set()
    packed = slam.steps.pack_edge_set(es)
    t1 = time.perf_counter()
    i_kf = slam.n - cfgl.KEYFRAME_INDEX - 1
    j_kf = slam.n - cfgl.KEYFRAME_INDEX + 1
    meta = np.zeros(24 + 2 * M, np.float32)
    meta[0] = slam.n; meta[1] = fac; meta[2] = 1.0
    meta[4] = start; meta[5] = count
    t0v = max(slam.n - cfgl.OPTIMIZATION_WINDOW, 1)
    meta[6] = t0v; meta[7] = slam.n - t0v
    meta[8] = i_kf; meta[9] = j_kf
    for off, (a, b) in ((0, (i_kf, j_kf)), (M, (j_kf, i_kf))):
        sel = (slam.topo.ii == a) & (slam.topo.jj == b)
        kk = slam.topo.kk[sel][:M]
        meta[10 + off // M] = len(kk)
        meta[24 + off:24 + off + len(kk)] = kk
    meta[12:16] = intrinsics
    if slam._pending is not None:
        ops, k_cull, n_after, nstore = slam._pending; slam._pending = None
    else:
        ops, k_cull, n_after, nstore = slam._identity_ops, -1, 0, 0
    meta[3] = k_cull; meta[16] = n_after; meta[17] = nstore
    t2 = time.perf_counter()
    im_d = jnp.asarray(image); pk_d = jnp.asarray(packed); mt_d = jnp.asarray(meta); op_d = jnp.asarray(ops)
    jax.block_until_ready(op_d)
    t3 = time.perf_counter()
    key = slam._next_key()
    slam.state, mag = slam.steps.frame_step(slam.params, slam.state, im_d, pk_d, mt_d, op_d, key)
    t4 = time.perf_counter()
    magf = float(mag)
    t5 = time.perf_counter()
    slam._keyframe_decide(magf)
    t6 = time.perf_counter()
    for k, v in (("topo+pack", t1-t0), ("meta", t2-t1), ("uploads", t3-t2), ("dispatch", t4-t3), ("mag fetch(+device)", t5-t4), ("decide", t6-t5)):
        acc[k] = acc.get(k, 0.0) + v
slam._fused_frame = timed_ff

for t in range(60):
    slam(t, frames[t], scene.intrinsics.copy())
acc.clear()
t0 = time.perf_counter()
N = 24
for t in range(60, 60 + N):
    slam(t, frames[t], scene.intrinsics.copy())
jax.block_until_ready(slam.state.poses)
tot = time.perf_counter() - t0
print(f"frame: {tot/N*1000:.1f} ms ({N/tot:.2f} fps)")
for k, v in sorted(acc.items(), key=lambda kv: -kv[1]):
    print(f"  {k:20s} {v/N*1000:8.1f} ms/frame")
print(f"  unaccounted {1000*(tot - sum(acc.values()))/N:8.1f} ms/frame")
