"""Ablate the fused frame step to attribute device time."""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from dpvo_tpu.config import Config
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene

ht, wd = 480, 640
cfg = Config()
scene = PlaneScene(ht=ht, wd=wd, n_frames=70, depth=4.0, seed=7)
slam = DPVO(cfg, None, ht=ht, wd=wd, seed=0)
slam._motion_probe = lambda: 1e9
for t in range(66):
    slam(t, scene.render(t), scene.intrinsics.copy())
print("E =", len(slam.topo.ii), flush=True)

steps = slam.steps
params = slam.params
M = cfg.PATCHES_PER_FRAME

# capture one realistic set of fused-step args
es = slam.topo.edge_set()
packed = jnp.asarray(steps.pack_edge_set(es))
meta_np = np.zeros(16 + 2 * M, np.float32)
n = slam.n
meta_np[0] = n - 1  # overwrite the last frame slot (safe for timing)
meta_np[1] = 1.0; meta_np[2] = 1.0
meta_np[4] = 0; meta_np[5] = 0
meta_np[6] = max(n - cfg.OPTIMIZATION_WINDOW, 1); meta_np[7] = n - 1 - meta_np[6]
meta_np[8] = n - 5; meta_np[9] = n - 3
meta_np[12:16] = scene.intrinsics
meta = jnp.asarray(meta_np)
img = jnp.asarray(scene.render(60))
key = jax.random.PRNGKey(0)

def make_variant(which):
    def fn(state, image_u8, es_packed, meta, key):
        nn = meta[0].astype(jnp.int32)
        intr = meta[12:16]
        k_pf, k_d = jax.random.split(key)
        if which in ("full", "noba", "nocorr", "noflow", "encoders_only"):
            fmap, gmap_p, imap_p, patches, clr = steps._patchify(params, image_u8, k_pf)
            if which != "encoders_only":
                state = steps._ingest(state, nn, fmap, gmap_p, imap_p, patches, clr,
                                      intr, meta[1], jnp.bool_(True), meta[2] > 0, k_d)
            else:
                state = state._replace(poses=state.poses + jnp.sum(fmap).astype(state.poses.dtype) * 0)
        es = steps.unpack_edge_set(es_packed)
        if which in ("full", "noba", "noflow"):
            if which == "noba":
                state = steps._update_noba(params, state, es)
            else:
                state = steps._update(params, state, es, meta[6].astype(jnp.int32), meta[7].astype(jnp.int32))
        elif which == "nocorr":
            # operator with zero corr + BA
            net, target, weight = steps.update_op.apply(
                params["update"], state.net,
                state.imap[es["ii1"]],
                jnp.zeros((cfg.E_MAX, cfg.CORR_WIDTH), steps.fdt),
                es["ix"], es["jx"], es["mask_ix"], es["mask_jx"],
                es["kk_seg"], es["ij_seg"], es["valid"], num_segments=cfg.E_MAX)
            state = state._replace(net=net, target=target, weight=weight)
            from dpvo_tpu.ba import solver as ba_solver
            ctr = state.patches[es["dense2patch"], :, 1, 1]
            fx, fy, cx2, cy2 = state.intrinsics[0]
            bounds = jnp.stack([-64.0, -64.0, 2*cx2+64.0, 2*cy2+64.0])
            poses, depths = ba_solver.ba(state.poses, ctr, state.intrinsics, target, weight,
                es["valid"], es["ii"], es["jj"], es["kd"], meta[6].astype(jnp.int32),
                meta[7].astype(jnp.int32), bounds, jnp.float32(1e-4), W=cfg.W_OPT_MAX,
                Md=cfg.M_OPT_MAX, iterations=2, ep=1.0, lm=1e-4, res_clip=128.0, clamp_mode="runtime")
            state = state._replace(poses=poses)
        if which in ("full", "noba", "nocorr"):
            def pair_mag(i, j, kk, npair):
                ii = jnp.full((M,), i, jnp.int32); jj = jnp.full((M,), j, jnp.int32)
                val = (jnp.arange(M) < npair).astype(jnp.float32)
                return steps._flowmag_pair(state, ii, jj, kk, val, jnp.float32(0.5))
            kk1 = meta[16:16+M].astype(jnp.int32); kk2 = meta[16+M:16+2*M].astype(jnp.int32)
            mag = 0.5 * (pair_mag(meta[8].astype(jnp.int32), meta[9].astype(jnp.int32), kk1, meta[10])
                         + pair_mag(meta[9].astype(jnp.int32), meta[8].astype(jnp.int32), kk2, meta[11]))
        else:
            mag = jnp.sum(state.poses[0])
        return state, mag
    return jax.jit(fn, donate_argnums=(0,))

for which in ("full", "noba", "nocorr", "noflow", "encoders_only"):
    f = make_variant(which)
    state = slam.state
    state, mag = f(state, img, packed, meta, key); _ = float(mag)
    t0 = time.perf_counter()
    for _ in range(8):
        state, mag = f(state, img, packed, meta, key)
    _ = float(mag)
    print(f"{which:16s} {(time.perf_counter()-t0)/8*1000:8.1f} ms", flush=True)
    slam.state = state
