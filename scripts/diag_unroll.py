"""Diagnose the training unroll with a checkpoint: weight/delta health,
per-step pose error, and a weight=1 BA counterfactual.

Runs vo_forward on one synthetic clip (CPU by default) and prints, per
unroll step: flow error on supervised edges, confidence-weight stats,
|delta| stats, and the relative-pose error of the BA trajectory. Then
re-runs the last-step BA with all-ones weights on the network's own
targets to separate "bad weights" from "bad targets".

  python scripts/diag_unroll.py --ckpt checkpoints/synth_r3_best.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="checkpoints/synth_r3_best.npz")
    p.add_argument("--device", default="cpu")
    p.add_argument("--ht", type=int, default=176)
    p.add_argument("--wd", type=int, default=240)
    p.add_argument("--n_frames", type=int, default=15)
    p.add_argument("--unroll", type=int, default=18)
    p.add_argument("--seed", type=int, default=999000)
    p.add_argument("--clips", type=int, default=1,
                   help="scan N clips from the seed's stream; per-clip "
                        "summary + full table for the worst one")
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import jax.numpy as jnp
    import numpy as np

    from dpvo_tpu.config import Config
    from dpvo_tpu.data.factory import SyntheticClipDataset
    from dpvo_tpu.lie import se3
    from dpvo_tpu.runtime.weights import load_params
    from dpvo_tpu.train.loss import flow_error, pose_error

    cfg = Config(MIXED_PRECISION=False)
    params = load_params(args.ckpt, cfg)
    print(f"loaded {args.ckpt}")

    ds = SyntheticClipDataset(n_frames=args.n_frames, ht=args.ht, wd=args.wd,
                              seed=args.seed, flow_t=(6.0, 28.0), flow_r=(0.5, 6.0))

    from dpvo_tpu.models import vonet as V

    P = cfg.P

    @jax.jit
    def fwd(images, poses_gt, disps, intr):
        traj = V.vo_forward(
            params, cfg, images, poses_gt, disps, intr, jax.random.PRNGKey(0),
            STEPS=args.unroll, remat=False,
        )
        out = []
        for (val, cs, cs_gt, Gs, n) in traj:
            fe, e_min, v = flow_error(val, cs, cs_gt, P)
            tr, ro = pose_error(Gs, poses_gt, n)
            out.append((fe, tr, ro, jnp.mean(v)))
        return out

    worst = None
    for ci in range(args.clips):
        images, poses_gt, disps, intr = ds.sample()
        rows = fwd(jnp.asarray(images), jnp.asarray(poses_gt),
                   jnp.asarray(disps), jnp.asarray(intr))
        rows = [[float(x) for x in r] for r in rows]
        # realized per-frame GT motion for context
        dt = np.linalg.norm(np.diff(
            np.asarray(se3.inv(jnp.asarray(poses_gt)))[:, :3], axis=0), axis=1)
        fin = rows[-1]
        print(f"clip {ci}: final flow={fin[0]:6.2f} tr={fin[1]:7.3f} "
              f"ro={fin[2]:6.3f}  gt-step med={np.median(dt):.3f} "
              f"max={dt.max():.3f}", flush=True)
        if worst is None or fin[1] > worst[0]:
            worst = (fin[1], ci, rows, (images, poses_gt, disps, intr))

    _, wi, rows, (images, poses_gt, disps, intr) = worst
    print(f"\nworst clip {wi} per-step table:")
    for i, (fe, tr, ro, v) in enumerate(rows):
        n = V.build_schedule(args.n_frames, cfg.PATCHES_PER_FRAME,
                             args.unroll)[i].n
        print(f"step {i:2d} n={n:2d} flow={fe:7.2f} tr={tr:7.3f} "
              f"ro={ro:6.3f} valid={v:.2f}")

    # weight/delta health on the final step's full edge set
    from dpvo_tpu.models.patchifier import Patchifier
    from dpvo_tpu.models.update import Update
    from dpvo_tpu.geom import projective as pops
    from dpvo_tpu.ops import avg_pool2d_nhwc
    from dpvo_tpu.ops.corr import corr_features_xla
    from dpvo_tpu.ba import solver as ba_solver

    F = args.n_frames
    M = cfg.PATCHES_PER_FRAME
    sched = V.build_schedule(F, M, args.unroll)
    st = sched[-1]
    print(f"\nfinal edge set: {len(st.kk)} edges over {st.n} frames")

    # replicate the forward to capture delta/weight (fp32)
    fdt = jnp.float32
    images_n = (2.0 * (jnp.asarray(images) / 255.0) - 0.5).astype(fdt)
    intr4 = jnp.asarray(intr) / cfg.RES
    intr_all = jnp.tile(intr4[None], (F, 1))
    disps4 = jnp.asarray(disps)[:, 1::cfg.RES, 1::cfg.RES].astype(jnp.float32)
    pf = Patchifier(patch_size=P, dim=cfg.DIM, fdim=cfg.FDIM, dtype=fdt)
    up = Update(dim=cfg.DIM, p=P, dtype=fdt)
    k = jax.random.PRNGKey(0)
    fmap, gmap, imap, patches, _ = pf.apply(
        params["patchifier"], images_n, M, k, disps=disps4,
        centroid_sel_strat=cfg.CENTROID_SEL_STRAT)
    pyr1 = fmap.astype(fdt)
    pyr2 = avg_pool2d_nhwc(pyr1, 4)
    patches_gt = patches  # patchifier filled GT disparities
    patches = patches.at[:, 2].set(0.5)

    Gs = jnp.tile(se3.identity()[None], (F, 1))
    net = jnp.zeros((len(st.kk), cfg.DIM), fdt)
    kk = jnp.asarray(st.kk, jnp.int32)
    jj = jnp.asarray(st.jj, jnp.int32)
    ii = jnp.asarray(st.ii, jnp.int32)
    valid = jnp.ones(len(st.kk), bool)
    coords = pops.transform(Gs, patches, intr_all, ii, jj, kk)
    corr = corr_features_xla(gmap, pyr1, pyr2, coords.astype(jnp.float32),
                             kk, jj, valid, radius=cfg.CORR_RADIUS)
    corr = corr.reshape(len(st.kk), -1).astype(fdt)
    net, delta, weight = up.apply(
        params["update"], net, imap[kk].astype(fdt), corr,
        jnp.asarray(st.ix, jnp.int32), jnp.asarray(st.jx, jnp.int32),
        jnp.asarray(st.mask_ix), jnp.asarray(st.mask_jx),
        jnp.asarray(st.kk_seg), jnp.asarray(st.ij_seg), valid,
        num_segments=len(st.kk))
    w = np.asarray(weight)
    d = np.asarray(delta)
    print(f"weight: mean={w.mean():.4f} median={np.median(w):.4f} "
          f"p10={np.percentile(w,10):.4f} p90={np.percentile(w,90):.4f}")
    print(f"|delta|: mean={np.linalg.norm(d,axis=-1).mean():.3f} "
          f"p90={np.percentile(np.linalg.norm(d,axis=-1),90):.3f}")

    # counterfactual: oracle targets + network weights vs net targets
    from dpvo_tpu.utils.synthetic import MultiPlaneScene  # noqa: F401
    h4, w4 = fmap.shape[1], fmap.shape[2]
    bounds = jnp.array([-64.0, -64.0, w4 + 64.0, h4 + 64.0])

    def run_ba(target, wgt, Gs0, d0, iters=12):
        Gs_, patches_ = Gs0, patches.at[:, 2].set(d0)
        for _ in range(iters // 2):
            ctr = patches_[:, :, P // 2, P // 2]
            Gs_, depths = ba_solver.ba(
                Gs_, ctr, intr_all, target, wgt, valid, ii, jj, kk,
                jnp.int32(1), jnp.int32(st.n - 1), bounds, jnp.float32(1e-4),
                W=F, Md=F * M, iterations=2, ep=10.0, lm=1e-4, res_clip=250.0,
                clamp_mode="train")
            patches_ = patches_.at[:, 2].set(depths[:, None, None])
        tr, ro = pose_error(Gs_, jnp.asarray(poses_gt), st.n)
        return float(tr), float(ro)

    c = P // 2
    target_net = coords[:, c, c, :].astype(jnp.float32) + delta

    # ground-truth targets for every edge (GT poses + GT depths)
    gt_full, gt_val = pops.transform(
        jnp.asarray(poses_gt), patches_gt, intr_all, ii, jj, kk, valid=True)
    target_gt = gt_full[:, c, c, :]

    ones = jnp.ones_like(weight)
    print("\nBA counterfactuals (12 GN iters from identity, d0=0.5):")
    for name, tgt, wt in [
        ("net target, net weight ", target_net, weight),
        ("net target, weight=1   ", target_net, ones),
        ("gt  target, weight=1   ", target_gt, ones),
        ("gt  target, net weight ", target_gt, weight),
    ]:
        tr, ro = run_ba(tgt, wt, Gs, 0.5)
        print(f"  {name}: tr={tr:7.3f} ro={ro:6.3f}")


if __name__ == "__main__":
    main()
    os._exit(0)
