"""VONet training-time forward: full VO unroll with BA in the loop.

Re-design of VONet.forward (dpvo/net.py:426-522): on a short clip,
extract patches for every frame, initialize a factor graph among the
first 8 frames, then run STEPS update-operator + differentiable-BA
rounds while progressively adding frames — emitting per-step supervision
tuples for the flow/pose loss (train.py:86-117).

TPU-first structural difference: the reference grows edge tensors
dynamically at runtime; here the *entire edge schedule is static* given
(F, M, STEPS) — frames join at fixed steps — so every per-step edge
array, neighbor index, and SoftAgg grouping is precomputed in NumPy at
trace time and the unrolled jit graph has exact static shapes per step.
The reference's random 10% frame dropout (net.py:489-494) becomes a
traced validity mask so shapes stay fixed.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.ba import solver as ba_solver
from dpvo_tpu.config import Config
from dpvo_tpu.geom import projective as pops
from dpvo_tpu.lie import se3
from dpvo_tpu.models.patchifier import Patchifier
from dpvo_tpu.models.update import Update
from dpvo_tpu.ops import avg_pool2d_nhwc
from dpvo_tpu.ops.corr import corr_features_xla
from dpvo_tpu.parallel.shard import edge_shard
from dpvo_tpu.runtime.topology import neighbors


class StepTopo(NamedTuple):
    """Static per-step edge topology (NumPy, computed at trace time)."""

    kk: np.ndarray
    jj: np.ndarray
    ii: np.ndarray
    kk_seg: np.ndarray
    ij_seg: np.ndarray
    ix: np.ndarray
    jx: np.ndarray
    mask_ix: np.ndarray
    mask_jx: np.ndarray
    n: int                 # active frame count
    new_frame: int         # frame added at this step (-1 if none)
    sup: np.ndarray        # indices of supervised edges (0 < |ii-jj| <= 2)


def build_schedule(F: int, M: int, STEPS: int, init_frames: int = 8) -> List[StepTopo]:
    """Static edge growth schedule (ref net.py:458-497)."""
    init_frames = min(init_frames, F)
    ix_all = np.arange(F * M) // M

    kk = np.nonzero(ix_all < init_frames)[0]
    kk, jj = np.meshgrid(kk, np.arange(init_frames), indexing="ij")
    kk, jj = kk.reshape(-1), jj.reshape(-1)

    steps = []
    n = init_frames
    for s in range(STEPS):
        new_frame = -1
        if s >= init_frames and n < F:
            # (ref :479-484) old patches -> new frame; new patches -> all
            kk1 = np.nonzero(ix_all < n)[0]
            jj1 = np.full_like(kk1, n)
            kk2 = np.nonzero(ix_all == n)[0]
            kk2, jj2 = np.meshgrid(kk2, np.arange(n + 1), indexing="ij")
            kk = np.concatenate([kk, kk1, kk2.reshape(-1)])
            jj = np.concatenate([jj, jj1, jj2.reshape(-1)])
            new_frame = n
            n += 1

        ii = kk // M
        _, kk_seg = np.unique(kk, return_inverse=True)
        _, ij_seg = np.unique(ii * np.int64(1 << 20) + jj, return_inverse=True)
        nix, njx, hp, hn = neighbors(kk, jj)
        dij = np.abs(ii - jj)
        sup = np.nonzero((dij > 0) & (dij <= 2))[0]
        steps.append(
            StepTopo(kk.copy(), jj.copy(), ii, kk_seg.astype(np.int32),
                     ij_seg.astype(np.int32), nix, njx, hp, hn, n, new_frame, sup)
        )
    return steps


def vo_forward(
    params,
    cfg: Config,
    images,        # [F, H, W, 3] raw uint8-range floats
    poses_gt,      # [F, 7] world-to-camera
    disps,         # [F, H, W] ground-truth disparity (inverse depth)
    intrinsics,    # [4] full-res
    key,
    STEPS: int = 18,
    structure_only: bool = False,
    frozen_encoders: bool = False,
    remat: bool = True,
):
    """Returns a list of per-step supervision tuples:
    (valid [Es], coords [Es,P,P,2], coords_gt [Es,P,P,2], poses [F,7], n).

    ``remat`` wraps each unroll step in ``jax.checkpoint`` so the
    backward pass recomputes per-step corr/GRU activations instead of
    keeping all STEPS of them live — those drop from O(STEPS * E * 882)
    to O(E * 882) at ~1 extra forward of FLOPs (the per-step supervision
    outputs still scale with STEPS; they feed the loss directly). ``frozen_encoders`` severs the gradient path through the
    patchifier entirely (the optimizer already zeroes those updates),
    which also frees every encoder conv activation.
    """
    F, H, W, _ = images.shape
    M, P = cfg.PATCHES_PER_FRAME, cfg.P
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32

    images_n = (2.0 * (images / 255.0) - 0.5).astype(fdt)
    intr4 = intrinsics / cfg.RES
    intr_all = jnp.tile(intr4[None], (F, 1))
    disps4 = disps[:, 1 :: cfg.RES, 1 :: cfg.RES].astype(jnp.float32)

    pf = Patchifier(patch_size=P, dim=cfg.DIM, fdim=cfg.FDIM, dtype=fdt)
    up = Update(dim=cfg.DIM, p=P, dtype=fdt)

    k_pf, k_d, k_drop = jax.random.split(key, 3)
    fmap, gmap, imap, patches, _ = pf.apply(
        params["patchifier"], images_n, M, k_pf, disps=disps4,
        centroid_sel_strat=cfg.CENTROID_SEL_STRAT,
    )
    if frozen_encoders:
        fmap, gmap, imap, patches = jax.tree.map(
            jax.lax.stop_gradient, (fmap, gmap, imap, patches)
        )
    # fmap [F,h,w,fdim] -> 2-level NHWC pyramid (ref CorrBlock levels 1,4)
    pyr1 = fmap.astype(fdt)
    pyr2 = avg_pool2d_nhwc(pyr1, 4)

    patches_gt = patches
    d0 = jax.random.uniform(k_d, (F * M,))
    patches = patches.at[:, 2].set(jnp.broadcast_to(d0[:, None, None], (F * M, P, P)))

    schedule = build_schedule(F, M, STEPS)
    E_total = len(schedule[-1].kk)
    net_full = jnp.zeros((E_total, cfg.DIM), fdt)

    Gs = jnp.tile(se3.identity()[None], (F, 1))
    if structure_only:
        Gs = poses_gt

    h4, w4 = fmap.shape[1], fmap.shape[2]
    bounds = jnp.array([-64.0, -64.0, w4 + 64.0, h4 + 64.0])
    drop_keys = jax.random.split(k_drop, STEPS)

    traj = []
    for s, st in enumerate(schedule):
        Es = len(st.kk)
        kk = jnp.asarray(st.kk, jnp.int32)
        jj = jnp.asarray(st.jj, jnp.int32)
        ii = jnp.asarray(st.ii, jnp.int32)
        sup = st.sup

        def step_body(Gs, patches, net_full, step_key,
                      st=st, Es=Es, kk=kk, jj=jj, ii=ii, sup=sup):
            if st.new_frame > 0:
                nf = st.new_frame
                if not structure_only:
                    Gs = Gs.at[nf].set(Gs[nf - 1])  # (ref :478)
                # median depth init from the previous two frames (ref :496)
                prev = patches[(nf - 2) * M : nf * M, 2]
                med = jnp.median(prev)
                patches = patches.at[nf * M : (nf + 1) * M, 2].set(med)

            # random frame-edge dropout as a validity mask (ref :489-494).
            # The split (discarding the second key) keeps the dropout
            # draws identical to the pre-remat RNG stream.
            ks1, _ = jax.random.split(step_key)
            do_drop = jax.random.uniform(ks1) < 0.1
            drop_frame = st.n - 4
            dropped = (ii == drop_frame) | (jj == drop_frame)
            valid = ~(do_drop & dropped)

            Gs = jax.lax.stop_gradient(Gs)
            patches = jax.lax.stop_gradient(patches)

            coords = edge_shard(pops.transform(Gs, patches, intr_all, ii, jj, kk))
            corr = corr_features_xla(
                gmap, pyr1, pyr2, coords.astype(jnp.float32), kk, jj, valid,
                radius=cfg.CORR_RADIUS,
            )
            corr = edge_shard(corr.reshape(Es, -1).astype(fdt))

            net = edge_shard(net_full[:Es])
            net, delta, weight = up.apply(
                params["update"], net, imap[kk].astype(fdt), corr,
                jnp.asarray(st.ix, jnp.int32), jnp.asarray(st.jx, jnp.int32),
                jnp.asarray(st.mask_ix), jnp.asarray(st.mask_jx),
                jnp.asarray(st.kk_seg), jnp.asarray(st.ij_seg), valid,
                num_segments=Es,
            )
            net_full = net_full.at[:Es].set(net)

            target = coords[:, P // 2, P // 2, :].astype(jnp.float32) + delta
            wgt = weight * valid[:, None]

            # two differentiable BA iterations (ref :509-511). During the
            # structure_only warmup the reference BA freezes ALL poses at
            # ground truth and solves depths only (ref ba.py BA(...,
            # structure_only=True) via train.py so<1000) — nfree=0 makes
            # the pose system an identity solve here.
            ctr = patches[:, :, P // 2, P // 2]  # all F*M patches are depth vars
            nfree = jnp.int32(0 if structure_only else st.n - 1)
            Gs, depths = ba_solver.ba(
                Gs, ctr, intr_all, target, wgt, valid, ii, jj, kk,
                jnp.int32(1), nfree, bounds, jnp.float32(1e-4),
                W=F, Md=F * M, iterations=2, ep=10.0, lm=1e-4, res_clip=250.0,
                clamp_mode="train",
            )
            dz = depths - ctr[:, 2]
            patches = patches.at[:, 2].add(dz[:, None, None])

            # supervision on short-baseline edges (ref :513-520)
            cs = pops.transform(Gs, patches, intr_all, ii[sup], jj[sup], kk[sup])
            cs_gt, val_gt = pops.transform(
                poses_gt, patches_gt, intr_all, ii[sup], jj[sup], kk[sup], valid=True
            )
            val = val_gt * valid[sup]
            return Gs, patches, net_full, (val, cs, cs_gt, Gs)

        if remat:
            step_body = jax.checkpoint(step_body)
        Gs, patches, net_full, out = step_body(Gs, patches, net_full, drop_keys[s])
        traj.append((*out, st.n))

    return traj
