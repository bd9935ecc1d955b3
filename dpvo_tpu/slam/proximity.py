"""Proximity loop closure — the DPV-SLAM "fast" backend.

Re-design of PatchGraph.edges_loop (dpvo/patchgraph.py:65-91) + the
numba NMS reduce_edges (dpvo/loop_closure/optim_utils.py:24-60): every
GLOBAL_OPT_FREQ frames, propose edges from old patches (age <=
MAX_EDGE_AGE) into recent frames, keep pairs whose mean reprojection
flow is below BACKEND_THRESH with >=75% valid patches, then non-max
suppress to at most 1000 frame pairs separated by >=30 frames. Selected
pairs trigger full-history global BA (runtime/steps.py _global_ba).

The flow scoring runs on device over a fixed-capacity candidate buffer;
the tiny NMS runs on host NumPy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.geom import projective as pops

LC_CAND_MAX = 1 << 20  # padded candidate-edge capacity
MIN_SEPARATION = 30    # frames between a proximity pair (ref optim_utils.py:37)


@partial(jax.jit, static_argnames=("P",))
def _lc_flow(poses, patches_ctr, intrinsics, ii, jj, kk, valid, P: int = 1):
    """Center-pixel flow magnitude for candidate edges
    (ref patchgraph.py:80, beta=0.5, patches collapsed to centers)."""
    mag, val = pops.flow_mag(poses, patches_ctr, intrinsics, ii, jj, kk, beta=0.5)
    mag = mag[:, 0, 0]
    # flow_mag's validity is evaluated at the patch center only -> [E]
    val = val & valid
    return mag, val


def reduce_edges(flow_mag, ii, jj, max_num_edges=1000, nms=1):
    """Greedy NMS over candidate frame pairs (NumPy port of the numba
    kernel, optim_utils.py:24-60)."""
    es = []
    if ii.size == 0:
        return np.zeros((0, 2), np.int64)
    Ni, Nj = ii.max() + 1, jj.max() + 1
    ignore = np.zeros((Ni, Nj), bool)
    for idx in np.argsort(flow_mag):
        if len(es) >= max_num_edges:
            break
        i, j, mag = ii[idx], jj[idx], flow_mag[idx]
        if (j - i) < MIN_SEPARATION or mag >= 1000 or ignore[i, j]:
            continue
        es.append((i, j))
        for di in range(-nms, nms + 1):
            if 0 <= i + di < Ni:
                ignore[i + di, j] = True
    return np.asarray(es, np.int64).reshape(-1, 2)


def edges_loop(slam):
    """Propose loop-closure edges (kk, jj) for the current graph
    (ref patchgraph.py:65-91)."""
    cfg = slam.cfg
    M = cfg.PATCHES_PER_FRAME
    n = slam.n
    l = n - cfg.REMOVAL_WINDOW
    if l <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    lo_patch = max(l - cfg.MAX_EDGE_AGE, 0) * M
    jj_r = np.arange(max(n - cfg.GLOBAL_OPT_FREQ, 0), n - cfg.KEYFRAME_INDEX)
    kk_r = np.arange(lo_patch, l * M)
    JJ, KK = np.meshgrid(jj_r, kk_r, indexing="ij")
    jj, kk = JJ.reshape(-1), KK.reshape(-1)
    ii = kk // M
    E = len(jj)
    if E == 0 or E > LC_CAND_MAX:
        if E > LC_CAND_MAX:
            # keep the most recent candidates (bounded capacity)
            jj, kk, ii = jj[-LC_CAND_MAX:], kk[-LC_CAND_MAX:], ii[-LC_CAND_MAX:]
            E = LC_CAND_MAX
        else:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)

    pad = int(2 ** np.ceil(np.log2(max(E, 1024))))
    iiP = np.zeros(pad, np.int32); iiP[:E] = ii
    jjP = np.zeros(pad, np.int32); jjP[:E] = jj
    kkP = np.zeros(pad, np.int32); kkP[:E] = kk
    vP = np.zeros(pad, bool); vP[:E] = True

    # collapse patches to their center pixel (ref patchgraph.py:80)
    c = cfg.P // 2
    import jax.numpy as _jnp
    ctr = _jnp.concatenate(
        [slam.state.patches[:, :2, c : c + 1, c : c + 1],
         slam.state.dvec[:, None, None, None]], axis=1)
    mag, val = _lc_flow(
        slam.state.poses, ctr, slam.state.intrinsics,
        jnp.asarray(iiP), jnp.asarray(jjP), jnp.asarray(kkP), jnp.asarray(vP),
    )
    mag = np.asarray(mag[:E]).reshape(len(jj_r), -1)   # [frames, patches]
    val = np.asarray(val[:E]).reshape(len(jj_r), -1)

    # per frame-pair aggregation, grouped in M-sized patch blocks
    fl = mag.shape[1] // M
    mag_sum = (mag * val).reshape(len(jj_r), fl, M).sum(-1)
    num_val = np.maximum(val.reshape(len(jj_r), fl, M).sum(-1), 1)
    flow = np.where(num_val > (M * 0.75), mag_sum / num_val, np.inf)

    pair_ii = (kk_r.reshape(fl, M)[:, 0] // M)[None, :].repeat(len(jj_r), 0)
    pair_jj = jj_r[:, None].repeat(fl, 1)
    mask = flow < cfg.BACKEND_THRESH

    es = reduce_edges(flow[mask], pair_ii[mask], pair_jj[mask], max_num_edges=1000, nms=1)
    if len(es) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    ei, ej = es[:, 0], es[:, 1]
    kk_out = (ei[:, None] * M + np.arange(M)[None, :]).reshape(-1)
    jj_out = np.repeat(ej, M)
    return kk_out, jj_out
