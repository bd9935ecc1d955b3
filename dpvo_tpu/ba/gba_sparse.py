"""O(edges)-memory global bundle adjustment (EfficentE analog).

The windowed solver (ba/solver.py) turns every pose/depth-indexed
reduction into dense one-hot matmuls — ideal at W=16 poses, catastrophic
at global-BA scale: with Eg edges and Md depth vars it materializes an
[Eg, Md] one-hot (3.2 GB at round-1 capacities) and a dense pose-depth
coupling E6 [6W, Md]. The reference solves the same problem with the
block-sparse CUDA kernels in dpvo/fastba/block_e.cu:43-299, which never
materialize E: the reduced camera system S = B - E Q E^T is accumulated
from per-depth-variable outer products.

This module is the TPU-native equivalent:

  - The HOST (which owns all topology anyway, runtime/topology.py)
    enumerates the sparsity pattern once per global-BA event:
      rows    : one entry per (edge, free-pose) incidence,
      entries : distinct (depth k, pose a) pairs ("F"), each row mapped
                to its entry,
      kpairs  : all ordered entry pairs sharing a depth var — exactly
                the nonzero 6x6 blocks of E Q E^T.
  - The DEVICE computes per-edge residuals/Jacobians, reduces rows into
    per-entry couplings F[f] = sum_{rows r -> f} J_r^T w Jz  (one
    segment_sum), forms the kpair outer products Q_k F[f1] F[f2]^T in
    bounded chunks, and segment-sums them straight into the dense
    reduced system S [6W, 6W]. Everything is static-shaped and masked;
    no [Eg, Md] or [6W, Md] tensor ever exists.

Memory: O(Eg + rows + kpairs + (6W)^2). Compute per GN iteration: a few
segment_sums plus one dense Cholesky of S.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.ba.solver import (
    BAProblem,
    _center_residuals,
    apply_depth_retr,
    apply_pose_retr,
)


def build_sparse_indices(
    ii: np.ndarray,
    jj: np.ndarray,
    kd: np.ndarray,
    t0: int,
    nfree: int,
    *,
    W: int,
    R_MAX: int,
    KP_MAX: int,
) -> Dict[str, np.ndarray]:
    """Host-side sparsity enumeration for one global-BA topology.

    ii/jj/kd: the VALID edges only (un-padded). Returns padded device-
    ready index arrays; see module docstring for the row/entry/kpair
    roles. All arrays int32 except the masks.
    """
    E = len(ii)
    pi = ii.astype(np.int64) - t0
    pj = jj.astype(np.int64) - t0

    # rows: (edge, local pose, side) for every free-pose incidence
    fi = (pi >= 0) & (pi < nfree)
    fj = (pj >= 0) & (pj < nfree)
    re = np.concatenate([np.nonzero(fi)[0], np.nonzero(fj)[0]])
    ra = np.concatenate([pi[fi], pj[fj]])
    rs = np.concatenate([np.zeros(fi.sum(), bool), np.ones(fj.sum(), bool)])
    rk = kd[re].astype(np.int64)
    R = len(re)
    assert R <= R_MAX, f"GBA rows {R} exceed capacity {R_MAX}"

    # entries: distinct (depth, pose) pairs; rows map onto them
    key = rk * W + ra
    ent_key, r2f = np.unique(key, return_inverse=True)
    F = len(ent_key)
    fk = (ent_key // W).astype(np.int32)
    fa = (ent_key % W).astype(np.int32)

    # kpairs: ordered entry pairs within each depth group (entries are
    # sorted by key = k*W + a, so depth groups are contiguous runs);
    # vectorized per-group meshgrid via repeat offsets
    if F:
        edges_ = np.concatenate([[0], np.nonzero(np.diff(fk))[0] + 1, [F]])
        sizes = np.diff(edges_)          # entries per depth group
        gstart = edges_[:-1]
        sq = sizes * sizes
        starts = np.repeat(gstart, sq)
        m = np.repeat(sizes, sq)
        off = np.repeat(np.cumsum(sq) - sq, sq)
        loc = np.arange(sq.sum()) - off  # position within the group's pair block
        p1 = (starts + loc // m).astype(np.int64)
        p2 = (starts + loc % m).astype(np.int64)
    else:
        sizes = np.zeros(0, np.int64)
        sq = sizes
        p1 = p2 = np.zeros(0, np.int64)
    KP = len(p1)
    fkeep = np.ones(F, bool)
    if KP > KP_MAX:
        # Capacity overflow: keep the smallest depth groups' couplings
        # intact and FREEZE the depth variables of every group that
        # loses couplings (fkeep=False on their entries -> excluded from
        # the E Q E^T subtraction, the E Q u correction, AND the depth
        # back-substitution). Freezing keeps the Gauss-Newton system
        # CONSISTENT — the earlier scheme dropped couplings from S but
        # still back-substituted those depths against the full E, a
        # mismatch that measurably destabilizes long loop-closure runs
        # (the 250-frame soak diverged to 1e13 translations after ~50
        # such GBA rounds; tests/test_soak.py).
        pair_group = np.repeat(np.arange(len(sizes)), sq)
        order = np.argsort(np.repeat(sizes, sq), kind="stable")
        keep = order[:KP_MAX]
        kept_per_group = np.bincount(pair_group[keep], minlength=len(sizes))
        clean = kept_per_group == sq
        # drop ALL pairs of unclean groups (their depths are frozen)
        keep = keep[clean[pair_group[keep]]]
        entry_group = np.repeat(np.arange(len(sizes)), sizes)
        fkeep = clean[entry_group]
        print(f"warning: GBA kpairs {KP} exceed {KP_MAX}; freezing "
              f"{int((~clean).sum())} depth groups this round")
        p1, p2 = p1[keep], p2[keep]
        KP = len(p1)

    def pad(a, n, dt=np.int32):
        out = np.zeros(n, dt)
        out[: len(a)] = a
        return out

    return dict(
        re=pad(re, R_MAX), ra=pad(ra, R_MAX), rs=pad(rs, R_MAX, bool),
        r2f=pad(r2f, R_MAX), rmask=pad(np.ones(R, bool), R_MAX, bool),
        fk=pad(fk, R_MAX), fa=pad(fa, R_MAX),
        fmask=pad(np.ones(F, bool), R_MAX, bool),
        fkeep=pad(fkeep, R_MAX, bool),
        p1=pad(p1, KP_MAX), p2=pad(p2, KP_MAX),
        kpmask=pad(np.ones(KP, bool), KP_MAX, bool),
    )


_PAIR_CHUNK_SIZE = 1 << 20  # pairs per fori_loop body (VMEM-bounded)


def _pair_chunks(total: int, chunk: int) -> int:
    return -(-total // chunk)


def _iteration(poses, depths, patch_ctr, intrinsics, target, weight, valid,
               ii, jj, kd, t0, nfree, bounds, lmbda, idx,
               *, W, Md, ep, lm, res_clip, axis=None):
    """One sparse Gauss-Newton iteration; returns (poses', depths').

    With ``axis`` set (inside shard_map), the row/entry/pair reductions
    are partial over the local shard and psum'd over that axis; the
    (cheap) edge-side terms are computed replicated."""
    prob = BAProblem(
        poses,
        jnp.concatenate([patch_ctr[:, :2], depths[:, None]], -1),
        intrinsics, target, weight, valid, ii, jj, kd, t0, nfree,
    )
    r, w, Ji, Jj, Jz = _center_residuals(prob, bounds, res_clip)
    r = r.astype(jnp.float32)
    w = w.astype(jnp.float32)
    Ji, Jj, Jz = (x.astype(jnp.float32) for x in (Ji, Jj, Jz))
    Jz = Jz[:, :, 0]  # [E,2]

    def allsum(x):
        return jax.lax.psum(x, axis) if axis else x

    # depth-side diagonal + gradient (replicated edges: no psum)
    C = jax.ops.segment_sum(jnp.sum(w * Jz * Jz, -1), kd, Md)
    u = jax.ops.segment_sum(jnp.sum(w * Jz * r, -1), kd, Md)
    Q = 1.0 / (C + lmbda)

    # pose-side B and v from per-edge 6x6 blocks (free-masked)
    pi = ii - t0
    pj = jj - t0
    fi = ((pi >= 0) & (pi < nfree)).astype(jnp.float32)
    fj = ((pj >= 0) & (pj < nfree)).astype(jnp.float32)
    pic = jnp.clip(pi, 0, W - 1)
    pjc = jnp.clip(pj, 0, W - 1)

    def blk(Ja, Jb, m):
        return jnp.einsum("nc,ncd,nce->nde", w * m[:, None], Ja, Jb)

    vals = jnp.concatenate([
        blk(Ji, Ji, fi), blk(Ji, Jj, fi * fj),
        blk(Jj, Ji, fj * fi), blk(Jj, Jj, fj),
    ])
    segs = jnp.concatenate([
        pic * W + pic, pic * W + pjc, pjc * W + pic, pjc * W + pjc,
    ])
    B = jax.ops.segment_sum(vals, segs, W * W)  # [W*W,6,6]

    wr = w * r
    vvals = jnp.concatenate([
        jnp.einsum("nc,ncd->nd", wr * fi[:, None], Ji),
        jnp.einsum("nc,ncd->nd", wr * fj[:, None], Jj),
    ])
    v = jax.ops.segment_sum(vvals, jnp.concatenate([pic, pjc]), W)  # [W,6]

    # per-row pose-depth couplings -> per-(k, pose) entries F
    re, rs, r2f, rmask = idx["re"], idx["rs"], idx["r2f"], idx["rmask"]
    fk, fa, fmask = idx["fk"], idx["fa"], idx["fmask"]
    fkeep = idx.get("fkeep", fmask)  # entries of non-frozen depth groups
    p1, p2, kpmask = idx["p1"], idx["p2"], idx["kpmask"]
    F = fk.shape[0]
    Jr = jnp.where(rs[:, None, None], Jj[re], Ji[re])  # [R,2,6]
    ekr = jnp.einsum("rc,rcd->rd", (w * Jz)[re], Jr) * rmask[:, None]
    Fe = allsum(jax.ops.segment_sum(ekr, r2f, F))  # [F,6]

    # E Q E^T accumulated into S via bounded pair chunks
    KP = p1.shape[0]
    PAIR_CHUNK = min(KP, _PAIR_CHUNK_SIZE)
    # pad to a chunk multiple: dynamic_slice CLAMPS an overrunning start,
    # which would re-read (and double-subtract) pairs from the previous
    # chunk whenever KP (the local shard size under dist_gba) is not a
    # chunk multiple; padded positions carry kpmask=False -> zero coef
    KPp = _pair_chunks(KP, PAIR_CHUNK) * PAIR_CHUNK
    if KPp != KP:
        p1 = jnp.pad(p1, (0, KPp - KP))
        p2 = jnp.pad(p2, (0, KPp - KP))
        kpmask = jnp.pad(kpmask, (0, KPp - KP))

    def pair_chunk(c, S):
        s = c * PAIR_CHUNK
        q1 = jax.lax.dynamic_slice_in_dim(p1, s, PAIR_CHUNK)
        q2 = jax.lax.dynamic_slice_in_dim(p2, s, PAIR_CHUNK)
        qm = jax.lax.dynamic_slice_in_dim(kpmask, s, PAIR_CHUNK)
        coef = Q[fk[q1]] * qm
        pv = coef[:, None, None] * (Fe[q1][:, :, None] * Fe[q2][:, None, :])
        seg = fa[q1] * W + fa[q2]
        return S - jax.ops.segment_sum(pv, seg, W * W)

    Spairs = jax.lax.fori_loop(
        0, _pair_chunks(KP, PAIR_CHUNK), pair_chunk, jnp.zeros_like(B))
    S = B + allsum(Spairs)
    S = S.reshape(W, W, 6, 6).transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    # truncated kpairs can drop one of a symmetric block pair
    S = 0.5 * (S + S.T)

    # y = v - E Q u, accumulated per entry (frozen-depth entries are
    # excluded so y matches the truncated S)
    equ = Fe * (Q[fk] * u[fk] * (fmask & fkeep))[:, None]
    # NOTE: entry arrays (fk/fa/fmask) are replicated even under
    # sharding, so this reduction needs no psum
    y = (v - jax.ops.segment_sum(equ, fa, W)).reshape(6 * W)

    # damping + fixed/padded-row masking (ref ba_cuda.cu:519-563)
    S = S + jnp.diag(lm * jnp.diag(S) + ep)
    free_row = (jnp.arange(W) < nfree).repeat(6)
    S = S * (free_row[:, None] & free_row[None, :]) + jnp.diag(
        (~free_row).astype(jnp.float32)
    )
    y = y * free_row

    L, lower = jax.scipy.linalg.cho_factor(S)
    dX = jax.scipy.linalg.cho_solve((L, lower), y)
    bad = jnp.any(jnp.isnan(dX)) | jnp.any(jnp.isinf(dX))
    dX = jnp.where(bad, 0.0, dX).reshape(W, 6)

    # dZ = Q (u - E^T dX), the E^T dX reduction riding the entries
    et_dx = jax.ops.segment_sum(
        jnp.einsum("fd,fd->f", Fe, dX[fa]) * fmask, fk, Md
    )
    # depth vars of frozen groups take NO update this round
    frozen = jax.ops.segment_sum(
        (fmask & ~fkeep).astype(jnp.float32), fk, Md
    )
    dZ = jnp.where(bad | (frozen > 0), 0.0, Q * (u - et_dx))

    poses = apply_pose_retr(poses, dX, t0, nfree, W)
    depths = apply_depth_retr(depths, dZ, "runtime")
    return poses, depths


@partial(jax.jit, static_argnames=("W", "Md", "iterations", "ep", "lm", "res_clip"))
def gba(
    poses,
    patch_ctr,
    intrinsics,
    target,
    weight,
    valid,
    ii,
    jj,
    kd,
    t0,
    nfree,
    bounds,
    lmbda,
    idx: Dict[str, jax.Array],
    *,
    W: int,
    Md: int,
    iterations: int = 2,
    ep: float = 1.0,
    lm: float = 1e-4,
    res_clip: float = 128.0,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse-assembled global BA; returns (poses', depths').

    Same contract as ba_solver.ba with clamp_mode="runtime", plus the
    host-built `idx` sparsity (build_sparse_indices).
    """
    depths = patch_ctr[:, 2]
    for _ in range(iterations):
        poses, depths = _iteration(
            poses, depths, patch_ctr, intrinsics, target, weight, valid,
            ii, jj, kd, t0, nfree, bounds, lmbda, idx,
            W=W, Md=Md, ep=ep, lm=lm, res_clip=res_clip,
        )
    return poses, depths


def dist_gba(
    mesh,
    poses,
    patch_ctr,
    intrinsics,
    target,
    weight,
    valid,
    ii,
    jj,
    kd,
    t0,
    nfree,
    bounds,
    lmbda,
    idx: Dict[str, jax.Array],
    *,
    W: int,
    Md: int,
    iterations: int = 2,
    ep: float = 1.0,
    lm: float = 1e-4,
    res_clip: float = 128.0,
) -> Tuple[jax.Array, jax.Array]:
    """Distributed sparse global BA over a device mesh (SURVEY §2.9).

    The dominant global-BA work — the E Q E^T coupling-pair outer
    products and the row reductions — shards over the mesh's 'edge'
    axis; each device accumulates a partial reduced camera system that
    is psum'd over ICI, and the (small) dense solve runs redundantly on
    every device. The per-edge Jacobian terms are cheap and computed
    replicated. Bitwise-matches the single-device `gba` up to psum
    reduction order."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    rep = P()
    shardspec = P("edge")
    idx_specs = {
        # rows + pairs shard; entry tables stay replicated
        "re": shardspec, "ra": shardspec, "rs": shardspec, "r2f": shardspec,
        "rmask": shardspec,
        "fk": rep, "fa": rep, "fmask": rep, "fkeep": rep,
        "p1": shardspec, "p2": shardspec, "kpmask": shardspec,
    }

    def body(poses, patch_ctr, intrinsics, target, weight, valid,
             ii, jj, kd, t0, nfree, bounds, lmbda, idx):
        depths = patch_ctr[:, 2]
        for _ in range(iterations):
            poses, depths = _iteration(
                poses, depths, patch_ctr, intrinsics, target, weight, valid,
                ii, jj, kd, t0, nfree, bounds, lmbda, idx,
                W=W, Md=Md, ep=ep, lm=lm, res_clip=res_clip, axis="edge",
            )
        return poses, depths

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(rep,) * 13 + (idx_specs,),
        out_specs=(rep, rep),
        check_rep=False,
    )
    return fn(poses, patch_ctr, intrinsics, target, weight, valid,
              ii, jj, kd, t0, nfree, bounds, lmbda, idx)
