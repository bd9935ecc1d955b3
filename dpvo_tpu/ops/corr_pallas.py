"""Pallas TPU kernel for sparse patch<->frame correlation.

TPU-native replacement for the reference altcorr CUDA kernel
(dpvo/altcorr/correlation_kernel.cu:82-175). The XLA gather formulation
in ops/corr.py moves one 16x16x128 region per edge through HBM
(~2.4 GB per level at E=36k); this kernel instead exploits that edges
sharing a target frame reuse the same feature map:

  1. edges are processed sorted by target frame jj,
  2. the full target feature map is DMA'd into a zero-padded VMEM
     cache once per distinct frame (~22 loads x ~6 MB instead of 36k
     x 64 KB),
  3. each edge slices its P^2 patch-pixel windows [D,2D,C] out of VMEM
     (aligned wide loads, no per-load rotate) and contracts them
     against the patch features on the MXU. The loop body is P^2 loads,
     ONE dot and ONE [P2, 2D*D] tile write; everything per-PIXEL — the
     8-alignment remainder of each window and the 2x2 bilinear
     reduction — happens outside in XLA as take_along_axis over the
     wide grid, vectorized across all edges at full lane width.

The kernel emits the raw wide-window dot-products s[e, p, u*2D + x2]
(f32 accumulated, bf16 stored).

Padded / fully-invalid edges (sorted to the tail) skip the loads and
dots entirely and emit zeros.

Out-of-image samples read the zeroed cache border, reproducing the
reference kernel's zero-outside-bounds semantics exactly; windows that
fall entirely outside the padded image are killed via the bilinear
weights.

Output layout (canonical "corr feature" order, shared with the
differentiable XLA path in ops/corr.py:corr_features_xla):

  out[e, p, u*D + v]  with p = py*P+px, u = dy, v = dx  (u,v < D-1
  valid, the last row/column are zero), one [E, P*P, D*D] block per
  pyramid level, concatenated on the last axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

EB = 128  # edges per grid step
# edges per fori_loop iteration: amortizes the ~1k-cycle loop/load floor
# against the (quadratically growing) cross-edge dot waste; sweepable on
# hardware without code edits
G_EDGES = int(os.environ.get("DPVO_CORR_G", "4"))
assert EB % G_EDGES == 0


def corr_sort_order(jj, n_valid: int, E_cap: int, mem: int):
    """Host-side valid-first stable sort of edges by fmap slot jj % mem,
    plus its inverse — THE contract the correlation kernels expect
    (edges sorted so same-slot edges are contiguous and the nv valid
    edges come first). _corr_features_common derives the identical
    order on device when no host order is shipped; keep the two in
    lockstep (see tests/test_corr.py::test_corr_sort_order_contract).

    jj: [>= n_valid] int array of target frame indices (only the first
    n_valid entries are live). Returns (order, inv) as int64 [E_cap].
    """
    import numpy as np

    key = np.full(E_cap, np.iinfo(np.uint16).max, np.uint16)
    key[:n_valid] = np.asarray(jj[:n_valid]) % mem  # mem << 2^16
    order = np.argsort(key, kind="stable").astype(np.int64)  # u16 radix
    inv = np.empty(E_cap, np.int64)
    inv[order] = np.arange(E_cap)
    return order, inv


def _make_kernel(H2: int, W2: int, C: int, D: int, P2: int):
    W = D * D
    WX = D * 2 * D  # wide (unrotated) window rows per patch pixel

    def kernel(jj_s, cy_s, cx_s, nv_s, f1_r, fmap_r, out_r, cache_r, win_r,
               loaded_r, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            loaded_r[0] = -1
            cache_r[:] = jnp.zeros_like(cache_r)

        # one vectorized zero-fill covers the invalid suffix (the output
        # buffer is uninitialized memory; the XLA epilogue multiplies by
        # 0 but 0 * garbage-NaN would stick), so the edge loop below has
        # NO per-edge validity branch: it simply stops at this block's
        # valid-group count (edges are sorted valid-first; a partial
        # tail group computes finite garbage on padded edges that the
        # epilogue's validity weights zero out)
        out_r[:] = jnp.zeros_like(out_r)
        nv = jnp.clip(nv_s[0, 0] - pl.program_id(0) * EB, 0, EB)

        G = G_EDGES  # edges per loop iteration: amortizes loop overhead
        #        and feeds the MXU one [G*P2, C]x[G*P2*WX, C]^T dot whose
        #        rows/lanes are ~Gx better utilized than per-edge dots

        def body(g, _):
            e0 = g * G
            for q in range(G):
                j = jj_s[0, e0 + q]

                @pl.when(j != loaded_r[0])
                def _():
                    loaded_r[0] = j
                    cp = pltpu.make_async_copy(
                        fmap_r.at[j],
                        cache_r.at[pl.ds(D, H2), pl.ds(D, W2), :],
                        sem,
                    )
                    cp.start()
                    cp.wait()

                # sublane (x) slices must be 8-aligned on TPU: load the
                # aligned 2D-wide strip as-is (bf16, no rotate); the
                # fractional offset is undone by the epilogue in XLA
                for p in range(P2):
                    cx = cx_s[e0 + q, p]
                    d = jax.lax.rem(cx, 8)
                    cxa = pl.multiple_of(cx - d, 8)
                    win_r[(q * P2 + p) * WX:(q * P2 + p + 1) * WX, :] = cache_r[
                        pl.ds(cy_s[e0 + q, p], D), pl.ds(cxa, 2 * D), :
                    ].reshape(WX, C)

            # MXU: [G*P2, C] x [G*P2*WX, C]^T -> [G*P2, G*P2*WX]. This
            # orientation keeps the result on full 128-lane tiles
            # (WX = 2*D*D = 128); each edge's own-window block diagonal
            # comes out with STATIC slices — no padded-lane select math
            f1g = jnp.concatenate([f1_r[e0 + q] for q in range(G)], axis=0)
            res = jax.lax.dot_general(
                f1g, win_r[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G*P2, G*P2*WX]
            for q in range(G):
                s = jnp.stack([
                    res[q * P2 + p, (q * P2 + p) * WX:(q * P2 + p + 1) * WX]
                    for p in range(P2)
                ])
                out_r[e0 + q] = s.astype(out_r.dtype)
            return 0

        jax.lax.fori_loop(0, (nv + G - 1) // G, body, 0)

    return kernel


def _corr_level(fmap, f1, cs, jjk, vs, radius: int, interpret: bool):
    """One pyramid level. fmap [mem,H2,W2,C]; f1 [E,P2,C] bf16 sorted;
    cs [E,P2,2] sorted coords at this level's scale; jjk [E] sorted
    frame ids (padding clamped); vs [E] sorted validity."""
    E, P2, C = f1.shape
    mem, H2, W2, _ = fmap.shape
    D = 2 * radius + 2
    W = D * D

    # DMA slice widths must be 8-aligned (sublane tiling); zero-pad the
    # map width — identical to the out-of-image zero semantics
    W2a = -(-W2 // 8) * 8
    if W2a != W2:
        fmap = jnp.pad(fmap, ((0, 0), (0, 0), (0, W2a - W2), (0, 0)))

    x = cs[..., 0]
    y = cs[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dxf = (x - x0).astype(jnp.float32)
    dyf = (y - y0).astype(jnp.float32)
    sy = y0.astype(jnp.int32) - radius
    sx = x0.astype(jnp.int32) - radius
    vp = (vs[:, None] & (sy >= -D) & (sy <= H2) & (sx >= -D) & (sx <= W2))
    vf = vp.astype(jnp.float32)
    cy = (jnp.clip(sy, -D, H2) + D).astype(jnp.int32)
    cx = (jnp.clip(sx, -D, W2) + D).astype(jnp.int32)

    grid = (E // EB,)
    smem = lambda *blk: pl.BlockSpec(blk, lambda i: (i,) + (0,) * (len(blk) - 1),
                                     memory_space=pltpu.SMEM)
    vmem = lambda *blk: pl.BlockSpec(blk, lambda i: (i,) + (0,) * (len(blk) - 1),
                                     memory_space=pltpu.VMEM)
    s = pl.pallas_call(
        _make_kernel(H2, W2a, C, D, P2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, EB), lambda i: (0, i), memory_space=pltpu.SMEM),  # jj
            smem(EB, P2),        # cy
            smem(EB, P2),        # cx
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),  # n_valid
            vmem(EB, P2, C),     # f1
            pl.BlockSpec(memory_space=pltpu.ANY),  # fmap (HBM)
        ],
        out_specs=vmem(EB, P2, 2 * W),
        out_shape=jax.ShapeDtypeStruct((E, P2, 2 * W), jnp.bfloat16),
        scratch_shapes=[
            # x is the sublane dim: pad right by an extra D so the
            # aligned 2D-wide strip loads stay in bounds
            pltpu.VMEM((H2 + 2 * D, W2a + 3 * D, C), fmap.dtype),
            pltpu.VMEM((G_EDGES * P2 * D * 2 * D, C), fmap.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(jjk[None], cy, cx, jnp.sum(vs).astype(jnp.int32)[None, None], f1, fmap)

    if os.environ.get("DPVO_CORR_NOEPI"):  # perf diagnosis: kernel cost only
        return jnp.pad(s.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, 0)))[..., :D * D]

    # Window selection (alignment remainder) + 2x2 bilinear reduction,
    # vectorized over all edges in XLA. The kernel emitted the WIDE
    # per-pixel grid s[p, u*2D + x2]; channel (u, v) samples x2 = d+v
    # with d in 0..7 the 8-alignment remainder of the window corner.
    # Per-element gathers are pathological on TPU, so build the 8
    # possible windows with STATIC slices and blend with a one-hot over
    # d — pure shifts/selects, fully vectorized.
    Ep_ = s.shape[0]
    s4 = s.astype(jnp.float32).reshape(Ep_, P2, D, 2 * D)
    drem = cx % 8  # [E,P2]
    sel = jnp.stack([s4[..., k:k + D] for k in range(8)])  # [8,E,P2,D,D]
    oh = (drem[None] == jnp.arange(8)[:, None, None]).astype(jnp.float32)
    sw = jnp.einsum("kep,kepuv->epuv", oh, sel).reshape(Ep_, P2, W)

    # 2x2 bilinear reduction across the D x D grid. Shifts along the
    # w = u*D+v axis: (u, v+1) = roll -1, (u+1, v) = roll -D,
    # (u+1, v+1) = roll -(D+1); wrapped entries land on masked
    # u/v = D-1 slots.
    s01 = jnp.roll(sw, -1, axis=-1)
    s10 = jnp.roll(sw, -D, axis=-1)
    s11 = jnp.roll(sw, -(D + 1), axis=-1)
    w00 = ((1 - dyf) * (1 - dxf) * vf)[..., None]
    w01 = ((1 - dyf) * dxf * vf)[..., None]
    w10 = (dyf * (1 - dxf) * vf)[..., None]
    w11 = (dyf * dxf * vf)[..., None]
    o = w00 * sw + w01 * s01 + w10 * s10 + w11 * s11
    lane = jnp.arange(W)
    keep = ((lane % D < D - 1) & (lane // D < D - 1)).astype(o.dtype)
    return (o * keep).astype(jnp.bfloat16)


# ---------------------------------------------------------------------
# superwindow variant ("pallas_sw"): ONE VMEM load + ONE small dot per
# edge instead of 9 loads and a G-batched cross-edge dot. All 9 patch
# pixels share a [RS, CS] superwindow anchored at the CENTER pixel's
# window corner; per-pixel row/col offsets (0..RS-D, 0..CS-D) are
# resolved in the XLA epilogue via one-hot blends of static slices.
# Semantics deviation vs the reference kernel: a pixel whose coords
# stray more than +-(RS-D)/2 px from the patch center samples a window
# CLAMPED into the superwindow. Real reprojected patches (one depth per
# patch, 3x3 px at 1/4 res) stay within +-2 px; adversarial inputs can
# exceed it, which is why "pallas" remains the exact default.
# ---------------------------------------------------------------------

RS = 14  # superwindow rows: D(8) + 2*margin(2) + bilinear(1) + slack
CS = 32  # superwindow cols: D + margin + 8-alignment remainder + slack


def _make_kernel_sw(H2: int, W2: int, C: int, D: int, P2: int):
    def kernel(jj_s, sy_s, sx_s, nv_s, f1_r, fmap_r, out_r, cache_r,
               loaded_r, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            loaded_r[0] = -1
            cache_r[:] = jnp.zeros_like(cache_r)

        out_r[:] = jnp.zeros_like(out_r)
        nv = jnp.clip(nv_s[0, 0] - pl.program_id(0) * EB, 0, EB)

        def body(e, _):
            j = jj_s[0, e]

            @pl.when(j != loaded_r[0])
            def _():
                loaded_r[0] = j
                cp = pltpu.make_async_copy(
                    fmap_r.at[j],
                    cache_r.at[pl.ds(16, H2), pl.ds(16, W2), :],
                    sem,
                )
                cp.start()
                cp.wait()

            win = cache_r[
                pl.ds(sy_s[0, e], RS), pl.ds(pl.multiple_of(sx_s[0, e], 8), CS), :
            ].reshape(RS * CS, C)
            # [P2, C] x [RS*CS, C]^T -> [P2, RS*CS]: per-edge dot, no
            # cross-edge waste, result small enough to stay in registers
            res = jax.lax.dot_general(
                f1_r[e], win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_r[e] = res.astype(out_r.dtype)
            return 0

        jax.lax.fori_loop(0, nv, body, 0)

    return kernel


def _corr_level_sw(fmap, f1, cs, jjk, vs, radius: int, interpret: bool):
    """Superwindow level: fmap [mem,H2,W2,C]; f1 [E,P2,C] bf16 sorted;
    cs [E,P2,2] sorted coords; jjk/vs sorted frame ids / validity."""
    E, P2, C = f1.shape
    mem, H2, W2, _ = fmap.shape
    D = 2 * radius + 2
    W = D * D

    W2a = -(-W2 // 8) * 8
    if W2a != W2:
        fmap = jnp.pad(fmap, ((0, 0), (0, 0), (0, W2a - W2), (0, 0)))

    x = cs[..., 0]
    y = cs[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dxf = (x - x0).astype(jnp.float32)
    dyf = (y - y0).astype(jnp.float32)
    sy = y0.astype(jnp.int32) - radius            # per-pixel window corner
    sx = x0.astype(jnp.int32) - radius
    c = P2 // 2
    # superwindow corner: center pixel's window corner minus the margin,
    # clamped into the padded cache, x aligned down to the sublane tile
    syc = jnp.clip(sy[:, c] - (RS - D) // 2, -16, H2)
    sxc = (jnp.clip(sx[:, c] - (RS - D) // 2, -16, W2a) + 16) // 8 * 8 - 16

    vp = (vs[:, None] & (sy >= -D) & (sy <= H2) & (sx >= -D) & (sx <= W2))
    vf = vp.astype(jnp.float32)

    grid = (E // EB,)
    smem1 = lambda: pl.BlockSpec((1, EB), lambda i: (0, i), memory_space=pltpu.SMEM)
    s = pl.pallas_call(
        _make_kernel_sw(H2, W2a, C, D, P2),
        grid=grid,
        in_specs=[
            smem1(),  # jj
            smem1(),  # superwindow row corner (cache coords)
            smem1(),  # superwindow col corner (cache coords, 8-aligned)
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, P2, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # fmap (HBM)
        ],
        out_specs=pl.BlockSpec((EB, P2, RS * CS), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, P2, RS * CS), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((H2 + 32, W2a + 48, C), fmap.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(jjk[None], (syc + 16)[None], (sxc + 16)[None],
      jnp.sum(vs).astype(jnp.int32)[None, None], f1, fmap)

    if os.environ.get("DPVO_CORR_NOEPI"):  # perf diagnosis: kernel cost only
        return s[..., :D * D]

    # epilogue: per-pixel (row, col) offsets within the superwindow,
    # clamped; one-hot blends of static slices (XLA fuses the stacks)
    dy = jnp.clip(sy - syc[:, None], 0, RS - D)                  # [E,P2]
    dxw = jnp.clip(sx - sxc[:, None], 0, CS - D)                 # [E,P2]

    s4 = s.astype(jnp.float32).reshape(E, P2, RS, CS)
    rows = jnp.stack([s4[:, :, k:k + D, :] for k in range(RS - D + 1)])
    ohr = (dy[None] == jnp.arange(RS - D + 1)[:, None, None]).astype(jnp.float32)
    sr = jnp.einsum("kep,kepuv->epuv", ohr, rows)                # [E,P2,D,CS]
    cols = jnp.stack([sr[..., k:k + D] for k in range(CS - D + 1)])
    ohc = (dxw[None] == jnp.arange(CS - D + 1)[:, None, None]).astype(jnp.float32)
    sw = jnp.einsum("kep,kepuv->epuv", ohc, cols)                # [E,P2,D,D]

    # 2x2 bilinear reduction to the canonical [P2, D*D] layout with the
    # last row/column zeroed (shared with _corr_level / corr.py)
    w00 = ((1 - dyf) * (1 - dxf) * vf)[..., None, None]
    w01 = ((1 - dyf) * dxf * vf)[..., None, None]
    w10 = (dyf * (1 - dxf) * vf)[..., None, None]
    w11 = (dyf * dxf * vf)[..., None, None]
    o = (w00 * sw[..., : D - 1, : D - 1] + w01 * sw[..., : D - 1, 1:]
         + w10 * sw[..., 1:, : D - 1] + w11 * sw[..., 1:, 1:])
    o = jnp.pad(o, ((0, 0), (0, 0), (0, 1), (0, 1)))
    return o.reshape(E, P2, W).astype(jnp.bfloat16)


# ---------------------------------------------------------------------
# v3 ("pallas_dma"): ONE double-buffered DMA + ONE small MXU dot per
# edge. Per edge a [RS3, CS3] superwindow (8-aligned x corner) is DMA'd
# from the per-frame VMEM cache into a ping-pong window buffer while the
# MXU contracts the PREVIOUS group's windows, so copy time hides behind
# compute instead of serializing with it (the v1 kernel's 9 VPU loads
# per edge were the bottleneck: 19.9 ms kernel time at E=49152).
# Per-pixel window selection (row/col offsets within the superwindow,
# including the 8-alignment remainder) AND the 2x2 bilinear reduction
# happen in ONE fused XLA epilogue pass: out = sum_a sum_b
# cR[a] cC[b] s[dy+u+a, dxw+v+b] where cR/cC merge the one-hot
# selection with the bilinear weights — no 8-way shifted-copy stacks
# (the v1 epilogue materialized GBs and cost ~14 ms).
# Exactness: per-pixel offsets are clamped to a +-3 px spread around
# the patch-center window. A 3x3 patch with one shared depth reprojects
# to a ~1 px pixel spacing, so real workloads stay well inside; the
# adversarial-coordinate case (pixels >3 px from center) clamps — the
# "pallas" v1 kernel remains available for exact semantics.
# ---------------------------------------------------------------------

RS3 = 16  # superwindow rows: 9 (window+bilinear) + 7 offset margin
CS3 = 24  # superwindow cols: 9 + 7 margin + 8 alignment remainder
G3 = 8    # edges per pipeline group


def _make_kernel_v3(H2: int, W2: int, C: int, P2: int):
    SW = RS3 * CS3

    def kernel(jj_s, sy_s, sx_s, nv_s, f1_r, fmap_r, out_r, cache_r, win_r,
               loaded_r, csem, wsem):
        # fmap_r is PRE-PADDED in HBM ([mem, H2+32, W2+40, C], zero
        # borders), so cache coordinates == padded-frame coordinates and
        # the cache path and the HBM-direct path sample identically.
        @pl.when(pl.program_id(0) == 0)
        def _():
            loaded_r[0] = -1

        out_r[:] = jnp.zeros_like(out_r)
        nv = jnp.clip(nv_s[0, 0] - pl.program_id(0) * EB, 0, EB)
        ng = (nv + G3 - 1) // G3

        def issue(g):
            """Start the G3 window DMAs of group g. Caller guarantees no
            window copies are outstanding, so a frame reload (first edge
            of the group on a new jj) is race-free; a mid-group frame
            boundary DMAs those windows straight from HBM instead (rare:
            ~22 boundary groups per level)."""
            e0 = g * G3
            base = (g % 2) * G3
            jg = jj_s[0, e0]

            @pl.when(jg != loaded_r[0])
            def _():
                loaded_r[0] = jg
                cp = pltpu.make_async_copy(fmap_r.at[jg], cache_r, csem)
                cp.start()
                cp.wait()

            for q in range(G3):
                e = e0 + q
                j = jj_s[0, e]
                sy = sy_s[0, e]
                sx = pl.multiple_of(sx_s[0, e], 8)

                @pl.when(j == loaded_r[0])
                def _():
                    pltpu.make_async_copy(
                        cache_r.at[pl.ds(sy, RS3), pl.ds(sx, CS3), :],
                        win_r.at[base + q],
                        wsem.at[base + q],
                    ).start()

                @pl.when(j != loaded_r[0])
                def _():
                    # mid-group frame boundary: same window, straight
                    # from the padded HBM map (linear layout, any offset)
                    pltpu.make_async_copy(
                        fmap_r.at[j, pl.ds(sy, RS3), pl.ds(sx, CS3), :],
                        win_r.at[base + q],
                        wsem.at[base + q],
                    ).start()

        @pl.when(ng > 0)
        def _():
            issue(0)

        def body(g, _):
            base = (g % 2) * G3
            e0 = g * G3
            for q in range(G3):  # consume group g's copies
                pltpu.make_async_copy(
                    win_r.at[base + q], win_r.at[base + q], wsem.at[base + q]
                ).wait()

            @pl.when(g + 1 < ng)
            def _():
                issue(g + 1)

            for q in range(G3):  # MXU while group g+1's DMAs fly
                res = jax.lax.dot_general(
                    f1_r[e0 + q], win_r[base + q].reshape(SW, C),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [P2, SW]
                out_r[e0 + q] = res.astype(out_r.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


EB3 = 128  # edges per epilogue-kernel block (VMEM-bounded)


def _make_epi_kernel(P2: int, W7: int):
    """Selection + bilinear tap stencil as a Pallas pass.

    XLA's fusion of the same stencil re-reads the tap slices per output
    element and transposes the [E,P2,384] kernel output to an E-minor
    layout first (~2.9 ms of relayout copies + ~8 ms of tap fusions at
    E=49152); here each block stays in VMEM and is read once."""

    def kernel(dy_r, dxw_r, dyf_r, dxf_r, vf_r, s_r, out_r, tmp_r, acc_r):
        dy = dy_r[:]
        dxw = dxw_r[:]
        dyf = dyf_r[:].astype(jnp.float32)
        dxf = dxf_r[:].astype(jnp.float32)
        vf = vf_r[:].astype(jnp.float32)
        s4 = s_r[:]  # [EB3, 16, RS3*CS3] bf16 (P2 padded to 16)

        # Mosaic only supports minor-dim insertion on 32-bit types:
        # coefficient broadcasts stay f32, data converts per tap
        tmp_r[:] = jnp.zeros_like(tmp_r)
        for a in range(9):  # row selection + y-bilinear (2 live taps)
            cR = ((dy == a).astype(jnp.float32) * (1.0 - dyf)
                  + (dy == a - 1).astype(jnp.float32) * dyf)
            tmp_r[:, :, :W7] += (
                cR[:, :, None] * s4[:, :, a * CS3:a * CS3 + W7].astype(jnp.float32)
            ).astype(jnp.bfloat16)

        acc_r[:] = jnp.zeros_like(acc_r)
        for b in range(17):  # col selection (incl. align remainder) + x-bilinear
            cC = ((dxw == b).astype(jnp.float32) * (1.0 - dxf)
                  + (dxw == b - 1).astype(jnp.float32) * dxf)
            acc_r[:] += (cC * vf)[:, :, None] * tmp_r[:, :, b:b + W7].astype(jnp.float32)
        out_r[:] = acc_r[:].astype(out_r.dtype)

    return kernel


def _epi_pallas(s, dy, dxw, dyf, dxf, vf, interpret: bool):
    """s [Ep, P2, RS3*CS3] bf16 -> [Ep, P2, 7*CS3] bf16 (x stride CS3).

    Sublane dim padded to 16 (Mosaic rejects 9-sublane 3-D broadcasts);
    padded rows carry vf=0 and are sliced off by the caller."""
    Ep, P2, _ = s.shape
    W7 = 7 * CS3
    s16 = jnp.pad(s, ((0, 0), (0, 16 - P2), (0, 0)))

    def pad16(a, dt):
        return jnp.pad(a.astype(dt), ((0, 0), (0, 16 - P2)))

    blk2 = lambda: pl.BlockSpec((EB3, 16), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_epi_kernel(P2, W7),
        grid=(Ep // EB3,),
        in_specs=[
            blk2(), blk2(), blk2(), blk2(), blk2(),
            pl.BlockSpec((EB3, 16, RS3 * CS3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB3, 16, W7), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ep, 16, W7), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((EB3, 16, W7 + 24), jnp.bfloat16),
            pltpu.VMEM((EB3, 16, W7), jnp.float32),
        ],
        interpret=interpret,
    )(pad16(dy, jnp.int32), pad16(dxw, jnp.int32), pad16(dyf, jnp.float32),
      pad16(dxf, jnp.float32), pad16(vf, jnp.float32), s16)
    return out[:, :P2]


def _corr_level_nokern(fmap, f1, cs, jjk, vs, radius: int, interpret: bool):
    """Perf diagnosis: the sort/gather/pad scaffolding with a free level
    body — measures _corr_features_common overhead S."""
    E, P2, C = f1.shape
    D = 2 * radius + 2
    return (f1[:, :, :1] * cs[..., :1] * vs[:, None, None]
            ).astype(jnp.bfloat16) * jnp.zeros((1, 1, D * D), jnp.bfloat16)


def _corr_level_v3(fmap, f1, cs, jjk, vs, radius: int, interpret: bool):
    """v3 level: fmap [mem,H2,W2,C]; f1 [E,P2,C] bf16 sorted by jj;
    cs [E,P2,2] sorted coords at this level's scale; jjk/vs sorted."""
    E, P2, C = f1.shape
    mem, H2, W2, _ = fmap.shape
    D = 2 * radius + 2
    c = P2 // 2

    W2a = -(-W2 // 8) * 8
    # zero-pad the maps in HBM so cache coords == padded-frame coords
    # (16 rows top, 16 cols left; the slack on the far side keeps every
    # clamped superwindow copy in bounds). Out-of-image samples then
    # read true zeros on both the cache and the HBM-direct path.
    fmap = jnp.pad(fmap, ((0, 0), (16, 16), (16, W2a - W2 + 24), (0, 0)))

    x = cs[..., 0]
    y = cs[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dxf = (x - x0).astype(jnp.float32)
    dyf = (y - y0).astype(jnp.float32)
    sy = y0.astype(jnp.int32) - radius   # [E,P2] per-pixel window corner
    sx = x0.astype(jnp.int32) - radius

    # superwindow corner: center pixel's window corner minus a 3 px
    # margin, clamped into the padded cache; x aligned down to 8
    syc = jnp.clip(sy[:, c] - 3, -16, H2)
    sxc = (jnp.clip(sx[:, c] - 3, -16, W2a) + 16) // 8 * 8 - 16

    # per-pixel offsets within the superwindow (clamped: see note above)
    dy = jnp.clip(sy - syc[:, None], 0, RS3 - 9)    # [E,P2] in [0,7]
    dxw = jnp.clip(sx - sxc[:, None], 0, CS3 - 9)   # [E,P2] in [0,15]

    vp = (vs[:, None] & (sy >= -D) & (sy <= H2) & (sx >= -D) & (sx <= W2))
    vf = vp.astype(jnp.float32)

    grid = (E // EB,)
    smem1 = lambda: pl.BlockSpec((1, EB), lambda i: (0, i), memory_space=pltpu.SMEM)
    s = pl.pallas_call(
        _make_kernel_v3(H2, W2a, C, P2),
        grid=grid,
        in_specs=[
            smem1(),  # jj
            smem1(),  # superwindow row corner (cache coords)
            smem1(),  # superwindow col corner (cache coords, 8-aligned)
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, P2, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # fmap (HBM)
        ],
        out_specs=pl.BlockSpec((EB, P2, RS3 * CS3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, P2, RS3 * CS3), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((H2 + 32, W2a + 40, C), fmap.dtype),  # padded frame
            pltpu.VMEM((2 * G3, RS3, CS3, C), fmap.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2 * G3,)),
        ],
        interpret=interpret,
    )(jjk[None], (syc + 16)[None], (sxc + 16)[None],
      jnp.sum(vs).astype(jnp.int32)[None, None], f1, fmap)

    if os.environ.get("DPVO_CORR_NOEPI"):  # perf diagnosis: kernel cost only
        return s[..., :D * D]

    # Fused epilogue: row/col selection + 2x2 bilinear as a two-stage
    # tap stencil in bf16. cR merges the one-hot over dy with the
    # y-bilinear, cC the one-hot over dxw (incl. the 8-alignment
    # remainder) with the x-bilinear.
    if E % EB3 == 0:
        # Pallas pass: blocks stay in VMEM, taps read once (see
        # _make_epi_kernel). All fused-path capacities divide EB3.
        wide = _epi_pallas(s, dy, dxw, dyf, dxf, vf, interpret)
        Dm1 = D - 1
        out = wide.reshape(E, P2, Dm1, CS3)[..., :Dm1]
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 1), (0, 1)))
        return out.reshape(E, P2, D * D)

    # XLA fallback (small/odd E): static slices — the measured-fastest
    # XLA formulation (gathers are ~40x slower; f32 doubles traffic;
    # lane-flattened layouts force per-tap rotates).
    s4 = s.reshape(E, P2, RS3, CS3)
    ar = jnp.arange(10, dtype=jnp.int32)                          # a in [0,9]
    cR = (((ar == dy[..., None]) * (1.0 - dyf[..., None])
           + (ar == dy[..., None] + 1) * dyf[..., None])).astype(jnp.bfloat16)
    ab = jnp.arange(17, dtype=jnp.int32)                          # b in [0,16]
    cC = (((ab == dxw[..., None]) * (1.0 - dxf[..., None])
           + (ab == dxw[..., None] + 1) * dxf[..., None])
          * vf[..., None]).astype(jnp.bfloat16)                   # [E,P2,17]

    Dm1 = D - 1  # 7 valid rows/cols
    tmp = jnp.zeros((E, P2, Dm1, CS3), jnp.bfloat16)
    for a in range(9):  # dy+a <= 7+1+6 = 14 < RS3 for u < 7
        tmp = tmp + cR[..., a, None, None] * s4[:, :, a:a + Dm1, :]
    out = jnp.zeros((E, P2, Dm1, Dm1), jnp.bfloat16)
    for b in range(17):
        out = out + cC[..., b, None, None] * tmp[..., b:b + Dm1]
    out = jnp.pad(out, ((0, 0), (0, 0), (0, 1), (0, 1)))
    return out.reshape(E, P2, D * D)


# ---------------------------------------------------------------------
# v4 ("pallas_fused"): ONE kernel pass for BOTH pyramid levels with the
# selection + bilinear epilogue fused inside. Each edge gets two
# double-buffered superwindow DMAs (one per level, shared loop/cache
# machinery, f1 read once); after the per-edge MXU dots the kernel
# applies the row/column selection and bilinear reduction as a
# group-batched stencil on [G4*P2, 384] f32 tiles — flat (edge*pixel)
# rows kill the [*, P2->16, lane] sublane-padding waste the separate
# epilogue pass paid (16/9 = 1.8x), and the column stage runs as a
# split-radix cascade (dxw = 4h + l: 4 + 4 + 2 taps instead of the
# 17-tap merged one-hot). Selection coefficients are precomputed in
# XLA and shipped as one [E*P2, 20] f32 array per level:
#   [:, 0:10]  cR    merged row one-hot x y-bilinear   (9 taps used)
#   [:, 10:14] clo   one-hot over dxw % 4
#   [:, 14:18] chi   one-hot over dxw // 4
#   [:, 18:20] bx    ((1-dxf)*vf, dxf*vf)  x-bilinear + validity
# The kernel emits the WIDE result out[e, p, l*168 + u*24 + v]
# (u-windows keep the CS3=24 stride); the cheap [*,:7]-slice + pad
# compaction to the canonical [E, P2, 128] happens in XLA (one
# elementwise pass, no transposes). Clamp semantics identical to v3:
# per-pixel windows within +-3 px of the patch-center window.
# Reference semantics: dpvo/altcorr/correlation_kernel.cu:82-160.
# ---------------------------------------------------------------------

G4 = 8        # edges per group: the group dot runs [G4*P2, C] x
              # [C, G4*SW] — 72 rows fill the MXU far better than
              # per-edge 9-row dots (and 72 is sublane-aligned)
W7 = 7 * CS3  # wide output lanes per level (7 u-windows, stride 24)


def _make_kernel_v4(H2: int, W2: int, H4: int, W4: int, C: int, P2: int):
    SW = RS3 * CS3
    GP = G4 * P2          # live stencil rows per group
    GS = -(-GP // 8) * 8  # row stride, 8-aligned (Mosaic sublane rule)
    NOSTENCIL = bool(os.environ.get("DPVO_V4_NOSTENCIL"))  # perf bisect

    def kernel(jj_s, sy1_s, sx1_s, sy2_s, sx2_s, nv_s, f1_r, co1_r, co2_r,
               fmap1_r, fmap2_r, out_r, cache1_r, cache2_r,
               res_r, tmp_r, sA_r, sB_r, sC_r, loaded_r, csem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            loaded_r[0] = -1

        out_r[:] = jnp.zeros_like(out_r)
        nv = jnp.clip(nv_s[0, 0] - pl.program_id(0) * EB, 0, EB)
        ng = (nv + G4 - 1) // G4

        # static block-diagonal row masks: rows q*P2..(q+1)*P2 of the
        # group-flat dot result belong to edge q
        riota = jax.lax.broadcasted_iota(jnp.int32, (GS, 1), 0)

        def body(g, _):
            e0 = g * G4
            # frame caches follow the jj-sorted edge stream (~22 reloads
            # per level per frame); windows are plain VECTOR loads out
            # of VMEM — the round-5 bisect measured the per-edge window
            # DMA + in-kernel-stencil combination serializing to
            # ~20 us/edge, while a [RS3, CS3, C] slice load is ~50 vregs.
            # Reload-then-load runs per edge so a mid-group frame
            # boundary reads each edge's own frame.
            wins = ([], [])
            for q in range(G4):
                j = jj_s[0, e0 + q]

                @pl.when(j != loaded_r[0])
                def _():
                    loaded_r[0] = j
                    cp1 = pltpu.make_async_copy(fmap1_r.at[j], cache1_r,
                                                csem.at[0])
                    cp2 = pltpu.make_async_copy(fmap2_r.at[j], cache2_r,
                                                csem.at[1])
                    cp1.start()
                    cp2.start()
                    cp1.wait()
                    cp2.wait()

                for li, (cache, sy_s, sx_s) in enumerate((
                        (cache1_r, sy1_s, sx1_s), (cache2_r, sy2_s, sx2_s))):
                    wins[li].append(cache[
                        pl.ds(sy_s[0, e0 + q], RS3),
                        pl.ds(pl.multiple_of(sx_s[0, e0 + q], 8), CS3),
                        :].reshape(SW, C))

            f1g = jnp.concatenate([f1_r[e0 + q] for q in range(G4)], axis=0)
            f1g = jnp.pad(f1g, ((0, GS - GP), (0, 0)))  # zero pad rows
            r0 = pl.multiple_of(g * GS, 8)  # group-flat row base (coeff/out)
            for li, co_r in enumerate((co1_r, co2_r)):
                wing = jnp.concatenate(wins[li], axis=0)
                # ONE MXU dot per level for the whole group: [GS, C] x
                # [G4*SW, C]^T (36 result rows utilize the MXU ~4x
                # better than per-edge 9-row dots); edge q's own-window
                # block comes off the block diagonal via static lane
                # slices + a row mask
                res_big = jax.lax.dot_general(
                    f1g, wing, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [GS, G4*SW] (pad rows are zero: f1g pad rows are)
                res = jnp.zeros((GS, SW), jnp.float32)
                for q in range(G4):
                    mask = ((riota >= q * P2) & (riota < (q + 1) * P2)
                            ).astype(jnp.float32)
                    res = res + mask * res_big[:, q * SW:(q + 1) * SW]
                res_r[:] = res

                if NOSTENCIL:
                    sC_r[:, li * W7:(li + 1) * W7] = (
                        res_r[:, :W7].astype(sC_r.dtype))
                    continue
                # group coefficients loaded ONCE (the dynamic r0 slice
                # is the expensive part; per-tap lane slices of the
                # loaded value are cheap selects)
                cog = co_r[pl.ds(r0, GS), :].astype(jnp.float32)  # [GS, 20]
                # rows: 9 merged taps (one-hot over dy x y-bilinear)
                for a in range(9):
                    t = cog[:, a:a + 1] * res_r[:, a * CS3:a * CS3 + 184]
                    if a == 0:
                        tmp_r[:] = t
                    else:
                        tmp_r[:] += t
                # cols, split radix: dxw = 4h + l
                for l in range(4):
                    t = cog[:, 10 + l:11 + l] * tmp_r[:, l:l + 181]
                    if l == 0:
                        sA_r[:] = t
                    else:
                        sA_r[:] += t
                for h in range(4):
                    t = cog[:, 14 + h:15 + h] * sA_r[:, 4 * h:4 * h + 169]
                    if h == 0:
                        sB_r[:] = t
                    else:
                        sB_r[:] += t
                sC_r[:, li * W7:(li + 1) * W7] = (
                    cog[:, 18:19] * sB_r[:, :W7]
                    + cog[:, 19:20] * sB_r[:, 1:W7 + 1]
                ).astype(sC_r.dtype)

            out_r[pl.ds(r0, GS), :] = sC_r[:]
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


def _level_coeffs(cs, vs, radius: int, H2: int, W2: int, W2a: int):
    """Per-(edge, pixel) selection/bilinear coefficients + superwindow
    corners for one level (XLA side; see _make_kernel_v4 layout)."""
    D = 2 * radius + 2
    P2 = cs.shape[1]
    c = P2 // 2
    x = cs[..., 0]
    y = cs[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dxf = (x - x0).astype(jnp.float32)
    dyf = (y - y0).astype(jnp.float32)
    sy = y0.astype(jnp.int32) - radius
    sx = x0.astype(jnp.int32) - radius

    syc = jnp.clip(sy[:, c] - 3, -16, H2)
    sxc = (jnp.clip(sx[:, c] - 3, -16, W2a) + 16) // 8 * 8 - 16
    dy = jnp.clip(sy - syc[:, None], 0, RS3 - 9)
    dxw = jnp.clip(sx - sxc[:, None], 0, CS3 - 9)

    vp = (vs[:, None] & (sy >= -D) & (sy <= H2) & (sx >= -D) & (sx <= W2))
    vf = vp.astype(jnp.float32)

    ar = jnp.arange(10, dtype=jnp.int32)  # [:, 9] pad: kernel taps 0..8
    cR = ((ar == dy[..., None]) * (1.0 - dyf[..., None])
          + (ar == dy[..., None] + 1) * dyf[..., None]).astype(jnp.float32)
    lo = dxw % 4
    hi = dxw // 4
    a4 = jnp.arange(4, dtype=jnp.int32)
    clo = (a4 == lo[..., None]).astype(jnp.float32)
    chi = (a4 == hi[..., None]).astype(jnp.float32)
    bx = jnp.stack([(1.0 - dxf) * vf, dxf * vf], axis=-1)
    co = jnp.concatenate([cR, clo, chi, bx], axis=-1)  # [E, P2, 20]
    return co.reshape(-1, 20).astype(jnp.bfloat16), syc, sxc


@partial(jax.jit, static_argnames=("radius", "interpret"))
def _corr_features_v4(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                      radius: int = 3, interpret: bool = False,
                      jj_order=None, jj_inv=None):
    """Both-level fused correlation features, canonical layout
    [E, P2, 2*D*D] bf16 (see module docstring for the kernel design)."""
    assert radius == 3, "v4 kernel geometry is built for CORR_RADIUS=3"
    E = coords.shape[0]
    Np, C, P, _ = gmap.shape
    P2 = P * P
    D = 2 * radius + 2
    mem, H2, W2, _ = fmap1.shape
    H4, W4 = fmap2.shape[1:3]
    GP = G4 * P2
    GS = -(-GP // 8) * 8

    Ep = -(-E // EB) * EB
    padE = Ep - E
    jj_p = jnp.pad(jj1, (0, padE))
    valid_p = jnp.pad(valid, (0, padE))
    ii_p = jnp.pad(ii1, (0, padE))
    cs_p = jnp.pad(coords.reshape(E, P2, 2), ((0, padE), (0, 0), (0, 0)))

    if jj_order is not None and jj_inv is not None and padE == 0:
        order = jj_order.astype(jnp.int32)
        inv = jj_inv.astype(jnp.int32)
    else:
        key = jnp.where(valid_p, jj_p, jnp.int32(2 ** 30))
        order = jnp.argsort(key)
        inv = jnp.zeros((Ep,), jnp.int32).at[order].set(jnp.arange(Ep, dtype=jnp.int32))

    gr = gmap.transpose(0, 2, 3, 1).reshape(Np, P2, C).astype(jnp.bfloat16)
    f1 = gr[ii_p[order]]
    cs = cs_p[order]
    vs = valid_p[order]
    maxj = jnp.max(jnp.where(valid, jj1, 0))
    jjk = jnp.where(vs, jj_p[order], maxj).astype(jnp.int32)

    W2a = -(-W2 // 8) * 8
    W4a = -(-W4 // 8) * 8
    # zero-pad the maps in HBM so cache coords == padded-frame coords
    # (same convention as _corr_level_v3)
    f1m = jnp.pad(fmap1.astype(jnp.bfloat16),
                  ((0, 0), (16, 16), (16, W2a - W2 + 24), (0, 0)))
    f2m = jnp.pad(fmap2.astype(jnp.bfloat16),
                  ((0, 0), (16, 16), (16, W4a - W4 + 24), (0, 0)))

    co1, syc1, sxc1 = _level_coeffs(cs, vs, radius, H2, W2, W2a)
    co2, syc2, sxc2 = _level_coeffs(cs / 4.0, vs, radius, H4, W4, W4a)

    if os.environ.get("DPVO_CORR_CLAMP_CHECK"):
        # ADVICE r4: observability for the +-3 px per-pixel clamp — a
        # nonzero rate means edges with extreme scale change (inverse
        # depth ratio >~3x) are sampling clamped windows and the exact
        # 'pallas' impl should be considered for this workload
        for li, (csl, Hl, Wl, Wal) in ((1, (cs, H2, W2, W2a)),
                                       (2, (cs / 4.0, H4, W4, W4a))):
            sy = jnp.floor(csl[..., 1]).astype(jnp.int32) - radius
            sx = jnp.floor(csl[..., 0]).astype(jnp.int32) - radius
            c = P2 // 2
            syc = jnp.clip(sy[:, c] - 3, -16, Hl)
            sxc = (jnp.clip(sx[:, c] - 3, -16, Wal) + 16) // 8 * 8 - 16
            dy0 = sy - syc[:, None]
            dx0 = sx - sxc[:, None]
            sat = ((dy0 < 0) | (dy0 > RS3 - 9) | (dx0 < 0)
                   | (dx0 > CS3 - 9)) & vs[:, None]
            jax.debug.print(
                "corr clamp check L{l}: {n} of {t} valid pixels saturated",
                l=li, n=jnp.sum(sat), t=jnp.sum(vs) * P2)

    def group_pad(co):
        # [Ep*P2, 20] -> [Ep//G4, GP, 20] -> pad rows to the 8-aligned
        # group stride GS -> flat [Ep//G4*GS, 20] (kernel indexes g*GS)
        co = co.reshape(Ep // G4, GP, 20)
        co = jnp.pad(co, ((0, 0), (0, GS - GP), (0, 0)))
        return co.reshape(Ep // G4 * GS, 20)

    co1 = group_pad(co1)
    co2 = group_pad(co2)

    grid = (Ep // EB,)
    GB = EB // G4 * GS  # group-flat rows per block
    smem1 = lambda: pl.BlockSpec((1, EB), lambda i: (0, i), memory_space=pltpu.SMEM)
    co_spec = pl.BlockSpec((GB, 20), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wide = pl.pallas_call(
        _make_kernel_v4(H2, W2a, H4, W4a, C, P2),
        grid=grid,
        in_specs=[
            smem1(),  # jj
            smem1(), smem1(),  # level-1 superwindow corners (cache coords)
            smem1(), smem1(),  # level-2 superwindow corners
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, P2, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            co_spec,  # level-1 coefficients
            co_spec,  # level-2 coefficients
            pl.BlockSpec(memory_space=pltpu.ANY),  # fmap1 (HBM, padded)
            pl.BlockSpec(memory_space=pltpu.ANY),  # fmap2 (HBM, padded)
        ],
        out_specs=pl.BlockSpec((GB, 2 * W7), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ep // G4 * GS, 2 * W7), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((H2 + 32, W2a + 40, C), jnp.bfloat16),  # frame cache L1
            pltpu.VMEM((H4 + 32, W4a + 40, C), jnp.bfloat16),  # frame cache L2
            pltpu.VMEM((GS, RS3 * CS3), jnp.float32),          # group dot results
            pltpu.VMEM((GS, 184), jnp.float32),                # row-stage
            pltpu.VMEM((GS, 181), jnp.float32),                # col lo-stage
            pltpu.VMEM((GS, 169), jnp.float32),                # col hi-stage
            pltpu.VMEM((GS, 2 * W7), jnp.bfloat16),            # x-bilinear, 2 levels
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jjk[None], (syc1 + 16)[None], (sxc1 + 16)[None],
      (syc2 + 16)[None], (sxc2 + 16)[None],
      jnp.sum(vs).astype(jnp.int32)[None, None], f1, co1, co2, f1m, f2m)

    # compaction to canonical: drop the group pad rows, then
    # [Ep, P2, 2, 7, 24] -> keep 7 cols, pad the zero last row/col ->
    # [Ep, P2, 2*64] (level-major, matching the XLA path), then unsort
    Dm1 = D - 1
    o = wide.reshape(Ep // G4, GS, 2 * W7)[:, :GP]
    o = o.reshape(Ep, P2, 2, Dm1, CS3)[..., :Dm1]
    o = jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
    return o.reshape(Ep, P2, 2 * D * D)[inv][:E]


def corr_features_pallas_fused(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                               radius: int = 3, interpret: bool = False,
                               jj_order=None, jj_inv=None):
    """v4 kernel: both pyramid levels + fused selection/bilinear
    epilogue in one Pallas pass (see block comment above)."""
    return _corr_features_v4(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                             radius=radius, interpret=interpret,
                             jj_order=jj_order, jj_inv=jj_inv)


@partial(jax.jit, static_argnames=("radius", "interpret", "level_fn"))
def _corr_features_common(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                          radius: int = 3, interpret: bool = False,
                          level_fn=None, jj_order=None, jj_inv=None):
    """Two-level correlation features in canonical layout.

    gmap  [Np, C, P, P] patch matching features (circular buffer)
    fmap1 [mem, H2, W2, C]; fmap2 [mem, H2/4, W2/4, C]  (NHWC)
    coords [E, P, P, 2]  level-1 reprojected (x, y)
    ii1/jj1 [E] int32 circular-slot indices; valid [E] bool
    jj_order/jj_inv: optional host-precomputed valid-first stable sort
    by jj and its inverse (the sort depends only on topology, so the
    host ships it once per frame — the on-device argsort costs ~2 ms
    at E=49k)
    returns [E, P*P, 2*D*D] bfloat16
    """
    E = coords.shape[0]
    Np, C, P, _ = gmap.shape
    P2 = P * P

    Ep = -(-E // EB) * EB
    padE = Ep - E
    jj_p = jnp.pad(jj1, (0, padE))
    valid_p = jnp.pad(valid, (0, padE))
    ii_p = jnp.pad(ii1, (0, padE))
    cs_p = jnp.pad(coords.reshape(E, P2, 2), ((0, padE), (0, 0), (0, 0)))

    if jj_order is not None and jj_inv is not None and padE == 0:
        # host order covers exactly the capacity bucket (all fused-path
        # capacities are EB multiples); other callers keep the device sort
        order = jj_order.astype(jnp.int32)
        inv = jj_inv.astype(jnp.int32)
    else:
        key = jnp.where(valid_p, jj_p, jnp.int32(2 ** 30))
        order = jnp.argsort(key)
        inv = jnp.zeros((Ep,), jnp.int32).at[order].set(jnp.arange(Ep, dtype=jnp.int32))

    gr = gmap.transpose(0, 2, 3, 1).reshape(Np, P2, C).astype(jnp.bfloat16)
    f1 = gr[ii_p[order]]
    cs = cs_p[order]
    vs = valid_p[order]
    maxj = jnp.max(jnp.where(valid, jj1, 0))
    jjk = jnp.where(vs, jj_p[order], maxj).astype(jnp.int32)

    outs = []
    for fmap, scale in ((fmap1, 1.0), (fmap2, 4.0)):
        outs.append(level_fn(fmap.astype(jnp.bfloat16), f1, cs / scale,
                             jjk, vs, radius, interpret))
    res = jnp.concatenate(outs, axis=-1)  # [Ep, P2, 2*D*D]
    return res[inv][:E]


def corr_features_pallas(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                         radius: int = 3, interpret: bool = False):
    """Exact per-pixel-window kernel (default)."""
    return _corr_features_common(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                                 radius=radius, interpret=interpret,
                                 level_fn=_corr_level)


def corr_features_pallas_sw(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                            radius: int = 3, interpret: bool = False):
    """Superwindow kernel (1 load + 1 dot per edge; per-pixel windows
    clamped within +-(RS-D)/2 px of the patch center)."""
    return _corr_features_common(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                                 radius=radius, interpret=interpret,
                                 level_fn=_corr_level_sw)


def corr_features_pallas_dma(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                             radius: int = 3, interpret: bool = False,
                             jj_order=None, jj_inv=None):
    """v3 kernel: double-buffered per-edge superwindow DMA + MXU dot,
    fused selection+bilinear epilogue. Per-pixel windows clamped within
    +-3 px of the patch-center window (exact for real patch geometry).
    jj_order/jj_inv: optional host-shipped valid-first jj sort."""
    return _corr_features_common(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                                 radius=radius, interpret=interpret,
                                 level_fn=_corr_level_v3,
                                 jj_order=jj_order, jj_inv=jj_inv)
