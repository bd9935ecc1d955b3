"""Jit-compiled device step functions for the VO runtime.

Each method of StepFunctions is a fixed-shape jitted program; together
they cover the device side of the reference's per-frame work
(dpvo/dpvo.py:905-1029 __call__, :775-836 update, :392-417 terminate).
The host orchestrator (runtime/dpvo.py) sequences them and owns the
dynamic topology.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dpvo_tpu.ba import gba_sparse
from dpvo_tpu.ba import solver as ba_solver
from dpvo_tpu.config import Config
from dpvo_tpu.geom import projective as pops
from dpvo_tpu.lie import se3
from dpvo_tpu.models import Patchifier, Update
from dpvo_tpu.ops import avg_pool2d_nhwc
from dpvo_tpu.ops.corr import corr_features_xla
from dpvo_tpu.ops.corr_pallas import (
    corr_features_pallas,
    corr_features_pallas_dma,
    corr_features_pallas_fused,
    corr_features_pallas_sw,
)
from dpvo_tpu.runtime.state import VOState


class StepFunctions:
    def __init__(self, cfg: Config, ht: int, wd: int, exported=None, mesh=None):
        """exported: an ExportedVONet (deploy/export.py) — when given,
        patchify and the update operator execute the serialized
        StableHLO artifacts instead of the flax modules (the analog of
        the reference's auto-selected onnx directory, dpvo/dpvo.py:
        187-268). The artifacts inline into the same fused per-frame
        jit programs.

        mesh: a jax.sharding.Mesh with an 'edge' axis — when given,
        global BA runs through the distributed sparse solver
        (ba/gba_sparse.dist_gba), sharding its row/pair reductions over
        the mesh and psum'ing the reduced camera system over ICI."""
        self.cfg = cfg
        self.ht, self.wd = ht, wd
        fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
        self.fdt = fdt
        self.exported = exported
        self.mesh = mesh
        self.patchifier = Patchifier(patch_size=cfg.P, dim=cfg.DIM, fdim=cfg.FDIM, dtype=fdt)
        self.update_op = Update(dim=cfg.DIM, p=cfg.P, dtype=fdt)
        self.pmem = cfg.MAX_EDGE_AGE if cfg.LOOP_CLOSURE else cfg.PMEM
        impl = cfg.CORR_IMPL
        if impl == "auto":
            # pallas_fused: both pyramid levels + selection/bilinear
            # epilogue fused into ONE kernel pass — exact for real patch
            # geometry (per-pixel windows within +-3 px of the patch
            # center; DPVO_CORR_CLAMP_CHECK=1 prints the clamp rate);
            # CORR_IMPL=pallas forces the per-pixel-exact kernel
            impl = "pallas_fused" if jax.default_backend() == "tpu" else "xla"
        self.corr_impl = impl

        self.patchify = jax.jit(self._patchify)
        self.ingest = jax.jit(self._ingest, donate_argnums=(0,))
        self.update = jax.jit(self._update, donate_argnums=(1,))
        self.update_noba = jax.jit(self._update_noba, donate_argnums=(1,))
        self.ba_only = jax.jit(self._ba_only, donate_argnums=(0,))
        self.zero_edges = jax.jit(self._zero_edges, donate_argnums=(0,))
        self.probe = jax.jit(self._probe)
        self.flowmag_pair = jax.jit(self._flowmag_pair)
        self.compact_edges = jax.jit(self._compact_edges, donate_argnums=(0,))
        self.store_inactive = jax.jit(self._store_inactive, donate_argnums=(0,))
        self.keyframe_shift = jax.jit(self._keyframe_shift, donate_argnums=(0,))
        self.global_ba = jax.jit(self._global_ba, donate_argnums=(1,))
        self.normalize = jax.jit(self._normalize, donate_argnums=(0,))
        self.point_cloud = jax.jit(self._point_cloud)
        self.maintenance = jax.jit(self._maintenance, donate_argnums=(0,))
        self.apply_pgo = jax.jit(self._apply_pgo, donate_argnums=(0,))
        self._layout_memo = {}
        self._frame_step_memo = {}
        self._layout = self.layout_for(cfg.E_MAX)
        self.frame_step = self.frame_step_for(cfg.E_MAX)

    # ---------------- packed per-frame payload ----------------
    #
    # Host -> device transfers through the tunnel cost milliseconds of
    # LATENCY each regardless of size (and the link degrades under
    # load), so the ENTIRE per-frame payload — image, edge topology,
    # maintenance ops, scalars — ships as ONE uint8 buffer. Index rows
    # derivable from kk/jj (ii, circular slots, segment ids) are
    # recomputed on device; u16/u8 narrow dtypes halve the rest.

    PAIR_MAX = 1024  # distinct (ii, jj) pairs in the active window

    def layout_for(self, E: int):
        """Memoized packed-frame layout at edge capacity E (the fused
        step compiles per capacity bucket; see frame_step_for)."""
        out = self._layout_memo.get(E)
        if out is None:
            out = self._layout_memo[E] = self._frame_layout(E)
        return out

    def frame_step_for(self, E_cap: int):
        """Memoized jitted fused frame step at edge capacity E_cap.

        Live edges are kept compacted in a prefix of the edge stores
        (topology.remove ships a compaction perm), so a program that
        correlates/updates/solves only the first E_cap rows is exact
        whenever the host's live-edge count fits — the rest of E_MAX is
        padding the reference never touches either (dpvo.py:775-787
        operates on the exact edge set). Each capacity is one XLA
        program; the host picks the smallest bucket that fits."""
        fn = self._frame_step_memo.get(E_cap)
        if fn is None:
            from functools import partial

            fn = jax.jit(partial(self._frame_step, E_cap=E_cap),
                         donate_argnums=(1,))
            self._frame_step_memo[E_cap] = fn
        return fn

    def _frame_layout(self, E: int):
        """Per-edge payload: 14.25 B/edge. Everything else the step
        needs is DERIVED on device from these rows + meta scalars
        (round-5 diet, ~2x: the axon tunnel is bandwidth-bound at
        ~25 MB/s, so every byte/edge costs ~2 ms/frame of link time at
        the steady-state bucket):
          kk       = d2p[kk_seg]           (d2p rows are sorted uniques)
          ii, ii1  = kk // M, kk % (M*pmem)
          valid    = iota < Ecur           (meta scalar)
          mask_ix  = (ix != iota) & valid  (neighbors self-default)
          jj_inv   = scatter-inverse of jj_order
          perm/src/dst (maintenance) = cumsum-compactions of the rm/st
          bitmasks + ring-slot iota from (inac_head, nstore) scalars
        Dense group ids (kk_seg/ij_seg) and the two sort orders stay
        host-computed: deriving them on device costs sorts (~2 ms each
        at E=49k) vs ~0.3 ms of overlapped transfer."""
        import numpy as np

        cfg = self.cfg
        M = cfg.PATCHES_PER_FRAME
        meta_len = 24 + 2 * M
        Eb = -(-E // 8)  # bitmask bytes
        sections = [
            ("jj", 2 * E, np.uint16),
            ("ix", 2 * E, np.uint16),
            ("jx", 2 * E, np.uint16),
            ("d2p", 4 * cfg.M_OPT_MAX, np.int32),
            ("kk_seg", 2 * E, np.uint16),
            ("ij_seg", 2 * E, np.uint16),
            ("meta", 4 * meta_len, np.float32),
            ("rm_bits", Eb, np.uint8),   # edges removed since last frame
            ("st_bits", Eb, np.uint8),   # subset of removed rows stored
            #                              into the inactive ring
            ("kd_order", 2 * E, np.uint16),
            ("jj_order", 2 * E, np.uint16),
        ]
        layout = {}
        off = 0
        for name, nbytes, dt in sections:
            off = -(-off // 4) * 4  # 4-byte align every section
            layout[name] = (off, nbytes, dt)
            off += nbytes
        return layout, off

    def pack_frame(self, buf, jj, ix, jx, d2p, kk_seg, ij_seg, meta,
                   rm_bits, st_bits, kd_order, jj_order, E_cap: int = None):
        """Fill the preallocated uint8 frame buffer (host side). The
        image ships separately so its (much larger) upload can start the
        moment the frame arrives, before the keyframe decision fixes the
        topology sections. Edge-indexed arrays may be shorter than the
        capacity (sections zero-fill) but never longer. rm/st are
        np.packbits bitmasks over PRE-removal edge rows."""
        import numpy as np

        layout, _ = self.layout_for(E_cap or self.cfg.E_MAX)
        def put(name, arr):
            off, nbytes, dt = layout[name]
            view = buf[off:off + nbytes].view(dt)
            a = np.asarray(arr, dt).ravel()
            view[: a.size] = a
            if a.size < view.size:
                view[a.size:] = 0

        put("jj", jj)
        put("ix", ix)
        put("jx", jx)
        put("d2p", d2p)
        put("kk_seg", kk_seg)
        put("ij_seg", ij_seg)
        put("meta", meta)
        put("rm_bits", rm_bits)
        put("st_bits", st_bits)
        put("kd_order", kd_order)
        put("jj_order", jj_order)
        return buf

    def unpack_frame(self, buf, E_cap: int = None):
        """Device-side unpack of the topology buffer -> (es, meta, ops).
        Derives everything not shipped (see _frame_layout): kk from the
        dense2patch table, validity/neighbor masks from scalars, the
        jj-sort inverse by scatter, and the maintenance perm/src/dst by
        stable cumsum-compaction of the removal/store bitmasks."""
        cfg = self.cfg
        M = cfg.PATCHES_PER_FRAME
        E = E_cap or cfg.E_MAX
        layout, _ = self.layout_for(E)

        def get(name, jdt, width):
            off, nbytes, _ = layout[name]
            raw = jax.lax.dynamic_slice(buf, (off,), (nbytes,))
            if width == 1:
                return raw
            return jax.lax.bitcast_convert_type(raw.reshape(-1, width), jdt)

        jj = get("jj", jnp.uint16, 2).astype(jnp.int32)
        ix = get("ix", jnp.uint16, 2).astype(jnp.int32)
        jx = get("jx", jnp.uint16, 2).astype(jnp.int32)
        d2p = get("d2p", jnp.int32, 4)[: cfg.M_OPT_MAX]
        kk_seg = get("kk_seg", jnp.uint16, 2).astype(jnp.int32)
        ij_seg = get("ij_seg", jnp.uint16, 2).astype(jnp.int32)
        meta = get("meta", jnp.float32, 4)[: 24 + 2 * M]
        rm_bits = get("rm_bits", jnp.uint8, 1)
        st_bits = get("st_bits", jnp.uint8, 1)
        kd_order = get("kd_order", jnp.uint16, 2).astype(jnp.int32)
        jj_order = get("jj_order", jnp.uint16, 2).astype(jnp.int32)

        iota = jnp.arange(E, dtype=jnp.int32)
        n_live = meta[18].astype(jnp.int32)   # live edges AFTER removal
        valid = iota < n_live
        kk = d2p[jnp.clip(kk_seg, 0, cfg.M_OPT_MAX - 1)]
        kk = jnp.where(valid, kk, 0)  # padded rows: patch 0 (as before)
        jj_inv = jnp.zeros((E,), jnp.int32).at[jj_order].set(iota)

        # maintenance ops from the bitmasks (over PRE-removal rows):
        # stable compaction perm of kept rows (tail default 0, matching
        # topology.remove), removed-row sources in original order, ring
        # destinations from (inac_head, nstore) scalars
        def unpack_bits(b):
            shifts = jnp.arange(8, dtype=jnp.uint8)  # packbits is MSB-first
            return ((b[:, None] >> (7 - shifts)[None, :]) & 1).reshape(-1)[:E] > 0

        rm = unpack_bits(rm_bits)
        st = unpack_bits(st_bits)
        keep = ~rm
        pos_k = jnp.cumsum(keep.astype(jnp.int32)) - 1
        perm = jnp.zeros((E,), jnp.int32).at[
            jnp.where(keep, pos_k, E)].set(iota, mode="drop")
        pos_s = jnp.cumsum(st.astype(jnp.int32)) - 1
        src = jnp.zeros((E,), jnp.int32).at[
            jnp.where(st, pos_s, E)].set(iota, mode="drop")
        head0 = meta[19].astype(jnp.int32)
        dst = (head0 + iota) % cfg.E_INAC_MAX

        ii = kk // M
        es = dict(
            ii=ii,
            jj=jj,
            kk=kk,
            ii1=kk % (M * self.pmem),
            jj1=jj % cfg.MEM,
            kk_seg=kk_seg,
            ij_seg=ij_seg,
            ix=ix,
            jx=jx,
            mask_ix=(ix != iota) & valid,
            mask_jx=(jx != iota) & valid,
            valid=valid,
        )
        es["kd"] = es["kk_seg"]
        es["kd_order"] = kd_order
        es["jj_order"] = jj_order
        es["jj_inv"] = jj_inv
        es["dense2patch"] = d2p
        return es, meta, (perm, src, dst)

    # ---------------- frame ingestion ----------------

    def _patchify(self, params, image_u8, key):
        """image_u8 [H,W,3] uint8 -> patch features (ref dpvo.py:917-929)."""
        if self.exported is not None:
            return self.exported.patchify(image_u8, key)
        img = 2.0 * (image_u8.astype(jnp.float32) / 255.0) - 0.5
        img = img[None].astype(self.fdt)  # [1,H,W,3]
        fmap, gmap_p, imap_p, patches, clr = self.patchifier.apply(
            params["patchifier"], img, self.cfg.PATCHES_PER_FRAME, key,
            centroid_sel_strat=self.cfg.CENTROID_SEL_STRAT,
        )
        # BGR color convention + [0,255] (ref dpvo.py:937)
        clr = (clr[:, ::-1] + 0.5) * (255.0 / 2)
        fmap_hwc = fmap[0].astype(self.fdt)  # [h,w,fdim] NHWC native
        return fmap_hwc, gmap_p.astype(self.fdt), imap_p.astype(self.fdt), patches, clr

    def _ingest(
        self, state: VOState, n, fmap, gmap_p, imap_p, patches, clr, intrinsics,
        motion_fac, is_initialized, do_motion, key,
    ) -> VOState:
        """Write one frame into the buffers + motion/depth init
        (ref dpvo.py:931-971)."""
        cfg = self.cfg
        M, P = cfg.PATCHES_PER_FRAME, cfg.P

        intr = state.intrinsics.at[n].set(intrinsics / cfg.RES)
        colors = state.colors.at[n].set(clr.astype(jnp.uint8))

        # damped-linear motion model (ref dpvo.py:943-954)
        P1 = state.poses[jnp.maximum(n - 1, 0)]
        P2 = state.poses[jnp.maximum(n - 2, 0)]
        xi = cfg.MOTION_DAMPING * motion_fac * se3.log(se3.mul(P1, se3.inv(P2)))
        pred = se3.mul(se3.exp(xi), P1)
        pred = jnp.where(do_motion, pred, P1)
        poses = state.poses.at[n].set(pred)

        # depth init: random, or median of last-3-frame depths (ref
        # :960-964; one scalar per patch, like the reference). Live
        # depth is dvec; the patches depth plane keeps the init value
        # only for debugging.
        d_rand = jax.random.uniform(key, (M,))
        lo = jnp.maximum(n - 3, 0) * M
        window = jax.lax.dynamic_slice(state.dvec, (lo,), (3 * M,))
        d_med = jnp.median(window)
        depth = jnp.where(is_initialized, d_med, d_rand)
        patches = patches.at[:, 2].set(depth[:, None, None])
        patches_all = jax.lax.dynamic_update_slice(state.patches, patches, (n * M, 0, 0, 0))
        dvec = jax.lax.dynamic_update_slice(state.dvec, depth, (n * M,))

        # circular feature memories (ref :968-971)
        slot_p = (n % self.pmem) * M
        imap = jax.lax.dynamic_update_slice(state.imap, imap_p, (slot_p, 0))
        gmap = jax.lax.dynamic_update_slice(state.gmap, gmap_p, (slot_p, 0, 0, 0))
        fmap1 = state.fmap1.at[n % cfg.MEM].set(fmap)
        fmap2 = state.fmap2.at[n % cfg.MEM].set(avg_pool2d_nhwc(fmap, 4))

        return state._replace(
            poses=poses, patches=patches_all, dvec=dvec, intrinsics=intr,
            colors=colors, imap=imap, gmap=gmap, fmap1=fmap1, fmap2=fmap2,
        )

    # ---------------- deferred keyframe / retirement maintenance ----

    @staticmethod
    def _wb(full, prefix):
        """Write a capacity-prefix result back into the full-size edge
        store (no-op copy elision when shapes already match)."""
        if prefix.shape[0] == full.shape[0]:
            return prefix
        return jax.lax.dynamic_update_slice(
            full, prefix.astype(full.dtype), (0,) * full.ndim)

    def _maintenance(self, state: VOState, perm, src, dst, k, n_after, nstore):
        """Apply pending edge retirement + keyframe cull in one program.

        perm [E_cap] composed edge-payload compaction; src/dst [E_cap]
        inactive-store copy (first nstore entries); k = deleted keyframe
        (or -1). The frame-indexed buffer permutations are derived from
        k on device (they are pure functions of (k, n_after)) so the
        host ships only scalars (ref dpvo.py:523-568, :601-693). At a
        capacity below E_MAX only the live prefix is permuted — the host
        guarantees every live edge (pre-removal) fits the bucket.
        """
        cfg = self.cfg
        M = cfg.PATCHES_PER_FRAME
        Ecap = perm.shape[0]

        # inactive store first: reads pre-compaction rows (ref :537-553)
        ksl = jnp.arange(src.shape[0])
        ok = ksl < nstore
        dst_safe = jnp.where(ok, dst, cfg.E_INAC_MAX)
        ti = state.target_inac.at[dst_safe].set(state.target[src], mode="drop")
        wi = state.weight_inac.at[dst_safe].set(state.weight[src], mode="drop")

        net = self._wb(state.net, state.net[:Ecap][perm])
        target = self._wb(state.target, state.target[:Ecap][perm])
        weight = self._wb(state.weight, state.weight[:Ecap][perm])
        state = state._replace(
            net=net, target=target, weight=weight, target_inac=ti, weight_inac=wi
        )

        span = cfg.KEYFRAME_INDEX + 4  # static bound on n_after - k + 1

        def shift(state):
            # Only rows k..n_after move (one up); n_after - k + 1 is
            # statically bounded by span, and the host guard keeps
            # k + span inside every buffer (dpvo.__call__ reserves the
            # last span rows), so each buffer updates a small dynamic
            # window instead of gathering the whole array (the fmap/gmap
            # buffers are 100s of MB; the window is a few MB).

            def shift_contig(buf, row_k, rows_per):
                w = span * rows_per
                win = jax.lax.dynamic_slice_in_dim(buf, row_k * rows_per + rows_per, w, 0)
                return jax.lax.dynamic_update_slice_in_dim(buf, win, row_k * rows_per, 0)

            def shift_circular(buf, period, rows_per):
                # slot (f % period) <- slot ((f+1) % period) for
                # f = k..n_after; iterate i statically, mask f > n_after.
                # Reads of step i come from slots later than all prior
                # writes (requires period > span + 1), so sequential
                # updates are safe.
                for i in range(span):
                    f = k + i
                    s_src = ((f + 1) % period) * rows_per
                    s_dst = (f % period) * rows_per
                    src = jax.lax.dynamic_slice_in_dim(buf, s_src, rows_per, 0)
                    cur = jax.lax.dynamic_slice_in_dim(buf, s_dst, rows_per, 0)
                    win = jnp.where(f <= n_after, src, cur)
                    buf = jax.lax.dynamic_update_slice_in_dim(buf, win, s_dst, 0)
                return buf

            def perm_circular(buf, period, rows_per):
                # tiny circular memories (test configs) can wrap within
                # the span; fall back to a full permutation gather
                f = k + jnp.arange(span)
                fok = f <= n_after
                perm = jnp.arange(period).at[
                    jnp.where(fok, f % period, period)
                ].set((f + 1) % period, mode="drop")
                rows = (perm[:, None] * rows_per + jnp.arange(rows_per)[None, :]).reshape(-1)
                return buf[rows] if rows_per > 1 else buf[perm]

            circ = (shift_circular
                    if min(self.pmem, cfg.MEM) > span + 1 else perm_circular)
            return state._replace(
                poses=shift_contig(state.poses, k, 1),
                patches=shift_contig(state.patches, k, M),
                dvec=shift_contig(state.dvec, k, M),
                intrinsics=shift_contig(state.intrinsics, k, 1),
                colors=shift_contig(state.colors, k, 1),
                imap=circ(state.imap, self.pmem, M),
                gmap=circ(state.gmap, self.pmem, M),
                fmap1=circ(state.fmap1, cfg.MEM, 1),
                fmap2=circ(state.fmap2, cfg.MEM, 1),
            )

        return jax.lax.cond(k >= 0, shift, lambda s: s, state)

    # ---------------- fused steady-state frame step ----------------

    def _frame_step(self, params, state: VOState, image_u8, buf, key,
                    E_cap: int = None):
        """One tracked frame in a single device program: pending
        keyframe/retirement maintenance -> patchify -> ingest -> zero
        fresh edges -> update operator + sliding-window BA -> keyframe
        flow magnitude. Fuses what the reference does in ~8 kernel
        launches + host syncs (dpvo.py:905-1025); the per-frame payload
        arrives as the raw image plus ONE packed topology buffer (see
        pack_frame).

        meta (f32): [0]=n [1]=motion_fac [2]=do_motion [3]=k_cull(-1)
        [4]=start [5]=count [6]=t0 [7]=nfree [8]=i_kf [9]=j_kf
        [10]=npair_ij [11]=npair_ji [12:16]=intrinsics [16]=n_after
        [17]=nstore; [24:24+M] kk of edges (i->j); [24+M:24+2M] kk of
        edges (j->i).

        Returns (state', out_small [15] f32 = [kf motion magnitude,
        poses[i_kf+... k-1], poses[k]] — everything the host needs, in
        one fetch).
        """
        cfg = self.cfg
        M = cfg.PATCHES_PER_FRAME
        es, meta, (perm, src, dst) = self.unpack_frame(buf, E_cap)
        n = meta[0].astype(jnp.int32)
        intr = meta[12:16]

        state = self._maintenance(
            state, perm, src, dst, meta[3].astype(jnp.int32),
            meta[16].astype(jnp.int32), meta[17].astype(jnp.int32),
        )

        k_pf, k_d = jax.random.split(key)
        fmap, gmap_p, imap_p, patches, clr = self._patchify(params, image_u8, k_pf)
        state = self._ingest(
            state, n, fmap, gmap_p, imap_p, patches, clr, intr,
            meta[1], jnp.bool_(True), meta[2] > 0, k_d,
        )
        state = self._zero_edges(
            state, meta[4].astype(jnp.int32), meta[5].astype(jnp.int32)
        )
        state = self._update(
            params, state, es, meta[6].astype(jnp.int32), meta[7].astype(jnp.int32)
        )

        # keyframe decision input (ref dpvo.py:601-612): mean flow
        # magnitude between frames (i, j) in both directions
        def pair_mag(i, j, kk, npair):
            ii = jnp.full((M,), i, jnp.int32)
            jj = jnp.full((M,), j, jnp.int32)
            val = (jnp.arange(M) < npair).astype(jnp.float32)
            return self._flowmag_pair(state, ii, jj, kk, val, jnp.float32(0.5))

        i_kf = meta[8].astype(jnp.int32)
        j_kf = meta[9].astype(jnp.int32)
        kk1 = meta[24:24 + M].astype(jnp.int32)
        kk2 = meta[24 + M:24 + 2 * M].astype(jnp.int32)
        mag = 0.5 * (pair_mag(i_kf, j_kf, kk1, meta[10]) +
                     pair_mag(j_kf, i_kf, kk2, meta[11]))

        # prefetch the pose pair the host needs if it culls keyframe
        # k = i_kf + 1 (dpvo.py _keyframe_decide), bundled with mag so
        # the host needs exactly one small fetch per frame
        k_next = i_kf + 1
        pose_pair = jax.lax.dynamic_slice(state.poses, (k_next - 1, 0), (2, 7))
        out_small = jnp.concatenate([mag[None], pose_pair.reshape(-1)])
        return state, out_small

    # ---------------- the hot loop ----------------

    def _edge_forward(self, params, state: VOState, es: Dict[str, Any], net=None):
        """reproject -> correlate -> update operator (ref dpvo.py:775-810)."""
        cfg = self.cfg
        if net is None:
            net = state.net
        if net.shape[0] != es["ii"].shape[0]:
            net = net[: es["ii"].shape[0]]  # capacity-bucketed prefix
        coords = pops.transform(
            state.poses, state.patches, state.intrinsics, es["ii"], es["jj"],
            es["kk"], depth=state.dvec,
        )  # [E,P,P,2]
        corr_fn = {
            "pallas": corr_features_pallas,
            "pallas_sw": corr_features_pallas_sw,
            "pallas_dma": corr_features_pallas_dma,
            "pallas_fused": corr_features_pallas_fused,
        }.get(self.corr_impl, corr_features_xla)
        E = coords.shape[0]
        corr_kw = {}
        if (self.corr_impl in ("pallas_dma", "pallas_fused")
                and es.get("jj_order") is not None):
            corr_kw = dict(jj_order=es["jj_order"], jj_inv=es["jj_inv"])
        corr = corr_fn(
            state.gmap, state.fmap1, state.fmap2, coords.astype(jnp.float32),
            es["ii1"], es["jj1"], es["valid"], radius=cfg.CORR_RADIUS,
            **corr_kw,
        ).reshape(E, -1).astype(self.fdt)
        ctx = state.imap[es["ii1"]]
        if self.exported is not None:
            net, delta, weight = self.exported.update(
                net, ctx, corr, es["ix"], es["jx"], es["mask_ix"], es["mask_jx"],
                es["kk_seg"], es["ij_seg"], es["valid"],
            )
        else:
            net, delta, weight = self.update_op.apply(
                params["update"], net, ctx, corr,
                es["ix"], es["jx"], es["mask_ix"], es["mask_jx"],
                es["kk_seg"], es["ij_seg"], es["valid"],
                num_segments=cfg.M_OPT_MAX, num_ij_segments=2 * self.PAIR_MAX,
            )
        c = cfg.P // 2
        target = coords[:, c, c, :].astype(jnp.float32) + delta
        return net, target, weight, delta

    def _update(self, params, state: VOState, es: Dict[str, Any], t0, nfree) -> VOState:
        """One tracking round: update operator + sliding-window BA
        (ref dpvo.py:775-836)."""
        cfg = self.cfg
        net, target, weight, _ = self._edge_forward(params, state, es)

        state = state._replace(
            net=self._wb(state.net, net),
            target=self._wb(state.target, target),
            weight=self._wb(state.weight, weight),
        )

        # sliding-window BA over active edges
        c = cfg.P // 2
        ctr = jnp.concatenate(
            [state.patches[es["dense2patch"], :2, c, c],
             state.dvec[jnp.clip(es["dense2patch"], 0, state.dvec.shape[0] - 1)][:, None]],
            axis=1,
        )  # [Md,3] (clip-gather)
        fx, fy, cx, cy = state.intrinsics[0]
        bounds = jnp.stack([-cfg.BA_BORDER, -cfg.BA_BORDER, 2 * cx + cfg.BA_BORDER, 2 * cy + cfg.BA_BORDER])
        poses, depths = ba_solver.ba(
            state.poses, ctr, state.intrinsics, target, weight, es["valid"],
            es["ii"], es["jj"], es["kd"], t0, nfree, bounds, jnp.float32(cfg.BA_LMBDA),
            W=cfg.W_OPT_MAX, Md=cfg.M_OPT_MAX, iterations=cfg.BA_ITERS,
            ep=cfg.BA_EP, lm=cfg.BA_LM, res_clip=cfg.BA_RESIDUAL_CLIP, clamp_mode="runtime",
            kd_order=es.get("kd_order"),
        )
        dvec = state.dvec.at[es["dense2patch"]].set(depths, mode="drop")
        return state._replace(poses=poses, dvec=dvec)

    def _ba_only(self, state: VOState, es: Dict[str, Any], target, weight, t0, nfree) -> VOState:
        """Sliding-window BA with externally supplied targets — the
        ground-truth-oracle debugging mode (bypasses the network; used by
        integration tests to validate the geometry/solver stack
        end-to-end)."""
        cfg = self.cfg
        state = state._replace(target=target, weight=weight)
        c = cfg.P // 2
        ctr = jnp.concatenate(
            [state.patches[es["dense2patch"], :2, c, c],
             state.dvec[jnp.clip(es["dense2patch"], 0, state.dvec.shape[0] - 1)][:, None]],
            axis=1,
        )
        fx, fy, cx, cy = state.intrinsics[0]
        bounds = jnp.stack([-cfg.BA_BORDER, -cfg.BA_BORDER, 2 * cx + cfg.BA_BORDER, 2 * cy + cfg.BA_BORDER])
        poses, depths = ba_solver.ba(
            state.poses, ctr, state.intrinsics, target, weight, es["valid"],
            es["ii"], es["jj"], es["kd"], t0, nfree, bounds, jnp.float32(cfg.BA_LMBDA),
            W=cfg.W_OPT_MAX, Md=cfg.M_OPT_MAX, iterations=cfg.BA_ITERS,
            ep=cfg.BA_EP, lm=cfg.BA_LM, res_clip=cfg.BA_RESIDUAL_CLIP, clamp_mode="runtime",
            kd_order=es.get("kd_order"),
        )
        dvec = state.dvec.at[es["dense2patch"]].set(depths, mode="drop")
        return state._replace(poses=poses, dvec=dvec)

    def _update_noba(self, params, state: VOState, es: Dict[str, Any]) -> VOState:
        """Update operator only (used before a global-BA round, which
        replaces the sliding-window solve; ref dpvo.py:812-816)."""
        net, target, weight, _ = self._edge_forward(params, state, es)
        return state._replace(
            net=self._wb(state.net, net),
            target=self._wb(state.target, target),
            weight=self._wb(state.weight, weight),
        )

    def _zero_edges(self, state: VOState, start, count) -> VOState:
        """Zero hidden state of freshly appended edges (ref dpvo.py:519).

        Per-frame appends are bounded by M*(2*PATCH_LIFETIME-1) rows
        (topology.edges_forw/edges_back), so only a static window is
        touched — a full-buffer where() pass costs ~2x the net buffer
        (150 MB at the default E_MAX) of HBM traffic per frame."""
        cfg = self.cfg
        span = min(cfg.E_MAX, cfg.PATCHES_PER_FRAME * 2 * cfg.PATCH_LIFETIME)
        s0 = jnp.clip(start, 0, cfg.E_MAX - span)
        win = jax.lax.dynamic_slice_in_dim(state.net, s0, span, 0)
        rows = s0 + jnp.arange(span)
        fresh = ((rows >= start) & (rows < start + count))[:, None]
        win = jnp.where(fresh, 0.0, win).astype(win.dtype)
        return state._replace(
            net=jax.lax.dynamic_update_slice_in_dim(state.net, win, s0, 0))

    def _probe(self, params, state: VOState, es: Dict[str, Any]):
        """Motion probe: median |delta| over probe edges with zero hidden
        state, no BA (ref dpvo.py:570-584)."""
        zero_net = jnp.zeros((es["ii"].shape[0], self.cfg.DIM), self.fdt)
        _, _, _, delta = self._edge_forward(params, state, es, net=zero_net)
        mag = jnp.linalg.norm(delta, axis=-1)
        big = 1e9
        mag = jnp.where(es["valid"], mag, big)
        k = jnp.sum(es["valid"])
        srt = jnp.sort(mag)
        med = srt[jnp.maximum(k // 2, 0)]
        return med

    def _flowmag_pair(self, state: VOState, ii, jj, kk, valid, beta):
        """Masked mean flow magnitude (ref dpvo.py:586-599 motionmag)."""
        mag, val = pops.flow_mag(
            state.poses, state.patches, state.intrinsics, ii, jj, kk, beta=beta,
            depth=state.dvec,
        )
        m = jnp.mean(mag, axis=(1, 2)) * valid
        cnt = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(m) / cnt

    # ---------------- topology maintenance ----------------

    def _compact_edges(self, state: VOState, perm, new_start, new_count) -> VOState:
        """Permute edge payloads after removal, zeroing appended slots
        (ref dpvo.py:519, :559-566)."""
        idx = jnp.arange(self.cfg.E_MAX)
        fresh = (idx >= new_start) & (idx < new_start + new_count)
        net = jnp.where(fresh[:, None], 0.0, state.net[perm]).astype(state.net.dtype)
        target = jnp.where(fresh[:, None], 0.0, state.target[perm])
        weight = jnp.where(fresh[:, None], 0.0, state.weight[perm])
        return state._replace(net=net, target=target, weight=weight)

    def _store_inactive(self, state: VOState, src, dst, count) -> VOState:
        """Copy removed edges' targets/weights into the inactive ring
        (ref dpvo.py:537-553)."""
        k = jnp.arange(src.shape[0])
        ok = k < count
        dst_safe = jnp.where(ok, dst, self.cfg.E_INAC_MAX)  # drop padded
        ti = state.target_inac.at[dst_safe].set(state.target[src], mode="drop")
        wi = state.weight_inac.at[dst_safe].set(state.weight[src], mode="drop")
        return state._replace(target_inac=ti, weight_inac=wi)

    def _keyframe_shift(self, state: VOState, frame_perm, patch_perm, pmem_perm, mem_perm) -> VOState:
        """Delete a keyframe by gathering every frame-indexed buffer
        (ref dpvo.py:658-670)."""
        M = self.cfg.PATCHES_PER_FRAME
        pslots = (pmem_perm[:, None] * M + jnp.arange(M)[None, :]).reshape(-1)
        return state._replace(
            poses=state.poses[frame_perm],
            patches=state.patches[patch_perm],
            dvec=state.dvec[patch_perm],
            intrinsics=state.intrinsics[frame_perm],
            colors=state.colors[frame_perm],
            imap=state.imap[pslots],
            gmap=state.gmap[pslots],
            fmap1=state.fmap1[mem_perm],
            fmap2=state.fmap2[mem_perm],
        )

    # ---------------- global BA + gauge ----------------

    def _normalize(self, state: VOState, n, m) -> VOState:
        """Scale-gauge conditioning guard before global BA.

        DELIBERATE deviation from the reference's unconditional
        normalize (patchgraph.py:93-100, raw-mean rescale + re-anchor
        every global-BA round): hysteresis — rescale ONLY when the mean
        inverse depth has drifted past 2x. Rationale (measured,
        scripts/lc_ab.py multi-seed grid, round 5): the per-round
        rescale + re-anchor measurably DEGRADES loop-closure accuracy
        (median ATE ~2x worse on loopy scenes, occasional divergence) —
        the BA damping/trust-region constants are parameter-scale
        sensitive, so thrashing the gauge every round perturbs every
        subsequent solve — while its only real job is keeping the free
        monocular scale gauge from drifting to poorly-conditioned
        extremes (the r4 soak found a 1e13 ratchet, tests/test_soak.py;
        the [0.25, 4] per-round clamp is kept on top). With hysteresis a
        drifted gauge is still pulled back to mean 1, but a healthy one
        is left strictly untouched."""
        M, P = self.cfg.PATCHES_PER_FRAME, self.cfg.P
        pidx = jnp.arange(state.dvec.shape[0])
        pvalid = pidx < m
        d = state.dvec
        s_raw = jnp.sum(jnp.where(pvalid, d, 0.0)) / jnp.maximum(jnp.sum(pvalid), 1)
        # trigger band is WIDE on purpose: a mean inverse depth of 0.25
        # (a 4 m scene) is a healthy gauge, not a pathology — rescaling
        # it measurably degraded the subsequent solves (grid above); the
        # runaway this guards against compounds exponentially (1e13 in
        # the r4 soak), so catching it at 100x is early
        drifted = (s_raw < 1e-2) | (s_raw > 1e2)
        s = jnp.where(drifted, jnp.clip(s_raw, 0.25, 4.0), 1.0)
        dvec = jnp.where(pvalid, d / s, d)
        fvalid = jnp.arange(state.poses.shape[0]) < n
        t_scaled = state.poses[:, :3] * s
        poses = state.poses.at[:, :3].set(jnp.where(fvalid[:, None], t_scaled, state.poses[:, :3]))
        # re-anchor to the first pose (ref patchgraph.py:100) — only
        # when actually rescaling (pose 0 is pinned by t0 >= 1 anyway
        # outside apply_pgo, so this is normally the identity)
        anchor = se3.inv(poses[0])
        re = se3.mul(poses, anchor)
        poses = jnp.where((fvalid & drifted)[:, None], re, poses)
        return state._replace(poses=poses, dvec=dvec), s

    def _global_ba(self, params, state: VOState, ges: Dict[str, Any], inac_pos, n_inac, t0, nfree, idx: Dict[str, Any]) -> VOState:
        """Full-history BA over active + inactive edges
        (ref dpvo.py:695-716 __run_global_BA), sparse-assembled
        (ba/gba_sparse.py) so memory stays O(edges) at full capacity."""
        cfg = self.cfg
        Eg = cfg.GBA_EDGES_MAX
        # assemble target/weight: first n_inac from the inactive ring, rest active
        k = jnp.arange(Eg)
        inac_slot = inac_pos  # [Eg] precomputed ring slots (padded)
        act_slot = jnp.clip(k - n_inac, 0, cfg.E_MAX - 1)
        t_in = state.target_inac[inac_slot]
        w_in = state.weight_inac[inac_slot]
        t_ac = state.target[act_slot]
        w_ac = state.weight[act_slot]
        use_inac = (k < n_inac)[:, None]
        target = jnp.where(use_inac, t_in, t_ac)
        weight = jnp.where(use_inac, w_in, w_ac)

        c = cfg.P // 2
        ctr = jnp.concatenate(
            [state.patches[ges["dense2patch"], :2, c, c],
             state.dvec[jnp.clip(ges["dense2patch"], 0, state.dvec.shape[0] - 1)][:, None]],
            axis=1,
        )
        fx, fy, cx, cy = state.intrinsics[0]
        bounds = jnp.stack([-cfg.BA_BORDER, -cfg.BA_BORDER, 2 * cx + cfg.BA_BORDER, 2 * cy + cfg.BA_BORDER])
        gba_args = (
            state.poses, ctr, state.intrinsics, target, weight, ges["valid"],
            ges["ii"], ges["jj"], ges["kd"], t0, nfree, bounds,
            jnp.float32(cfg.BA_LMBDA), idx,
        )
        gba_kw = dict(W=cfg.GBA_POSES_MAX, Md=cfg.GBA_DEPTHS_MAX,
                      iterations=cfg.GBA_ITERS, ep=cfg.BA_EP, lm=cfg.BA_LM,
                      res_clip=cfg.BA_RESIDUAL_CLIP)
        if self.mesh is not None:
            poses, depths = gba_sparse.dist_gba(self.mesh, *gba_args, **gba_kw)
        else:
            poses, depths = gba_sparse.gba(*gba_args, **gba_kw)
        dvec = state.dvec.at[ges["dense2patch"]].set(depths, mode="drop")
        return state._replace(poses=poses, dvec=dvec)

    def _apply_pgo(self, state: VOState, poses_new, scales, m) -> VOState:
        """Apply a Sim(3) PGO result: rewrite poses < m and rescale
        their patches' inverse depths (ref loop_closure/long_term.py:
        189-203 lc_callback)."""
        cfg = self.cfg
        M = cfg.PATCHES_PER_FRAME
        N = state.poses.shape[0]
        mask = jnp.arange(N) < m
        poses = jnp.where(mask[:, None], poses_new, state.poses)
        s_frame = jnp.where(mask, scales, 1.0)
        s_patch = s_frame[jnp.arange(N * M) // M]
        dvec = state.dvec / s_patch
        return state._replace(poses=poses, dvec=dvec)

    # ---------------- outputs ----------------

    def _point_cloud(self, state: VOState, m) -> jnp.ndarray:
        """World points at patch centers for viewer/export
        (ref dpvo.py:834-836)."""
        cfg = self.cfg
        ix = jnp.arange(state.patches.shape[0], dtype=jnp.int32) // cfg.PATCHES_PER_FRAME
        X = pops.point_cloud(state.poses, state.patches, state.intrinsics, ix,
                             depth=state.dvec)
        c = cfg.P // 2
        pts = X[:, c, c, :3] / jnp.maximum(jnp.abs(X[:, c, c, 3:]), 1e-8) * jnp.sign(X[:, c, c, 3:])
        ok = (jnp.arange(pts.shape[0]) < m)[:, None]
        return jnp.where(ok, pts, 0.0)
