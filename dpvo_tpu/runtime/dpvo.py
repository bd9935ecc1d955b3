"""DPVO runtime — host orchestrator for the TPU-native VO system.

Sequencing mirrors the reference state machine (dpvo/dpvo.py:905-1029):
patchify -> ingest -> (motion probe until initialized) -> edge append ->
update (operator + sliding-window BA) -> keyframe culling -> edge
retirement. The host owns dynamic topology (runtime/topology.py) and
feeds fixed-shape padded arrays to the jitted steps (runtime/steps.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.config import Config
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime.state import VOState, make_state
from dpvo_tpu.runtime.steps import StepFunctions
from dpvo_tpu.runtime.topology import EdgeSet, Topology
from dpvo_tpu.runtime.weights import init_params, load_params


def _es_dict(es: EdgeSet) -> Dict:
    return dict(
        ii=es.ii, jj=es.jj, kk=es.kk, valid=es.valid, ii1=es.ii1, jj1=es.jj1,
        kk_seg=es.kk_seg, ij_seg=es.ij_seg, ix=es.ix, jx=es.jx,
        mask_ix=es.mask_ix, mask_jx=es.mask_jx, kd=es.kd, dense2patch=es.dense2patch,
    )


class DPVO:
    """Track a monocular camera through an image stream.

    Usage (same contract as the reference, demo.py:46-92):
        slam = DPVO(cfg, network, ht, wd)
        for t, image, intrinsics in stream: slam(t, image, intrinsics)
        poses, tstamps = slam.terminate()
    """

    def __init__(self, cfg: Config, network: Optional[str] = None, ht: int = 480, wd: int = 640,
                 viz: bool = False, seed: int = 0):
        self.cfg = cfg
        self.ht, self.wd = ht, wd
        self.steps = StepFunctions(cfg, ht, wd)
        self.state = make_state(cfg, ht, wd)
        self.topo = Topology(cfg)

        if isinstance(network, dict):
            self.params = network
        elif isinstance(network, str) and network:
            self.params = load_params(network, cfg)
        else:
            self.params = init_params(cfg, jax.random.PRNGKey(seed))

        self.is_initialized = False
        self.counter = 0           # total frames seen
        self.tlist = []            # wall timestamps per frame
        self.tstamps = []          # counter value per kept keyframe (ref pg.tstamps_)
        self.delta = {}            # counter -> (anchor counter, rel pose np[7])
        self.ran_global_ba = set()
        self.last_global_ba = -1000
        self.rng = jax.random.PRNGKey(seed)

        # optional ground-truth oracle: fn(slam, EdgeSet) -> (target, weight)
        # padded numpy arrays. Replaces the network's (delta, weight)
        # prediction; used by integration tests / debugging.
        self.oracle = None

        self.viewer = None
        if viz:
            from dpvo_tpu.apps.viewer import Viewer

            self.viewer = Viewer()

    # ---------------- helpers ----------------

    @property
    def n(self) -> int:
        return self.topo.n

    @property
    def m(self) -> int:
        return self.topo.m

    def _next_key(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def poses_np(self, upto: Optional[int] = None) -> np.ndarray:
        p = np.asarray(self.state.poses)
        return p[: upto if upto is not None else self.n]

    # ---------------- per-frame tracking ----------------

    def __call__(self, tstamp, image: np.ndarray, intrinsics: np.ndarray):
        """Track one frame. image [H,W,3] uint8 RGB; intrinsics [4]."""
        cfg = self.cfg
        if (self.n + 1) >= cfg.BUFFER_SIZE:
            raise RuntimeError(
                f"Buffer size {cfg.BUFFER_SIZE} too small; increase BUFFER_SIZE"
            )

        self.tlist.append(float(tstamp))
        if len(self.tstamps) == self.n:
            self.tstamps.append(self.counter)
        else:  # probe-rejected frame previously occupied row n
            self.tstamps[self.n] = self.counter

        # motion factor handles varying camera hz (ref dpvo.py:948-950)
        *_, a, b, c = [1.0] * 3 + self.tlist
        fac = (c - b) / (b - a) if b != a else 1.0
        self.counter += 1

        run_gba = cfg.LOOP_CLOSURE and (
            self.n + 1 - self.last_global_ba >= cfg.GLOBAL_OPT_FREQ
            or (self.topo.ii < self.n + 1 - cfg.REMOVAL_WINDOW - 1).any()
        )
        if (
            self.is_initialized
            and self.oracle is None
            and not run_gba
        ):
            self._fused_frame(image, intrinsics, fac)
            return

        fmap, gmap_p, imap_p, patches, clr = self.steps.patchify(
            self.params, jnp.asarray(image), self._next_key()
        )
        self.state = self.steps.ingest(
            self.state, jnp.int32(self.n), fmap, gmap_p, imap_p, patches, clr,
            jnp.asarray(intrinsics, jnp.float32), jnp.float32(fac),
            jnp.bool_(self.is_initialized), jnp.bool_(self.n > 1), self._next_key(),
        )

        if self.n > 0 and not self.is_initialized:
            if float(self._motion_probe()) < 2.0:
                # not enough motion: drop the frame, chain its pose to the
                # previous one (ref dpvo.py:975-978)
                self.delta[self.counter - 1] = (self.counter - 2, se3.identity())
                return

        self.topo.add_frame()

        if cfg.LOOP_CLOSURE and self.n - self.last_global_ba >= cfg.GLOBAL_OPT_FREQ:
            from dpvo_tpu.slam.proximity import edges_loop

            lkk, ljj = edges_loop(self)
            if len(lkk) > 0:
                self.last_global_ba = self.n
                self._append(lkk, ljj)

        kk_f, jj_f = self.topo.edges_forw()
        kk_b, jj_b = self.topo.edges_back()
        self._append(np.concatenate([kk_f, kk_b]), np.concatenate([jj_f, jj_b]))

        if self.n == 8 and not self.is_initialized:
            self.is_initialized = True
            for _ in range(12):
                self.update()
        elif self.is_initialized:
            self.update()
            self.keyframe()

    def _fused_frame(self, image, intrinsics, fac):
        """Steady-state frame: one device program for patchify + ingest
        + update + keyframe flow magnitude, one packed topology upload,
        one scalar fetch (see StepFunctions._frame_step)."""
        cfg = self.cfg
        M = cfg.PATCHES_PER_FRAME
        self.topo.add_frame()

        kk_f, jj_f = self.topo.edges_forw()
        kk_b, jj_b = self.topo.edges_back()
        start, count = self._append(
            np.concatenate([kk_f, kk_b]), np.concatenate([jj_f, jj_b]), defer_zero=True
        )

        es = self.topo.edge_set()
        packed = self.steps.pack_edge_set(es)
        t0 = max(self.n - cfg.OPTIMIZATION_WINDOW, 1)
        nfree = max(self.n - t0, 0)
        assert nfree <= cfg.W_OPT_MAX, (nfree, cfg.W_OPT_MAX)

        i_kf = self.n - cfg.KEYFRAME_INDEX - 1
        j_kf = self.n - cfg.KEYFRAME_INDEX + 1
        meta = np.zeros(16 + 2 * M, np.float32)
        meta[0] = self.n
        meta[1] = fac
        meta[2] = 1.0 if self.n > 1 else 0.0
        meta[4] = start
        meta[5] = count
        meta[6] = t0
        meta[7] = nfree
        meta[8] = i_kf
        meta[9] = j_kf
        for off, (a, b) in ((0, (i_kf, j_kf)), (M, (j_kf, i_kf))):
            sel = (self.topo.ii == a) & (self.topo.jj == b)
            kk = self.topo.kk[sel][:M]
            meta[10 + off // M] = len(kk)
            meta[16 + off:16 + off + len(kk)] = kk
        meta[12:16] = intrinsics

        self.state, mag = self.steps.frame_step(
            self.params, self.state, jnp.asarray(image), jnp.asarray(packed),
            jnp.asarray(meta), self._next_key(),
        )
        self._keyframe_decide(float(mag))

    def _append(self, kk, jj, defer_zero: bool = False):
        overflow = len(self.topo.ii) + len(kk) - self.cfg.E_MAX
        if overflow > 0:
            # degrade gracefully: retire the oldest active edges into the
            # inactive store (the fork raises here, dpvo.py:504-509; we
            # keep tracking and let global BA still see the constraints)
            print(f"warning: E_MAX={self.cfg.E_MAX} reached; retiring {overflow} oldest edges")
            rm = np.zeros(len(self.topo.ii), bool)
            rm[:overflow] = True
            self.state = self._remove_store(rm)
        start, count = self.topo.append(kk, jj)
        if not defer_zero:
            self.state = self.steps.zero_edges(self.state, jnp.int32(start), jnp.int32(count))
        return start, count

    def _motion_probe(self) -> float:
        """Median predicted flow of last-frame patches against the new
        frame (ref dpvo.py:570-584)."""
        M = self.cfg.PATCHES_PER_FRAME
        kk = np.arange(self.m - M, self.m)
        jj = np.full(M, self.n)
        es = self.topo.edge_set(ii=kk // M, jj=jj, kk=kk, pad=M)
        return self.steps.probe(self.params, self.state, _es_dict(es))

    # ---------------- optimization round ----------------

    def update(self):
        if len(self.topo.ii) == 0:
            return
        cfg = self.cfg
        es = self.topo.edge_set()

        run_gba = (
            cfg.LOOP_CLOSURE
            and (self.topo.ii < self.n - cfg.REMOVAL_WINDOW - 1).any()
            and self.n not in self.ran_global_ba
        )
        t0 = max(self.n - cfg.OPTIMIZATION_WINDOW, 1) if self.is_initialized else 1
        nfree = max(self.n - t0, 0)
        assert nfree <= cfg.W_OPT_MAX, (nfree, cfg.W_OPT_MAX)

        if self.oracle is not None:
            target, weight = self.oracle(self, es)
            self.state = self.steps.ba_only(
                self.state, _es_dict(es), jnp.asarray(target), jnp.asarray(weight),
                jnp.int32(t0), jnp.int32(nfree),
            )
        elif run_gba:
            self.state = self.steps.update_noba(self.params, self.state, _es_dict(es))
            self._run_global_ba()
        else:
            self.state = self.steps.update(
                self.params, self.state, _es_dict(es), jnp.int32(t0), jnp.int32(nfree)
            )

    def _run_global_ba(self):
        """Full-history BA over active + inactive edges (ref dpvo.py:695-716)."""
        cfg = self.cfg
        ges, pos, ninac = self.topo.global_edge_set()
        self.state, _ = self.steps.normalize(self.state, jnp.int32(self.n), jnp.int32(self.m))
        t0 = int(min(ges["ii"][: ges["count"]].min(), self.n - 1)) if ges["count"] else 0
        t0 = max(t0, max(self.n - cfg.GBA_POSES_MAX, 0))
        pos_pad = np.zeros(cfg.GBA_EDGES_MAX, np.int32)
        pos_pad[:ninac] = pos
        self.state = self.steps.global_ba(
            self.params, self.state, ges, jnp.asarray(pos_pad), jnp.int32(ninac),
            jnp.int32(t0), jnp.int32(self.n - t0),
        )
        self.ran_global_ba.add(self.n)

    # ---------------- keyframing (ref dpvo.py:601-693) ----------------

    def _motionmag(self, i: int, j: int) -> float:
        sel = (self.topo.ii == i) & (self.topo.jj == j)
        if not sel.any():
            return 0.0
        M = self.cfg.PATCHES_PER_FRAME
        ii, jj, kk = self.topo.ii[sel][:M], self.topo.jj[sel][:M], self.topo.kk[sel][:M]
        pad = M
        iiP = np.zeros(pad, np.int32); iiP[: len(ii)] = ii
        jjP = np.zeros(pad, np.int32); jjP[: len(jj)] = jj
        kkP = np.zeros(pad, np.int32); kkP[: len(kk)] = kk
        val = np.zeros(pad, np.float32); val[: len(ii)] = 1.0
        return float(
            self.steps.flowmag_pair(
                self.state, jnp.asarray(iiP), jnp.asarray(jjP), jnp.asarray(kkP),
                jnp.asarray(val), jnp.float32(0.5),
            )
        )

    def keyframe(self):
        cfg = self.cfg
        i = self.n - cfg.KEYFRAME_INDEX - 1
        j = self.n - cfg.KEYFRAME_INDEX + 1
        m = (self._motionmag(i, j) + self._motionmag(j, i)) / 2
        self._keyframe_decide(m)

    def _keyframe_decide(self, m: float):
        """Apply keyframe culling + edge retirement given the mean flow
        magnitude between the probe frames (ref dpvo.py:601-693)."""
        cfg = self.cfg
        if m < cfg.KEYFRAME_THRESH:
            k = self.n - cfg.KEYFRAME_INDEX
            # relative-pose chain for the removed frame (ref :627-631)
            poses = np.asarray(self.state.poses[k - 1 : k + 1])
            dP = np.asarray(se3.mul(jnp.asarray(poses[1]), se3.inv(jnp.asarray(poses[0]))))
            t0c, t1c = self.tstamps[k - 1], self.tstamps[k]
            self.delta[t1c] = (t0c, dP)

            # drop edges touching frame k (no store)
            rm = (self.topo.ii == k) | (self.topo.jj == k)
            perm, _, _ = self.topo.remove(rm, store=False)
            self.state = self.steps.compact_edges(
                self.state, jnp.asarray(perm), jnp.int32(0), jnp.int32(0)
            )
            self.topo.shift_frame(k)
            del self.tstamps[k]

            # shift frame-indexed buffers (ref :658-670)
            N = cfg.BUFFER_SIZE
            M = cfg.PATCHES_PER_FRAME
            n_after = self.n  # already decremented
            frame_perm = np.arange(N)
            frame_perm[k : n_after + 1] = np.arange(k + 1, n_after + 2)
            patch_perm = (frame_perm[:, None] * M + np.arange(M)[None, :]).reshape(-1)
            pmem = self.steps.pmem
            pmem_perm = np.arange(pmem)
            for f in range(k, n_after + 1):
                pmem_perm[f % pmem] = (f + 1) % pmem
            mem_perm = np.arange(cfg.MEM)
            for f in range(k, n_after + 1):
                mem_perm[f % cfg.MEM] = (f + 1) % cfg.MEM
            self.state = self.steps.keyframe_shift(
                self.state, jnp.asarray(frame_perm), jnp.asarray(patch_perm),
                jnp.asarray(pmem_perm), jnp.asarray(mem_perm),
            )

        # retire edges whose patches fell out of the optimization window
        to_remove = (self.topo.kk // cfg.PATCHES_PER_FRAME) < self.n - cfg.REMOVAL_WINDOW
        if cfg.LOOP_CLOSURE:
            lc = ((self.topo.jj - self.topo.ii) > 30) & (
                self.topo.jj > (self.n - cfg.OPTIMIZATION_WINDOW)
            )
            to_remove = to_remove & ~lc
        if to_remove.any():
            self.state = self._remove_store(to_remove)

    def _remove_store(self, mask) -> VOState:
        perm, src, dst = self.topo.remove(mask, store=True)
        state = self.state
        if len(src) > 0:
            K = self.cfg.E_MAX  # pad store arrays to a fixed size
            srcP = np.zeros(K, np.int32); srcP[: len(src)] = src
            dstP = np.zeros(K, np.int32); dstP[: len(dst)] = dst
            state = self.steps.store_inactive(
                state, jnp.asarray(srcP), jnp.asarray(dstP), jnp.int32(len(src))
            )
        return self.steps.compact_edges(state, jnp.asarray(perm), jnp.int32(0), jnp.int32(0))

    # ---------------- termination (ref dpvo.py:392-417) ----------------

    def get_pose(self, t: int, traj: Dict[int, np.ndarray]) -> np.ndarray:
        if t in traj:
            return traj[t]
        t0, dP = self.delta[t]
        base = self.get_pose(t0, traj)
        out = np.asarray(se3.mul(jnp.asarray(dP), jnp.asarray(base)))
        traj[t] = out
        return out

    def terminate(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.cfg.LOOP_CLOSURE:
            from dpvo_tpu.slam.proximity import edges_loop

            lkk, ljj = edges_loop(self)
            if len(lkk) > 0:
                self._append(lkk, ljj)

        for _ in range(12):
            self.ran_global_ba.discard(self.n)
            self.update()

        poses_kf = self.poses_np()
        traj = {self.tstamps[i]: poses_kf[i] for i in range(self.n)}
        poses = np.stack([self.get_pose(t, traj) for t in range(self.counter)])
        poses = np.asarray(se3.inv(jnp.asarray(poses)))  # camera-to-world
        tstamps = np.asarray(self.tlist, np.float64)

        if self.viewer is not None:
            self.viewer.join()
        return poses, tstamps

    def point_cloud(self) -> Tuple[np.ndarray, np.ndarray]:
        """World points + colors for export (PLY/COLMAP)."""
        pts = np.asarray(self.steps.point_cloud(self.state, jnp.int32(self.m)))[: self.m]
        clr = np.asarray(self.state.colors).reshape(-1, 3)[: self.m]
        return pts, clr
