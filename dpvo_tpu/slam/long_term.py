"""Classic (long-term) loop closure — retrieval + Sim(3) + PGO.

Re-design of the reference DPV-SLAM classic backend
(dpvo/loop_closure/long_term.py:20-266):

  reference                          this module
  ---------                          -----------
  DBoW2 ORB retrieval child proc  -> OrbRetrieval (C++ hamming core,
                                     slam/retrieval.py)
  DISK + LightGlue keypoints      -> ORB + ratio-test hamming matching
                                     (same detector the retrieval uses)
  structure-only fastba triangul. -> structure-only ba/solver.py solve
                                     (nfree=0) over the (i-1, i, i+1)
                                     triplet, 6 iterations, residual<2px
                                     + depth<20 gating — the reference's
                                     estimate_3d_keypoints mini patch
                                     graph (long_term.py:70-138)
  RANSAC-Umeyama Sim(3)           -> same algorithm
                                     (optim_utils.py:117-150)
  async Sim3 PGO worker pool      -> slam/pgo.py LM solver (JAX), run
                                     opportunistically; result applied
                                     via a single device call

Keypoint extraction and matching are host-side (OpenCV + native C++),
exactly as in the reference; only the PGO itself and the correction
application run on the TPU.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from dpvo_tpu.eval.ate import umeyama_alignment
from dpvo_tpu.lie import sim3

MIN_INLIERS = 30       # ref long_term.py:207
RANSAC_ITERS = 400     # ref long_term.py:239 close_loop
RANSAC_TAU = 0.1       # inlier threshold as a fraction of cloud scale
N_LC = 512             # padded keypoint capacity of the mini triplet BA
                       # (one compile; the reference caps at 2048 DISK kps)


def ransac_umeyama(X: np.ndarray, Y: np.ndarray, iters: int = RANSAC_ITERS,
                   tau: float = RANSAC_TAU):
    """Robust Sim(3) X->Y from [n,3] correspondences
    (ref loop_closure/optim_utils.py:117-150). Returns
    (R, t, s, inlier_mask) or None."""
    n = X.shape[0]
    if n < 3:
        return None
    rng = np.random.default_rng(0)
    scale = max(np.linalg.norm(Y - Y.mean(0), axis=1).mean(), 1e-6)
    best = None
    best_count = 0
    for _ in range(iters):
        idx = rng.choice(n, 3, replace=False)
        try:
            R, t, s = umeyama_alignment(X[idx].T, Y[idx].T, with_scale=True)
        except np.linalg.LinAlgError:
            continue
        pred = s * X @ R.T + t
        inl = np.linalg.norm(pred - Y, axis=1) < tau * scale
        if inl.sum() > best_count:
            best_count = int(inl.sum())
            best = inl
    if best is None or best_count < MIN_INLIERS:
        return None
    # final fit on the consensus set, then one inlier-refit round: the
    # 3-point hypothesis that won RANSAC is noisy; refitting on its
    # inliers and re-gating tightens the estimate at negligible cost
    for _ in range(2):
        R, t, s = umeyama_alignment(X[best].T, Y[best].T, with_scale=True)
        pred = s * X @ R.T + t
        best = np.linalg.norm(pred - Y, axis=1) < tau * scale
        if best.sum() < MIN_INLIERS:
            return None
    return R, t, s, best


def _pose_matrix(pose7: np.ndarray) -> np.ndarray:
    """world-to-camera [4,4] from (t, q) embedding."""
    from dpvo_tpu.lie import se3
    import jax.numpy as jnp

    return np.asarray(se3.to_matrix(jnp.asarray(pose7)))


def _triplet_structure_ba(poses3, intr_full, kp_xy, targets, tvalid, d0):
    """Structure-only BA over a keyframe triplet (ref long_term.py:108-131).

    poses3 [3,7]: world-to-camera poses of (i-1, i, i+1); intr_full [4]:
    full-resolution intrinsics; kp_xy [N_LC,2]: center-frame keypoints
    (full-res px); targets [2,N_LC,2]: their matched positions in the two
    neighbor frames; tvalid [2,N_LC]: which of those matches exist; d0:
    initial inverse depth (median of the center keyframe's patch depths,
    ref :112). All 3 poses stay fixed (nfree=0); only the N_LC inverse
    depths are solved, 6 Gauss-Newton iterations at lambda=1e-3 (ref
    :125-128). Returns (X [N_LC,3] points in the center-camera frame,
    keep [N_LC] bool: max edge residual < 2px and depth < 20, ref
    :130-137 + close_loop's z<20 gate :213-218).
    """
    import jax.numpy as jnp

    from dpvo_tpu.ba import solver as ba_solver
    from dpvo_tpu.geom import projective as pops

    n = kp_xy.shape[0]
    ctr = jnp.concatenate(
        [jnp.asarray(kp_xy, jnp.float32), jnp.full((n, 1), d0, jnp.float32)], axis=1
    )
    intr3 = jnp.tile(jnp.asarray(intr_full, jnp.float32)[None], (3, 1))
    target = jnp.asarray(targets, jnp.float32).reshape(2 * n, 2)
    valid = jnp.asarray(tvalid).reshape(2 * n)
    weight = jnp.ones((2 * n, 2), jnp.float32) * valid[:, None]
    ii = jnp.full((2 * n,), 1, jnp.int32)
    jj = jnp.concatenate([jnp.zeros(n, jnp.int32), jnp.full((n,), 2, jnp.int32)])
    kd = jnp.tile(jnp.arange(n, dtype=jnp.int32), 2)
    # generous bounds: gating is by the 2px residual mask below, the
    # ref mini graph passes the fastba defaults
    wd = float(intr_full[2]) * 2.0
    ht = float(intr_full[3]) * 2.0
    bounds = jnp.array([-64.0, -64.0, wd + 64.0, ht + 64.0], jnp.float32)

    poses, depths = ba_solver.ba(
        jnp.asarray(poses3, jnp.float32), ctr, intr3, target, weight, valid,
        ii, jj, kd, jnp.int32(0), jnp.int32(0), bounds, jnp.float32(1e-3),
        W=4, Md=n, iterations=6, res_clip=128.0, clamp_mode="runtime",
    )

    ctr_opt = jnp.concatenate([ctr[:, :2], depths[:, None]], axis=1)
    coords = pops.transform(poses, ctr_opt[:, :, None, None], intr3, ii, jj, kd)
    resid = jnp.linalg.norm(coords[:, 0, 0, :] - target, axis=-1)
    resid = jnp.where(valid, resid, 0.0)  # absent neighbor: no veto
    rmax = jnp.maximum(resid[:n], resid[n:])
    z = 1.0 / jnp.maximum(depths, 1e-8)
    keep = (rmax < 2.0) & (z < 20.0) & jnp.any(jnp.asarray(tvalid), axis=0)

    fx, fy, cx, cy = (float(intr_full[k]) for k in range(4))
    X = jnp.stack(
        [(ctr[:, 0] - cx) / fx * z, (ctr[:, 1] - cy) / fy * z, z], axis=1
    )
    return np.asarray(X), np.asarray(keep)


class LongTermLoopClosure:
    """Hooks mirror the reference (dpvo/dpvo.py:908,1027-1029,675,394):
    __call__(image, n) every frame; attempt_loop_closure(n) after
    tracking; lc_callback() applies a finished PGO; keyframe(k) on
    keyframe removal; terminate(n) at the end.

    Orchestration matches the reference's async layout: ORB hashing,
    retrieval scoring and descriptor matching run on a worker THREAD
    (the reference uses a DBoW child process, retrieval_dbow.py:18-52),
    and the Sim(3) PGO runs in a single-slot executor (the reference
    uses a process pool, long_term.py:30-34) — the tracking thread only
    enqueues images, drains candidate packages, does the (rare,
    candidate-only) triangulation/RANSAC geometry, and applies finished
    corrections. Multiple loop closures queue up and are applied in
    order. ``asynchronous=False`` degrades to the round-1 inline mode
    (deterministic; used by unit tests)."""

    def __init__(self, cfg, slam, asynchronous: bool = True):
        import queue as _q
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from dpvo_tpu.slam.retrieval import OrbRetrieval

        self.cfg = cfg
        self.slam = slam
        self.retrieval = OrbRetrieval(
            thresh=cfg.LOOP_RETR_THRESH, window=cfg.LOOP_CLOSE_WINDOW_SIZE
        )
        self.result: Optional[Tuple[np.ndarray, int, int]] = None  # (C, i, j)
        self.applied: List[int] = []
        self.asynchronous = asynchronous
        self._ops: "_q.Queue" = _q.Queue()
        self._cands: "_q.Queue" = _q.Queue()
        # keyframe-removal generation counters: a candidate package is
        # only valid while the keyframe indexing it was built under
        # still matches the tracker's (enqueued == processed == at
        # package creation); removals in between remap indices and
        # would aim the Sim3/PGO at the wrong frames
        self._rm_enq = 0   # bumped on the tracking thread (keyframe())
        self._rm_done = 0  # bumped on the worker thread (_remove())
        self._pgo = ThreadPoolExecutor(max_workers=1)
        self._pgo_future = None
        self._pgo_pair: Optional[Tuple[int, int]] = None
        if asynchronous:
            self._worker = threading.Thread(target=self._worker_loop, daemon=True)
            self._worker.start()

    # ---- per-frame hashing (ref long_term.py:215-221) ----

    def __call__(self, image: np.ndarray, n: int):
        # keep the retrieval DB aligned with keyframe indices: only hash
        # when the tracker kept frame n as a new keyframe
        if self.asynchronous:
            self._ops.put(("sync", np.ascontiguousarray(image), n))
        else:
            self._sync(image, n)

    def keyframe(self, k: int):
        """Keyframe k removed -> drop its retrieval entry
        (ref image_cache.py:51-57 index remapping)."""
        self._rm_enq += 1
        if self.asynchronous:
            self._ops.put(("remove", k))
        else:
            self._remove(k)

    # ---- retrieval-thread body ----

    def _worker_loop(self):
        while True:
            op = self._ops.get()
            try:
                if op[0] == "sync":
                    self._sync(op[1], op[2])
                elif op[0] == "remove":
                    self._remove(op[1])
                elif op[0] == "stop":
                    return
            except Exception as e:  # never kill tracking over retrieval
                print(f"loop-closure worker error: {e}")
            finally:
                self._ops.task_done()

    def _sync(self, image: np.ndarray, n: int):
        r = self.retrieval
        while r.n_frames() <= n:
            r.insert_image(image)
            i = r.n_frames() - 1
            cand = r.detect_loop(i) if i > 0 else None
            if cand is not None:
                self._package(cand)

    def _remove(self, k: int):
        r = self.retrieval
        if k < len(r.descs):
            del r.descs[k]
            del r.kps[k]
            if r.db is not None:
                # rebuild the native DB without k (cheap: descriptors
                # are kept host-side)
                r.db = r.lib.retrieval_create()
                for d in r.descs:
                    r.lib.retrieval_insert(r.db, d.tobytes(), len(d))
            r.closures = [(a - (a > k), b - (b > k)) for a, b in r.closures]
        self._rm_done += 1

    def _package(self, cand: Tuple[int, int]):
        """Descriptor matching for a loop candidate (worker thread: the
        retrieval DB is only touched here); posts the pixel-level
        correspondence package for the tracking thread's geometry.
        Each loop frame gets matches to BOTH temporal neighbors so the
        tracking thread can run the triplet structure-only BA (the
        reference tracks keypoints across (i-1, i, i+1),
        long_term.py:80-90)."""
        q, rr = cand
        r = self.retrieval
        m_qr = r.match(q, rr)
        if len(m_qr[2]) < MIN_INLIERS:
            return
        nf = r.n_frames()

        def nb_matches(f):
            return [(nb, r.match(f, nb)) for nb in (f - 1, f + 1) if 0 <= nb < nf]

        self._cands.put(dict(
            gen=self._rm_done,
            q=q, rr=rr, m_qr=m_qr,
            nbs_q=nb_matches(q), nbs_r=nb_matches(rr),
        ))

    # ---- geometry (ref long_term.py:70-138 estimate_3d_keypoints) ----

    def _triangulate(self, poses: np.ndarray, i: int, nbs, kp_idx: np.ndarray,
                     kp_xy: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """3-D points (camera-i frame) for keypoints kp_idx of frame i
        (full-res pixel coords kp_xy, aligned with kp_idx), solved by a
        structure-only BA over the (i-1, i, i+1) triplet using the
        worker's neighbor match packages nbs = [(nb, (pa, pb, ia, ib)),
        ...] (ref long_term.py:70-138 estimate_3d_keypoints). Returns
        (X [len(kp_idx), 3], good [len(kp_idx)] bool)."""
        n_out = len(kp_idx)
        nk = min(n_out, N_LC)
        xy = np.zeros((N_LC, 2), np.float32)
        xy[:nk] = kp_xy[:nk]
        targets = np.zeros((2, N_LC, 2), np.float32)
        tvalid = np.zeros((2, N_LC), bool)
        for nb, match in nbs[:2]:
            e = 0 if nb < i else 1  # local pose slot 0 = i-1, 2 = i+1
            pa, pb, ia, ib = match
            row_of = {int(a): k for k, a in enumerate(ia)}
            for k in range(nk):
                r = row_of.get(int(kp_idx[k]))
                if r is not None:
                    targets[e, k] = pb[r]
                    tvalid[e, k] = True
        X_out = np.zeros((n_out, 3))
        good = np.zeros(n_out, bool)
        if tvalid.any(0).sum() < 8:
            return X_out, good

        slam = self.slam
        M = self.cfg.PATCHES_PER_FRAME
        npn = poses.shape[0]
        triplet = [max(i - 1, 0), i, min(i + 1, npn - 1)]
        intr_full = np.asarray(slam.state.intrinsics[i]) * self.cfg.RES
        # init every keypoint at the keyframe's median patch inverse
        # depth (ref long_term.py:112 true_disp)
        d0 = float(np.median(np.asarray(
            slam.state.dvec[i * M:(i + 1) * M])))
        d0 = d0 if np.isfinite(d0) and d0 > 1e-4 else 1.0
        X, keep = _triplet_structure_ba(
            poses[triplet], intr_full, xy, targets, tvalid, d0)
        X_out[:nk] = X[:nk]
        good[:nk] = keep[:nk]
        return X_out, good

    # ---- loop attempt (ref long_term.py:140-213) ----

    def attempt_loop_closure(self, n: int):
        """Drain one candidate package, run the geometry (triangulation
        + RANSAC-Umeyama), and submit the Sim(3) PGO to the worker
        executor — candidate-only work; the common case is an empty
        queue."""
        import queue as _q

        if self._pgo_future is not None:  # one PGO in flight at a time
            return
        try:
            pkg = self._cands.get_nowait()
        except _q.Empty:
            return
        q, rr = pkg["q"], pkg["rr"]
        slam = self.slam
        if not (self._rm_enq == self._rm_done == pkg["gen"]):
            return  # keyframe indexing shifted since packaging: stale
        nb_all = [nb for nb, _ in pkg["nbs_q"]] + [nb for nb, _ in pkg["nbs_r"]]
        if any(f >= slam.n for f in [q, rr] + nb_all):
            return
        pq, pr, iq, ir = pkg["m_qr"]
        poses = slam.poses_np()
        Xq, okq = self._triangulate(poses, q, pkg["nbs_q"], iq, pq)
        Xr, okr = self._triangulate(poses, rr, pkg["nbs_r"], ir, pr)
        both = okq & okr
        if both.sum() < MIN_INLIERS:
            return
        fit = ransac_umeyama(Xq[both], Xr[both])
        if fit is None:
            return
        R, t, s, inl = fit
        # measured cam-q -> cam-rr Sim3; loop constant
        # C = T_rr * S_meas^-1 * T_rr^-1 (world drift transform), see
        # slam/pgo.py conventions
        import jax.numpy as jnp

        q_meas = _rot_to_quat(R)
        S = jnp.concatenate([jnp.asarray(t, jnp.float32),
                             jnp.asarray(q_meas, jnp.float32),
                             jnp.asarray([s], jnp.float32)])
        Trr = sim3.inv(sim3.from_se3(jnp.asarray(poses[rr])))
        C = np.asarray(sim3.mul(sim3.mul(Trr, sim3.inv(S)), sim3.inv(Trr)))

        from dpvo_tpu.slam.pgo import apply_loop_closure

        n_snap = slam.n
        self._pgo_pair = (q, rr)
        self._pgo_future = self._pgo.submit(
            apply_loop_closure, poses[:n_snap].copy(), C[None],
            np.array([q]), np.array([rr]),
        )

    # ---- apply (ref long_term.py:189-203 lc_callback) ----

    def lc_callback(self, wait: bool = False):
        """Apply a finished PGO correction, if any (non-blocking unless
        ``wait``)."""
        if self._pgo_future is None:
            return False
        if not (wait or self._pgo_future.done()):
            return False
        fut, (q, rr) = self._pgo_future, self._pgo_pair
        self._pgo_future, self._pgo_pair = None, None
        try:
            corrected = fut.result()
        except Exception as e:  # PGO divergence: skip, keep tracking
            print(f"loop closure PGO failed: {e}")
            return False
        self.slam.apply_pgo_result(corrected)
        self.applied.append(q)
        return True

    def terminate(self, n: int):
        """Flush the retrieval queue, finish queued candidates, apply
        pending corrections (ref dpvo.py:394-417 termination order)."""
        if self.asynchronous:
            self._ops.join()
        applied = False
        for _ in range(8):  # bounded: queued candidates, one PGO each
            applied |= self.lc_callback(wait=True)
            if self._cands.empty() and self._pgo_future is None:
                break
            self.attempt_loop_closure(self.slam.n)
        applied |= self.lc_callback(wait=True)
        if self.asynchronous:
            self._ops.put(("stop",))
        return applied


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (qx, qy, qz, qw)."""
    w = np.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12)) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)
