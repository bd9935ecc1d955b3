"""Classic (long-term) loop closure — retrieval + Sim(3) + PGO.

Re-design of the reference DPV-SLAM classic backend
(dpvo/loop_closure/long_term.py:20-266):

  reference                          this module
  ---------                          -----------
  DBoW2 ORB retrieval child proc  -> OrbRetrieval (C++ hamming core,
                                     slam/retrieval.py)
  DISK + LightGlue keypoints      -> ORB + ratio-test hamming matching
                                     (same detector the retrieval uses)
  structure-only fastba triangul. -> DLT triangulation against the
                                     neighbor keyframe with VO poses
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
RANSAC_ITERS = 200     # ref optim_utils.py:121
RANSAC_TAU = 0.1       # inlier threshold as a fraction of cloud scale


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
    R, t, s = umeyama_alignment(X[best].T, Y[best].T, with_scale=True)
    return R, t, s, best


def _pose_matrix(pose7: np.ndarray) -> np.ndarray:
    """world-to-camera [4,4] from (t, q) embedding."""
    from dpvo_tpu.lie import se3
    import jax.numpy as jnp

    return np.asarray(se3.to_matrix(jnp.asarray(pose7)))


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
        correspondence package for the tracking thread's geometry."""
        q, rr = cand
        r = self.retrieval
        m_qr = r.match(q, rr)
        if len(m_qr[2]) < MIN_INLIERS:
            return
        nbq = q + 1 if q + 1 < r.n_frames() else q - 1
        nbr = rr + 1 if rr + 1 < r.n_frames() else rr - 1
        self._cands.put(dict(
            gen=self._rm_done,
            q=q, rr=rr, m_qr=m_qr,
            nbq=nbq, m_q=r.match(q, nbq),
            nbr=nbr, m_r=r.match(rr, nbr),
        ))

    # ---- geometry (ref long_term.py:70-138 estimate_3d_keypoints) ----

    def _triangulate(self, poses: np.ndarray, i: int, nb: int, match,
                     kp_idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """3-D points (camera-i frame) for keypoints kp_idx of frame i,
        triangulated against neighbor keyframe nb using the worker's
        match package (pa, pb, ia, ib). Returns (X [len(kp_idx), 3],
        good [len(kp_idx)] bool), aligned with kp_idx."""
        import cv2

        pa, pb, ia, ib = match
        row_of = {int(a): k for k, a in enumerate(ia)}

        X_out = np.zeros((len(kp_idx), 3))
        good = np.zeros(len(kp_idx), bool)
        rows = [(out_k, row_of[int(a)]) for out_k, a in enumerate(kp_idx) if int(a) in row_of]
        if len(rows) < 8:
            return X_out, good
        out_ks = np.array([x[0] for x in rows], np.int32)
        m_rows = np.array([x[1] for x in rows], np.int32)

        intr = np.asarray(self.slam.state.intrinsics[0]) * self.cfg.RES
        K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1.0]])
        Gi = _pose_matrix(poses[i])
        Gn = _pose_matrix(poses[nb])
        # projection matrices in camera-i coordinates
        P1 = K @ np.eye(4)[:3]
        P2 = K @ (Gn @ np.linalg.inv(Gi))[:3]
        X = cv2.triangulatePoints(P1, P2, pa[m_rows].T.astype(np.float64),
                                  pb[m_rows].T.astype(np.float64))
        X = (X[:3] / np.where(np.abs(X[3]) > 1e-8, X[3], 1e-8)).T  # cam-i frame
        ok = X[:, 2] > 0.1
        X_out[out_ks[ok]] = X[ok]
        good[out_ks[ok]] = True
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
        if q >= slam.n or rr >= slam.n or pkg["nbq"] >= slam.n or pkg["nbr"] >= slam.n:
            return
        iq, ir = pkg["m_qr"][2], pkg["m_qr"][3]
        poses = slam.poses_np()
        Xq, okq = self._triangulate(poses, q, pkg["nbq"], pkg["m_q"], iq)
        Xr, okr = self._triangulate(poses, rr, pkg["nbr"], pkg["m_r"], ir)
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
