"""ORB place recognition for classic loop closure.

Replaces the reference's DBoW2-based stack (DPRetrieval/src/main.cpp
pybind module + dpvo/loop_closure/retrieval/retrieval_dbow.py) with:

  - OpenCV ORB keypoints/descriptors (same features DBoW2 consumes),
  - a native C++ scoring core (native/retrieval.cpp, built on demand
    with g++ and bound via ctypes) computing exact best-match hamming
    similarity instead of DBoW2's quantized vocabulary scores,
  - the same retrieval discipline: only frames >= RADIUS older are
    candidates (main.cpp:121-133), a hit requires
    LOOP_CLOSE_WINDOW_SIZE consecutive matches to a consistent older
    window (retrieval_dbow.py:79-114), and hits are NMS'd against
    previous closures (:106-108).

Falls back to a NumPy popcount implementation when no C++ toolchain is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

RADIUS = 50          # min frame separation query<->result (main.cpp:126)
MAX_DESC = 512       # descriptors kept per frame


def _build_native() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "..", "..", "native", "retrieval.cpp")
    src = os.path.abspath(src)
    if not os.path.exists(src):
        return None
    cache = os.path.join(tempfile.gettempdir(), "dpvo_tpu_native")
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, "libretrieval.so")
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", lib_path],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.retrieval_create.restype = ctypes.c_void_p
    lib.retrieval_insert.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.retrieval_query.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.retrieval_match.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _build_native()
        _LIB_TRIED = True
    return _LIB


def _np_best_hamming(q: np.ndarray, d: np.ndarray) -> np.ndarray:
    """min hamming distance of each q row to d rows (numpy fallback)."""
    # unpack to bits is memory-heavy; xor bytes + popcount table instead
    table = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
    x = np.bitwise_xor(q[:, None, :], d[None, :, :])  # [nq, nd, 32]
    dist = table[x].sum(-1)
    return dist.min(axis=1), dist.argmin(axis=1)


class OrbRetrieval:
    """Per-frame ORB extraction + loop-candidate retrieval."""

    def __init__(self, n_features: int = MAX_DESC, thresh: float = 0.04,
                 window: int = 3):
        import cv2

        self.orb = cv2.ORB_create(nfeatures=n_features)
        self.lib = _lib()
        self.db = self.lib.retrieval_create() if self.lib is not None else None
        self.descs: List[np.ndarray] = []   # kept for matching / fallback
        self.kps: List[np.ndarray] = []     # [n,2] pixel coords per frame
        self.thresh = thresh
        self.window = window
        self.hits: List[Tuple[int, int]] = []   # consecutive (query, result)
        self.closures: List[Tuple[int, int]] = []

    # ---- indexing ----

    def insert_image(self, image: np.ndarray):
        """Extract ORB + add to the database (main.cpp:65-92)."""
        import cv2

        gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY) if image.ndim == 3 else image
        kps, desc = self.orb.detectAndCompute(gray, None)
        if desc is None:
            desc = np.zeros((0, 32), np.uint8)
            kps = []
        desc = np.ascontiguousarray(desc[:MAX_DESC], np.uint8)
        pts = np.array([k.pt for k in kps[:MAX_DESC]], np.float32).reshape(-1, 2)
        self.descs.append(desc)
        self.kps.append(pts)
        if self.db is not None:
            self.lib.retrieval_insert(self.db, desc.tobytes(), len(desc))

    def n_frames(self) -> int:
        return len(self.descs)

    # ---- retrieval ----

    def query(self, i: int) -> Tuple[int, float]:
        """Best matching frame at least RADIUS older than i; (-1, 0) if
        none (main.cpp:121-139 query)."""
        max_index = i - RADIUS
        if max_index < 0 or len(self.descs[i]) == 0:
            return -1, 0.0
        if self.db is not None:
            n = len(self.descs)
            scores = (ctypes.c_float * n)()
            self.lib.retrieval_query(self.db, self.descs[i].tobytes(),
                                     len(self.descs[i]), max_index, scores)
            scores = np.frombuffer(scores, np.float32, n).copy()
        else:
            scores = np.full(len(self.descs), -1.0, np.float32)
            for j in range(max_index + 1):
                if len(self.descs[j]):
                    d, _ = _np_best_hamming(self.descs[i], self.descs[j])
                    scores[j] = float((1.0 - d / 256.0).mean())
        best = int(np.argmax(scores))
        return (best, float(scores[best])) if scores[best] > 0 else (-1, 0.0)

    def detect_loop(self, i: int) -> Optional[Tuple[int, int]]:
        """Require `window` consecutive consistent hits and NMS against
        accepted closures (retrieval_dbow.py:79-114)."""
        j, score = self.query(i)
        if j < 0 or score < self.thresh:
            self.hits.clear()
            return None
        if self.hits and abs(self.hits[-1][1] - j) > 10:
            self.hits.clear()
        self.hits.append((i, j))
        if len(self.hits) < self.window:
            return None
        cand = self.hits[-1]
        self.hits.clear()
        for (qi, qj) in self.closures:
            if abs(cand[0] - qi) < RADIUS:
                return None
        self.closures.append(cand)
        return cand

    # ---- matching ----

    def match(self, i: int, j: int, ratio: float = 0.8):
        """Ratio-test hamming matches i -> j; returns (pts_i, pts_j,
        idx_i, idx_j) (main.cpp:94-119 match_pair)."""
        a, b = self.descs[i], self.descs[j]
        if len(a) == 0 or len(b) == 0:
            z = np.zeros((0, 2), np.float32)
            return z, z, np.zeros(0, np.int32), np.zeros(0, np.int32)
        if self.lib is not None:
            na, nb = len(a), len(b)
            bi = (ctypes.c_int32 * na)()
            b1 = (ctypes.c_int32 * na)()
            b2 = (ctypes.c_int32 * na)()
            self.lib.retrieval_match(a.tobytes(), na, b.tobytes(), nb, bi, b1, b2)
            bi = np.frombuffer(bi, np.int32, na)
            b1 = np.frombuffer(b1, np.int32, na)
            b2 = np.frombuffer(b2, np.int32, na)
            ok = (b1 < ratio * np.maximum(b2, 1)) & (bi >= 0)
        else:
            d, bi = _np_best_hamming(a, b)
            ok = d < 64
            b1 = d
        ia = np.nonzero(ok)[0].astype(np.int32)
        ib = bi[ok].astype(np.int32)
        return self.kps[i][ia], self.kps[j][ib], ia, ib
