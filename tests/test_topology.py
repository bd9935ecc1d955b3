"""Tests for the host topology manager."""

import numpy as np

from dpvo_tpu.config import Config
from dpvo_tpu.runtime.topology import Topology, neighbors



import pytest

pytestmark = pytest.mark.smoke

def brute_neighbors(kk, jj):
    E = len(kk)
    ix = np.arange(E)
    jx = np.arange(E)
    hp = np.zeros(E, bool)
    hn = np.zeros(E, bool)
    for e in range(E):
        same = np.nonzero(kk == kk[e])[0]
        prev = [s for s in same if jj[s] < jj[e]]
        nxt = [s for s in same if jj[s] > jj[e]]
        if prev:
            ix[e] = prev[int(np.argmax(jj[prev]))]
            hp[e] = True
        if nxt:
            jx[e] = nxt[int(np.argmin(jj[nxt]))]
            hn[e] = True
    return ix, jx, hp, hn


def test_neighbors_matches_bruteforce():
    rng = np.random.default_rng(0)
    kk = rng.integers(0, 12, 60)
    jj = rng.integers(0, 40, 60)
    # dedupe (kk, jj) pairs — the graph never holds duplicates
    _, u = np.unique(kk * 1000 + jj, return_index=True)
    kk, jj = kk[u], jj[u]
    ix, jx, hp, hn = neighbors(kk, jj)
    ix2, jx2, hp2, hn2 = brute_neighbors(kk, jj)
    assert np.array_equal(hp, hp2) and np.array_equal(hn, hn2)
    assert np.array_equal(ix[hp], ix2[hp2])
    assert np.array_equal(jx[hn], jx2[hn2])


def small_cfg(**kw):
    return Config(
        PATCHES_PER_FRAME=4, BUFFER_SIZE=64, E_MAX=256, E_INAC_MAX=64,
        M_OPT_MAX=64, PMEM=8, MEM=8, PATCH_LIFETIME=3, **kw
    )


def test_append_remove_roundtrip():
    topo = Topology(small_cfg())
    topo.n, topo.m = 5, 20
    kk, jj = topo.edges_back()
    start, cnt = topo.append(kk, jj)
    assert start == 0 and cnt == len(kk)
    assert np.all(topo.ii == topo.kk // 4)

    mask = topo.jj == 4
    n_rm = mask.sum()
    perm, src, dst = topo.remove(mask, store=True)
    assert len(topo.ii) == cnt - n_rm
    assert topo.inac_count == n_rm
    assert np.all(topo.jj != 4)
    # perm maps compacted payload slots to original positions
    assert len(np.unique(perm[: cnt - n_rm])) == cnt - n_rm


def test_inactive_ring_drop_oldest():
    cfg = small_cfg()
    topo = Topology(cfg)
    topo.n, topo.m = 2, 8
    for _ in range(40):  # overflow the 64-slot ring
        topo.append(np.arange(4), np.full(4, 1))
        topo.remove(np.ones(4, bool), store=True)
    assert topo.inac_count == cfg.E_INAC_MAX


def test_edge_set_segments():
    topo = Topology(small_cfg())
    topo.n, topo.m = 4, 16
    kk = np.array([0, 0, 1, 5, 5, 5])
    jj = np.array([1, 2, 1, 0, 2, 3])
    topo.append(kk, jj)
    es = topo.edge_set()
    E = es.count
    assert E == 6
    # kk groups: {0: [0,1], 1: [2], 5: [3,4,5]}
    assert es.kk_seg[0] == es.kk_seg[1]
    assert es.kk_seg[2] != es.kk_seg[0]
    assert es.kk_seg[3] == es.kk_seg[4] == es.kk_seg[5]
    assert es.n_depths == 3
    # dense2patch inverts kk_seg
    assert np.all(es.dense2patch[es.kd[:E]] == es.kk[:E])
    # neighbors: edge 1 (kk=0, jj=2) has prev edge 0 (jj=1)
    assert es.ix[1] == 0 and es.mask_ix[1]
    assert es.jx[0] == 1 and es.mask_jx[0]
    assert not es.mask_ix[2] and not es.mask_jx[2]


def test_shift_frame_renumbers():
    topo = Topology(small_cfg())
    topo.n, topo.m = 6, 24
    topo.append(np.array([4, 8, 12, 20]), np.array([2, 3, 4, 5]))
    # delete frame 3: edges referencing it were removed by caller first
    rm = (topo.ii == 3) | (topo.jj == 3)
    topo.remove(rm, store=False)
    topo.shift_frame(3)
    # patch 12 (frame 3) was removed; patches of frames >3 shift down by M
    assert np.array_equal(topo.kk, np.array([4, 16]))
    assert np.array_equal(topo.ii, np.array([1, 4]))
    assert np.array_equal(topo.jj, np.array([2, 4]))
    assert topo.n == 5 and topo.m == 20
