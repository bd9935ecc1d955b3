"""Device-resident VO state — fixed-shape arrays in a NamedTuple.

Re-design of the reference PatchGraph (dpvo/patchgraph.py:11-63) +
DPVO's feature memories (dpvo/dpvo.py:96-115) as an immutable pytree
that jit'd step functions thread through (with buffer donation). Edge
*topology* (ii/jj/kk, counts, group ids) lives on the host in
runtime/topology.py; this holds only the numeric payloads.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dpvo_tpu.config import Config


class VOState(NamedTuple):
    # --- per-frame state (ref patchgraph.py:26-35) ---
    poses: jnp.ndarray       # [N, 7] world-to-camera (t, q)
    patches: jnp.ndarray     # [N*M, 3, P, P] (x, y) planes at 1/4 res; the
    #                          depth plane holds only the INGEST-TIME init —
    #                          live inverse depth is ``dvec``
    dvec: jnp.ndarray        # [N*M] live inverse depth (one per patch). BA
    #                          updates scatter here (1-D, cheap) instead of
    #                          into the 4-D patches buffer, whose tiny minor
    #                          dims made every scatter a ~15 ms relayout
    intrinsics: jnp.ndarray  # [N, 4] (fx, fy, cx, cy) at 1/4 res
    colors: jnp.ndarray      # [N, M, 3] uint8 (viewer/export)
    points: jnp.ndarray      # [N*M, 3] world points (viewer/export)

    # --- circular feature memories (ref dpvo.py:102-115) ---
    imap: jnp.ndarray        # [pmem*M, DIM]        patch context
    gmap: jnp.ndarray        # [pmem*M, FDIM, P, P] patch matching features
    fmap1: jnp.ndarray       # [mem, h, w, FDIM]    frame features, 1x (NHWC)
    fmap2: jnp.ndarray       # [mem, h/4, w/4, FDIM] frame features, 4x (NHWC)

    # --- active edge payloads (ref patchgraph.py:49-54) ---
    net: jnp.ndarray         # [E_MAX, DIM] update-operator hidden state
    target: jnp.ndarray      # [E_MAX, 2]
    weight: jnp.ndarray      # [E_MAX, 2]

    # --- inactive edge payloads kept for global BA (ref :56-63) ---
    target_inac: jnp.ndarray  # [E_INAC_MAX, 2]
    weight_inac: jnp.ndarray  # [E_INAC_MAX, 2]


def make_state(cfg: Config, ht: int, wd: int) -> VOState:
    """Allocate zero state for images of (ht, wd) pixels."""
    N, M, P = cfg.BUFFER_SIZE, cfg.PATCHES_PER_FRAME, cfg.P
    h, w = ht // cfg.RES, wd // cfg.RES
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    pmem = cfg.MAX_EDGE_AGE if cfg.LOOP_CLOSURE else cfg.PMEM

    poses = jnp.zeros((N, 7), jnp.float32).at[:, 6].set(1.0)
    return VOState(
        poses=poses,
        patches=jnp.zeros((N * M, 3, P, P), jnp.float32),
        dvec=jnp.zeros((N * M,), jnp.float32),
        intrinsics=jnp.zeros((N, 4), jnp.float32),
        colors=jnp.zeros((N, M, 3), jnp.uint8),
        points=jnp.zeros((N * M, 3), jnp.float32),
        imap=jnp.zeros((pmem * M, cfg.DIM), fdt),
        gmap=jnp.zeros((pmem * M, cfg.FDIM, P, P), fdt),
        fmap1=jnp.zeros((cfg.MEM, h, w, cfg.FDIM), fdt),
        fmap2=jnp.zeros((cfg.MEM, h // 4, w // 4, cfg.FDIM), fdt),
        net=jnp.zeros((cfg.E_MAX, cfg.DIM), fdt),
        target=jnp.zeros((cfg.E_MAX, 2), jnp.float32),
        weight=jnp.zeros((cfg.E_MAX, 2), jnp.float32),
        target_inac=jnp.zeros((cfg.E_INAC_MAX, 2), jnp.float32),
        weight_inac=jnp.zeros((cfg.E_INAC_MAX, 2), jnp.float32),
    )
