"""Configuration for dpvo_tpu.

Mirrors the knob surface of the reference config system (yacs CfgNode at
dpvo/config.py:3-42 + config/{default,fast}.yaml) but as a frozen
dataclass so configs can be closed over by jit'd functions as static
values. Adds TPU-specific static-shape capacities (``E_MAX``,
``W_OPT_MAX``, ...) — fixed shapes are what XLA wants, and the reference
fork already demonstrated the algorithm tolerates fixed-capacity buffers
(dpvo/patchgraph.py:44-63).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import yaml


@dataclass(frozen=True)
class Config:
    # ---- buffers / patch budget (ref dpvo/config.py:5-15) ----
    BUFFER_SIZE: int = 4096            # max keyframes kept (ref default 4096)
    PATCHES_PER_FRAME: int = 80
    REMOVAL_WINDOW: int = 20
    OPTIMIZATION_WINDOW: int = 12
    PATCH_LIFETIME: int = 12

    # ---- patch selection (ref dpvo/config.py:8-9) ----
    CENTROID_SEL_STRAT: str = "RANDOM"   # RANDOM | GRADIENT_BIAS

    # ---- keyframing (ref dpvo/config.py:17-19) ----
    KEYFRAME_INDEX: int = 4
    KEYFRAME_THRESH: float = 12.5
    # apply the keyframe decision before the next frame (reference-exact
    # timing, costs one device round trip of pipeline overlap per frame)
    # instead of one frame late (the fused pipeline's default)
    KEYFRAME_SYNC: bool = False
    # fused-path pipeline depth: how many frames may be in flight before
    # the host waits for a keyframe-magnitude result (the decision then
    # lags that many frames; measured impact of lag 1 is zero on smooth
    # motion — scripts/kf_lag_ab.py). Depth d hides d-1 device->host
    # round trips behind device compute; the reference decides inline
    # every frame (dpvo.py:601-693), which KEYFRAME_SYNC reproduces.
    PIPELINE_DEPTH: int = 1

    # ---- motion model (ref dpvo/config.py:21-23) ----
    MOTION_MODEL: str = "DAMPED_LINEAR"
    MOTION_DAMPING: float = 0.5

    MIXED_PRECISION: bool = True       # bf16 feature maps / update operator

    # ---- proximity loop closure / global BA (ref dpvo/config.py:27-31) ----
    LOOP_CLOSURE: bool = False
    BACKEND_THRESH: float = 64.0
    MAX_EDGE_AGE: int = 1000
    GLOBAL_OPT_FREQ: int = 15

    # ---- classic loop closure (ref dpvo/config.py:33-36) ----
    CLASSIC_LOOP_CLOSURE: bool = False
    LOOP_CLOSE_WINDOW_SIZE: int = 3
    LOOP_RETR_THRESH: float = 0.04

    # ---- network architecture constants (ref dpvo/net.py:25,429-434) ----
    P: int = 3                          # patch size
    DIM: int = 384                      # update-operator hidden width
    FDIM: int = 128                     # matching feature width
    RES: int = 4                        # feature stride
    CORR_RADIUS: int = 3
    CORR_LEVELS: int = 2                # pyramid levels (1x, 4x)

    # ---- TPU static-shape capacities (new; XLA needs fixed shapes) ----
    # steady-state active edges with default knobs is ~30k: each patch
    # accrues ~(2*PATCH_LIFETIME-1) edges and lives REMOVAL_WINDOW frames
    E_MAX: int = 36864                 # max active edges (padded)
    E_INAC_MAX: int = 131072           # max inactive (stored) edges
    W_OPT_MAX: int = 16                # padded sliding-window pose count
    M_OPT_MAX: int = 2048              # padded depth-variable count (window BA)
    # global BA (sparse-assembled, ba/gba_sparse.py — edge-side memory is
    # O(edges); the reduced camera system is dense like the reference's
    # block_e.cu, ~3 x 36*(GBA_POSES_MAX)^2 floats of working set:
    # 2048 poses = ~1.8 GB HBM, 4096 would be ~7 GB — 2048 free poses
    # covers loops over ~2x the reference's MAX_EDGE_AGE=1000 history;
    # poses older than n-GBA_POSES_MAX stay fixed (gauge anchors)
    GBA_POSES_MAX: int = 2048          # padded global-BA pose count
    GBA_DEPTHS_MAX: int = 65536        # padded global-BA depth count
    GBA_EDGES_MAX: int = 172032        # padded global-BA edge count
    GBA_KPAIRS_MAX: int = 3145728      # padded E Q E^T coupling-block count
    PMEM: int = 36                     # circular patch-feature memory (ref dpvo/dpvo.py:97)
    MEM: int = 36                      # circular frame-feature memory

    # ---- solver details (ref fastba/ba_cuda.cu:296-306,519-546) ----
    BA_LMBDA: float = 1e-4
    BA_EP: float = 1.0                 # S += I*(lm*S + ep); upstream fastba uses 1.0
    BA_LM: float = 1e-4
    BA_RESIDUAL_CLIP: float = 128.0    # reject residuals with ||r|| >= this
    BA_BORDER: float = 64.0            # reject projections outside image +/- border
    BA_MIN_Z: float = 0.2
    BA_ITERS: int = 2                  # fastba iterations per update (ref dpvo.py:821)
    GBA_ITERS: int = 2

    # ---- correlation kernel ----
    CORR_IMPL: str = "auto"            # auto (pallas on TPU, xla elsewhere) | xla | pallas | pallas_sw

    # ---- fused-step edge-capacity buckets ----
    # The fused per-frame program compiles once per capacity; the host
    # dispatches the smallest bucket the live edge count fits, so the
    # steady-state correlation/update/BA work scales with the REAL edge
    # count instead of always padding to E_MAX (the reference touches
    # only the live edge set, dpvo.py:775-787).
    #   "auto" -> E_MAX/8, E_MAX/4, E_MAX/2, E_MAX   "off" -> E_MAX only
    #   or an explicit comma list, e.g. "4096,12288"
    E_BUCKETS: str = "auto"

    @property
    def CORR_WIDTH(self) -> int:
        """Flattened canonical corr-feature width fed to the update
        operator: P^2 patch pixels x CORR_LEVELS x (2r+2)^2 window."""
        return self.P * self.P * self.CORR_LEVELS * (2 * self.CORR_RADIUS + 2) ** 2

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# The reference ships two YAML profiles (config/default.yaml, config/fast.yaml).
DEFAULT = Config()
FAST = Config(
    PATCHES_PER_FRAME=48,
    REMOVAL_WINDOW=16,
    OPTIMIZATION_WINDOW=7,
    PATCH_LIFETIME=11,
    KEYFRAME_THRESH=15.0,
    W_OPT_MAX=12,
    E_MAX=16384,
)


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> Config:
    """Load a Config from a YAML profile plus ``K=V`` overrides.

    Equivalent surface to the reference's ``cfg.merge_from_file`` +
    ``--opts K V`` CLI merge (demo.py:109-117).
    """
    cfg = Config()
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        cfg = cfg.replace(**{k: _coerce(cfg, k, v) for k, v in data.items()})
    if overrides:
        cfg = cfg.replace(**{k: _coerce(cfg, k, v) for k, v in overrides.items()})
    return cfg


def _coerce(cfg: Config, key: str, val):
    if not hasattr(cfg, key):
        raise KeyError(f"Unknown config key: {key}")
    cur = getattr(cfg, key)
    if isinstance(cur, bool):
        if isinstance(val, str):
            return val.lower() in ("1", "true", "yes", "on")
        return bool(val)
    return type(cur)(val)
