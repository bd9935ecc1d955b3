"""A/B: keyframe-decision timing vs trajectory quality, on the trained
tiny fixture.

Sweeps KEYFRAME_SYNC (reference-exact inline timing, dpvo/dpvo.py:
601-693) against the fused pipeline at PIPELINE_DEPTH 1, 2 and 4 — the
decision then lags that many frames. Measures rel-ATE and keyframe
counts so bench.py's default depth is backed by a measurement instead
of an extrapolation from the depth-1 experiment (round-2 VERDICT weak
point 4)."""
import sys

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from dpvo_tpu.config import Config
from dpvo_tpu.eval import ate_rmse
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene, MultiPlaneScene

HT, WD = 48, 64
BASE = dict(
    BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=10,
    OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5, KEYFRAME_INDEX=2,
    KEYFRAME_THRESH=12.5, MIXED_PRECISION=False, E_MAX=1024,
    E_INAC_MAX=1024, W_OPT_MAX=8, M_OPT_MAX=128, PMEM=16, MEM=16,
    DIM=64, FDIM=32,
)
FIX = "/root/repo/tests/fixtures/tiny_synth.npz"
SCENES = [
    (PlaneScene, 9002, dict(depth=5.0, tstep=0.45, rstep=0.008)),
    (MultiPlaneScene, 9003, dict(depth=7.0, tstep=0.6, rstep=0.01)),
    (PlaneScene, 9011, dict(depth=6.0, tstep=0.5, rstep=0.01)),
]
N = 32

VARIANTS = [
    ("KEYFRAME_SYNC (ref-exact)", dict(KEYFRAME_SYNC=True)),
    ("PIPELINE_DEPTH=1 (lag 1)", dict(PIPELINE_DEPTH=1)),
    ("PIPELINE_DEPTH=2 (lag 2)", dict(PIPELINE_DEPTH=2)),
    ("PIPELINE_DEPTH=4 (lag 4)", dict(PIPELINE_DEPTH=4)),
]

for name, over in VARIANTS:
    out = []
    kfs = []
    for cls, seed, kw in SCENES:
        sc = cls(ht=HT, wd=WD, n_frames=N, seed=seed, **kw)
        gt = np.asarray(se3.inv(jnp.asarray(sc.poses[:N])))
        motion = float(np.linalg.norm(np.diff(gt[:, :3], axis=0), axis=1).sum())
        slam = DPVO(Config(**BASE, **over), FIX, ht=HT, wd=WD, seed=0)
        for t in range(N):
            slam(t, sc.render(t), sc.intrinsics.copy())
        poses, _ = slam.terminate()
        err = ate_rmse(poses[:, :3], gt[:, :3], align_scale=True)
        out.append(err / motion)
        kfs.append(int(slam.n))
    print(f"{name}: rel-ATE={[round(r, 4) for r in out]} "
          f"median={np.median(out):.4f} keyframes={kfs}", flush=True)
