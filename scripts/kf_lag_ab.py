"""A/B: KEYFRAME_SYNC (reference-exact keyframe timing) vs the fused
one-frame-lagged decision, on the trained tiny fixture.

VERDICT weak #3: the fused path drains the previous frame's flow
magnitude, deciding keyframes one frame late vs dpvo/dpvo.py:601-693;
with trained weights we can finally measure the trajectory impact.
"""
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

for sync in (False, True):
    out = []
    kfs = []
    for cls, seed, kw in SCENES:
        sc = cls(ht=HT, wd=WD, n_frames=N, seed=seed, **kw)
        gt = np.asarray(se3.inv(jnp.asarray(sc.poses[:N])))
        motion = float(np.linalg.norm(np.diff(gt[:, :3], axis=0), axis=1).sum())
        slam = DPVO(Config(**BASE, KEYFRAME_SYNC=sync), FIX, ht=HT, wd=WD, seed=0)
        for t in range(N):
            slam(t, sc.render(t), sc.intrinsics.copy())
        poses, _ = slam.terminate()
        err = ate_rmse(poses[:, :3], gt[:, :3], align_scale=True)
        out.append(err / motion)
        kfs.append(int(slam.n))
    print(f"KEYFRAME_SYNC={sync}: rel-ATE={[round(r, 4) for r in out]} "
          f"median={np.median(out):.4f} keyframes={kfs}", flush=True)
