"""Grade tiny checkpoints against the test_tracking_e2e criteria.

One process, shared jit cache across checkpoints (same shapes/config).
Usage: python /tmp/grade_ckpts.py ckpt1.npz ckpt2.npz ...
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from dpvo_tpu.config import Config
from dpvo_tpu.eval import ate_rmse
from dpvo_tpu.lie import se3
from dpvo_tpu.runtime import DPVO
from dpvo_tpu.utils.synthetic import PlaneScene, MultiPlaneScene

HT, WD = 48, 64
CFG = dict(
    BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=10,
    OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5, KEYFRAME_INDEX=2,
    KEYFRAME_THRESH=12.5, MIXED_PRECISION=False, E_MAX=1024,
    E_INAC_MAX=1024, W_OPT_MAX=8, M_OPT_MAX=128, PMEM=16, MEM=16,
    DIM=64, FDIM=32,
)

SCENES = [
    (PlaneScene, 9001, dict(depth=6.0, tstep=0.55, rstep=0.01)),   # the test's scene
    (PlaneScene, 9002, dict(depth=5.0, tstep=0.45, rstep=0.008)),
    (MultiPlaneScene, 9003, dict(depth=7.0, tstep=0.6, rstep=0.01)),
]
N = 24

scenes = []
for cls, seed, kw in SCENES:
    sc = cls(ht=HT, wd=WD, n_frames=N, seed=seed, **kw)
    gt = np.asarray(se3.inv(jnp.asarray(sc.poses[:N])))
    motion = float(np.linalg.norm(np.diff(gt[:, :3], axis=0), axis=1).sum())
    eid = ate_rmse(np.zeros((N, 3)), gt[:, :3], align_scale=True)
    scenes.append((sc, gt, motion, eid, f"{cls.__name__}:{seed}"))

for ckpt in sys.argv[1:]:
    rels, ratios, inits = [], [], []
    for sc, gt, motion, eid, name in scenes:
        slam = DPVO(Config(**CFG), ckpt, ht=HT, wd=WD, seed=0)
        for t in range(N):
            slam(t, sc.render(t), sc.intrinsics.copy())
        poses, _ = slam.terminate()
        err = ate_rmse(poses[:, :3], gt[:, :3], align_scale=True)
        rels.append(err / motion)
        ratios.append(err / eid)
        inits.append(bool(slam.is_initialized))
        print(f"  {name}: ATE {err:.3f} motion {motion:.2f} rel {err/motion:.3f} "
              f"vs-identity {err/eid:.3f} init {slam.is_initialized}", flush=True)
    print(f"{ckpt}: med-rel {np.median(rels):.3f} med-vs-id {np.median(ratios):.3f} "
          f"all-init {all(inits)}  PASS(test)={rels[0] < 0.15 and ratios[0] < 0.5 and inits[0]}",
          flush=True)
