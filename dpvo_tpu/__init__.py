"""dpvo_tpu — a TPU-native deep patch visual odometry / SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DPVO /
DPV-SLAM (reference: cuteboyqq/DPVO): sparse patch-based monocular visual
odometry with a recurrent update operator, correlation-volume feature
matching, Schur-complement bundle adjustment over a dynamic patch graph,
and loop-closure backends — expressed as pure-functional, fixed-shape,
jit-compiled programs that map onto the TPU MXU/VPU and scale over device
meshes with XLA collectives.

Layers (mirrors SURVEY.md §2 component inventory):
  lie/      SE(3)/SO(3)/Sim(3) manifold math        (ref: dpvo/lietorch/*)
  geom/     projective ops + analytic Jacobians     (ref: dpvo/projective_ops.py)
  ba/       Schur-complement bundle adjustment      (ref: dpvo/fastba/*, dpvo/ba.py)
  ops/      patch correlation + patchify kernels    (ref: dpvo/altcorr/*)
  models/   feature encoders + update operator      (ref: dpvo/net.py, extractor.py, blocks.py)
  runtime/  the VO state machine / patch graph      (ref: dpvo/dpvo.py, patchgraph.py)
  slam/     loop-closure backends + Sim(3) PGO      (ref: dpvo/loop_closure/*)
  parallel/ device-mesh sharding + distributed BA   (TPU-native; ref has no collectives)
  data/     frame streams + dataset readers         (ref: dpvo/stream.py, data_readers/*)
  train/    training loop, loss, checkpoints        (ref: train.py, dpvo/logger.py)
  eval/     trajectory alignment + ATE metrics      (ref: evaluate_*.py)
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("DPVO_NO_COMPILE_CACHE"):
    # Persistent XLA compilation cache: the fused frame step / training
    # step are multi-minute compiles on a tunneled TPU backend; caching
    # them makes every restart (training resume, bench re-run, test
    # re-run) hit warm executables instead of recompiling.
    import jax as _jax

    # Fingerprint the cache dir by host CPU: XLA:CPU AOT executables
    # bake in the compile machine's ISA features, and loading an entry
    # compiled on a different machine spams machine-feature-mismatch
    # errors ("could lead to execution errors such as SIGILL") — the
    # round-3/4 multichip artifacts carried pages of it. A per-machine
    # subdirectory makes stale cross-machine entries unreachable.
    def _host_tag():
        try:
            import hashlib
            import platform

            flags = ""
            if _os.path.exists("/proc/cpuinfo"):
                for line in open("/proc/cpuinfo"):
                    if line.startswith("flags"):
                        flags = line
                        break
            return hashlib.sha1(
                (platform.machine() + flags).encode()).hexdigest()[:10]
        except Exception:
            return "generic"

    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser(f"~/.cache/dpvo_tpu_xla/{_host_tag()}"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags: cache is an optimization only

from dpvo_tpu.config import Config, load_config  # noqa: F401
