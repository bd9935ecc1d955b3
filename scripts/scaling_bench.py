"""Sharded-path scaling harness: throughput at 1 vs N devices.

Measures the two genuinely distributed device programs —

  * dist_gba  (global BA: edge-sharded assembly + psum'd camera system)
  * (training-step scaling: run ``apps/train.py --mesh 1,N --steps 20``
    twice and compare logged step times — see SCALING.md)

— on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
and reports steps/s at mesh size 1 vs N plus the scaling efficiency
eff = (T1 / TN) / N.

Caveat (documented in SCALING.md): virtual CPU devices share one host's
cores, so absolute numbers and efficiencies here validate the SHARDING
STRUCTURE (no replicated bottleneck grows with N; collective volume is
O(|camera system|)), not ICI performance. On real multi-chip hardware
rerun with the same flags minus the host-platform override.

Usage:
    python scripts/scaling_bench.py [--devices 8] [--what gba,train]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_gba(n_dev: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpvo_tpu.ba.gba_sparse import build_sparse_indices, dist_gba, gba
    from dpvo_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    # quarter-scale flagship global BA: 512 poses, 16k depth vars, 43k edges
    N, W, Md, E = 600, 512, 16384, 43008
    t0, nfree = 8, 500
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (N, 1)).astype(np.float32)
    poses[:, :3] += rng.normal(size=(N, 3)).astype(np.float32) * 0.02
    ctr = np.stack([rng.uniform(10, 150, Md), rng.uniform(10, 110, Md),
                    rng.uniform(0.3, 2.0, Md)], -1).astype(np.float32)
    intr = np.tile([128.0, 128.0, 80.0, 60.0], (N, 1)).astype(np.float32)
    ii = rng.integers(0, N - 20, E).astype(np.int32)
    jj = np.clip(ii + rng.integers(-15, 15, E), 0, N - 1).astype(np.int32)
    kd = np.sort(rng.integers(0, Md, E)).astype(np.int32)
    target = rng.uniform(0, 160, (E, 2)).astype(np.float32)
    weight = rng.uniform(0.2, 1.0, (E, 2)).astype(np.float32)
    valid = np.arange(E) < int(0.9 * E)
    bounds = np.array([-64.0, -64.0, 224.0, 184.0], np.float32)
    idx = build_sparse_indices(ii, jj, kd, t0, nfree, W=W,
                               R_MAX=1 << 17, KP_MAX=1 << 20)
    idx_j = {k: jnp.asarray(v) for k, v in idx.items()}
    args = (jnp.asarray(poses), jnp.asarray(ctr), jnp.asarray(intr),
            jnp.asarray(target), jnp.asarray(weight), jnp.asarray(valid),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kd),
            jnp.int32(t0), jnp.int32(nfree), jnp.asarray(bounds),
            jnp.float32(1e-4), idx_j)
    kw = dict(W=W, Md=Md, iterations=2)

    def run(mesh):
        def f():
            if mesh is None:
                return gba(*args, **kw)
            return dist_gba(mesh, *args, **kw)
        out = f()
        jax.block_until_ready(out)
        reps = 3
        t0_ = time.perf_counter()
        for _ in range(reps):
            out = f()
            jax.block_until_ready(out)
        return (time.perf_counter() - t0_) / reps

    t1 = run(None)
    tn = run(make_mesh(n_data=1, n_edge=n_dev))
    return t1, tn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--what", default="gba")
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    if "gba" in args.what:
        t1, tn = bench_gba(args.devices)
        eff = t1 / tn / args.devices
        print(f"dist_gba: 1-dev {t1*1e3:.1f} ms  {args.devices}-dev "
              f"{tn*1e3:.1f} ms  speedup {t1/tn:.2f}x  eff {eff:.2f}")


if __name__ == "__main__":
    main()
