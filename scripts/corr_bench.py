"""Microbenchmark of the correlation implementations at runtime shapes.

Times each corr impl (pallas exact / pallas_sw / xla) at the bench's
steady-state operating point (E_cap=49152, 480x640 -> 120x160 maps,
mem=36, M=96), LICM-safe scan differencing. Use to pick CORR_IMPL and
validate kernel work without building a whole tracker.

Usage: python scripts/corr_bench.py [--E 49152] [--live 37344]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def scan_time(fn, init, k_lo=2, k_hi=10, reps=3):
    import jax
    from jax import lax

    def chain(k):
        def run(st):
            return lax.scan(lambda c, _: (fn(c), ()), st, None, length=k)[0]
        return jax.jit(run)

    times = {}
    for k in (k_lo, k_hi):
        f = chain(k)
        out = f(init)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(init)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--E", type=int, default=49152)
    p.add_argument("--live", type=int, default=37344)
    p.add_argument("--ht", type=int, default=480)
    p.add_argument("--wd", type=int, default=640)
    p.add_argument("--impls", default="pallas,pallas_sw")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpvo_tpu.ops.corr import corr_features_xla
    from dpvo_tpu.ops import corr_pallas as cp

    mem, M, C, P = 36, 96, 128, 3
    H2, W2 = args.ht // 4, args.wd // 4
    E, live = args.E, args.live

    rng = np.random.default_rng(0)
    gmap = jnp.asarray(rng.normal(size=(mem * M, C, P, P)), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.normal(size=(mem, H2, W2, C)), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.normal(size=(mem, H2 // 4, W2 // 4, C)), jnp.bfloat16)
    # realistic topology: edges target ~22 recent frames, sorted-ish by jj
    jj = np.sort(rng.integers(0, 22, size=E))
    jj1 = jnp.asarray(jj % mem, jnp.int32)
    ii1 = jnp.asarray(rng.integers(0, mem * M, size=E) % (mem * M), jnp.int32)
    coords0 = np.stack(
        [rng.uniform(2, W2 - 3, size=(E, P, P)), rng.uniform(2, H2 - 3, size=(E, P, P))],
        axis=-1,
    )
    coords = jnp.asarray(coords0, jnp.float32)
    valid = jnp.asarray(np.arange(E) < live)

    fns = {
        "pallas": cp.corr_features_pallas,
        "pallas_sw": cp.corr_features_pallas_sw,
        "pallas_dma": cp.corr_features_pallas_dma,
        "pallas_fused": cp.corr_features_pallas_fused,
        "nokern": lambda *a, **k: cp._corr_features_common(*a, **k, level_fn=cp._corr_level_nokern),
        "xla": corr_features_xla,
    }
    for name in args.impls.split(","):
        fn = fns[name]

        def body(c):
            eps, acc = c
            out = fn(gmap, fmap1, fmap2, coords + eps, ii1, jj1, valid, radius=3)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, acc

        try:
            sec = scan_time(body, (jnp.float32(0.0), jnp.float32(0.0)))
            print(f"{name:10s} {sec*1e3:8.2f} ms  (E={E}, live={live})")
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
