"""Microbenchmark of the sliding-window BA solver at runtime shapes.

Times ba_solver.ba (2 GN iterations) and its pieces at the bench
steady state (E=49152, Md per profile, W=16), LICM-safe scan
differencing, so assembly/solve optimizations can be validated without
a full tracker run.
"""

import argparse
from functools import partial
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
    p.add_argument("--Md", type=int, default=2560)
    p.add_argument("--W", type=int, default=16)
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--extra", action="store_true")
    p.add_argument("--extra2", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpvo_tpu.ba import solver as ba_solver
    from dpvo_tpu.ba.solver import BAProblem

    E, Md, W, N = args.E, args.Md, args.W, args.N
    rng = np.random.default_rng(0)

    poses = jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (N, 1)), jnp.float32)
    poses = poses.at[:, :3].add(jnp.asarray(rng.normal(size=(N, 3)) * 0.01))
    patch_ctr = jnp.asarray(
        np.stack([rng.uniform(10, 150, Md), rng.uniform(10, 110, Md),
                  rng.uniform(0.3, 2.0, Md)], -1), jnp.float32)
    intr = jnp.asarray(np.tile([128.0, 128.0, 80.0, 60.0], (N, 1)), jnp.float32)
    t0v = jnp.int32(20)
    nfree = jnp.int32(12)
    ii = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    jj = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    kd = jnp.asarray(np.sort(rng.integers(0, Md, E)), jnp.int32)
    target = jnp.asarray(rng.uniform(0, 160, (E, 2)), jnp.float32)
    weight = jnp.asarray(rng.uniform(0, 1, (E, 2)), jnp.float32)
    valid = jnp.asarray(np.arange(E) < int(E * 0.76))
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])

    kd_order = jnp.asarray(np.argsort(np.asarray(kd), kind="stable"), jnp.int32)

    def ba_body(c):
        po, de = c
        po2, de2 = ba_solver.ba(
            po, jnp.concatenate([patch_ctr[:, :2], de[:, None]], -1), intr,
            target, weight, valid, ii, jj, kd, t0v, nfree, bounds,
            jnp.float32(1e-4), W=W, Md=Md, iterations=2, kd_order=kd_order)
        return po2, de2

    sec = scan_time(ba_body, (poses, patch_ctr[:, 2]))
    print(f"ba x2 iters      {sec*1e3:8.2f} ms")

    # assembly only
    def asm_body(c):
        po, de = c
        prob = BAProblem(po, jnp.concatenate([patch_ctr[:, :2], de[:, None]], -1),
                         intr, target, weight, valid, ii, jj, kd, t0v, nfree)
        B6, E6, C, u, v6 = ba_solver.assemble_normal_eqs(prob, bounds, W=W, Md=Md)
        return po + jnp.sum(B6) * 1e-30, de + u * 1e-30

    sec = scan_time(jax.jit(asm_body), (poses, patch_ctr[:, 2]))
    print(f"assemble x1      {sec*1e3:8.2f} ms")

    # residual+jacobian only
    def rj_body(c):
        po, de = c
        prob = BAProblem(po, jnp.concatenate([patch_ctr[:, :2], de[:, None]], -1),
                         intr, target, weight, valid, ii, jj, kd, t0v, nfree)
        r, w, Ji, Jj, Jz = ba_solver._center_residuals(prob, bounds, 128.0)
        s = (jnp.sum(r) + jnp.sum(Ji) + jnp.sum(Jj) + jnp.sum(Jz)) * 1e-30
        return po + s, de + s

    sec = scan_time(jax.jit(rj_body), (poses, patch_ctr[:, 2]))
    print(f"resid+jac x1     {sec*1e3:8.2f} ms")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def extra():
    """Extra rows: iterations=1, solve-only, retr-only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpvo_tpu.ba import solver as ba_solver
    from dpvo_tpu.ba.solver import BAProblem

    E, Md, W, N = 49152, 2560, 16, 2048
    rng = np.random.default_rng(0)
    poses = jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (N, 1)), jnp.float32)
    poses = poses.at[:, :3].add(jnp.asarray(rng.normal(size=(N, 3)) * 0.01))
    patch_ctr = jnp.asarray(
        np.stack([rng.uniform(10, 150, Md), rng.uniform(10, 110, Md),
                  rng.uniform(0.3, 2.0, Md)], -1), jnp.float32)
    intr = jnp.asarray(np.tile([128.0, 128.0, 80.0, 60.0], (N, 1)), jnp.float32)
    t0v = jnp.int32(20)
    nfree = jnp.int32(12)
    ii = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    jj = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    kd = jnp.asarray(np.sort(rng.integers(0, Md, E)), jnp.int32)
    target = jnp.asarray(rng.uniform(0, 160, (E, 2)), jnp.float32)
    weight = jnp.asarray(rng.uniform(0, 1, (E, 2)), jnp.float32)
    valid = jnp.asarray(np.arange(E) < int(E * 0.76))
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])

    def ba_k(k):
        def body(c):
            po, de = c
            return ba_solver.ba(
                po, jnp.concatenate([patch_ctr[:, :2], de[:, None]], -1), intr,
                target, weight, valid, ii, jj, kd, t0v, nfree, bounds,
                jnp.float32(1e-4), W=W, Md=Md, iterations=k)
        return body

    for k in (1, 2):
        sec = scan_time(ba_k(k), (poses, patch_ctr[:, 2]))
        print(f"ba iters={k}       {sec*1e3:8.2f} ms", flush=True)

    prob = BAProblem(poses, patch_ctr, intr, target, weight, valid, ii, jj,
                     kd, t0v, nfree)
    B6, E6, C, u, v6 = jax.jit(partial(ba_solver.assemble_normal_eqs, W=W, Md=Md))(prob, bounds)

    def solve_body(c):
        b6, v = c
        dX, dZ = ba_solver.schur_solve(b6, E6, C, u, v, jnp.float32(1e-4),
                                       nfree, W=W)
        return b6 + jnp.sum(dX) * 1e-30, v + jnp.sum(dZ) * 1e-30

    sec = scan_time(jax.jit(solve_body), (B6, v6))
    print(f"schur_solve x1   {sec*1e3:8.2f} ms", flush=True)

    dX = jnp.zeros((W, 6))
    dZ = jnp.zeros((Md,))

    def retr_body(c):
        po, de = c
        po = ba_solver.apply_pose_retr(po, dX + jnp.sum(de) * 1e-30, t0v, nfree, W)
        de = ba_solver.apply_depth_retr(de, dZ + jnp.sum(po) * 1e-30)
        return po, de

    sec = scan_time(jax.jit(retr_body), (poses, patch_ctr[:, 2]))
    print(f"retr x1          {sec*1e3:8.2f} ms")


if __name__ == "__main__" and sys.argv[1:2] == ["--extra"]:
    extra()


def extra2():
    """Bisect the per-iteration gap: ba_delta only, retr-only chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpvo_tpu.ba import solver as ba_solver
    from dpvo_tpu.ba.solver import BAProblem

    E, Md, W, N = 49152, 2560, 16, 2048
    rng = np.random.default_rng(0)
    poses = jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (N, 1)), jnp.float32)
    poses = poses.at[:, :3].add(jnp.asarray(rng.normal(size=(N, 3)) * 0.01))
    patch_ctr = jnp.asarray(
        np.stack([rng.uniform(10, 150, Md), rng.uniform(10, 110, Md),
                  rng.uniform(0.3, 2.0, Md)], -1), jnp.float32)
    intr = jnp.asarray(np.tile([128.0, 128.0, 80.0, 60.0], (N, 1)), jnp.float32)
    t0v = jnp.int32(20)
    nfree = jnp.int32(12)
    ii = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    jj = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    kd = jnp.asarray(np.sort(rng.integers(0, Md, E)), jnp.int32)
    kd_order = jnp.asarray(np.argsort(np.asarray(kd), kind="stable"), jnp.int32)
    target = jnp.asarray(rng.uniform(0, 160, (E, 2)), jnp.float32)
    weight = jnp.asarray(rng.uniform(0, 1, (E, 2)), jnp.float32)
    valid = jnp.asarray(np.arange(E) < int(E * 0.76))
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])

    def delta_body(c):
        po, de = c
        prob = BAProblem(po, jnp.concatenate([patch_ctr[:, :2], de[:, None]], -1),
                         intr, target, weight, valid, ii, jj, kd, t0v, nfree,
                         kd_order)
        dX, dZ = ba_solver.ba_delta(prob, bounds, jnp.float32(1e-4), W=W, Md=Md)
        return po + jnp.sum(dX) * 1e-30, de + jnp.sum(dZ) * 1e-30

    sec = scan_time(jax.jit(delta_body), (poses, patch_ctr[:, 2]))
    print(f"ba_delta x1      {sec*1e3:8.2f} ms", flush=True)

    def full_iter_body(c):
        po, de = c
        prob = BAProblem(po, jnp.concatenate([patch_ctr[:, :2], de[:, None]], -1),
                         intr, target, weight, valid, ii, jj, kd, t0v, nfree,
                         kd_order)
        dX, dZ = ba_solver.ba_delta(prob, bounds, jnp.float32(1e-4), W=W, Md=Md)
        po = ba_solver.apply_pose_retr(po, dX, t0v, nfree, W)
        de = ba_solver.apply_depth_retr(de, dZ)
        return po, de

    sec = scan_time(jax.jit(full_iter_body), (poses, patch_ctr[:, 2]))
    print(f"full GN iter x1  {sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__" and sys.argv[1:2] == ["--extra2"]:
    extra2()


def extra3():
    """assemble+schur directly, with vs without kd_order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpvo_tpu.ba import solver as ba_solver
    from dpvo_tpu.ba.solver import BAProblem

    E, Md, W, N = 49152, 2560, 16, 2048
    rng = np.random.default_rng(0)
    poses = jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (N, 1)), jnp.float32)
    poses = poses.at[:, :3].add(jnp.asarray(rng.normal(size=(N, 3)) * 0.01))
    patch_ctr = jnp.asarray(
        np.stack([rng.uniform(10, 150, Md), rng.uniform(10, 110, Md),
                  rng.uniform(0.3, 2.0, Md)], -1), jnp.float32)
    intr = jnp.asarray(np.tile([128.0, 128.0, 80.0, 60.0], (N, 1)), jnp.float32)
    t0v = jnp.int32(20)
    nfree = jnp.int32(12)
    ii = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    jj = jnp.asarray(rng.integers(10, 32, E), jnp.int32)
    kd = jnp.asarray(np.sort(rng.integers(0, Md, E)), jnp.int32)
    kd_order = jnp.asarray(np.argsort(np.asarray(kd), kind="stable"), jnp.int32)
    target = jnp.asarray(rng.uniform(0, 160, (E, 2)), jnp.float32)
    weight = jnp.asarray(rng.uniform(0, 1, (E, 2)), jnp.float32)
    valid = jnp.asarray(np.arange(E) < int(E * 0.76))
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])

    def mk(use_order):
        def body(c):
            po, de = c
            prob = BAProblem(po, jnp.concatenate([patch_ctr[:, :2], de[:, None]], -1),
                             intr, target, weight, valid, ii, jj, kd, t0v, nfree,
                             kd_order if use_order else None)
            B6, E6, C, u, v6 = ba_solver.assemble_normal_eqs(prob, bounds, W=W, Md=Md)
            dX, dZ = ba_solver.schur_solve(B6, E6, C, u, v6, jnp.float32(1e-4),
                                           nfree, W=W)
            return po + jnp.sum(dX) * 1e-30, de + jnp.sum(dZ) * 1e-30
        return body

    for use in (True, False):
        sec = scan_time(jax.jit(mk(use)), (poses, patch_ctr[:, 2]))
        print(f"asm+solve order={use}  {sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__" and "--extra3" in sys.argv:
    extra3()
