import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from dpvo_tpu.config import Config
from dpvo_tpu.ba import solver as S
from dpvo_tpu.geom import projective as pops

cfg = Config()
rng = np.random.default_rng(0)
E, W, Md = cfg.E_MAX, cfg.W_OPT_MAX, cfg.M_OPT_MAX
N = 70
poses = jnp.asarray(np.tile([0,0,0,0,0,0,1.0],(2048,1)), jnp.float32)
poses = poses.at[:N, :3].set(jnp.asarray(rng.standard_normal((N,3))*0.1))
ctr = jnp.asarray(np.stack([rng.uniform(10,140,Md), rng.uniform(10,100,Md), rng.uniform(0.3,2,Md)],1), jnp.float32)
intr = jnp.asarray(np.tile([100.,100.,80.,60.],(2048,1)), jnp.float32)
target = jnp.asarray(rng.uniform(0,150,(E,2)), jnp.float32)
weight = jnp.asarray(rng.uniform(0.2,1,(E,2)), jnp.float32)
valid = jnp.ones(E, bool)
ii = jnp.asarray(rng.integers(40, 66, E), jnp.int32)
jj = jnp.asarray(rng.integers(40, 66, E), jnp.int32)
kd = jnp.asarray(np.sort(rng.integers(0, 1600, E)), jnp.int32)
t0v, nfree = jnp.int32(54), jnp.int32(12)
bounds = jnp.asarray([-64., -64., 224., 184.])

def timeit(name, fn, args, n=8):
    out = fn(*args); jax.block_until_ready(out); _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

args = (poses, ctr, intr, target, weight, valid, ii, jj, kd, t0v, nfree, bounds, jnp.float32(1e-4))
kw = dict(W=W, Md=Md, ep=1.0, lm=1e-4, res_clip=128.0, clamp_mode="runtime")
timeit("ba 2 iters", partial(S.ba, iterations=2, **kw), args)
timeit("ba 1 iter", partial(S.ba, iterations=1, **kw), args)

prob = S.BAProblem(poses, ctr, intr, target, weight, valid, ii, jj, kd, t0v, nfree)
f_asm = jax.jit(lambda prob: jax.tree_util.tree_map(jnp.sum, S.assemble_normal_eqs(prob, bounds, W=W, Md=Md))[0])
timeit("assemble only", f_asm, (prob,))
f_res = jax.jit(lambda prob: jnp.sum(S._center_residuals(prob, bounds, 128.0)[0]))
timeit("residuals+jac only", f_res, (prob,))

B6, E6, C, u, v6 = S.assemble_normal_eqs(prob, bounds, W=W, Md=Md)
f_schur = jax.jit(lambda *a: jnp.sum(S.schur_solve(*a, jnp.float32(1e-4), nfree, W=W)[0]))
timeit("schur+chol only", f_schur, (B6, E6, C, u, v6))

# einsum-only (hblocks without scatters)
def honly(prob):
    r, w, Ji, Jj, Jz = S._center_residuals(prob, bounds, 128.0)
    h1 = jnp.einsum("er,eri,erj->eij", w, Ji, Ji)
    h2 = jnp.einsum("er,eri,erj->eij", w, Ji, Jj)
    h3 = jnp.einsum("er,eri,erj->eij", w, Jj, Jj)
    e1 = jnp.einsum("er,eri,er->ei", w, Ji, Jz[:, :, 0])
    return jnp.sum(h1) + jnp.sum(h2) + jnp.sum(h3) + jnp.sum(e1)
timeit("res+jac+einsums (no scatter)", jax.jit(honly), (prob,))
