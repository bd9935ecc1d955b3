"""Kernel ablation variants to find the per-edge cost driver."""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 128
rng = np.random.default_rng(0)
C, P2, D = 128, 9, 8
W = D * D
mem, H2, W2 = 36, 120, 160
E = 36864

fmap = jnp.asarray(rng.standard_normal((mem, H2, W2, C)), jnp.bfloat16)
f1 = jnp.asarray(rng.standard_normal((E, P2, C)), jnp.bfloat16)
cy = jnp.asarray(rng.integers(0, H2, (E, P2)), jnp.int32)
cx = jnp.asarray(rng.integers(0, W2, (E, P2)), jnp.int32)
ws = [jnp.asarray(rng.uniform(0, 1, (E, P2)), jnp.float32) for _ in range(4)]
jj = jnp.asarray(np.sort(rng.integers(0, 22, E)), jnp.int32)

def make_kernel(variant):
    def kernel(jj_s, cy_s, cx_s, f1_r, w00_r, w01_r, w10_r, w11_r,
               fmap_r, out_r, cache_r, win_r, loaded_r, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            loaded_r[0] = -1
            cache_r[:] = jnp.zeros_like(cache_r)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (P2 * W, P2), 1)
               == jax.lax.broadcasted_iota(jnp.int32, (P2 * W, P2), 0) // W).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (P2, W), 1)
        keep = ((lane % D < D - 1) & (lane // D < D - 1)).astype(jnp.float32)

        def body(e, _):
            j = jj_s[0, e]
            @pl.when(j != loaded_r[0])
            def _():
                loaded_r[0] = j
                cp = pltpu.make_async_copy(fmap_r.at[j], cache_r.at[pl.ds(D, H2), pl.ds(D, W2), :], sem)
                cp.start(); cp.wait()
            if variant != "nocopy":
                for p in range(P2):
                    cxv = cx_s[e, p]
                    if variant == "norot":
                        d0 = jax.lax.rem(cxv, 8)
                        cxa = pl.multiple_of(cxv - d0, 8)
                        wide = cache_r[pl.ds(cy_s[e, p], D), pl.ds(cxa, D), :]
                        win_r[p * W:(p + 1) * W, :] = wide.reshape(W, C)
                    else:
                        d0 = jax.lax.rem(cxv, 8)
                        cxa = pl.multiple_of(cxv - d0, 8)
                        wide = cache_r[pl.ds(cy_s[e, p], D), pl.ds(cxa, 2 * D), :]
                        wide = pltpu.roll(wide.astype(jnp.float32), 2 * D - d0, axis=1)
                        win_r[p * W:(p + 1) * W, :] = wide[:, :D, :].astype(win_r.dtype).reshape(W, C)
            if variant == "nodot":
                o = win_r[0:P2, 0:W].astype(jnp.float32)
            elif variant == "noselect":
                res = jax.lax.dot_general(win_r[:], f1_r[e], (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                o = res.reshape(P2, W, P2).sum(axis=-1)
            elif variant == "nobil":
                res = jax.lax.dot_general(win_r[:], f1_r[e], (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                s = (res * sel).reshape(P2, W, P2).sum(axis=-1)
                o = s
            elif variant == "selmxu":
                res = jax.lax.dot_general(win_r[:], f1_r[e], (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                ones9 = jnp.ones((P2, 8), jnp.float32)
                s576 = jax.lax.dot_general(res * sel, ones9, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
                o = s576.reshape(P2, W, 8)[:, :, 0]
            else:
                res = jax.lax.dot_general(win_r[:], f1_r[e], (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                s = (res * sel).reshape(P2, W, P2).sum(axis=-1)
                o = (w00_r[e].reshape(P2, 1) * s
                     + w01_r[e].reshape(P2, 1) * pltpu.roll(s, W - 1, 1)
                     + w10_r[e].reshape(P2, 1) * pltpu.roll(s, W - D, 1)
                     + w11_r[e].reshape(P2, 1) * pltpu.roll(s, W - D - 1, 1))
                o = o * keep
            out_r[e] = o.astype(out_r.dtype)
            return 0
        jax.lax.fori_loop(0, EB, body, 0)
    return kernel

def run(variant):
    smem2 = lambda *blk: pl.BlockSpec(blk, lambda i: (i,) + (0,) * (len(blk) - 1), memory_space=pltpu.SMEM)
    vmem = lambda *blk: pl.BlockSpec(blk, lambda i: (i,) + (0,) * (len(blk) - 1), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(variant),
        grid=(E // EB,),
        in_specs=[pl.BlockSpec((1, EB), lambda i: (0, i), memory_space=pltpu.SMEM),
                  smem2(EB, P2), smem2(EB, P2), vmem(EB, P2, C),
                  vmem(EB, P2), vmem(EB, P2), vmem(EB, P2), vmem(EB, P2),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=vmem(EB, P2, W),
        out_shape=jax.ShapeDtypeStruct((E, P2, W), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((H2 + 2 * D, W2 + 3 * D, C), jnp.bfloat16),
                        pltpu.VMEM((P2 * W, C), jnp.bfloat16),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    args = (jj[None], cy, cx, f1, *ws, fmap)
    out = g(*args); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(5): out = g(*args)
    _ = float(out)
    print(f"{variant:10s} {(time.perf_counter()-t0)/5*1000:8.2f} ms", flush=True)

for v in ("noselect", "nobil", "selmxu", "full"):
    run(v)
