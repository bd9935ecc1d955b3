"""Blocked segment-sum Pallas kernel for BA normal-equation assembly.

TPU-native replacement for the [E, Md] one-hot matmul in
ba/solver.assemble_normal_eqs (and the atomicAdd scatters of the
reference's fused CUDA kernel, dpvo/fastba/ba_cuda.cu:335-373). The
dense one-hot materializes E*Md floats (0.5 GB at the steady state)
and pays E*Md*K MACs; this kernel exploits that the depth index is a
DENSE RANK (consecutive integers, each present at least once), so a
SORTED block of EB edges spans at most EB distinct ids — a local
[EB, EB+8] one-hot against the block's base id reduces the matmul to
E*EB*K MACs with no big materialization. Blocks accumulate into the
output at their (8-aligned) base row; the sequential TPU grid makes
the read-modify-write race-free.

Inputs must be sorted by segment id (the host ships the stable argsort
of kk per frame — see runtime/topology.py edge_set.kd_order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 256  # edges per block
L = EB + 8  # local one-hot width (block spread + base 8-alignment)


def _make_kernel(Kp: int):
    def kernel(kd_s, kd_v, pay_r, out_r):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_r[:] = jnp.zeros_like(out_r)

        base = kd_s[0, 0] // 8 * 8
        loc = kd_v[:] - base  # [EB, 1], in [0, L) for sorted dense ids
        oh = (jax.lax.broadcasted_iota(jnp.int32, (EB, L), 1) == loc).astype(
            jnp.float32
        )
        res = jax.lax.dot_general(
            oh, pay_r[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # payload is f32; a
            # default bf16 1-pass drops ~3 decimal digits
        )  # [L, Kp]
        out_r[pl.ds(base, L), :] += res

    return kernel


@partial(jax.jit, static_argnames=("Md", "interpret"))
def segment_sum_sorted(payload, kd_sorted, *, Md: int, interpret: bool = False):
    """payload [E, K] f32 (rows sorted by segment id), kd_sorted [E]
    int32 (sorted dense ids in [0, Md)) -> [Md, K] f32 sums.

    E must be a multiple of EB (pad with zero payload rows, id 0 or any
    in-range id keeping sortedness)."""
    E, K = payload.shape
    assert E % EB == 0, E
    Kp = -(-K // 128) * 128
    if Kp != K:
        payload = jnp.pad(payload, ((0, 0), (0, Kp - K)))
    kd2 = kd_sorted.astype(jnp.int32)

    out = pl.pallas_call(
        _make_kernel(Kp),
        grid=(E // EB,),
        in_specs=[
            pl.BlockSpec((1, EB), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Md + L, Kp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Md + L, Kp), jnp.float32),
        interpret=interpret,
    )(kd2[None], kd2[:, None], payload)
    return out[:Md, :K]
