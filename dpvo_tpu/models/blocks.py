"""Building blocks of the update operator — flax.linen.

Re-design of dpvo/blocks.py (GatedResidual, SoftAgg, GradientClip) for
TPU: the torch_scatter scatter_softmax/scatter_sum pair becomes
segment_max/segment_sum with host-precomputed dense group ids (fixed
shapes; the reference's torch.unique grouping, blocks.py:41, is not
XLA-expressible and is instead computed by the host topology manager).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

GRAD_CLIP = 0.01  # backward clamp (ref blocks.py:74-82 clamps to ±0.01)


@jax.custom_vjp
def gradient_clip(x):
    """Identity forward; backward NaN-zeroing + clamp to ±0.01
    (ref blocks.py GradClip)."""
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -GRAD_CLIP, GRAD_CLIP),)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


class LayerNorm(nn.Module):
    """LayerNorm with the reference's eps=1e-3 (net.py:189)."""

    eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)


class MLP2(nn.Module):
    """Linear-ReLU-Linear (the c1/c2 message transforms, net.py:179-187)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class GatedResidual(nn.Module):
    """x + sigmoid(W_g x) * MLP(x)  (ref blocks.py:15-29)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Dense(self.dim, dtype=self.dtype)(x))
        res = MLP2(self.dim, dtype=self.dtype)(x)
        return x + gate * res


def segment_softmax(x, seg, num_segments: int, valid=None):
    """Softmax over groups of rows (torch_scatter.scatter_softmax).

    x [E, C]; seg [E] int32 in [0, num_segments); rows with valid=False
    contribute nothing and receive weight 0.
    """
    if valid is not None:
        seg = jnp.where(valid, seg, num_segments)
    ns = num_segments + 1
    m = jax.ops.segment_max(x, seg, num_segments=ns)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # empty groups
    e = jnp.exp(x - m[seg])
    if valid is not None:
        e = e * valid[:, None].astype(e.dtype)
    den = jax.ops.segment_sum(e, seg, num_segments=ns)
    return e / jnp.maximum(den[seg], 1e-9)


class SoftAgg(nn.Module):
    """Grouped attention pooling, expanded back to rows (ref blocks.py:31-48):

        w = scatter_softmax(g(x), groups)
        y = scatter_sum(f(x) * w, groups)
        out = h(y)[groups]

    At runtime segment counts (>= matmul_threshold) the two grouped
    reductions ride ONE HIGHEST-precision one-hot matmul on the MXU
    instead of three scatter passes — TPU scatters cost ~1-2 ms of
    latency each regardless of size. The softmax shift uses the global
    per-channel max instead of the per-group max (mathematically
    identical; logits are bounded activations, so no overflow), which is
    what makes the denominator a plain segment sum.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    matmul_threshold: int = 256

    @nn.compact
    def __call__(self, x, seg, num_segments: int, valid=None):
        fx = nn.Dense(self.dim, dtype=self.dtype)(x)
        gx = nn.Dense(self.dim, dtype=self.dtype)(x)
        if num_segments >= self.matmul_threshold:
            g32 = gx.astype(jnp.float32)
            vf = None if valid is None else valid.astype(jnp.float32)[:, None]
            masked = g32 if vf is None else jnp.where(vf > 0, g32, -jnp.inf)
            m = jnp.max(masked, axis=0)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            e = jnp.exp(g32 - m[None])
            if vf is not None:
                e = e * vf
            # Precision follows the module dtype: the f32 training path
            # keeps the exact 6-pass MXU product; the bf16 runtime path
            # (whose Dense layers already compute in bf16) uses one bf16
            # MXU pass with f32 accumulation — group sizes are O(100)
            # and e <= 1, so the f32-accumulated sums stay within bf16's
            # ~0.4% input rounding, far below the runtime's own bf16
            # activation noise.
            exact = self.dtype == jnp.float32
            mdt = jnp.float32 if exact else jnp.bfloat16
            payload = jnp.concatenate(
                [fx.astype(jnp.float32) * e, e], axis=1).astype(mdt)
            oh = (seg[None, :] == jnp.arange(num_segments)[:, None]).astype(mdt)
            sums = jax.lax.dot_general(
                oh, payload, (((1,), (0,)), ((), ())),
                precision=(jax.lax.Precision.HIGHEST if exact
                           else jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32,
            )  # [S, 2*dim] f32-accumulated
            y = (sums[:, : self.dim]
                 / jnp.maximum(sums[:, self.dim :], 1e-9)).astype(x.dtype)
        else:
            w = segment_softmax(gx.astype(jnp.float32), seg, num_segments, valid).astype(x.dtype)
            seg_safe = jnp.where(valid, seg, num_segments) if valid is not None else seg
            y = jax.ops.segment_sum(fx * w, seg_safe, num_segments=num_segments + 1)
            y = y[:num_segments]
        out = nn.Dense(self.dim, dtype=self.dtype)(y)
        return out[seg]
