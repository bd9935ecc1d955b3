"""Feature encoders — flax.linen, NHWC (TPU-preferred layout).

Re-design of the reference BasicEncoder4 (dpvo/extractor.py:200-264):
7x7/s2 stem + two 2-block residual stages (stride 1, 2) + 1x1 head,
producing 1/4-resolution features. The fnet (matching, 128-d) uses
instance norm; the inet (context, 384-d) uses no norm
(dpvo/net.py:348-349). Convs are the MXU's food: XLA tiles NHWC convs
onto the systolic array directly; bf16 compute with fp32 params.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

STEM_DIM = 32  # ref extractor.py:115 DIM=32


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization, no affine
    (torch InstanceNorm2d defaults; ref extractor.py:29-32)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [..., H, W, C]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        var = jnp.var(x32, axis=(-3, -2), keepdims=True)
        return ((x32 - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)


def _norm(norm_fn: str):
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x: x
    raise NotImplementedError(norm_fn)


class ResidualBlock(nn.Module):
    """conv3x3-norm-relu x2 with optional strided downsample shortcut
    (ref extractor.py:6-55)."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, dtype=self.dtype)(x)
        y = _norm(self.norm_fn)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype)(y)
        y = _norm(self.norm_fn)(y)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, dtype=self.dtype)(x)
            x = _norm(self.norm_fn)(x)
        return nn.relu(x + y)


class BasicEncoder4(nn.Module):
    """1/4-resolution encoder (ref extractor.py:200-264)."""

    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] normalized images
        x = nn.Conv(STEM_DIM, (7, 7), strides=2, padding=3, dtype=self.dtype)(x)
        x = _norm(self.norm_fn)(x)
        x = nn.relu(x)

        x = ResidualBlock(STEM_DIM, self.norm_fn, 1, dtype=self.dtype)(x)
        x = ResidualBlock(STEM_DIM, self.norm_fn, 1, dtype=self.dtype)(x)
        x = ResidualBlock(2 * STEM_DIM, self.norm_fn, 2, dtype=self.dtype)(x)
        x = ResidualBlock(2 * STEM_DIM, self.norm_fn, 1, dtype=self.dtype)(x)

        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype)(x)
