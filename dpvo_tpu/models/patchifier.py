"""Patch extraction: encoders + centroid sampling + feature gathers.

Re-design of dpvo/net.py:344-407 (class Patchifier). Runs both encoders
at 1/4 resolution, samples patch centroids (RANDOM or GRADIENT_BIAS via
image-gradient top-k, ref :369-379), and gathers per-patch context
(imap, 384-d), matching features (gmap, 128-d 3x3), and the (x, y,
inverse-depth) patch state via the bilinear patchify op.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpvo_tpu.models.extractor import BasicEncoder4
from dpvo_tpu.ops import avg_pool2d, patchify


class Patchifier(nn.Module):
    patch_size: int = 3
    dim: int = 384
    fdim: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder4(self.fdim, norm_fn="instance", dtype=self.dtype)
        self.inet = BasicEncoder4(self.dim, norm_fn="none", dtype=self.dtype)

    def _image_gradient(self, images):
        """Grayscale gradient magnitude, 4x pooled (ref net.py:351-357)."""
        gray = ((images + 0.5) * (255.0 / 2)).sum(axis=-1)  # [B,H,W]
        dx = gray[:, :-1, 1:] - gray[:, :-1, :-1]
        dy = gray[:, 1:, :-1] - gray[:, :-1, :-1]
        g = jnp.sqrt(dx**2 + dy**2)
        B, H1, W1 = g.shape
        g = g[:, : (H1 // 4) * 4, : (W1 // 4) * 4]
        g = g.reshape(B, H1 // 4, 4, W1 // 4, 4).mean(axis=(2, 4))
        return g

    def __call__(self, images, M: int, key, disps=None, centroid_sel_strat: str = "RANDOM"):
        """images [B,H,W,3] normalized to [-0.5, 1.5]; B frames.

        Returns per frame b:
          fmap    [B, h, w, fdim]   (h = H/4)
          gmap    [B*M, fdim, P, P]
          imap    [B*M, dim]
          patches [B*M, 3, P, P]    (x, y, inverse depth at 1/4 res)
          clr     [B*M, 3]          (colors for visualization)
        """
        P = self.patch_size
        fmap = self.fnet(images) / 4.0  # [B,h,w,fdim]
        imap = self.inet(images) / 4.0  # [B,h,w,dim]
        B, h, w, _ = fmap.shape

        kx, ky = jax.random.split(key)
        if centroid_sel_strat == "GRADIENT_BIAS":
            g = self._image_gradient(images)  # [B,h',w']
            x = jax.random.randint(kx, (B, 3 * M), 1, w - 1)
            y = jax.random.randint(ky, (B, 3 * M), 1, h - 1)
            score = jax.vmap(lambda gb, xb, yb: gb[yb, xb])(g, y, x)
            _, top = jax.lax.top_k(score, M)  # [B,M]
            x = jnp.take_along_axis(x, top, axis=1)
            y = jnp.take_along_axis(y, top, axis=1)
        elif centroid_sel_strat == "RANDOM":
            x = jax.random.randint(kx, (B, M), 1, w - 1)
            y = jax.random.randint(ky, (B, M), 1, h - 1)
        else:
            raise NotImplementedError(centroid_sel_strat)

        coords = jnp.stack([x, y], axis=-1).astype(jnp.float32)  # [B,M,2]

        if disps is None:
            disps = jnp.ones((B, h, w), images.dtype)

        # per-frame gathers (B is small: 1 at inference, n_frames at training)
        def gather(fm, im, img, dm, cd):
            fm_chw = fm.transpose(2, 0, 1).astype(jnp.float32)
            im_chw = im.transpose(2, 0, 1).astype(jnp.float32)
            img_chw = img.transpose(2, 0, 1).astype(jnp.float32)
            gmap_p = patchify(fm_chw, cd, P // 2)  # [M,fdim,P,P]
            imap_p = patchify(im_chw, cd, 0)[:, :, 0, 0]  # [M,dim]
            clr = patchify(img_chw, 4.0 * (cd + 0.5), 0)[:, :, 0, 0]  # [M,3]
            # (x, y, d) grid map -> per-pixel patch state (ref utils.py:39-54)
            gx = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
            gy = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
            grid = jnp.stack([gx, gy, dm.astype(jnp.float32)], axis=0)  # [3,h,w]
            patches_p = patchify(grid, cd, P // 2)  # [M,3,P,P]
            return gmap_p, imap_p, clr, patches_p

        gmap_p, imap_p, clr, patches_p = jax.vmap(gather)(fmap, imap, images, disps, coords)
        return (
            fmap,
            gmap_p.reshape(B * M, self.fdim, P, P),
            imap_p.reshape(B * M, self.dim),
            patches_p.reshape(B * M, 3, P, P),
            clr.reshape(B * M, 3),
        )
