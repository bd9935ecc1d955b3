"""Sparse patch correlation + patchify — XLA gather/einsum formulation.

TPU-native replacement for the reference altcorr extension
(dpvo/altcorr/correlation_kernel.cu:16-175, correlation.py:63-84).
Semantics follow the CUDA kernel exactly:

  corr[e, di, dj, p] = sum_c gmap[ii1[e], c, p] *
                       fmap[jj1[e], c, floor(y_p)+di-r, floor(x_p)+dj-r]
  (zero outside bounds), over a (2r+2)^2 window, then a 2x2 bilinear
  combination with the fractional part of the coords reduces the window
  to (2r+1)^2 (correlation.py / correlation_kernel.py:552-654).

Output feature ordering matches the reference stacking
(dpvo/dpvo.py:462-465, net.py:419-423): per edge
[dx (2r+1), dy (2r+1), py (P), px (P), level (L)] flattened.

The computation is chunked over edges (lax.map) to bound the
materialized gather to ~CHUNK*P^2*D^2*C elements; a Pallas kernel that
stages per-edge windows through VMEM lives in ops/corr_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _corr_chunk(gmap, fmap_flat, H2, W2, radius, f1, jj1, coords):
    """Correlation for one edge chunk.

    f1     [Ec, C, P, P]   patch features (already gathered)
    jj1    [Ec]            frame index into fmap
    coords [Ec, P, P, 2]   reprojected (x, y) per patch pixel
    returns [Ec, 2r+1, 2r+1, P, P]  (dx, dy, py, px)
    """
    Ec, C, P, _ = f1.shape
    D = 2 * radius + 2

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).reshape(Ec, P * P, 1, 1)
    dy = (y - y0).reshape(Ec, P * P, 1, 1)
    x0 = x0.astype(jnp.int32).reshape(Ec, P * P)
    y0 = y0.astype(jnp.int32).reshape(Ec, P * P)

    offs = jnp.arange(D, dtype=jnp.int32) - radius
    ix = x0[:, :, None, None] + offs[None, None, None, :]  # [Ec,P2,1,D] x
    iy = y0[:, :, None, None] + offs[None, None, :, None]  # [Ec,P2,D,1] y
    ix = jnp.broadcast_to(ix, (Ec, P * P, D, D))
    iy = jnp.broadcast_to(iy, (Ec, P * P, D, D))
    ok = (ix >= 0) & (ix < W2) & (iy >= 0) & (iy < H2)
    lin = jnp.clip(iy, 0, H2 - 1) * W2 + jnp.clip(ix, 0, W2 - 1)  # [Ec,P2,D,D]

    # gather [Ec, P2, D*D, C] from [mem, H2*W2, C]
    f2 = fmap_flat[jj1[:, None, None], lin.reshape(Ec, P * P, D * D)]
    f1p = f1.reshape(Ec, C, P * P).transpose(0, 2, 1)  # [Ec,P2,C]
    corr = jnp.einsum("epc,epdc->epd", f1p, f2, preferred_element_type=jnp.float32)
    corr = corr.reshape(Ec, P * P, D, D) * ok.astype(corr.dtype)

    # 2x2 bilinear reduction: window axis order (dy, dx) -> (2r+1)^2
    out = (
        (1 - dy) * (1 - dx) * corr[:, :, : D - 1, : D - 1]
        + (1 - dy) * dx * corr[:, :, : D - 1, 1:]
        + dy * (1 - dx) * corr[:, :, 1:, : D - 1]
        + dy * dx * corr[:, :, 1:, 1:]
    )
    # [Ec, P2, dy, dx] -> reference order [Ec, dx, dy, py, px]
    out = out.reshape(Ec, P, P, D - 1, D - 1).transpose(0, 4, 3, 1, 2)
    return out


@partial(jax.jit, static_argnames=("radius", "chunk"))
def sparse_corr(gmap, fmap, coords, ii1, jj1, radius: int = 3, chunk: int = 2048):
    """Sparse patch<->frame correlation volume.

    gmap   [Np, C, P, P]   patch matching features (circular buffer)
    fmap   [mem, C, H2, W2] frame feature maps (circular buffer, one level)
    coords [E, P, P, 2]    reprojected coords at this level's scale
    ii1    [E] int32       patch index into gmap
    jj1    [E] int32       frame index into fmap
    returns [E, 2r+1, 2r+1, P, P] float32
    """
    E = coords.shape[0]
    mem, C, H2, W2 = fmap.shape
    fmap_flat = fmap.transpose(0, 2, 3, 1).reshape(mem, H2 * W2, C)
    f1 = gmap[ii1]  # [E,C,P,P]

    if E <= chunk:
        return _corr_chunk(gmap, fmap_flat, H2, W2, radius, f1, jj1, coords)

    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    f1p = jnp.pad(f1, ((0, pad), (0, 0), (0, 0), (0, 0)))
    jjp = jnp.pad(jj1, (0, pad))
    cdp = jnp.pad(coords, ((0, pad), (0, 0), (0, 0), (0, 0)))

    def body(args):
        f1c, jjc, cc = args
        return _corr_chunk(gmap, fmap_flat, H2, W2, radius, f1c, jjc, cc)

    P = coords.shape[1]
    out = jax.lax.map(
        body,
        (
            f1p.reshape(n_chunks, chunk, C, P, P),
            jjp.reshape(n_chunks, chunk),
            cdp.reshape(n_chunks, chunk, P, P, 2),
        ),
    )
    return out.reshape(n_chunks * chunk, 2 * radius + 1, 2 * radius + 1, P, P)[:E]


def corr_stack(gmap, pyramid, coords, ii1, jj1, radius: int = 3, chunk: int = 2048,
               levels=(1, 4), impl: str = "region"):
    """Two-level correlation, flattened per edge to [E, (2r+1)^2*P^2*L].

    Matches the runtime stacking at dpvo/dpvo.py:462-465: per-level
    volumes stacked on a trailing level axis then flattened.
    impl: "region" (TPU-fast MXU formulation) | "gather" (direct port).
    """
    fn = sparse_corr_region if impl == "region" else sparse_corr
    outs = []
    for lvl, fmap in zip(levels, pyramid):
        outs.append(fn(gmap, fmap, coords / lvl, ii1, jj1, radius, chunk))
    out = jnp.stack(outs, axis=-1)  # [E, d, d, P, P, L]
    E = out.shape[0]
    return out.reshape(E, -1)


REGION = 16  # per-edge feature region edge length (covers window + patch spread)


def _corr_region_chunk(fmap, H2, W2, radius, f1, jj1, coords):
    """Region-based correlation for one edge chunk — the TPU-fast path.

    Instead of per-sample gathers (256B granularity, slow on TPU), gather
    ONE contiguous [16,16,C] region per edge (64KB slices), contract it
    against the patch features on the MXU, then select each patch pixel's
    (2r+2)^2 window from the tiny per-edge dot-map with one-hot einsums:

        dotmap[e,p,a,b] = sum_c region[e,a,b,c] * f1[e,p,c]     (MXU)
        corr[e,p,dy,dx] = dotmap[e,p, ry(e,p)+dy, rx(e,p)+dx]   (one-hot)

    Numerically identical to the direct formulation wherever the window
    fits the region (patch-pixel spread <= 4px from the patch center —
    always true for gated edges); out-of-region samples are zeroed just
    like out-of-image samples in the reference kernel.
    """
    Ec, C, P, _ = f1.shape
    D = 2 * radius + 2
    # Clamp the region to the map extent per axis: when clamped, the
    # region spans the whole axis, so out-of-region == out-of-image and
    # the zeroing semantics are unchanged.
    Ry = min(REGION, H2)
    Rx = min(REGION, W2)

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dxf = (x - x0).reshape(Ec, P * P, 1, 1)
    dyf = (y - y0).reshape(Ec, P * P, 1, 1)
    x0 = x0.astype(jnp.int32).reshape(Ec, P * P)
    y0 = y0.astype(jnp.int32).reshape(Ec, P * P)

    c = (P * P) // 2
    y0r = jnp.clip(y0[:, c] - (Ry // 2 - 1), 0, max(H2 - Ry, 0))
    x0r = jnp.clip(x0[:, c] - (Rx // 2 - 1), 0, max(W2 - Rx, 0))

    # one 64KB-slice gather per edge: region [Ec, Ry, Rx, C]. Slicing the
    # 4-D buffer directly (frame axis included) keeps the vmap a single
    # gather with slice_sizes (1,Ry,Rx,C) — indexing fmap[j] first would
    # materialize a full frame per edge.
    fmap_nhwc = fmap  # [mem, H2, W2, C]
    Cc = fmap_nhwc.shape[-1]
    region = jax.vmap(
        lambda j, ys, xs: jax.lax.dynamic_slice(fmap_nhwc, (j, ys, xs, 0), (1, Ry, Rx, Cc))[0]
    )(jj1, y0r, x0r)

    # MXU contraction: [Ec,R,R,C] x [Ec,P2,C] -> [Ec,P2,R,R]
    f1p = f1.reshape(Ec, C, P * P).transpose(0, 2, 1)
    dotmap = jnp.einsum("eabc,epc->epab", region, f1p.astype(region.dtype),
                        preferred_element_type=jnp.float32)

    # window select: ry/rx [Ec,P2,D] relative offsets into the region
    offs = jnp.arange(D, dtype=jnp.int32) - radius
    iy = y0[:, :, None] + offs[None, None, :]  # absolute sample rows
    ix = x0[:, :, None] + offs[None, None, :]
    ry = iy - y0r[:, None, None]
    rx = ix - x0r[:, None, None]
    ok_y = (ry >= 0) & (ry < Ry) & (iy >= 0) & (iy < H2)
    ok_x = (rx >= 0) & (rx < Rx) & (ix >= 0) & (ix < W2)
    ary = jnp.arange(Ry, dtype=jnp.int32)
    arx = jnp.arange(Rx, dtype=jnp.int32)
    OHy = ((jnp.clip(ry, 0, Ry - 1)[..., None] == ary) & ok_y[..., None]).astype(dotmap.dtype)
    OHx = ((jnp.clip(rx, 0, Rx - 1)[..., None] == arx) & ok_x[..., None]).astype(dotmap.dtype)
    # corr[e,p,dy,dx] = OHy[e,p,dy,a] dotmap[e,p,a,b] OHx[e,p,dx,b]
    tmp = jnp.einsum("epua,epab->epub", OHy, dotmap)
    corr = jnp.einsum("epub,epvb->epuv", tmp, OHx)  # [Ec,P2,D,D]

    out = (
        (1 - dyf) * (1 - dxf) * corr[:, :, : D - 1, : D - 1]
        + (1 - dyf) * dxf * corr[:, :, : D - 1, 1:]
        + dyf * (1 - dxf) * corr[:, :, 1:, : D - 1]
        + dyf * dxf * corr[:, :, 1:, 1:]
    )
    return out.reshape(Ec, P, P, D - 1, D - 1).transpose(0, 4, 3, 1, 2)


@partial(jax.jit, static_argnames=("radius", "chunk"))
def sparse_corr_region(gmap, fmap, coords, ii1, jj1, radius: int = 3, chunk: int = 4096):
    """Region-gather correlation (same contract as sparse_corr)."""
    E = coords.shape[0]
    mem, C, H2, W2 = fmap.shape
    fmap_nhwc = fmap.transpose(0, 2, 3, 1)  # [mem,H2,W2,C]
    f1 = gmap[ii1]

    if E <= chunk:
        return _corr_region_chunk(fmap_nhwc, H2, W2, radius, f1, jj1, coords)

    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    P = coords.shape[1]
    f1p = jnp.pad(f1, ((0, pad), (0, 0), (0, 0), (0, 0)))
    jjp = jnp.pad(jj1, (0, pad))
    cdp = jnp.pad(coords, ((0, pad), (0, 0), (0, 0), (0, 0)))

    def body(args):
        f1c, jjc, cc = args
        return _corr_region_chunk(fmap_nhwc, H2, W2, radius, f1c, jjc, cc)

    out = jax.lax.map(
        body,
        (
            f1p.reshape(n_chunks, chunk, C, P, P),
            jjp.reshape(n_chunks, chunk),
            cdp.reshape(n_chunks, chunk, P, P, 2),
        ),
    )
    return out.reshape(n_chunks * chunk, 2 * radius + 1, 2 * radius + 1, P, P)[:E]


@partial(jax.jit, static_argnames=("radius",))
def patchify(fmap, coords, radius: int):
    """Bilinear window gather at centroids (ref altcorr.patchify,
    correlation.py:63-80 + patchify_forward_kernel).

    fmap [C, H, W]; coords [M, 2] (x, y) -> [M, C, 2r+1, 2r+1]
    """
    C, H, W = fmap.shape
    M = coords.shape[0]
    D = 2 * radius + 2

    x0 = jnp.floor(coords[:, 0])
    y0 = jnp.floor(coords[:, 1])
    dx = (coords[:, 0] - x0)[:, None, None, None]
    dy = (coords[:, 1] - y0)[:, None, None, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    offs = jnp.arange(D, dtype=jnp.int32) - radius
    ix = x0[:, None, None] + offs[None, None, :]
    iy = y0[:, None, None] + offs[None, :, None]
    ix = jnp.broadcast_to(ix, (M, D, D))
    iy = jnp.broadcast_to(iy, (M, D, D))
    ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)

    fflat = fmap.reshape(C, H * W)
    win = fflat[:, lin] * ok.astype(fmap.dtype)  # [C,M,D,D]
    win = win.transpose(1, 0, 2, 3)  # [M,C,D,D]

    d = 2 * radius + 1
    out = (
        (1 - dy) * (1 - dx) * win[..., :d, :d]
        + (1 - dy) * dx * win[..., :d, 1:]
        + dy * (1 - dx) * win[..., 1:, :d]
        + dy * dx * win[..., 1:, 1:]
    )
    return out


def corr_features_xla(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                      radius: int = 3, chunk: int = 2048, impl: str = "region"):
    """Two-level correlation features in the canonical layout shared
    with ops/corr_pallas.py:corr_features_pallas — differentiable XLA
    path used for training and as the CPU/golden reference.

    gmap [Np,C,P,P]; fmap1/fmap2 [mem,H2,W2,C] NHWC; coords [E,P,P,2]
    level-1 scale; returns [E, P*P, 2*(2r+2)^2] bfloat16 where each
    level block is laid out [p(py*P+px), u(dy)*D + v(dx)] with the last
    row/column (u or v == D-1) zero.
    """
    P = coords.shape[1]
    D = 2 * radius + 2
    fn = sparse_corr_region if impl == "region" else sparse_corr
    outs = []
    for fmap, scale in ((fmap1, 1.0), (fmap2, 4.0)):
        fm = fmap.transpose(0, 3, 1, 2)  # NHWC -> NCHW for the low-level op
        c = fn(gmap, fm, coords / scale, ii1, jj1, radius, chunk)
        # [E, dx, dy, py, px] -> [E, py*px, dy, dx] -> pad to D x D
        E = c.shape[0]
        c = c.transpose(0, 3, 4, 2, 1).reshape(E, P * P, D - 1, D - 1)
        c = jnp.pad(c, ((0, 0), (0, 0), (0, 1), (0, 1)))
        outs.append(c.reshape(E, P * P, D * D))
    out = jnp.concatenate(outs, axis=-1)
    out = out * valid[:, None, None]
    return out.astype(jnp.bfloat16)


def avg_pool2d(x, k: int):
    """Average pool with stride k (ref F.avg_pool2d in pyramidify,
    dpvo/utils.py:65-74). x [..., C, H, W], H and W divisible by k."""
    if k == 1:
        return x
    *lead, C, H, W = x.shape
    x = x.reshape(*lead, C, H // k, k, W // k, k)
    return x.mean(axis=(-3, -1))


def avg_pool2d_nhwc(x, k: int):
    """Average pool with stride k over NHWC/HWC layout.
    x [..., H, W, C], H and W divisible by k."""
    if k == 1:
        return x
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // k, k, W // k, k, C)
    return x.mean(axis=(-4, -2))
