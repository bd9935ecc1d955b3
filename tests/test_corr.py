"""Golden tests: XLA correlation/patchify vs a direct NumPy port of the
reference CUDA kernel semantics (correlation_kernel.cu:16-175)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.ops import avg_pool2d, patchify, sparse_corr



import pytest

pytestmark = pytest.mark.smoke

def numpy_corr(gmap, fmap, coords, ii1, jj1, radius):
    """Direct port of corr_forward_kernel + the 2x2 bilinear wrapper."""
    E, P, _, _ = coords.shape
    Np, C, _, _ = gmap.shape
    mem, _, H2, W2 = fmap.shape
    D = 2 * radius + 2
    corr = np.zeros((E, P, P, D, D), np.float32)
    for e in range(E):
        f1 = gmap[ii1[e]]
        f2 = fmap[jj1[e]]
        for i0 in range(P):
            for j0 in range(P):
                x, y = coords[e, i0, j0]
                for di in range(D):
                    for dj in range(D):
                        i1 = int(np.floor(y)) + di - radius
                        j1 = int(np.floor(x)) + dj - radius
                        if 0 <= i1 < H2 and 0 <= j1 < W2:
                            corr[e, i0, j0, di, dj] = np.dot(f1[:, i0, j0], f2[:, i1, j1])
    # bilinear reduce (dy, dx) -> (D-1, D-1)
    dx = (coords[..., 0] - np.floor(coords[..., 0]))[..., None, None]
    dy = (coords[..., 1] - np.floor(coords[..., 1]))[..., None, None]
    out = (
        (1 - dy) * (1 - dx) * corr[..., : D - 1, : D - 1]
        + (1 - dy) * dx * corr[..., : D - 1, 1:]
        + dy * (1 - dx) * corr[..., 1:, : D - 1]
        + dy * dx * corr[..., 1:, 1:]
    )
    # -> [E, dx, dy, py, px]
    return out.transpose(0, 4, 3, 1, 2)


def make_inputs(key, E=17, Np=24, mem=4, C=16, H2=30, W2=40, P=3):
    ks = jax.random.split(key, 5)
    gmap = jax.random.normal(ks[0], (Np, C, P, P))
    fmap = jax.random.normal(ks[1], (mem, C, H2, W2))
    # coords partially out of bounds to exercise masking
    coords = jnp.stack(
        [
            jax.random.uniform(ks[2], (E, P, P), minval=-6, maxval=W2 + 6),
            jax.random.uniform(ks[3], (E, P, P), minval=-6, maxval=H2 + 6),
        ],
        axis=-1,
    )
    ii1 = jax.random.randint(ks[4], (E,), 0, Np)
    jj1 = jax.random.randint(jax.random.PRNGKey(9), (E,), 0, mem)
    return gmap, fmap, coords, ii1, jj1


def test_sparse_corr_matches_numpy():
    gmap, fmap, coords, ii1, jj1 = make_inputs(jax.random.PRNGKey(0))
    got = sparse_corr(gmap, fmap, coords, ii1, jj1, radius=3)
    want = numpy_corr(
        np.asarray(gmap), np.asarray(fmap), np.asarray(coords), np.asarray(ii1), np.asarray(jj1), 3
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-3), np.abs(np.asarray(got) - want).max()


def test_sparse_corr_chunked_matches_unchunked():
    gmap, fmap, coords, ii1, jj1 = make_inputs(jax.random.PRNGKey(1), E=37)
    a = sparse_corr(gmap, fmap, coords, ii1, jj1, radius=3, chunk=8)
    b = sparse_corr(gmap, fmap, coords, ii1, jj1, radius=3, chunk=4096)
    assert np.allclose(a, b, atol=1e-4)


def test_patchify_integer_coords_exact():
    key = jax.random.PRNGKey(2)
    fmap = jax.random.normal(key, (8, 20, 24))
    coords = jnp.array([[5.0, 7.0], [10.0, 3.0]])
    out = patchify(fmap, coords, radius=1)
    # integer coords -> exact center extraction
    for m, (x, y) in enumerate([(5, 7), (10, 3)]):
        want = fmap[:, y - 1 : y + 2, x - 1 : x + 2]
        assert np.allclose(out[m], want, atol=1e-5)


def test_patchify_bilinear_midpoint():
    fmap = jnp.arange(24.0).reshape(1, 4, 6)
    coords = jnp.array([[2.5, 1.5]])
    out = patchify(fmap, coords, radius=0)  # [1,1,1,1]
    want = (fmap[0, 1, 2] + fmap[0, 1, 3] + fmap[0, 2, 2] + fmap[0, 2, 3]) / 4
    assert np.allclose(out[0, 0, 0, 0], want, atol=1e-5)


def test_patchify_out_of_bounds_zero():
    fmap = jnp.ones((2, 10, 10))
    coords = jnp.array([[0.0, 0.0]])
    out = patchify(fmap, coords, radius=1)
    # top-left corner: rows/cols at -1 are zero-filled
    assert np.allclose(out[0, 0, 0, :], 0.0)
    assert np.allclose(out[0, 0, :, 0], 0.0)
    assert np.allclose(out[0, 0, 1:, 1:], 1.0)


def test_avg_pool():
    x = jnp.arange(64.0).reshape(1, 8, 8)
    y = avg_pool2d(x, 4)
    assert y.shape == (1, 2, 2)
    assert np.allclose(y[0, 0, 0], np.mean(np.arange(64).reshape(8, 8)[:4, :4]))


def test_region_corr_matches_gather():
    """Region/MXU formulation == direct gather wherever windows fit the
    region (patch spread small, the gated-edge regime)."""
    import jax

    from dpvo_tpu.ops import sparse_corr_region

    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 5)
    E, Np, mem, C, H2, W2, P = 23, 16, 4, 16, 40, 48, 3
    gmap = jax.random.normal(ks[0], (Np, C, P, P))
    fmap = jax.random.normal(ks[1], (mem, C, H2, W2))
    # patch centers with small per-pixel spread (realistic reprojection)
    cx = jax.random.uniform(ks[2], (E, 1, 1), minval=5, maxval=W2 - 5)
    cy = jax.random.uniform(ks[3], (E, 1, 1), minval=5, maxval=H2 - 5)
    offs = jnp.arange(P) - P // 2
    gx = jnp.broadcast_to(cx + offs[None, None, :] * 1.1, (E, P, P))
    gy = jnp.broadcast_to(cy + offs[None, :, None] * 0.9, (E, P, P))
    coords = jnp.stack([gx, gy], axis=-1)
    ii1 = jax.random.randint(ks[4], (E,), 0, Np)
    jj1 = jax.random.randint(jax.random.PRNGKey(6), (E,), 0, mem)

    a = sparse_corr(gmap, fmap, coords, ii1, jj1, radius=3)
    b = sparse_corr_region(gmap, fmap, coords, ii1, jj1, radius=3)
    assert np.allclose(a, b, atol=2e-3), np.abs(np.asarray(a) - np.asarray(b)).max()


def test_region_corr_image_border():
    """Out-of-image samples are zeroed identically near borders."""
    import jax

    from dpvo_tpu.ops import sparse_corr_region

    E, Np, mem, C, H2, W2, P = 8, 4, 2, 8, 24, 28, 3
    key = jax.random.PRNGKey(7)
    gmap = jax.random.normal(key, (Np, C, P, P))
    fmap = jax.random.normal(jax.random.PRNGKey(8), (mem, C, H2, W2))
    # centers right at the border
    cx = jnp.array([1.2, 2.0, W2 - 2.0, 5.0, W2 - 1.5, 3.0, 14.0, 1.0])
    cy = jnp.array([1.5, H2 - 2.0, 2.0, H2 - 1.2, H2 - 2.5, 2.2, 1.1, H2 - 1.0])
    offs = jnp.arange(P, dtype=jnp.float32) - 1
    gx = jnp.broadcast_to(cx[:, None, None] + offs[None, None, :], (E, P, P))
    gy = jnp.broadcast_to(cy[:, None, None] + offs[None, :, None], (E, P, P))
    coords = jnp.stack([gx, gy], -1)
    ii1 = jnp.zeros(E, jnp.int32)
    jj1 = jnp.zeros(E, jnp.int32)
    a = sparse_corr(gmap, fmap, coords, ii1, jj1, radius=3)
    b = sparse_corr_region(gmap, fmap, coords, ii1, jj1, radius=3)
    assert np.allclose(a, b, atol=2e-3), np.abs(np.asarray(a) - np.asarray(b)).max()


def test_corr_features_pallas_matches_xla_interpret():
    """The Pallas kernel (interpret mode on CPU) must match the
    differentiable XLA path in the canonical feature layout."""
    import numpy as np

    from dpvo_tpu.ops import corr_features_xla
    from dpvo_tpu.ops.corr_pallas import corr_features_pallas

    rng = np.random.default_rng(3)
    Np, C, P = 24, 128, 3
    mem, H2, W2 = 4, 24, 32
    E = 37
    gmap = jnp.asarray(rng.standard_normal((Np, C, P, P)), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.standard_normal((mem, H2, W2, C)), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.standard_normal((mem, H2 // 4, W2 // 4, C)), jnp.bfloat16)
    base = rng.uniform(-6, 36, (E, 1, 1, 2))
    grid = np.stack(np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), indexing="ij"), -1)
    coords = jnp.asarray(base + grid[None][..., ::-1] + rng.uniform(0, 1, (E, 1, 1, 2)),
                         jnp.float32)
    ii1 = jnp.asarray(rng.integers(0, Np, E), jnp.int32)
    jj1 = jnp.asarray(rng.integers(0, mem, E), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=E) > 0.2)

    want = np.asarray(corr_features_xla(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                                        impl="gather"), np.float32)
    got = np.asarray(corr_features_pallas(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                                          interpret=True), np.float32)
    assert got.shape == want.shape == (E, 9, 128)
    np.testing.assert_allclose(got, want, atol=0.5, rtol=0.06)


def test_corr_features_pallas_sw_matches_xla_interpret():
    """The superwindow kernel must match the XLA path for coords within
    its clamp envelope (reprojected patches always are: one depth per
    patch bounds the pixel spread to ~+-2 px of the center)."""
    import numpy as np

    from dpvo_tpu.ops import corr_features_xla
    from dpvo_tpu.ops.corr_pallas import corr_features_pallas_sw

    rng = np.random.default_rng(5)
    Np, C, P = 24, 128, 3
    mem, H2, W2 = 4, 24, 32
    E = 37
    gmap = jnp.asarray(rng.standard_normal((Np, C, P, P)), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.standard_normal((mem, H2, W2, C)), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.standard_normal((mem, H2 // 4, W2 // 4, C)), jnp.bfloat16)
    base = rng.uniform(-6, 36, (E, 1, 1, 2))
    grid = np.stack(np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), indexing="ij"), -1)
    # per-pixel jitter up to +-0.8 px on top of the patch grid — inside
    # the superwindow margin, exercising distinct per-pixel offsets
    coords = jnp.asarray(
        base + grid[None][..., ::-1] + rng.uniform(-0.8, 0.8, (E, P, P, 2)),
        jnp.float32)
    ii1 = jnp.asarray(rng.integers(0, Np, E), jnp.int32)
    jj1 = jnp.asarray(rng.integers(0, mem, E), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=E) > 0.2)

    want = np.asarray(corr_features_xla(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                                        impl="gather"), np.float32)
    got = np.asarray(corr_features_pallas_sw(gmap, fmap1, fmap2, coords, ii1, jj1,
                                             valid, interpret=True), np.float32)
    assert got.shape == want.shape == (E, 9, 128)
    np.testing.assert_allclose(got, want, atol=0.5, rtol=0.06)


def test_corr_features_pallas_dma_matches_xla_interpret():
    """The v3 (DMA-pipelined superwindow) kernel must match the XLA path
    for coords within its +-3 px clamp envelope (reprojected patches
    always are: one depth per patch bounds the pixel spread)."""
    import numpy as np

    from dpvo_tpu.ops import corr_features_xla
    from dpvo_tpu.ops.corr_pallas import corr_features_pallas_dma

    rng = np.random.default_rng(7)
    Np, C, P = 24, 128, 3
    mem, H2, W2 = 4, 24, 32
    E = 37
    gmap = jnp.asarray(rng.standard_normal((Np, C, P, P)), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.standard_normal((mem, H2, W2, C)), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.standard_normal((mem, H2 // 4, W2 // 4, C)), jnp.bfloat16)
    base = rng.uniform(-6, 36, (E, 1, 1, 2))
    grid = np.stack(np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), indexing="ij"), -1)
    coords = jnp.asarray(
        base + grid[None][..., ::-1] + rng.uniform(-0.8, 0.8, (E, P, P, 2)),
        jnp.float32)
    ii1 = jnp.asarray(rng.integers(0, Np, E), jnp.int32)
    jj1 = jnp.asarray(rng.integers(0, mem, E), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=E) > 0.2)

    want = np.asarray(corr_features_xla(gmap, fmap1, fmap2, coords, ii1, jj1, valid,
                                        impl="gather"), np.float32)
    got = np.asarray(corr_features_pallas_dma(gmap, fmap1, fmap2, coords, ii1, jj1,
                                              valid, interpret=True), np.float32)
    assert got.shape == want.shape == (E, 9, 128)
    np.testing.assert_allclose(got, want, atol=0.5, rtol=0.06)


def test_corr_sort_order_contract():
    """The host-shipped jj sort (ops/corr_pallas.corr_sort_order, built
    in DPVO._fused_frame) must mirror the device-side key in
    _corr_features_common EXACTLY: valid-first, stable by jj % mem,
    inverse is a true inverse. ADVICE r4 flagged this cross-module
    coupling as assertion-free."""
    import numpy as np

    from dpvo_tpu.ops.corr_pallas import corr_sort_order

    rng = np.random.default_rng(3)
    mem, E, E_cap = 32, 300, 384
    jj = rng.integers(0, 4096, E)
    order, inv = corr_sort_order(jj, E, E_cap, mem)

    # device-side formulation (jnp.argsort is stable)
    jj1 = np.zeros(E_cap, np.int64)
    jj1[:E] = jj % mem
    valid = np.zeros(E_cap, bool)
    valid[:E] = True
    key = np.where(valid, jj1, 1 << 30)
    dev_order = np.asarray(jnp.argsort(jnp.asarray(key)))
    np.testing.assert_array_equal(order, dev_order)
    # inverse really inverts; valid edges precede invalid ones
    np.testing.assert_array_equal(order[inv], np.arange(E_cap))
    assert valid[order][:E].all() and not valid[order][E:].any()
