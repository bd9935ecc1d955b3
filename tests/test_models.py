"""Model-layer tests: shapes, SoftAgg golden vs NumPy, masking and
gradient-clip semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.models import BasicEncoder4, Patchifier, Update, gradient_clip, segment_softmax


def test_encoder_shapes():
    enc = BasicEncoder4(output_dim=128, norm_fn="instance")
    x = jnp.zeros((2, 64, 96, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 16, 24, 128)


def test_segment_softmax_matches_numpy():
    key = jax.random.PRNGKey(1)
    E, C, G = 40, 8, 5
    x = jax.random.normal(key, (E, C))
    seg = jax.random.randint(jax.random.PRNGKey(2), (E,), 0, G)
    w = segment_softmax(x, seg, G)
    xn, sn, wn = np.asarray(x), np.asarray(seg), np.asarray(w)
    for g in range(G):
        m = sn == g
        if m.sum() == 0:
            continue
        e = np.exp(xn[m] - xn[m].max(0))
        want = e / e.sum(0)
        assert np.allclose(wn[m], want, atol=1e-5)
        assert np.allclose(wn[m].sum(0), 1.0, atol=1e-5)


def test_segment_softmax_invalid_rows_zero():
    x = jnp.ones((6, 4))
    seg = jnp.array([0, 0, 1, 1, 1, 2])
    valid = jnp.array([True, True, True, False, True, True])
    w = segment_softmax(x, seg, 3, valid)
    assert np.allclose(w[3], 0.0)
    assert np.allclose(np.asarray(w[2]) + np.asarray(w[4]), 1.0, atol=1e-5)


def test_gradient_clip_backward():
    def f(x):
        return jnp.sum(gradient_clip(x * 100.0))

    g = jax.grad(f)(jnp.ones(4))
    # forward scale 100 -> raw grad 100, clipped to 0.01
    assert np.allclose(g, 100.0 * 0.01) or np.allclose(g, 0.01 * 100.0)
    # NaN grads zeroed: chain through 0/0
    def f2(x):
        y = gradient_clip(x)
        return jnp.sum(jnp.where(jnp.isnan(y), 0.0, y))

    g2 = jax.grad(f2)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g2)))


def make_update_inputs(key, E=32, D=64, P=3):
    ks = jax.random.split(key, 8)
    net = jax.random.normal(ks[0], (E, D))
    inp = jax.random.normal(ks[1], (E, D))
    corr = jax.random.normal(ks[2], (E, 2 * 64 * P * P))
    ix = jax.random.randint(ks[3], (E,), 0, E)
    jx = jax.random.randint(ks[4], (E,), 0, E)
    mask = jnp.ones((E,), bool)
    kk_seg = jax.random.randint(ks[5], (E,), 0, 8)
    ij_seg = jax.random.randint(ks[6], (E,), 0, 6)
    valid = jnp.ones((E,), bool)
    return net, inp, corr, ix, jx, mask, mask, kk_seg, ij_seg, valid


def test_update_shapes_and_ranges():
    E, D = 32, 64
    upd = Update(dim=D)
    args = make_update_inputs(jax.random.PRNGKey(3), E=E, D=D)
    params = upd.init(jax.random.PRNGKey(4), *args, num_segments=E)
    net2, d, w = upd.apply(params, *args, num_segments=E)
    assert net2.shape == (E, D)
    assert d.shape == (E, 2) and w.shape == (E, 2)
    assert np.all(np.asarray(w) >= 0) and np.all(np.asarray(w) <= 1)


def test_update_invalid_edges_do_not_affect_valid():
    """Appending masked garbage edges must not change valid edges' output
    when the graph indexing doesn't reference them."""
    E, D = 16, 32
    upd = Update(dim=D)
    net, inp, corr, ix, jx, mi, mj, kk_seg, ij_seg, valid = make_update_inputs(
        jax.random.PRNGKey(5), E=E, D=D
    )
    params = upd.init(jax.random.PRNGKey(6), net, inp, corr, ix, jx, mi, mj, kk_seg, ij_seg, valid, num_segments=E)
    out1, d1, w1 = upd.apply(params, net, inp, corr, ix, jx, mi, mj, kk_seg, ij_seg, valid, num_segments=E)

    pad = 8
    Ep = E + pad
    netp = jnp.concatenate([net, 100 * jnp.ones((pad, D))])
    inpp = jnp.concatenate([inp, 100 * jnp.ones((pad, D))])
    corrp = jnp.concatenate([corr, 100 * jnp.ones((pad, corr.shape[1]))])
    ixp = jnp.concatenate([ix, jnp.zeros(pad, ix.dtype)])
    jxp = jnp.concatenate([jx, jnp.zeros(pad, jx.dtype)])
    mip = jnp.concatenate([mi, jnp.zeros(pad, bool)])
    mjp = jnp.concatenate([mj, jnp.zeros(pad, bool)])
    kkp = jnp.concatenate([kk_seg, jnp.zeros(pad, kk_seg.dtype)])  # same groups!
    ijp = jnp.concatenate([ij_seg, jnp.zeros(pad, ij_seg.dtype)])
    vp = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    out2, d2, w2 = upd.apply(params, netp, inpp, corrp, ixp, jxp, mip, mjp, kkp, ijp, vp, num_segments=Ep)
    assert np.allclose(out1, out2[:E], atol=1e-4)
    assert np.allclose(d1, d2[:E], atol=1e-4)


def test_patchifier_shapes_and_patch_grid():
    M, P = 12, 3
    pf = Patchifier(patch_size=P, dim=48, fdim=16)
    img = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 96, 3)) * 0.2
    params = pf.init(jax.random.PRNGKey(8), img, M, jax.random.PRNGKey(9))
    fmap, gmap, imap, patches, clr = pf.apply(params, img, M, jax.random.PRNGKey(10))
    assert fmap.shape == (1, 16, 24, 16)
    assert gmap.shape == (M, 16, P, P)
    assert imap.shape == (M, 48)
    assert patches.shape == (M, 3, P, P)
    assert clr.shape == (M, 3)
    # patch (x, y) planes are centroid +/- 1 integer grids; depth is 1
    px = np.asarray(patches[:, 0])
    assert np.allclose(px[:, :, 1] - px[:, :, 0], 1.0)
    assert np.allclose(np.asarray(patches[:, 2]), 1.0)
    # gradient-bias strategy also runs
    out = pf.apply(params, img, M, jax.random.PRNGKey(11), centroid_sel_strat="GRADIENT_BIAS")
    assert out[1].shape == (M, 16, P, P)


def test_softagg_matmul_matches_scatter():
    """The one-hot-matmul aggregation (runtime segment counts) must
    match the scatter path bit-for-bit-ish on identical params/input."""
    import jax

    from dpvo_tpu.models.blocks import SoftAgg

    rng = np.random.default_rng(0)
    E, S, D = 70, 9, 16
    x = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, S, E), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=E) > 0.25)

    mm = SoftAgg(dim=D, matmul_threshold=1)     # force matmul path
    sc = SoftAgg(dim=D, matmul_threshold=10**9)  # force scatter path
    params = mm.init(jax.random.PRNGKey(0), x, seg, S, valid)
    a = mm.apply(params, x, seg, S, valid)
    b = sc.apply(params, x, seg, S, valid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)

    # and with no valid mask
    a = mm.apply(params, x, seg, S)
    b = sc.apply(params, x, seg, S)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)
