"""Property tests for the Lie-group layer.

Ports the algebraic-identity suite of the reference
(dpvo/lietorch/run_tests.py:16-52) to JAX, plus analytic-vs-numerical
Jacobian checks replacing the reference's vendored gradcheck harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpvo_tpu.lie import se3, sim3, so3


import pytest

pytestmark = pytest.mark.smoke

KEY = jax.random.PRNGKey(0)


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rand_se3(key, shape=()):
    k1, k2 = jax.random.split(key)
    return se3.make(0.5 * jax.random.normal(k1, shape + (3,)), rand_quat(k2, shape))


def rand_sim3(key, shape=()):
    k1, k2, k3 = jax.random.split(key, 3)
    t = 0.5 * jax.random.normal(k1, shape + (3,))
    s = jnp.exp(0.3 * jax.random.normal(k3, shape))
    return sim3.make(t, rand_quat(k2, shape), s)


# ---------------- SO3 ----------------


def test_so3_exp_log_roundtrip():
    phi = 0.8 * jax.random.normal(KEY, (64, 3))
    assert np.allclose(so3.log(so3.exp(phi)), phi, atol=1e-5)


def test_so3_exp_log_small_angle():
    phi = 1e-9 * jax.random.normal(KEY, (8, 3))
    assert np.allclose(so3.log(so3.exp(phi)), phi, atol=1e-12)
    # gradients finite at zero
    g = jax.grad(lambda p: jnp.sum(so3.exp(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_so3_rotate_matches_matrix():
    q = rand_quat(KEY, (16,))
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    Rv = jnp.einsum("nij,nj->ni", so3.to_matrix(q), v)
    assert np.allclose(so3.quat_rotate(q, v), Rv, atol=1e-5)


def test_so3_from_matrix_roundtrip():
    q = rand_quat(KEY, (32,))
    q2 = so3.from_matrix(so3.to_matrix(q))
    # double cover: compare up to sign
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    assert np.allclose(q2 * sign, q, atol=1e-5)


# ---------------- SE3 ----------------


def test_se3_inverse_identity():
    g = rand_se3(KEY, (32,))
    e = se3.mul(g, se3.inv(g))
    assert np.allclose(e, se3.identity((32,)), atol=1e-5)


def test_se3_exp_log_roundtrip():
    xi = 0.7 * jax.random.normal(KEY, (64, 6))
    assert np.allclose(se3.log(se3.exp(xi)), xi, atol=1e-4)


def test_se3_act_matches_matrix():
    g = rand_se3(KEY, (16,))
    p = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    T = se3.to_matrix(g)
    ph = jnp.concatenate([p, jnp.ones((16, 1))], -1)
    expected = jnp.einsum("nij,nj->ni", T, ph)[..., :3]
    assert np.allclose(se3.act(g, p), expected, atol=1e-5)


def test_se3_act4_inverse_depth():
    """act4 on (x,y,z,w) equals scaling the point action (ref se3.h act4)."""
    g = rand_se3(KEY, (8,))
    X = jax.random.normal(jax.random.PRNGKey(3), (8, 4))
    Y = se3.act4(g, X)
    # point = X[:3]/w; transformed point should be Y[:3]/w
    w = X[..., 3:4]
    assert np.allclose(Y[..., :3] / w, se3.act(g, X[..., :3] / w), atol=1e-4)
    assert np.allclose(Y[..., 3], X[..., 3])


def test_se3_adjoint_identity():
    """Adj(X) a == Log(X * Exp(a) * X^-1)  (ref run_tests.py:30-41)."""
    g = rand_se3(KEY, (16,))
    a = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (16, 6))
    lhs = jnp.einsum("nij,nj->ni", se3.adj_matrix(g), a)
    rhs = se3.log(se3.mul(se3.mul(g, se3.exp(a)), se3.inv(g)))
    assert np.allclose(lhs, rhs, atol=1e-4)


def test_se3_adjT_is_adj_transpose():
    g = rand_se3(KEY, (16,))
    a = jax.random.normal(jax.random.PRNGKey(5), (16, 6))
    lhs = se3.adjT(g, a)
    rhs = jnp.einsum("nji,nj->ni", se3.adj_matrix(g), a)
    assert np.allclose(lhs, rhs, atol=1e-5)


def test_se3_retr_first_order():
    """d/dxi [retr(g, xi)] at 0 acts like left-multiplication by Exp."""
    g = rand_se3(KEY)
    xi = 1e-4 * jnp.ones(6)
    approx = se3.retr(g, xi)
    exact = se3.mul(se3.exp(xi), g)
    assert np.allclose(approx, exact, atol=1e-7)


def test_se3_exp_jacobian_vs_numerical():
    xi0 = jnp.array([0.1, -0.2, 0.3, 0.2, -0.1, 0.15])
    J = jax.jacfwd(se3.exp)(xi0)
    eps = 1e-4
    for k in range(6):
        d = jnp.zeros(6).at[k].set(eps)
        num = (se3.exp(xi0 + d) - se3.exp(xi0 - d)) / (2 * eps)
        assert np.allclose(J[:, k], num, atol=1e-3)


# ---------------- Sim3 ----------------


def test_sim3_inverse_identity():
    g = rand_sim3(KEY, (32,))
    e = sim3.mul(g, sim3.inv(g))
    assert np.allclose(e, sim3.identity((32,)), atol=1e-4)


def test_sim3_exp_log_roundtrip():
    xi = 0.5 * jax.random.normal(KEY, (64, 7))
    assert np.allclose(sim3.log(sim3.exp(xi)), xi, atol=1e-4)


def test_sim3_exp_zero_scale_matches_se3():
    xi6 = 0.5 * jax.random.normal(KEY, (16, 6))
    xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], -1)
    g = sim3.exp(xi7)
    g_se3 = se3.exp(xi6)
    assert np.allclose(sim3.to_se3(g), g_se3, atol=1e-5)
    assert np.allclose(sim3.s_of(g), 1.0, atol=1e-6)


def test_sim3_act_matches_matrix():
    g = rand_sim3(KEY, (16,))
    p = jax.random.normal(jax.random.PRNGKey(6), (16, 3))
    T = sim3.to_matrix(g)
    ph = jnp.concatenate([p, jnp.ones((16, 1))], -1)
    expected = jnp.einsum("nij,nj->ni", T, ph)[..., :3]
    assert np.allclose(sim3.act(g, p), expected, atol=1e-4)


def test_sim3_adjoint_transpose_identity():
    """adjT(g, a) . b == a . Adj(g) b via Log(g Exp(b) g^-1)."""
    g = rand_sim3(KEY, (8,))
    a = jax.random.normal(jax.random.PRNGKey(7), (8, 7))
    b = 1e-3 * jax.random.normal(jax.random.PRNGKey(8), (8, 7))
    adj_b = sim3.log(sim3.mul(sim3.mul(g, sim3.exp(b)), sim3.inv(g)))
    lhs = jnp.sum(sim3.adjT(g, a) * b, axis=-1)
    rhs = jnp.sum(a * adj_b, axis=-1)
    assert np.allclose(lhs, rhs, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
