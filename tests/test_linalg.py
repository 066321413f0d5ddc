"""Linear-algebra tests (reference CMatrix.cpp chol/jitChol/pdinv/logDet, testMatrix.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu import linalg


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def test_jitchol_pd_no_jitter():
    A = _spd(16)
    L, jit = linalg.jitchol(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(L @ L.T), A, rtol=1e-10, atol=1e-10)
    assert float(jit) == 0.0


def test_jitchol_escalates_on_nonpd():
    # rank-deficient matrix: needs jitter
    v = np.ones((8, 1))
    A = v @ v.T  # PSD rank-1
    L, jit = linalg.jitchol(jnp.asarray(A))
    assert np.all(np.isfinite(np.asarray(L)))
    assert float(jit) > 0.0
    # factor reproduces A + jitter·I
    np.testing.assert_allclose(np.asarray(L @ L.T), A + float(jit) * np.eye(8), rtol=1e-8, atol=1e-8)


def test_jitchol_inside_jit():
    A = jnp.asarray(_spd(12, 1))
    L, _ = jax.jit(linalg.jitchol)(A)
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(np.asarray(A)), rtol=1e-10, atol=1e-10)


def test_logdet_and_solve():
    A = _spd(20, 2)
    L, _ = linalg.jitchol(jnp.asarray(A))
    np.testing.assert_allclose(float(linalg.chol_logdet(L)), np.linalg.slogdet(A)[1], rtol=1e-10)
    b = np.random.default_rng(3).standard_normal((20, 4))
    x = np.asarray(linalg.chol_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-8, atol=1e-10)


def test_pdinv():
    A = _spd(10, 4)
    np.testing.assert_allclose(np.asarray(linalg.pdinv(jnp.asarray(A))), np.linalg.inv(A), rtol=1e-8, atol=1e-10)


def test_quad_form():
    A = _spd(15, 5)
    m = np.random.default_rng(6).standard_normal((15, 3))
    L, _ = linalg.jitchol(jnp.asarray(A))
    want = np.trace(m.T @ np.linalg.solve(A, m))
    np.testing.assert_allclose(float(linalg.quad_form(L, jnp.asarray(m))), want, rtol=1e-9)


def test_dist2():
    rng = np.random.default_rng(7)
    X1 = rng.standard_normal((9, 4))
    X2 = rng.standard_normal((7, 4))
    D = np.asarray(linalg.dist2(jnp.asarray(X1), jnp.asarray(X2)))
    want = ((X1[:, None, :] - X2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(D, want, rtol=1e-9, atol=1e-9)


def test_chol_nansafe_vjp_matches_reference():
    """Closed-form cholesky vjp ≡ jax.grad of jnp.linalg.cholesky."""
    import jax
    A = _spd(8, 11)
    f_ref = lambda A: jnp.sum(jnp.sin(jnp.linalg.cholesky(A)))
    f_new = lambda A: jnp.sum(jnp.sin(linalg._chol_nansafe(A)))
    g_ref = jax.grad(f_ref)(jnp.asarray(A))
    g_new = jax.grad(f_new)(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-12, atol=1e-14)


def test_jitchol_rescue_gradient_no_nan_leak():
    """Gradient through the failure→rescue path is finite and matches FD
    at the (stop-gradiented) discovered jitter — the failed first attempt's
    NaN factor must contribute exactly zero cotangent."""
    import jax
    rng = np.random.default_rng(0)
    B = rng.standard_normal((8, 8))
    C = jnp.asarray(B @ B.T - 3.0 * np.eye(8))   # indefinite

    def obj(A):
        L, _ = linalg.jitchol(A)
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    _, used = linalg.jitchol(C)
    assert float(used) > 0.0
    g = np.asarray(jax.grad(obj)(C))
    assert np.all(np.isfinite(g))

    c = float(used)
    def obj_fixed(A):
        L = linalg._chol_nansafe(A + c * jnp.eye(8, dtype=A.dtype))
        return jnp.sum(jnp.log(jnp.diagonal(L)))
    g_fixed = np.asarray(jax.grad(obj_fixed)(C))
    np.testing.assert_allclose(g, g_fixed, rtol=1e-10, atol=1e-12)


def test_evidence_terms_fast_matches_exact(monkeypatch):
    """Fast (fused, fixed-jitter) evidence ≈ exact path on a well-conditioned
    matrix — the perturbation is the 1e-6·mean(diag) base jitter only."""
    A = _spd(64, 21)
    m = np.random.default_rng(3).standard_normal((64, 2))
    ld_e, q_e, _ = linalg.evidence_terms(jnp.asarray(A), jnp.asarray(m))
    monkeypatch.setattr(linalg, "FAST_JITCHOL", True)
    ld_f, q_f, _ = linalg.evidence_terms(jnp.asarray(A), jnp.asarray(m))
    np.testing.assert_allclose(float(ld_f), float(ld_e), rtol=1e-5)
    np.testing.assert_allclose(float(q_f), float(q_e), rtol=1e-5)
