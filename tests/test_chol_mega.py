"""Mega-kernel evidence (ops/chol_mega): whole factorization in one Pallas op.

Interpret-mode parity vs a dense fp64 evidence on the bench problem family
(RBF Gram at SNR 10).  The kernel runs the same bf16-input/f32-accum GEMM
policy as the bench's XLA pipeline, so tolerances match that path's
certified drift (logdet ~1e-3, quad ~5e-3 at these sizes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu.ops.chol_mega import (_cholinv_leaf, _factor_diag,
                                   evidence_mega_rbf, LEAF)


def _dense_reference(X, m, iw, noise):
    Xs = np.asarray(X, np.float64) * np.sqrt(0.5 * iw)
    n2 = np.sum(Xs * Xs, axis=1)
    d2 = np.maximum(n2[:, None] + n2[None, :] - 2.0 * Xs @ Xs.T, 0.0)
    K = np.exp(-d2) + noise * np.eye(X.shape[0])
    L = np.linalg.cholesky(K)
    v = np.linalg.solve(L, np.asarray(m, np.float64))
    return 2.0 * np.sum(np.log(np.diag(L))), float(np.sum(v * v))


def test_cholinv_leaf():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((LEAF, 8)).astype(np.float32)
    K = jnp.asarray(A @ A.T * 0.05 + np.eye(LEAF, dtype=np.float32))
    L, M = _cholinv_leaf(K)
    Lr = np.linalg.cholesky(np.asarray(K, np.float64))
    np.testing.assert_allclose(np.asarray(L), Lr, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(M) @ Lr, np.eye(LEAF),
                               rtol=0, atol=5e-5)


def test_factor_diag_blocked():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((512, 16)).astype(np.float32)
    K = jnp.asarray(A @ A.T * 0.02 + np.eye(512, dtype=np.float32))
    L, M = _factor_diag(K, 512)
    Lr = np.linalg.cholesky(np.asarray(K, np.float64))
    np.testing.assert_allclose(np.asarray(L), Lr, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(M) @ Lr, np.eye(512),
                               rtol=0, atol=2e-4)


@pytest.mark.parametrize("N,b", [(512, 128), (1024, 256)])
def test_evidence_mega_interpret(N, b):
    rng = np.random.default_rng(0)
    q, D = 8, 1
    X = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    ld, quad = evidence_mega_rbf(X, m, jnp.float32(1.0), jnp.float32(1.0),
                                 jnp.float32(0.1), b=b, interpret=True)
    want_ld, want_q = _dense_reference(X, m, 1.0, 0.1)
    assert abs(float(ld) - want_ld) < 2e-3 * abs(want_ld)
    assert abs(float(quad) - want_q) < 1e-2 * abs(want_q)
