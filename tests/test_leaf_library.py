"""In-VMEM leaf factorization library (ops/chol_panel): both sweep variants.

The leaves are the panel kernel's serial-latency floor (BASELINE.md: leaf
cost is VPU column-sweep issue latency), so both implementations stay
pinned against f64 LAPACK ground truth:
  * _cholinv_leaf      — v2 masked sweep returning (L, L⁻¹); kept as the
                         mode="oldleaf" A/B reference and for
                         ops/chol_pallas's fused (L, L⁻¹) op;
  * _cholinv_leaf_fast — augmented [A|M] sweep (ONE unmasked rank-1 update
                         per column, no L storage; 5.7 vs 54.3 µs per
                         128-sweep in-kernel) — the production leaf;
  * _factor_diag(_fast) — their LEAF-blocked b×b elimination wrappers.
"""

import numpy as np
import jax.numpy as jnp

from gpc_tpu.ops.chol_panel import (LEAF, _cholinv_leaf, _cholinv_leaf_fast,
                                    _factor_diag, _factor_diag_fast)


def _spd(n, seed, q=16, scale=0.05):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, q)).astype(np.float32)
    return jnp.asarray(A @ A.T * scale + np.eye(n, dtype=np.float32))


def test_cholinv_leaf():
    K = _spd(LEAF, 3, q=8)
    L, M = _cholinv_leaf(K)
    Lr = np.linalg.cholesky(np.asarray(K, np.float64))
    np.testing.assert_allclose(np.asarray(L), Lr, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(M) @ Lr, np.eye(LEAF),
                               rtol=0, atol=5e-5)


def test_cholinv_leaf_fast():
    """The augmented sweep returns L⁻¹ with exact-zero strict upper; its
    diagonal is 1/diag(L) (the logdet source in _factor_diag_fast)."""
    K = _spd(LEAF, 5, q=8)
    M = _cholinv_leaf_fast(K)
    Lr = np.linalg.cholesky(np.asarray(K, np.float64))
    np.testing.assert_allclose(np.asarray(M) @ Lr, np.eye(LEAF),
                               rtol=0, atol=5e-5)
    assert np.all(np.triu(np.asarray(M), 1) == 0.0)
    np.testing.assert_allclose(np.diag(np.asarray(M)), 1.0 / np.diag(Lr),
                               rtol=2e-5)


def test_factor_diag_blocked():
    K = _spd(512, 4)
    L, M = _factor_diag(K, 512)
    Lr = np.linalg.cholesky(np.asarray(K, np.float64))
    np.testing.assert_allclose(np.asarray(L), Lr, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(M) @ Lr, np.eye(512),
                               rtol=0, atol=2e-4)


def test_factor_diag_fast_blocked():
    """(L⁻¹, logdet) without ever materializing L — vs f64 ground truth."""
    K = _spd(512, 6)
    Kf = np.asarray(K, np.float64)
    M, ld = _factor_diag_fast(K, 512)
    Lr = np.linalg.cholesky(Kf)
    np.testing.assert_allclose(np.asarray(M) @ Lr, np.eye(512),
                               rtol=0, atol=2e-4)
    _, ld_ref = np.linalg.slogdet(Kf)
    np.testing.assert_allclose(float(ld), ld_ref, rtol=1e-5)
