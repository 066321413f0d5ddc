"""Lazy-Gram fused evidence ≡ dense Gram + Cholesky (ops/lazy_evidence.py)."""

import numpy as np
import jax.numpy as jnp

from gpc_tpu.ops.lazy_evidence import (
    evidence_fused_lazy, rbf_block_fn, rbf_evidence_lazy)


def _dense_reference(X, m, iw, var, noise):
    n2 = np.sum(X * X, axis=1)
    d2 = np.maximum(n2[:, None] + n2[None, :] - 2.0 * X @ X.T, 0.0)
    K = var * np.exp(-0.5 * iw * d2) + noise * np.eye(X.shape[0])
    L = np.linalg.cholesky(K)
    v = np.linalg.solve(L, m)
    return 2.0 * np.sum(np.log(np.diag(L))), float(np.sum(v * v)), K


def test_rbf_lazy_matches_dense():
    rng = np.random.default_rng(0)
    n, q, d = 1024, 5, 3
    X = rng.standard_normal((n, q))
    m = rng.standard_normal((n, d))
    iw, var, noise = 0.3, 1.7, 1e-2
    want_ld, want_quad, _ = _dense_reference(X, m, iw, var, noise)
    ld, quad = rbf_evidence_lazy(jnp.asarray(X), jnp.asarray(m),
                                 iw, var, noise, force=True)
    assert abs(float(ld) - want_ld) < 1e-8 * abs(want_ld)
    assert abs(float(quad) - want_quad) < 1e-8 * abs(want_quad)


def test_lazy_factor_matches_dense_chol():
    rng = np.random.default_rng(1)
    n, q = 768, 4  # non-power-of-two multiple of BASE: odd split shapes
    X = rng.standard_normal((n, q))
    m = rng.standard_normal((n, 1))
    iw, var, noise = 1.0, 1.0, 1e-1
    want_ld, want_quad, K = _dense_reference(X, m, iw, var, noise)
    kfn = rbf_block_fn(jnp.asarray(X), iw, var, noise)
    ld, quad, L = evidence_fused_lazy(kfn, n, jnp.asarray(m))
    assert abs(float(ld) - want_ld) < 1e-8 * abs(want_ld)
    assert abs(float(quad) - want_quad) < 1e-8 * abs(want_quad)
    Lnp = np.asarray(L)
    assert np.allclose(Lnp @ Lnp.T, K, atol=1e-9)
    assert np.allclose(np.triu(Lnp, 1), 0.0)


def test_lazy_diagonal_blocks_only_get_ridge():
    # every diagonal element must receive the noise ridge exactly once
    rng = np.random.default_rng(2)
    n = 768
    X = rng.standard_normal((n, 2))
    kfn = rbf_block_fn(jnp.asarray(X), 1.0, 1.0, 0.5)
    blk = kfn(256, 256, 256, 256)
    assert np.allclose(np.diag(np.asarray(blk)), 1.0 + 0.5)
    off = kfn(512, 256, 256, 256)
    assert float(jnp.max(jnp.abs(jnp.diagonal(off)))) < 1.0  # no ridge added


def test_left_looking_matches_dense():
    # fully lazy variant: trailing corrections composed into the block thunk
    from gpc_tpu.ops.lazy_evidence import evidence_fused_left

    rng = np.random.default_rng(3)
    n, q, d = 768, 4, 2  # non-power-of-two multiple of BASE
    X = rng.standard_normal((n, q))
    m = rng.standard_normal((n, d))
    iw, var, noise = 0.5, 1.2, 5e-2
    want_ld, want_quad, K = _dense_reference(X, m, iw, var, noise)
    kfn = rbf_block_fn(jnp.asarray(X), iw, var, noise)
    ld, quad, L = evidence_fused_left(kfn, n, jnp.asarray(m))
    assert abs(float(ld) - want_ld) < 1e-8 * abs(want_ld)
    assert abs(float(quad) - want_quad) < 1e-8 * abs(want_quad)
    Lnp = np.asarray(L)
    assert np.allclose(Lnp @ Lnp.T, K, atol=1e-9)
    assert np.allclose(np.triu(Lnp, 1), 0.0)


def test_kern_block_fn_general_kernel():
    # compound kernel (rbf+matern52+bias+white): lazy evidence ≡ dense compute
    from gpc_tpu import kernels as K
    from gpc_tpu.ops.lazy_evidence import kern_evidence_lazy

    rng = np.random.default_rng(4)
    n, q, d = 768, 3, 2
    X = jnp.asarray(rng.standard_normal((n, q)))
    m = jnp.asarray(rng.standard_normal((n, d)))
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Matern52(input_dim=q), K.Bias(input_dim=q),
        K.White(input_dim=q)))
    p = jnp.asarray(kern.default_params())
    Kd = np.asarray(kern.compute(p, X, X)) + float(kern.white(p)) * np.eye(n)
    L = np.linalg.cholesky(Kd)
    want_ld = 2.0 * np.sum(np.log(np.diag(L)))
    want_quad = float(np.sum(np.linalg.solve(L, np.asarray(m)) ** 2))
    ld, quad = kern_evidence_lazy(kern, p, X, m, force=True)
    assert abs(float(ld) - want_ld) < 1e-8 * abs(want_ld)
    assert abs(float(quad) - want_quad) < 1e-8 * abs(want_quad)
