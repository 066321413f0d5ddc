"""Remaining MATLAB golden fixtures: mapping models and matrix-op parity.

testMltools{linear,mlp}.mat (testMltools.cpp pattern): params in the
getOptParams layout drop into our pack/unpack; ll/grads/out must match.
Matrix fixtures (testCholesky/testSyev/testInv/testGemm — testMatrix.cpp):
the reference golden-tests its LAPACK wrappers; we run the same data through
jnp/linalg to demonstrate the numerical layer agrees with MATLAB.
"""

import numpy as np
import scipy.io as sio
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu.models.mltools import LinearMapping, MlpMapping

MATDIR = "/root/reference/matfiles"


def _load(name):
    d = sio.loadmat(f"{MATDIR}/{name}.mat", squeeze_me=False)
    return {k: (v.toarray() if hasattr(v, "toarray") else v) for k, v in d.items()}


def test_mltools_linear_golden():
    d = _load("testMltoolslinear")
    X, y = d["X"], d["y"]
    m = LinearMapping(X, y, seed=0)
    theta = jnp.asarray(d["params"].ravel().astype(np.float64))
    m.theta = theta
    # parameter layout: [W col-major][b] must reconstruct the stored W, b
    W, b = m.unpack(theta)
    np.testing.assert_allclose(np.asarray(W), d["W"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b), d["b"], rtol=1e-12)
    np.testing.assert_allclose(m.log_likelihood(), float(d["ll"][0, 0]), rtol=1e-9)
    g = jax.grad(lambda t: -m._objective(t))(theta)
    np.testing.assert_allclose(np.asarray(g), d["grads"].ravel(), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(m.out(X)), d["out"], rtol=1e-9)


def test_mltools_mlp_golden():
    d = _load("testMltoolsmlp")
    X, y = d["X"], d["y"]
    hidden = d["W1"].shape[1]
    m = MlpMapping(X, y, hidden_dim=hidden, seed=0)
    theta = jnp.asarray(d["params"].ravel().astype(np.float64))
    m.theta = theta
    W1, b1, W2, b2 = m.unpack(theta)
    np.testing.assert_allclose(np.asarray(W1), d["W1"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b1), d["b1"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(W2), d["W2"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b2), d["b2"], rtol=1e-12)
    # unlike the linear fixture, the MATLAB mlp fixture omits the N/2·log2π
    # constant that the C++ (and we) include (CMltools.cpp:264-265)
    const = 0.5 * X.shape[0] * np.log(2 * np.pi)
    np.testing.assert_allclose(m.log_likelihood() + const, float(d["ll"][0, 0]),
                               rtol=1e-9)
    g = jax.grad(lambda t: -m._objective(t))(theta)
    np.testing.assert_allclose(np.asarray(g), d["grads"].ravel(), rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.out(X)), d["out"], rtol=1e-8)


def test_matrix_cholesky_golden():
    d = _load("testCholesky")
    C = d["C"]
    L = np.asarray(jnp.linalg.cholesky(jnp.asarray(C)))
    np.testing.assert_allclose(L, d["L"], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(L.T, d["U"], rtol=1e-9, atol=1e-11)


def test_matrix_syev_golden():
    d = _load("testSyev")
    C = d["C"]
    vals, vecs = np.linalg.eigh(np.triu(C) + np.triu(C, 1).T)
    np.testing.assert_allclose(np.sort(vals), np.sort(d["SYEV3"].ravel()),
                               rtol=1e-9, atol=1e-11)


def test_matrix_inv_golden():
    # fixture layout: A + Ainv (dgetrf/dgetri LU inverse, CMatrix.cpp:443-470)
    d = _load("testInv")
    keys = [k for k in d if not k.startswith("__")]
    C = d.get("C", d.get("D", d.get("A")))
    inv_key = [k for k in keys if "INV" in k.upper()]
    assert C is not None and inv_key, f"unexpected fixture layout: {keys}"
    got = np.linalg.inv(C)
    np.testing.assert_allclose(got, d[inv_key[0]], rtol=1e-8, atol=1e-10)


def test_matrix_gemm_golden():
    d = _load("testGemm")
    D, E, F, G = d["D"], d["E"], d["F"], d["G"]
    alpha = float(d["alpha"][0, 0])
    beta = float(d["beta"][0, 0])
    # GEMM1: F ← α·D·E + β·F (testMatrix.cpp gemm "n","n")
    got = alpha * D @ E + beta * F
    np.testing.assert_allclose(got, d["GEMM1"], rtol=1e-10)
    # GEMM2: G ← α·Dᵀ·Eᵀ + β·G (the "t","t" case, testMatrix.cpp:295-305)
    got2 = alpha * D.T @ E.T + beta * G
    np.testing.assert_allclose(got2, d["GEMM2"], rtol=1e-10)


def test_matrix_syrk_golden():
    d = _load("testSyrk")
    A, C, D, a, b = d["A"], d["C"], d["D"], float(d["alpha"][0, 0]), float(d["beta"][0, 0])
    # SYRK1: C ← α·A·Aᵀ + β·C (upper filled symmetric); SYRK2: D ← α·Aᵀ·A + β·D
    np.testing.assert_allclose(a * A @ A.T + b * np.triu(C) + b * np.triu(C, 1).T,
                               d["SYRK1"], rtol=1e-10)
    np.testing.assert_allclose(a * A.T @ A + b * np.triu(D) + b * np.triu(D, 1).T,
                               d["SYRK2"], rtol=1e-10)


def test_matrix_sysv_golden():
    d = _load("testSysv")
    A, B = d["A"], d["B"]
    Asym = np.triu(A) + np.triu(A, 1).T
    got = np.linalg.solve(Asym, B)
    np.testing.assert_allclose(got, d["SYSV1"], rtol=1e-7, atol=1e-9)
