"""Distributed blocked Cholesky vs single-device factorization."""

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu.parallel.mesh import data_mesh, shard_rows
from gpc_tpu.parallel.chol_distributed import chol_distributed


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def test_distributed_matches_lapack():
    mesh = data_mesh()
    n_dev = len(mesh.devices)
    N = 64 * n_dev
    K = _spd(N)
    K_sharded = shard_rows(mesh, K)
    L = np.asarray(chol_distributed(mesh, K_sharded))
    want = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, want, rtol=1e-9, atol=1e-9)
    assert np.allclose(np.triu(L, 1), 0.0)


def test_distributed_under_jit():
    mesh = data_mesh()
    N = 32 * len(mesh.devices)
    K = _spd(N, 1)
    K_sharded = shard_rows(mesh, K)
    f = jax.jit(lambda K: chol_distributed(mesh, K))
    L = np.asarray(f(K_sharded))
    np.testing.assert_allclose(L @ L.T, K, rtol=1e-8, atol=1e-8)


def test_evidence_from_distributed_factor():
    """logdet + quadratic form computed from the sharded factor."""
    mesh = data_mesh()
    N = 48 * len(mesh.devices)
    K = _spd(N, 2)
    m = np.random.default_rng(3).standard_normal((N, 1))
    L = np.asarray(chol_distributed(mesh, shard_rows(mesh, K)))
    logdet = 2.0 * np.sum(np.log(np.diag(L)))
    v = np.linalg.solve(L, m)
    quad = float((v.T @ v).item())
    sign, want_logdet = np.linalg.slogdet(K)
    np.testing.assert_allclose(logdet, want_logdet, rtol=1e-10)
    np.testing.assert_allclose(quad, (m.T @ np.linalg.solve(K, m)).item(), rtol=1e-8)


def test_fused_evidence_sweep():
    from gpc_tpu.parallel.chol_distributed import evidence_distributed
    mesh = data_mesh()
    N = 40 * len(mesh.devices)
    K = _spd(N, 5)
    m = np.random.default_rng(6).standard_normal((N, 3))
    logdet, quad = jax.jit(lambda K, m: evidence_distributed(mesh, K, m))(
        shard_rows(mesh, K), jnp.asarray(m))
    sign, want_logdet = np.linalg.slogdet(K)
    want_quad = float(np.trace(m.T @ np.linalg.solve(K, m)))
    np.testing.assert_allclose(float(logdet), want_logdet, rtol=1e-10)
    np.testing.assert_allclose(float(quad), want_quad, rtol=1e-8)


def test_evidence_distributed_grad_matches_dense():
    """jax.grad through evidence_distributed (custom VJP: reverse panel
    sweeps) must match the dense single-chip gradient — the differentiable
    surface GPLVM/sparse paths build on."""
    from gpc_tpu.parallel.chol_distributed import evidence_distributed

    mesh = data_mesh()
    n_dev = len(mesh.devices)
    N = 16 * n_dev
    rng = np.random.default_rng(9)
    X = rng.standard_normal((N, 3))
    m = rng.standard_normal((N, 2))

    def build_K(theta, Xj):
        iw, var, noise = theta
        d2 = jnp.sum((Xj[:, None, :] - Xj[None, :, :]) ** 2, axis=-1)
        return var * jnp.exp(-0.5 * iw * d2) + noise * jnp.eye(N)

    def dist_obj(theta):
        K = build_K(theta, jnp.asarray(X))
        Ks = jax.device_put(
            K, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("dp", None)))
        ld, quad = evidence_distributed(mesh, Ks, jnp.asarray(m))
        return 3.0 * ld + 0.5 * quad

    def dense_obj(theta):
        K = build_K(theta, jnp.asarray(X))
        L = jnp.linalg.cholesky(K)
        v = jax.scipy.linalg.solve_triangular(L, jnp.asarray(m), lower=True)
        return 3.0 * 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))) + 0.5 * jnp.sum(v * v)

    theta = jnp.asarray([0.7, 1.3, 0.3])
    v_d, g_d = jax.value_and_grad(dist_obj)(theta)
    v_s, g_s = jax.value_and_grad(dense_obj)(theta)
    np.testing.assert_allclose(float(v_d), float(v_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_s), rtol=1e-7)

    # grad w.r.t. m too (∂quad/∂m = 2·K⁻¹m through the VJP)
    gm = jax.grad(lambda mm: evidence_distributed(
        mesh, jax.device_put(build_K(theta, jnp.asarray(X)),
                             jax.sharding.NamedSharding(
                                 mesh, jax.sharding.PartitionSpec("dp", None))),
        mm)[1])(jnp.asarray(m))
    K = np.asarray(build_K(theta, jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(gm), 2 * np.linalg.solve(K, m),
                               rtol=1e-7)
