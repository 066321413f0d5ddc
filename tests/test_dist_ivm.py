"""Distributed IVM selection (parallel/dist_ivm): order ≡ single-chip.

8 virtual CPU devices (tests/conftest.py).  The selection scan is the
reference's O(d·N) hot loop (/root/reference/CIvm.cpp:302-365); the sharded
version must reproduce the single-chip scan's selection order bit-for-bit
(argmax tie-breaking included) and its site/posterior state numerically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models.ivm import (ENTROPY, RANDOM, RENTROPY, IvmSpec,
                                select_points)
from gpc_tpu.noise import GaussianNoise, ProbitNoise
from gpc_tpu.parallel.dist_ivm import make_select_points_dist
from gpc_tpu.parallel.mesh import data_mesh, replicated, shard_rows


def _mesh8():
    mesh = data_mesh()
    if len(mesh.devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh


def _problem(N, noise_kind, seed=0):
    rng = np.random.default_rng(seed)
    q = 2
    X = rng.standard_normal((N, q))
    if noise_kind == "probit":
        y = np.sign(np.sin(2.0 * X[:, :1]) + 0.3 * rng.standard_normal((N, 1)))
        noise = ProbitNoise(output_dim=1)
    else:
        y = np.sin(2.0 * X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
        noise = GaussianNoise(output_dim=1)
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    return kern, noise, X, y


@pytest.mark.parametrize("noise_kind", ["gaussian", "probit"])
@pytest.mark.parametrize("selection", [ENTROPY, RANDOM, RENTROPY])
def test_selection_order_matches_single_chip(noise_kind, selection):
    mesh = _mesh8()
    N, d = 64, 16
    kern, noise, X, y = _problem(N, noise_kind)
    spec = IvmSpec(kern=kern, noise=noise, n_data=N, input_dim=2,
                   output_dim=1, num_active=d, selection=selection)
    kp = jnp.asarray(kern.default_params())
    npar = jnp.asarray(noise.default_params(y))
    rng = np.random.default_rng(3)
    rv = rng.random(d)

    ref = select_points(spec, kp, npar, X, y, jnp.asarray(rv))
    sel = jax.jit(make_select_points_dist(spec, mesh))
    st = sel(kp, npar, shard_rows(mesh, X), shard_rows(mesh, y),
             shard_rows(mesh, np.ones(N)), replicated(mesh, rv))

    assert np.array_equal(np.asarray(st.active_idx),
                          np.asarray(ref.active_idx))
    np.testing.assert_allclose(np.asarray(st.m_site), np.asarray(ref.m_site),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(st.beta_site),
                               np.asarray(ref.beta_site),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(st.varsigma),
                               np.asarray(ref.varsigma),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.mu), np.asarray(ref.mu),
                               rtol=1e-8, atol=1e-10)


def test_padded_rows_never_selected():
    """Ragged N: padded (valid=0) rows are excluded from both entropy and
    random selection, and the order still matches single-chip on the valid
    prefix."""
    mesh = _mesh8()
    N, d = 57, 12  # 57 pads to 64 over 8 devices
    kern, noise, X, y = _problem(N, "gaussian", seed=5)
    spec = IvmSpec(kern=kern, noise=noise, n_data=N, input_dim=2,
                   output_dim=1, num_active=d, selection=ENTROPY)
    kp = jnp.asarray(kern.default_params())
    npar = jnp.asarray(noise.default_params(y))

    ref = select_points(spec, kp, npar, X, y, jnp.zeros(d))

    from gpc_tpu.parallel.mesh import pad_rows
    Xp, _ = pad_rows(X, 8)
    yp, _ = pad_rows(y, 8)
    valid = np.zeros(Xp.shape[0])
    valid[:N] = 1.0
    sel = jax.jit(make_select_points_dist(spec, mesh))
    st = sel(kp, npar, shard_rows(mesh, Xp), shard_rows(mesh, yp),
             shard_rows(mesh, valid), replicated(mesh, np.zeros(d)))

    assert np.array_equal(np.asarray(st.active_idx),
                          np.asarray(ref.active_idx))
    assert np.all(np.asarray(st.active_idx) < N)


def test_training_after_distributed_selection():
    """The active-set likelihood on the distributed selection's sites equals
    the single-chip one (the d×d training problem is replicated)."""
    from gpc_tpu.models.ivm import active_log_likelihood

    mesh = _mesh8()
    N, d = 64, 16
    kern, noise, X, y = _problem(N, "probit", seed=9)
    spec = IvmSpec(kern=kern, noise=noise, n_data=N, input_dim=2,
                   output_dim=1, num_active=d, selection=ENTROPY)
    kp = jnp.asarray(kern.default_params())
    npar = jnp.asarray(noise.default_params(y))

    sel = jax.jit(make_select_points_dist(spec, mesh))
    st = sel(kp, npar, shard_rows(mesh, X), shard_rows(mesh, y),
             shard_rows(mesh, np.ones(N)), replicated(mesh, np.zeros(d)))
    ref = select_points(spec, kp, npar, X, y, jnp.zeros(d))

    Xa = jnp.asarray(X[np.asarray(st.active_idx)])
    ll_dist = float(active_log_likelihood(spec, kp, Xa, st.m_site,
                                          st.beta_site))
    ll_ref = float(active_log_likelihood(
        spec, kp, jnp.asarray(X[np.asarray(ref.active_idx)]), ref.m_site,
        ref.beta_site))
    assert abs(ll_dist - ll_ref) < 1e-9 * max(abs(ll_ref), 1.0)
