"""2-D mesh (mp × dp) sparse evidence (DTC/DTCVAR/FITC): value AND gradient
vs single chip."""

import numpy as np
import jax
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models.gp import GP
from gpc_tpu.parallel.mesh import pad_rows
from gpc_tpu.parallel.dist_sparse2d import (make_dist2d_objective, mesh_2d,
                                            shard_data_2d)

rng = np.random.default_rng(31)


def _kern(q):
    return K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))


@pytest.fixture(scope="module", params=["dtc", "dtcvar", "fitc"])
def setup(request):
    approx = request.param
    N, q, D, M = 45, 3, 2, 8
    X = rng.standard_normal((N, q))
    y = np.column_stack([np.sin(X[:, 0]), np.cos(X[:, 1])])
    y += 0.05 * rng.standard_normal((N, D))
    model = GP(_kern(q), X, y, approx=approx, num_active=M, beta=2.0, seed=7)
    mesh = mesh_2d(2, 4)
    n_dp = 4
    Xp, _ = pad_rows(X, n_dp)
    yp, _ = pad_rows(y, n_dp)
    mask = np.zeros(Xp.shape[0])
    mask[:N] = 1.0
    Xs = shard_data_2d(mesh, Xp)
    ys = shard_data_2d(mesh, yp)
    ms = shard_data_2d(mesh, mask)
    nlml = make_dist2d_objective(model.spec, mesh, model.bias,
                                 model.fixed_scales, N)
    return model, nlml, Xs, ys, ms


def test_value_matches_single_chip(setup):
    model, nlml, Xs, ys, ms = setup
    got = float(jax.jit(nlml)(model.theta, Xs, ys, ms))
    want = float(model._objective(model.theta))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_gradient_matches_single_chip(setup):
    model, nlml, Xs, ys, ms = setup
    g2 = np.asarray(jax.jit(jax.grad(nlml))(model.theta, Xs, ys, ms))
    g1 = np.asarray(jax.grad(model._objective)(model.theta))
    np.testing.assert_allclose(g2, g1, rtol=1e-7, atol=1e-9)


def test_scg_step_runs_sharded(setup):
    """A short SCG run driven by the 2-D objective stays finite and descends."""
    from gpc_tpu.optim.scg import scg
    model, nlml, Xs, ys, ms = setup
    vag = jax.jit(jax.value_and_grad(nlml))
    res = scg(vag, model.theta, max_iters=10, args=(Xs, ys, ms))
    start = float(model._objective(model.theta))
    assert np.isfinite(float(res.obj))
    assert float(res.obj) < start
