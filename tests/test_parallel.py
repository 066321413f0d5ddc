"""Distributed-objective tests: sharded NLML must equal the single-chip NLML.

The multi-host test the reference lacks (SURVEY.md §4 implication d): same
seed/data, 1-device vs 8-virtual-device mesh, identical likelihood and
gradients to tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models.gp import GP
from gpc_tpu.parallel.mesh import data_mesh, pad_rows, shard_rows, replicated, DATA_AXIS
from gpc_tpu.parallel.dist_gp import make_dist_objective, make_dist_train_step

rng = np.random.default_rng(21)


def _kern(q):
    return K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))


def _data(N=43, q=3, D=2):
    X = rng.standard_normal((N, q))
    y = np.column_stack([np.sin(X[:, 0]), np.cos(X[:, 1])])[:, :D]
    y += 0.05 * rng.standard_normal((N, D))
    return X, y


def _setup(approx, N=43, num_active=9):
    X, y = _data(N=N)
    kwargs = dict(num_active=num_active, beta=2.0, seed=5) if approx != "ftc" else {}
    model = GP(_kern(3), X, y, approx=approx, centre=True, **kwargs)
    mesh = data_mesh()
    ndev = len(mesh.devices)
    Xp, _ = pad_rows(X, ndev)
    yp, _ = pad_rows(y, ndev)
    mask = np.zeros(Xp.shape[0])
    mask[:N] = 1.0
    Xs = shard_rows(mesh, Xp)
    ys = shard_rows(mesh, yp)
    ms = shard_rows(mesh, mask)
    nlml = make_dist_objective(model.spec, mesh, model.bias, model.fixed_scales, N)
    return model, mesh, nlml, Xs, ys, ms


@pytest.mark.parametrize("approx", ["ftc", "dtc", "dtcvar", "fitc"])
def test_dist_objective_matches_single_chip(approx):
    model, mesh, nlml, Xs, ys, ms = _setup(approx)
    got = float(jax.jit(nlml)(model.theta, Xs, ys, ms))
    want = float(model._objective(model.theta))
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("approx", ["ftc", "dtc", "fitc"])
def test_dist_gradient_matches_single_chip(approx):
    model, mesh, nlml, Xs, ys, ms = _setup(approx)
    g_dist = np.asarray(jax.jit(jax.grad(nlml))(model.theta, Xs, ys, ms))
    g_single = np.asarray(jax.grad(model._objective)(model.theta))
    np.testing.assert_allclose(g_dist, g_single, rtol=1e-7, atol=1e-9)


def test_dist_scg_training_matches_single_chip():
    model, mesh, nlml, Xs, ys, ms = _setup("dtc", N=40, num_active=8)
    step = make_dist_train_step(model.spec, mesh, model.bias,
                                model.fixed_scales, 40)
    res_dist = jax.jit(step, static_argnames="iters")(model.theta, Xs, ys, ms, iters=25)
    res_single = model.optimise(iters=25)
    np.testing.assert_allclose(float(res_dist.obj), float(res_single.obj), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res_dist.x), np.asarray(res_single.x),
                               rtol=1e-4, atol=1e-6)


def test_eight_devices_present():
    assert len(jax.devices()) == 8  # conftest virtual device count


def test_scaling_bench_smoke():
    from gpc_tpu.parallel.scaling_bench import run
    results = run(rows_per_device=96, num_active=16, q=2, device_counts=[1, 2])
    assert len(results) == 2
    assert results[0]["efficiency"] == 1.0
    assert all(r["t_ms"] > 0 for r in results)
