"""Fully distributed FTC training path vs the single-chip AD path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.models.gp import GP
from gpc_tpu.parallel.mesh import data_mesh, pad_rows, shard_rows
from gpc_tpu.parallel.dist_ftc import make_dist_ftc_value_and_grad

rng = np.random.default_rng(31)


def _setup(N=43, q=3, D=2, learn_scales=False):
    X = rng.standard_normal((N, q))
    y = np.column_stack([np.sin(X[:, 0]), np.cos(X[:, 1])])[:, :D]
    y += 0.05 * rng.standard_normal((N, D))
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    model = GP(kern, X, y, centre=True, learn_scales=learn_scales,
               scale_data=learn_scales)
    mesh = data_mesh()
    nd = len(mesh.devices)
    Xp, _ = pad_rows(X, nd)
    yp, _ = pad_rows(y, nd)
    mask = np.zeros(Xp.shape[0])
    mask[:N] = 1.0
    args = (shard_rows(mesh, Xp), shard_rows(mesh, yp), shard_rows(mesh, mask))
    vag = jax.jit(make_dist_ftc_value_and_grad(
        model.spec, mesh, model.bias, model.fixed_scales, N))
    return model, vag, args


@pytest.mark.parametrize("learn_scales", [False, True])
def test_value_and_grad_match_ad(learn_scales):
    model, vag, args = _setup(learn_scales=learn_scales)
    val, grad = vag(model.theta, *args)
    want_val = float(model._objective(model.theta))
    want_grad = np.asarray(jax.grad(model._objective)(model.theta))
    np.testing.assert_allclose(float(val), want_val, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(grad), want_grad, rtol=1e-6, atol=1e-9)


def test_scg_training_on_distributed_path():
    from gpc_tpu.optim.scg import scg
    model, vag, args = _setup(N=40, D=1)
    res = jax.jit(lambda t: scg(lambda th: vag(th, *args), t, max_iters=30))(model.theta)
    res_single = model.optimise(iters=30)
    np.testing.assert_allclose(float(res.obj), float(res_single.obj), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_single.x),
                               rtol=1e-4, atol=1e-6)


def test_distributed_posterior_matches_single_chip():
    from gpc_tpu.parallel.dist_ftc import make_dist_ftc_posterior
    from gpc_tpu.models.gp import posterior
    model, vag, args = _setup(N=40, D=2)
    Xtest = jnp.asarray(rng.standard_normal((7, 3)))
    post = jax.jit(make_dist_ftc_posterior(
        model.spec, data_mesh(), model.bias, model.fixed_scales, 40))
    mu, var = post(model.theta, *args, Xtest)
    mu_s, var_s = posterior(model.spec, model.theta, model.X, model.y,
                            model.bias, model.fixed_scales, Xtest)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_s), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_s), rtol=1e-8,
                               atol=1e-10)
