"""Pallas fused Gram tiles vs the kernel DSL (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.ops import gram_pallas as gp

rng = np.random.default_rng(13)
X1 = rng.standard_normal((256, 4)).astype(np.float32)
X2 = rng.standard_normal((256, 4)).astype(np.float32)


@pytest.mark.parametrize("family,kind,pidx", [
    ("rbf", "rbf", None), ("exp", "exp", None), ("ratquad", "ratquad", None),
    ("matern32", "matern32", None), ("matern52", "matern52", None)])
def test_dist_family_matches_dsl(family, kind, pidx):
    kern = K.make_kern(kind, 4)
    params = jnp.asarray(kern.default_params() * (0.5 + rng.random(kern.n_params)),
                         jnp.float32)
    want = np.asarray(kern.compute(params, jnp.asarray(X1), jnp.asarray(X2)))
    got = np.asarray(gp.dist_gram(family, params, jnp.asarray(X1), jnp.asarray(X2),
                                  tile=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("family,kind", [("lin", "lin"), ("poly", "poly"), ("mlp", "mlp")])
def test_inner_family_matches_dsl(family, kind):
    kern = K.make_kern(kind, 4)
    params = jnp.asarray(kern.default_params(), jnp.float32)
    want = np.asarray(kern.compute(params, jnp.asarray(X1), jnp.asarray(X2)))
    got = np.asarray(gp.inner_gram(family, params, jnp.asarray(X1), jnp.asarray(X2),
                                   tile=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ragged_shapes_fall_back():
    kern = K.Rbf(input_dim=4)
    params = jnp.asarray(kern.default_params(), jnp.float32)
    got = np.asarray(gp.dist_gram("rbf", params, jnp.asarray(X1[:100]),
                                  jnp.asarray(X2[:70])))
    want = np.asarray(kern.compute(params, jnp.asarray(X1[:100]), jnp.asarray(X2[:70])))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
