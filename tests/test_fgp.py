"""fGP-equivalent stateful API (reference mex/fGP.mex.cpp)."""

import numpy as np
import pytest

from gpc_tpu.interop import fgp, clear, query, retrain, train


@pytest.fixture(autouse=True)
def _fresh_state():
    clear()
    yield
    clear()


def _sine_data(n, seed):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3, 3, (n, 1)), axis=0)
    Y = np.sin(X) + 0.05 * rng.standard_normal((n, 1))
    return X, Y


def test_train_query_roundtrip():
    X, Y = _sine_data(30, 0)
    train("rBw", X, Y, iters=50)
    mu = query(X)
    assert mu.shape == (30, 1)
    # a trained GP interpolates the sine to well under the noise level
    assert float(np.sqrt(np.mean((mu - Y) ** 2))) < 0.1
    mu2, var = query(X, want_variance=True)
    np.testing.assert_allclose(mu2, mu)
    assert np.all(np.asarray(var) > 0)


def test_retrain_warm_starts():
    X, Y = _sine_data(30, 0)
    train("rBw", X, Y, iters=50)
    X2, Y2 = _sine_data(40, 1)
    obj = retrain(X2, Y2, iters=20)
    assert np.isfinite(obj)
    mu = query(X2)
    assert float(np.sqrt(np.mean((mu - Y2) ** 2))) < 0.15


def test_errors_match_mex_semantics():
    with pytest.raises(RuntimeError):
        query(np.zeros((3, 1)))
    with pytest.raises(RuntimeError):
        retrain(np.zeros((3, 1)), np.zeros((3, 1)))
    with pytest.raises(ValueError):
        train("rz", np.zeros((3, 1)), np.zeros((3, 1)))  # illegal letter 'z'
    with pytest.raises(ValueError):
        fgp("help")
    X, Y = _sine_data(20, 2)
    train("r", X, Y, iters=5)
    with pytest.raises(ValueError):
        query(np.zeros((3, 2)))  # wrong input dim


def test_dispatch_gateway():
    X, Y = _sine_data(25, 3)
    fgp("train", "rw", X, Y, iters=30)
    mu = fgp("query", X)
    assert mu.shape == (25, 1)
    fgp("clear")
    with pytest.raises(RuntimeError):
        fgp("query", X)
