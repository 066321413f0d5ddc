"""Checkpoint and profiling utility tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu.utils import checkpoint as ck
from gpc_tpu.utils.profiling import evidence_flops, time_fn


def test_checkpoint_roundtrip(tmp_path):
    theta = np.linspace(0, 1, 7)
    key = jax.random.PRNGKey(3)
    path = os.path.join(tmp_path, "ckpt_5.npz")
    ck.save(path, 5, theta, extra={"obj": 1.25}, prng_key=key)
    step, theta2, extra, key2 = ck.load(path)
    assert step == 5
    np.testing.assert_allclose(theta2, theta)
    assert float(extra["obj"]) == 1.25
    # restored key generates the same stream
    a = jax.random.normal(key, (3,))
    b = jax.random.normal(key2, (3,))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
def test_time_fn_runs():
    f = jax.jit(lambda x: x * 2.0)
    t = time_fn(f, jnp.ones(4), reps=2)
    assert t > 0


def test_evidence_flops():
    assert evidence_flops(100, 2, 1) == 2 * 100 * 100 * 2 + 100 ** 3 / 3 + 2 * 100 * 100
