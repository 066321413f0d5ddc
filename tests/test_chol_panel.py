"""ops/chol_panel (v3 panel mega-kernel) vs dense evidence, interpret mode.

Covers all four j-mod-CB tail variants (the lax.switch bodies) by running
several (N, b) geometries; tolerances are the bf16-input/f32-accum policy's
(same as ops/chol_mega, tests/test_chol_mega.py).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gpc_tpu.ops.chol_panel import evidence_panel_rbf

rng = np.random.default_rng(3)


def _dense(X, m, noise):
    Xd = np.asarray(X, np.float64)
    d2 = ((Xd[:, None, :] - Xd[None, :, :]) ** 2).sum(-1) * 0.5
    K = np.exp(-d2) + noise * np.eye(X.shape[0])
    _, ld = np.linalg.slogdet(K)
    quad = float((np.asarray(m, np.float64)
                  * np.linalg.solve(K, np.asarray(m, np.float64))).sum())
    return ld, quad


@pytest.mark.parametrize("N,b", [(1536, 128), (3072, 256), (2048, 512)])
def test_panel_evidence_matches_dense(N, b):
    X = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((N, 2)), jnp.float32)
    ld_ref, quad_ref = _dense(X, m, 0.1)
    ld, quad = evidence_panel_rbf(X, m, jnp.float32(1.0), jnp.float32(1.0),
                                  jnp.float32(0.1), b=b, interpret=True)
    assert abs(float(ld) - ld_ref) / abs(ld_ref) < 2e-3
    assert abs(float(quad) - quad_ref) / abs(quad_ref) < 2e-3


def test_panel_rejects_bad_geometry():
    X = jnp.zeros((1920, 8), jnp.float32)   # nb = 15, not a CB multiple
    m = jnp.zeros((1920, 1), jnp.float32)
    with pytest.raises(AssertionError):
        evidence_panel_rbf(X, m, jnp.float32(1.0), jnp.float32(1.0),
                           jnp.float32(0.1), b=128, interpret=True)
