"""Rank-1 bias Woodbury split (ops/lazy_evidence.bias_split).

The Bias kernel contributes c·𝟙𝟙ᵀ with an O(N) eigenvalue that pushes
1-pass-bf16 factorizations out of their stability region (measured NaN on
cmpnd(rbf, bias, white) at N=16k, BASELINE.md round-3 extras).  The split
factors K₀ = K − c·𝟙𝟙ᵀ once with an augmented RHS and applies exact
Sherman-Morrison corrections.  Pinned here:
  * exactness: split evidence ≡ dense evidence at f64 (value AND gradient),
  * applicability rules (needs top-level Bias + white, else None),
  * bf16 stability: on the problem family where the UNSPLIT bf16 path is
    out-of-domain, the split path stays finite and accurate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as K
from gpc_tpu.ops.lazy_evidence import (bias_split, kern_evidence_lazy,
                                       _evidence_bias_split, kern_block_fn)
from gpc_tpu.ops.evidence_fast import Policy, evidence_left_fast


def _dense(kern, p, X, m):
    Kd = kern.compute(p, X, X) + kern.white(p) * jnp.eye(X.shape[0],
                                                         dtype=X.dtype)
    L = jnp.linalg.cholesky(Kd)
    v = jax.scipy.linalg.solve_triangular(L, m, lower=True)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))), jnp.sum(v * v)


def _kern(q=3):
    return K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))


def test_split_applicability():
    q = 2
    assert bias_split(K.Rbf(input_dim=q)) is None
    assert bias_split(K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.White(input_dim=q)))) is None   # no bias
    assert bias_split(K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q)))) is None    # no white: K0 PD not guaranteed
    sp = bias_split(_kern(q))
    assert sp is not None
    kern0, slots = sp
    assert slots == (2,)  # rbf has 2 params, bias variance is p[2]
    assert all(c.kind != "bias" for c in kern0.components)

    # whitefixed also guarantees the ridge
    sp2 = bias_split(K.Cmpnd(input_dim=q, components=(
        K.Bias(input_dim=q), K.WhiteFixed(input_dim=q, fixed_variance=0.1))))
    assert sp2 is not None and sp2[1] == (0,)


def test_split_exact_f64():
    rng = np.random.default_rng(0)
    n, q, D = 768, 3, 2
    X = jnp.asarray(rng.standard_normal((n, q)))
    m = jnp.asarray(rng.standard_normal((n, D)))
    kern = _kern(q)
    p = jnp.asarray(kern.default_params())
    kern0, slots = bias_split(kern)
    pol = Policy(base=256, bf16=False, leafinv=False, stack=True)

    def split_obj(p):
        ld, qd = _evidence_bias_split(kern0, slots, p, X, m, 0.0, pol)
        return 0.6 * ld + 1.4 * qd

    def dense_obj(p):
        ld, qd = _dense(kern, p, X, m)
        return 0.6 * ld + 1.4 * qd

    v_s, g_s = jax.value_and_grad(split_obj)(p)
    v_d, g_d = jax.value_and_grad(dense_obj)(p)
    assert abs(float(v_s) - float(v_d)) < 1e-9 * abs(float(v_d))
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-7, atol=1e-9)


def test_lazy_path_uses_split(monkeypatch):
    """kern_evidence_lazy routes bias-bearing kernels through the split on
    the fast path (GPC_TPU_BIAS_SPLIT=0 restores the raw Gram)."""
    rng = np.random.default_rng(1)
    n, q = 768, 2
    X = jnp.asarray(rng.standard_normal((n, q)))
    m = jnp.asarray(rng.standard_normal((n, 1)))
    kern = _kern(q)
    p = jnp.asarray(kern.default_params())
    want_ld, want_q = _dense(kern, p, X, m)

    ld, qd = kern_evidence_lazy(kern, p, X, m, force=True)
    assert abs(float(ld) - float(want_ld)) < 1e-8 * abs(float(want_ld))
    assert abs(float(qd) - float(want_q)) < 1e-8 * abs(float(want_q))

    monkeypatch.setenv("GPC_TPU_BIAS_SPLIT", "0")
    ld2, qd2 = kern_evidence_lazy(kern, p, X, m, force=True)
    assert abs(float(ld2) - float(want_ld)) < 1e-8 * abs(float(want_ld))


def test_split_is_bf16_stable_where_unsplit_is_not():
    """At f32+bf16 with a LARGE bias variance (the O(N)-eigenvalue regime),
    the unsplit factorization degrades catastrophically while the split
    stays accurate."""
    rng = np.random.default_rng(2)
    n, q = 1024, 3
    X = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    kern = _kern(q)
    p = jnp.asarray([1.0, 1.0, 5.0, 0.1], jnp.float32)  # iw, var, BIAS=5, white
    want_ld, want_q = _dense(kern, p.astype(jnp.float64),
                             X.astype(jnp.float64), m.astype(jnp.float64))
    pol = Policy(base=256, bf16=True, leafinv=False, stack=True)

    kern0, slots = bias_split(kern)
    ld_s, q_s = _evidence_bias_split(kern0, slots, p, X, m, 0.0, pol)
    assert np.isfinite(float(ld_s)) and np.isfinite(float(q_s))
    assert abs(float(ld_s) - float(want_ld)) < 3e-3 * abs(float(want_ld))
    assert abs(float(q_s) - float(want_q)) < 2e-2 * abs(float(want_q))

    ld_u, q_u = evidence_left_fast(kern_block_fn(kern, p, X), n, m, pol)
    unsplit_bad = (not np.isfinite(float(q_u))
                   or abs(float(q_u) - float(want_q))
                   > 10 * abs(float(q_s) - float(want_q)) + 1e-6)
    assert unsplit_bad, (float(q_u), float(q_s), float(want_q))
