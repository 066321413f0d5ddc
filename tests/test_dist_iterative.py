"""Row-sharded matrix-free evidence (parallel/dist_iterative) vs single chip.

8-virtual-device equivalence (VERDICT r4 ask #2): the distributed CG+SLQ
engine must reproduce the single-chip iterative engine — same fixed-probe
estimator, same seed — to CG/float tolerance, including gradients, and the
masked-identity padding must leave the evidence untouched.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpc_tpu import kernels as GK
from gpc_tpu.ops.iterative import (IterConfig, cg_solve,
                                   kern_evidence_iterative, slq_logdet)
from gpc_tpu.parallel.dist_iterative import (dist_iterative_nlml,
                                             make_dist_iterative_evidence)
from gpc_tpu.parallel.mesh import data_mesh, pad_rows, shard_rows


def _kern(q):
    return GK.Cmpnd(input_dim=q, components=(
        GK.Rbf(input_dim=q), GK.Bias(input_dim=q), GK.White(input_dim=q)))


CFG = IterConfig(block=32, probes=8, lanczos_iters=24, cg_iters=200,
                 precond_rank=0, trace_probes=8, seed=0)


def _data(N, q=2, D=2, seed=5):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, q))
    m = rng.standard_normal((N, D))
    p = jnp.asarray(np.array([1.2, 0.9, 0.2, 0.3]))
    return jnp.asarray(X), jnp.asarray(m), p


def test_dist_matches_single_chip_evidence_and_grads():
    """N divisible by the mesh: identical probes ⇒ identical estimator —
    value and (p, X, m) gradients match the single-chip engine."""
    N = 64
    X, m, p = _data(N)
    kern = _kern(2)
    mesh = data_mesh()
    nd = len(mesh.devices)
    assert N % nd == 0
    mask = jnp.ones((N,))
    ev = make_dist_iterative_evidence(kern, mesh, CFG)
    args = (shard_rows(mesh, np.asarray(X)), shard_rows(mesh, np.asarray(m)),
            shard_rows(mesh, np.asarray(mask)))

    def obj_dist(p, Xs, ms):
        ld, quad = ev(p, Xs, ms, args[2])
        return ld + quad

    def obj_single(p, X, m):
        ld, quad = kern_evidence_iterative(kern, p, X, m, cfg=CFG)
        return ld + quad

    v_d, g_d = jax.value_and_grad(obj_dist, argnums=(0, 1, 2))(
        p, args[0], args[1])[0], jax.grad(obj_dist, argnums=(0, 1, 2))(
        p, args[0], args[1])
    v_s = float(obj_single(p, X, m))
    g_s = jax.grad(obj_single, argnums=(0, 1, 2))(p, X, m)
    np.testing.assert_allclose(float(v_d), v_s, rtol=1e-8)
    for a, b in zip(g_d, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_padded_rows_are_identity():
    """Ragged N (pads masked to the identity): the padded distributed
    operator's CG quad and SLQ logdet equal a single-chip run of the SAME
    masked padded operator (deterministic probe-for-probe match), and the
    quad equals the exact dense value to CG tolerance."""
    N = 43
    X, m, p = _data(N, seed=6)
    kern = _kern(2)
    mesh = data_mesh()
    nd = len(mesh.devices)
    Xp, _ = pad_rows(np.asarray(X), nd)
    mp, _ = pad_rows(np.asarray(m), nd)
    mask = np.zeros(Xp.shape[0])
    mask[:N] = 1.0
    ev = make_dist_iterative_evidence(kern, mesh, CFG)
    ld_d, quad_d = ev(p, shard_rows(mesh, Xp), shard_rows(mesh, mp),
                      shard_rows(mesh, mask))

    # single-chip twin of the masked padded operator
    Np = Xp.shape[0]
    maskj = jnp.asarray(mask)

    def mvm(V):
        from gpc_tpu.ops.iterative import kernel_mvm
        Vm = V * maskj[:, None]
        out = kernel_mvm(kern, p, jnp.asarray(Xp), Vm, block=CFG.block)
        return out * maskj[:, None] + (1.0 - maskj[:, None]) * V

    key = jax.random.PRNGKey(CFG.seed)
    k_tr, k_slq = jax.random.split(jax.random.fold_in(key, Np))
    Z = jax.random.rademacher(k_tr, (Np, CFG.trace_probes), dtype=X.dtype)
    sols = cg_solve(mvm, jnp.concatenate([jnp.asarray(mp), Z], axis=1),
                    max_iters=CFG.cg_iters).x
    quad_s = float(jnp.sum(jnp.asarray(mp) * sols[:, :m.shape[1]]))
    ld_s = float(slq_logdet(mvm, Np, k_slq, probes=CFG.probes,
                            lanczos_iters=CFG.lanczos_iters, dtype=X.dtype))
    np.testing.assert_allclose(float(quad_d), quad_s, rtol=1e-8)
    np.testing.assert_allclose(float(ld_d), ld_s, rtol=1e-7)

    # pads change nothing: quad is exact (CG tolerance) vs the dense value
    K = np.asarray(kern.gram(p, X))
    quad_exact = float((np.asarray(m) * np.linalg.solve(K, np.asarray(m))).sum())
    np.testing.assert_allclose(float(quad_d), quad_exact, rtol=1e-7)


def test_dist_iterative_nlml_trains():
    """One SCG segment on the distributed matrix-free NLML descends and
    matches the single-chip iterative NLML value at theta0."""
    from gpc_tpu import transforms as tr
    from gpc_tpu.models.gp import GP
    from gpc_tpu.optim.scg import scg

    N, q, D = 48, 2, 1
    rng = np.random.default_rng(9)
    X = rng.standard_normal((N, q))
    y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    kern = _kern(q)
    model = GP(kern, X, y, centre=True)
    mesh = data_mesh()
    nd = len(mesh.devices)
    Xp, _ = pad_rows(X, nd)
    yp, _ = pad_rows(y, nd)
    mask = np.zeros(Xp.shape[0])
    mask[:N] = 1.0
    args = (shard_rows(mesh, Xp), shard_rows(mesh, yp),
            shard_rows(mesh, mask))
    nlml = dist_iterative_nlml(kern, mesh, model.bias, model.fixed_scales,
                               N, CFG)
    vag = jax.jit(jax.value_and_grad(nlml))
    v0, g0 = vag(model.theta, *args)
    assert np.isfinite(float(v0)) and np.isfinite(np.asarray(g0)).all()

    # N divides the mesh here, so the distributed estimator is probe-for-
    # probe the single-chip iterative one: values must match exactly
    from gpc_tpu import ndlutil
    from gpc_tpu import priors as priors_mod
    codes = kern.transform_codes()
    kp0 = tr.apply_atox(codes, jnp.asarray(model.theta))
    m0 = (jnp.asarray(yp[:N]) - model.bias[None, :]) / model.fixed_scales
    ld_s, quad_s = kern_evidence_iterative(kern, kp0, jnp.asarray(X),
                                           m0, cfg=CFG)
    v_single = float(0.5 * (quad_s + 1 * ld_s)
                     - priors_mod.total_log_prob(kern.priors_global, kp0)
                     + N * ndlutil.HALFLOGTWOPI)
    np.testing.assert_allclose(float(v0), v_single, rtol=1e-8)

    res = scg(lambda th: vag(th, *args), model.theta, max_iters=15)
    assert float(res.obj) < float(v0)


def test_dist_preconditioned_matches_single_chip():
    """precond_rank > 0: the distributed PCG (masked pivoted-Cholesky/
    Woodbury preconditioner built on the gathered X) reproduces the
    single-chip preconditioned engine on divisible N, and converges on a
    hard conditioning (small white) where the same-budget plain CG has
    visibly larger residual error vs the exact dense solve."""
    N = 64
    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.standard_normal((N, 2)))
    m = jnp.asarray(rng.standard_normal((N, 1)))
    kern = _kern(2)
    p = jnp.asarray(np.array([0.4, 1.0, 0.2, 1e-4]))   # tiny white: hard CG
    cfgp = IterConfig(block=32, probes=8, lanczos_iters=24, cg_iters=25,
                      precond_rank=24, trace_probes=8, seed=0)
    cfg0 = IterConfig(block=32, probes=8, lanczos_iters=24, cg_iters=25,
                      precond_rank=0, trace_probes=8, seed=0)
    mesh = data_mesh()
    mask = jnp.ones((N,))
    args = (shard_rows(mesh, np.asarray(X)), shard_rows(mesh, np.asarray(m)),
            shard_rows(mesh, np.asarray(mask)))
    evp = make_dist_iterative_evidence(kern, mesh, cfgp)
    _, quad_p = evp(p, *args)
    _, quad_s = kern_evidence_iterative(kern, p, X, m, cfg=cfgp)
    np.testing.assert_allclose(float(quad_p), float(quad_s), rtol=1e-8)

    ev0 = make_dist_iterative_evidence(kern, mesh, cfg0)
    _, quad_0 = ev0(p, *args)
    K = np.asarray(kern.gram(p, X))
    quad_exact = float((np.asarray(m) * np.linalg.solve(K, np.asarray(m))).sum())
    err_p = abs(float(quad_p) - quad_exact) / abs(quad_exact)
    err_0 = abs(float(quad_0) - quad_exact) / abs(quad_exact)
    assert err_p < 1e-6, (err_p, err_0)
    assert err_p < err_0 * 0.1, (err_p, err_0)   # ≥10× better at equal iters
