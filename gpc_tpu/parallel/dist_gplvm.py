"""Distributed GP-LVM training step — latent rows sharded with the evidence.

The reference GP-LVM is explicitly capped at ~1k points (no sparsification in
the C++ GP-LVM, /root/reference/README.md:412-414).  This module removes the
wall the TPU way: the latent coordinates live in the replicated θ vector
(CGplvm's own layout, CGplvm.cpp:257-330), each device builds the Gram ROWS
for its slice of latent points, and the row-sharded evidence runs through
`parallel.chol_distributed.evidence_distributed`, whose custom VJP returns
the row-sharded cotangent — so one `jax.value_and_grad` yields ∂NLML/∂θ
including all N·q latent gradients, with no N×N object on any device.

Plain GP-LVM only (no dynamics / back constraints — those stay on the
single-chip path, which itself scales to N=16k via the lazy fused evidence in
models/gplvm.log_likelihood).  N must divide the device count (pad data AND
latent init together if needed).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gpc_tpu import ndlutil
from gpc_tpu import priors as priors_mod
from gpc_tpu.models.gplvm import GplvmSpec
from gpc_tpu.parallel.chol_distributed import evidence_distributed
from gpc_tpu.parallel.mesh import DATA_AXIS


def make_dist_gplvm_value_and_grad(spec: GplvmSpec, mesh: Mesh, noise_bias,
                                   fixed_scales):
    """Returns vag(theta, y_sharded) → (nlml, dnlml/dθ) — the distributed
    CGplvm::logLikelihood(Gradient) (CGplvm.cpp:493-716) for plain GP-LVM."""
    assert not spec.has_dynamics and not spec.back_constrained, (
        "distributed GP-LVM covers the plain model; dynamics/back constraints "
        "stay single-chip")
    n_dev = len(mesh.devices)
    N, D, q = spec.n_data, spec.data_dim, spec.latent_dim
    assert N % n_dev == 0, "n_data must divide the device count"
    B = N // n_dev
    noise_bias = jnp.asarray(noise_bias)
    fixed_scales = jnp.asarray(fixed_scales)

    def build_local(theta, y_l):
        kp, _, Xvals, scales = spec.unpack(theta)
        scales_ = scales if spec.learn_scales else fixed_scales
        d = lax.axis_index(DATA_AXIS)
        X_l = lax.dynamic_slice(Xvals, (d * B, jnp.zeros((), jnp.int32)),
                                (B, q))
        K_rows = spec.kern.compute(kp, X_l, Xvals)
        # gram() diagonal discipline: diag(p, X) overwrites the compute diag
        rows_g = d * B + jnp.arange(B)
        own = jnp.arange(N)[None, :] == rows_g[:, None]
        K_rows = jnp.where(own, spec.kern.diag(kp, X_l)[:, None], K_rows)
        m_l = (y_l - noise_bias[None, :]) / scales_[None, :]
        return K_rows, m_l

    build = jax.shard_map(
        build_local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)), check_vma=False)

    def nlml(theta, y):
        K_rows, m_rows = build(theta, y)
        logdet, quad = evidence_distributed(mesh, K_rows, m_rows)
        kp, _, Xvals, scales = spec.unpack(theta)
        scales_ = scales if spec.learn_scales else fixed_scales
        Lacc = quad + D * logdet
        if spec.latent_regularised:
            Lacc = Lacc + jnp.sum(Xvals * Xvals)
        if spec.learn_scales:
            Lacc = Lacc + 2.0 * jnp.sum(jnp.log(jnp.abs(scales_)))
        L = -0.5 * Lacc
        L = L + priors_mod.total_log_prob(spec.kern.priors_global, kp)
        L = L - D * N * ndlutil.HALFLOGTWOPI
        return -L

    return jax.value_and_grad(nlml)


def dryrun(mesh: Mesh, n_devices: int) -> None:
    """One distributed GP-LVM value+grad on tiny shapes, checked against the
    single-chip objective (used by __graft_entry__.dryrun_multichip)."""
    from gpc_tpu import kernels as K
    from gpc_tpu.models.gplvm import GPLVM, log_likelihood

    N, D, q = 8 * n_devices, 3, 2
    rng = np.random.default_rng(4)
    y = rng.standard_normal((N, D))
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    model = GPLVM(kern, y, latent_dim=q)

    vag = jax.jit(make_dist_gplvm_value_and_grad(
        model.spec, mesh, model.noise_bias, model.fixed_scales))
    ys = jax.device_put(
        jnp.asarray(y), jax.sharding.NamedSharding(mesh, P(DATA_AXIS, None)))
    val, grad = vag(model.theta, ys)
    want = -float(log_likelihood(model.spec, model.theta, y,
                                 model.noise_bias, model.fixed_scales))
    assert abs(float(val) - want) / max(abs(want), 1.0) < 1e-4, (
        float(val), want)
    g_single = np.asarray(jax.grad(lambda t: -log_likelihood(
        model.spec, t, y, model.noise_bias, model.fixed_scales))(model.theta))
    # atol covers f32 reduction-order noise on near-zero latent gradients
    np.testing.assert_allclose(np.asarray(grad), g_single,
                               rtol=2e-4, atol=5e-5)
    print(f"dryrun_multichip({n_devices}): OK — distributed GP-LVM value+grad "
          f"{float(val):.6f} matches single-chip {want:.6f}")
