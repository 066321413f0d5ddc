"""Fully distributed FTC evidence + analytic gradient — no N×N object anywhere.

Completes SURVEY.md §7 Phase 6: the dense-GP training path whose Gram matrix,
Cholesky factor, and gradient cotangent are all row-block sharded.  The
`dist_gp.make_dist_objective` FTC path still all_gathers K for a replicated
factorization (O(N²) per-device memory); this module removes that wall:

  sweep 1  distributed Cholesky fused with the forward solve L·v = m and the
           logdet accumulation (parallel.chol_distributed machinery);
  sweep 2  reverse panel sweep for the backward solve Lᵀ·α = v (α = K⁻¹m);
  sweep 3  per-device solves for its own K⁻¹ block columns Z_d = K⁻¹·E_d
           (forward + reverse over the same gathered panels);
  finally  the classic evidence cotangent (CGp::updateCovGradient,
           CGp.cpp:666-679, summed over outputs)
               ∂L/∂K = ½·(α·αᵀ − D·K⁻¹)
           is contracted against each device's MASKED Gram-row construction via
           a local jax.vjp, and the per-device parameter cotangents psum.

Per-device memory O(N·B); total communication O(N²) spread over 3·n_dev panel
gathers (ICI); all O(N³) work is local MXU GEMMs/solves.  Returns the exact
(value, grad) pair the SCG optimizer consumes — gradients match the AD-based
single-chip path to float tolerance (tests/test_dist_ftc.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P

from gpc_tpu import ndlutil
from gpc_tpu import priors as priors_mod
from gpc_tpu.models.gp import GpSpec
from gpc_tpu.parallel.chol_distributed import _local_factor_step
from gpc_tpu.parallel.mesh import DATA_AXIS


def _gather_panel(L_local, j, B):
    """Replicated (N, B) column panel j of the row-sharded factor."""
    zero = jnp.zeros((), jnp.int32)
    my = lax.dynamic_slice(L_local, (zero, jnp.asarray(j, jnp.int32) * B), (B, B))
    return lax.all_gather(my, DATA_AXIS, tiled=True)


def make_dist_ftc_value_and_grad(spec: GpSpec, mesh: Mesh, bias, fixed_scales,
                                 n_valid: int):
    """Returns vag(theta, X, y, mask) → (nlml, dnlml/dtheta), fully sharded."""
    assert spec.approx == "ftc"
    n_dev = len(mesh.devices)
    bias = jnp.asarray(bias)
    fixed_scales = jnp.asarray(fixed_scales)
    N_total, D = spec.n_data, spec.output_dim

    def local(theta, X_l, y_l, mask_l):
        B = X_l.shape[0]
        N = B * n_dev
        d = lax.axis_index(DATA_AXIS)
        zero = jnp.zeros((), jnp.int32)
        rows_g = d * B + jnp.arange(B)  # my global row indices

        X_g = lax.all_gather(X_l, DATA_AXIS, tiled=True)
        mask_g = lax.all_gather(mask_l, DATA_AXIS, tiled=True)

        # --- masked Gram rows as a pure function of theta (for the vjp) -----
        def gram_rows_and_m(theta):
            _, kp, scales, _ = spec.unpack(theta)
            scales_ = scales if spec.learn_scales else fixed_scales
            K_rows = spec.kern.compute(kp, X_l, X_g)
            diag_l = spec.kern.diag(kp, X_l)
            K_rows = K_rows * (mask_l[:, None] * mask_g[None, :])
            idx = jnp.arange(B)
            K_rows = K_rows.at[idx, rows_g].set(jnp.where(mask_l > 0, diag_l, 1.0))
            m_l = (y_l - bias[None, :]) / scales_[None, :] * mask_l[:, None]
            return K_rows, m_l

        (K_rows, m_l), pullback = jax.vjp(gram_rows_and_m, theta)
        m_g = lax.all_gather(m_l, DATA_AXIS, tiled=True)

        # --- sweep 1: factor + logdet + forward solve L v = m ---------------
        def body1(j, carry):
            S, r, logdet = carry
            S, panel = _local_factor_step(j, S, n_dev, B, N)
            j32 = jnp.asarray(j, jnp.int32)
            L_jj = lax.dynamic_slice(panel, (j32 * B, zero), (B, B))
            r_j = lax.dynamic_slice(r, (j32 * B, zero), (B, D))
            v_j = solve_triangular(L_jj, r_j, lower=True)
            below = (jnp.arange(N) >= (j + 1) * B)[:, None]
            r = r - jnp.where(below, panel @ v_j, 0.0)
            r = lax.dynamic_update_slice(r, v_j, (j32 * B, zero))
            logdet = logdet + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_jj)))
            return S, r, logdet

        L_local, v, logdet = lax.fori_loop(
            0, n_dev, body1, (K_rows, m_g, jnp.zeros((), K_rows.dtype)))
        quad = jnp.sum(v * v)

        # --- sweep 2: backward solve Lᵀ α = v (reverse panel order) ---------
        def body2(t, alpha):
            j = n_dev - 1 - t
            j32 = jnp.asarray(j, jnp.int32)
            panel = _gather_panel(L_local, j, B)
            L_jj = lax.dynamic_slice(panel, (j32 * B, zero), (B, B))
            a_j = lax.dynamic_slice(alpha, (j32 * B, zero), (B, D))
            below = (jnp.arange(N) >= (j + 1) * B)[:, None]
            # a_j ← L_jj⁻ᵀ (v_j − Σ_{i>j} L_ijᵀ α_i)
            rhs = a_j - panel.T @ jnp.where(below, alpha, 0.0)
            a_j = solve_triangular(L_jj.T, rhs, lower=False)
            return lax.dynamic_update_slice(alpha, a_j, (j32 * B, zero))

        alpha = lax.fori_loop(0, n_dev, body2, v)      # replicated (N, D)

        # --- sweeps 3+4: Z = K⁻¹ columns for MY indices (N, B local) --------
        # forward: L U = E_d  (unit columns at my global rows)
        U0 = jnp.zeros((N, B), K_rows.dtype).at[rows_g, jnp.arange(B)].set(1.0)

        def body3(j, U):
            j32 = jnp.asarray(j, jnp.int32)
            panel = _gather_panel(L_local, j, B)
            L_jj = lax.dynamic_slice(panel, (j32 * B, zero), (B, B))
            u_j = solve_triangular(
                L_jj, lax.dynamic_slice(U, (j32 * B, zero), (B, B)), lower=True)
            below = (jnp.arange(N) >= (j + 1) * B)[:, None]
            U = U - jnp.where(below, panel @ u_j, 0.0)
            return lax.dynamic_update_slice(U, u_j, (j32 * B, zero))

        U = lax.fori_loop(0, n_dev, body3, U0)

        def body4(t, Z):
            j = n_dev - 1 - t
            j32 = jnp.asarray(j, jnp.int32)
            panel = _gather_panel(L_local, j, B)
            L_jj = lax.dynamic_slice(panel, (j32 * B, zero), (B, B))
            z_j = lax.dynamic_slice(Z, (j32 * B, zero), (B, B))
            below = (jnp.arange(N) >= (j + 1) * B)[:, None]
            rhs = z_j - panel.T @ jnp.where(below, Z, 0.0)
            z_j = solve_triangular(L_jj.T, rhs, lower=False)
            return lax.dynamic_update_slice(Z, z_j, (j32 * B, zero))

        Z = lax.fori_loop(0, n_dev, body4, U)          # (N, B) = K⁻¹ E_d

        # --- evidence cotangent and parameter gradient ----------------------
        # L = −½(quad + D·logdet) (+scale terms +priors −ND/2·log2π)
        # ∂L/∂K rows (mine) = ½(α_mine·αᵀ − D·Zᵀ); ∂L/∂m = −α  (quad term)
        alpha_l = lax.dynamic_slice(alpha, (d * B, zero), (B, D))
        Kbar_rows = 0.5 * (alpha_l @ alpha.T - D * Z.T)
        mbar_l = -alpha_l
        (g_local,) = pullback((Kbar_rows, mbar_l))
        g = lax.psum(g_local, DATA_AXIS)

        # replicated scalar terms (scales/priors) via plain grad
        def scalar_terms(theta):
            _, kp, scales, _ = spec.unpack(theta)
            scales_ = scales if spec.learn_scales else fixed_scales
            t = priors_mod.total_log_prob(spec.kern.priors_global, kp)
            if spec.learn_scales:
                t = t - jnp.sum(jnp.log(jnp.abs(scales_)))
            return t

        sval, sgrad = jax.value_and_grad(scalar_terms)(theta)

        L_val = (-0.5 * (quad + D * logdet) + sval
                 - D * N_total * ndlutil.HALFLOGTWOPI)
        return -L_val, -(g + sgrad)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(), P()), check_vma=False)


def make_dist_ftc_posterior(spec: GpSpec, mesh: Mesh, bias, fixed_scales,
                            n_valid: int):
    """Distributed FTC prediction: (mu, var) at T test points, K row-sharded.

    alpha = K⁻¹m from the forward+backward panel sweeps; the predictive
    variance's L⁻¹k* runs a third forward sweep with the T test columns as
    right-hand sides.  Returns posterior(theta, X, y, mask, Xtest) with
    replicated (T, D) outputs — the distributed CGp::posteriorMeanVar.
    """
    assert spec.approx == "ftc"
    n_dev = len(mesh.devices)
    bias = jnp.asarray(bias)
    fixed_scales = jnp.asarray(fixed_scales)
    D = spec.output_dim

    def local(theta, X_l, y_l, mask_l, Xtest):
        B = X_l.shape[0]
        N = B * n_dev
        d = lax.axis_index(DATA_AXIS)
        zero = jnp.zeros((), jnp.int32)
        rows_g = d * B + jnp.arange(B)
        T = Xtest.shape[0]

        X_g = lax.all_gather(X_l, DATA_AXIS, tiled=True)
        mask_g = lax.all_gather(mask_l, DATA_AXIS, tiled=True)
        _, kp, scales, _ = spec.unpack(theta)
        scales_ = scales if spec.learn_scales else fixed_scales

        K_rows = spec.kern.compute(kp, X_l, X_g)
        diag_l = spec.kern.diag(kp, X_l)
        K_rows = K_rows * (mask_l[:, None] * mask_g[None, :])
        idx = jnp.arange(B)
        K_rows = K_rows.at[idx, rows_g].set(jnp.where(mask_l > 0, diag_l, 1.0))
        m_l = (y_l - bias[None, :]) / scales_[None, :] * mask_l[:, None]
        m_g = lax.all_gather(m_l, DATA_AXIS, tiled=True)

        # test cross-columns for ALL training rows (replicated; T assumed modest)
        kX_l = spec.kern.compute(kp, X_l, Xtest) * mask_l[:, None]   # (B, T)
        kX = lax.all_gather(kX_l, DATA_AXIS, tiled=True)             # (N, T)

        # sweep 1: factor + forward-solve [m | kX] together
        R0 = jnp.concatenate([m_g, kX], axis=1)                      # (N, D+T)

        def body1(j, carry):
            S, r = carry
            S, panel = _local_factor_step(j, S, n_dev, B, N)
            j32 = jnp.asarray(j, jnp.int32)
            L_jj = lax.dynamic_slice(panel, (j32 * B, zero), (B, B))
            r_j = lax.dynamic_slice(r, (j32 * B, zero), (B, R0.shape[1]))
            v_j = solve_triangular(L_jj, r_j, lower=True)
            below = (jnp.arange(N) >= (j + 1) * B)[:, None]
            r = r - jnp.where(below, panel @ v_j, 0.0)
            r = lax.dynamic_update_slice(r, v_j, (j32 * B, zero))
            return S, r

        L_local, V = lax.fori_loop(0, n_dev, body1, (K_rows, R0))
        v_m = V[:, :D]            # L⁻¹m
        v_k = V[:, D:]            # L⁻¹k*

        # sweep 2: backward solve for alpha = L⁻ᵀ (L⁻¹ m)
        def body2(t, alpha):
            j = n_dev - 1 - t
            j32 = jnp.asarray(j, jnp.int32)
            panel = _gather_panel(L_local, j, B)
            L_jj = lax.dynamic_slice(panel, (j32 * B, zero), (B, B))
            a_j = lax.dynamic_slice(alpha, (j32 * B, zero), (B, D))
            below = (jnp.arange(N) >= (j + 1) * B)[:, None]
            rhs = a_j - panel.T @ jnp.where(below, alpha, 0.0)
            a_j = solve_triangular(L_jj.T, rhs, lower=False)
            return lax.dynamic_update_slice(alpha, a_j, (j32 * B, zero))

        alpha = lax.fori_loop(0, n_dev, body2, v_m)

        mu0 = kX.T @ alpha                                           # (T, D)
        kstar = spec.kern.diag(kp, Xtest)
        var0 = kstar - jnp.sum(v_k * v_k, axis=0)                    # (T,)
        mu = mu0 * scales_[None, :] + bias[None, :]
        var = var0[:, None] * (scales_ ** 2)[None, :]
        return mu, var

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS), P()),
        out_specs=(P(), P()), check_vma=False)
