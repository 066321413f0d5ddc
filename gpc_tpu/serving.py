"""Batch prediction server: factor once, serve chunks at MXU speed.

The reference recomputes its posterior state lazily behind dirty flags and
serves one request at a time through LAPACK (CGp::posteriorMeanVar +
updateAlpha, /root/reference/CGp.cpp:469-663).  For production serving the
TPU-native decomposition is explicit:

  factor (once)  — K's Cholesky, α = K⁻¹m, and (on TPU) the blocked
                   explicit L⁻¹, so every per-batch variance solve is a
                   pure MXU GEMM (measured AT the session matmul roofline:
                   177 TF/s on the 2·N²·T solve-GEMMs, 18 M mean-only
                   predictions/s at N=16k — BASELINE.md round 3);
  serve (per batch) — one jitted program per fixed chunk shape: cross-Gram
                   tiles + GEMMs; ragged tails are padded to the chunk so
                   ONE compiled executable serves any request size.

Sparse approximations (DTC/DTCVAR/FITC/PITC) hold (L_uu, L_m, u) — their
per-batch work is M-sized triangular solves, already cheap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu.models.gp import GP, posterior_apply, posterior_state


class GPServer:
    """One-time-factored predictor for a trained `models.gp.GP`.

    `chunk` fixes the compiled batch shape; `explicit_inverse` (default: on
    for TPU backends, off for CPU/f64 parity) stores L⁻¹ at factor time.
    `predict` matches `GP.predict` to numerical precision (pinned in
    tests/test_serving.py) for any request size, including ragged tails.
    """

    def __init__(self, model: GP, chunk: int = 8192,
                 explicit_inverse: Optional[bool] = None, mesh=None):
        self.spec = model.spec
        self.chunk = int(chunk)
        if explicit_inverse is None:
            explicit_inverse = (self.spec.approx == "ftc"
                                and jax.default_backend() != "cpu")
        X_u_fixed = getattr(model, "X_u_fixed", None)

        # multi-chip serving: prediction is embarrassingly parallel over the
        # batch dim — shard each chunk's rows over the mesh and let GSPMD
        # partition the cross-Gram + GEMMs (state replicated; collectives
        # are nothing but the final per-row outputs staying local)
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from gpc_tpu.parallel.mesh import DATA_AXIS
            assert self.chunk % len(mesh.devices) == 0, (
                "chunk must be a multiple of the device count")
            self._sharding = NamedSharding(mesh, P(DATA_AXIS, None))

        state_fn = jax.jit(lambda theta, X, y: posterior_state(
            self.spec, theta, X, y, model.bias, model.fixed_scales,
            X_u_fixed=X_u_fixed, explicit_inverse=explicit_inverse))
        self.state = state_fn(model.theta, jnp.asarray(model.X),
                              jnp.asarray(model.y))
        self._apply = jax.jit(lambda st, Xt: posterior_apply(
            self.spec, st, Xt))

    def predict(self, Xtest):
        """(mu, varsigma) for any number of test rows — served in fixed-size
        chunks against the precomputed state (one compiled program)."""
        Xtest = np.asarray(Xtest)
        T = Xtest.shape[0]
        if T == 0:  # match GP.predict's (0, D) output on empty requests
            D = int(np.asarray(self.state["scales"]).shape[0])
            return np.zeros((0, D)), np.zeros((0, D))
        ch = self.chunk
        mus, vars_ = [], []
        for c0 in range(0, T, ch):
            Xb = Xtest[c0:c0 + ch]
            pad = ch - Xb.shape[0]
            if pad and (T > ch or self._sharding is not None):
                # keep ONE compiled shape (and even shards): pad the tail
                Xb = np.concatenate(
                    [Xb, np.zeros((pad, Xb.shape[1]), Xb.dtype)], axis=0)
            else:
                pad = 0
            Xj = jnp.asarray(Xb)
            if self._sharding is not None:
                Xj = jax.device_put(Xj, self._sharding)
            mu, var = self._apply(self.state, Xj)
            if pad:
                mu, var = mu[:-pad], var[:-pad]
            mus.append(np.asarray(mu))
            vars_.append(np.asarray(var))
        return np.concatenate(mus, axis=0), np.concatenate(vars_, axis=0)
