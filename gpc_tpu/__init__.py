"""gpc_tpu — a TPU-native Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
SheffieldML/GPc C++ toolkit (reference mounted at /root/reference): compositional
covariance functions, Gaussian/probit/ordered/NCNM likelihoods, full and sparse GP
regression (FTC/DTC/DTCVAR/FITC), GP-LVM / GPDM latent-variable models, the IVM
active-set classifier, and a Scaled Conjugate Gradient trainer — all expressed as
pure, jit-compiled, differentiable functions sharded over TPU meshes.

Unlike the reference (single-threaded C++ on BLAS/LAPACK, hand-derived gradients),
gpc_tpu computes the negative log marginal likelihood as one differentiable graph:
Gram matrices are built by fused tiles on the MXU, Cholesky factorizations stay
on-device, and hyperparameter gradients come from `jax.grad`.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU f32 matmuls lower to single-pass bf16 under XLA's DEFAULT precision —
# ~4e-3 relative error, which breaks positive-definiteness in Cholesky-heavy
# GP algebra (trailing Schur updates drift past the noise ridge at N≳10k and
# the factor goes NaN).  A GP library must default to numerically trustworthy
# GEMMs: "high" (bf16_3x, ≈f32 quality at ~3 MXU passes).  Opt back into raw
# speed per-op (explicit bf16 casts, GPC_TPU_BF16_CHOL) or globally via env.
_prec = _os.environ.get("GPC_TPU_MATMUL_PRECISION", "high")
if _prec != "unset":
    _jax.config.update("jax_default_matmul_precision", _prec)

from gpc_tpu import ndlutil, transforms, priors, linalg  # noqa: F401
