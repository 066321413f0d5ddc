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

from gpc_tpu import ndlutil, transforms, priors, linalg  # noqa: F401
