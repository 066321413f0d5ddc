"""Slow end-to-end acceptance tests against reference canonical outputs.

These run multi-minute IVM trainings; enable with GPC_TPU_RUN_SLOW=1.
Observed results (2026-08-17, seed 2):
  * ard_gaussian_clusters `-a 100 -k rbf -i 1`: inputScales [4.85e-07, 0.9348]
    vs reference ≈[5.9e-08, 0.935] (README.md:293-310) — dimension pruned.
  * semisupercrescent `-a 100 -k rbf` (NCNM auto-upgrade): gamma = 0.9075 vs
    reference ≈0.9075 (README.md:335-351) — exact to 4 decimals.
"""

import os

import numpy as np
import pytest

slow = pytest.mark.skipif(os.environ.get("GPC_TPU_RUN_SLOW") != "1",
                          reason="set GPC_TPU_RUN_SLOW=1 to run")


@slow
def test_ard_input_selection():
    from gpc_tpu import kernels as K, noise as NZ
    from gpc_tpu.io.svml import read_svml
    from gpc_tpu.models.ivm import IVM

    X, y = read_svml("/root/reference/examples/ard_gaussian_clusters.svml")
    kern = K.Cmpnd(input_dim=X.shape[1], components=(
        K.Rbfard(input_dim=X.shape[1]), K.Bias(input_dim=X.shape[1]),
        K.White(input_dim=X.shape[1])))
    model = IVM(kern, NZ.ProbitNoise(output_dim=1), X, y, num_active=100, seed=2)
    model.optimise(ext_iters=4, kern_iters=100, noise_iters=20)
    kp = np.asarray(model.kern_params)
    scales = sorted(kp[2:4])
    assert scales[0] < 1e-4, kp          # pruned dimension
    assert abs(scales[1] - 0.935) < 0.05, kp


@slow
def test_ncnm_semisupervised_gamma():
    from gpc_tpu import kernels as K, noise as NZ, priors as pr
    from gpc_tpu.io.svml import read_svml
    from gpc_tpu.models.ivm import IVM

    X, y = read_svml("/root/reference/examples/semisupercrescent.svml")
    g = pr.gamma(1.0, 1.0)
    kern = K.Cmpnd(input_dim=2, components=(
        K.Rbf(input_dim=2).with_priors([pr.gamma(1.0, 1.0, index=1)]),
        K.Bias(input_dim=2).with_priors([g]),
        K.White(input_dim=2).with_priors([g])))
    model = IVM(kern, NZ.NcnmNoise(output_dim=1), X, y, num_active=100, seed=2)
    model.optimise(ext_iters=4, kern_iters=100, noise_iters=20)
    gamma = float(model.noise_params[1])
    assert abs(gamma - 0.9075) < 0.01, gamma
