"""Worker process for tests/test_multihost.py.

Joins a localhost jax.distributed group (2 processes x 4 virtual CPU devices),
loads its shard of an SVM-light file, evaluates the distributed FTC NLML over
the global 8-device mesh, and prints it for the parent to compare.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.environ["GPC_TPU_REPO"])

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gpc_tpu import kernels as K  # noqa: E402
from gpc_tpu.models.gp import GpSpec  # noqa: E402
from gpc_tpu.parallel.mesh import DATA_AXIS, data_mesh  # noqa: E402
from gpc_tpu.parallel.dist_gp import make_dist_objective  # noqa: E402
from gpc_tpu.parallel import multihost  # noqa: E402


def main():
    active = multihost.initialize_from_env()
    assert active, "expected a multi-process group"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    path = os.environ["GPC_TPU_DATA"]
    mesh = data_mesh()
    X, y, n_valid = multihost.load_svml_sharded(path, mesh)

    n_pad = X.shape[0]
    lo, hi = multihost.process_row_range(n_pad)
    mask_l = (np.arange(lo, hi) < n_valid).astype(np.float64)
    mask = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), mask_l, (n_pad,))

    q = X.shape[1]
    kern = K.Cmpnd(input_dim=q, components=(
        K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
    spec = GpSpec(kern=kern, n_data=n_valid, input_dim=q, output_dim=1,
                  approx="ftc", num_active=0, learn_scales=False,
                  inducing_fixed=False)
    theta = spec.pack(kern.default_params())
    nlml = make_dist_objective(spec, mesh, np.zeros(1), np.ones(1), n_valid)
    val = jax.jit(nlml)(theta, X, y, mask)
    # fetch forces execution on every process; only proc 0 reports
    v = float(val)
    if jax.process_index() == 0:
        print(f"NLML={v:.12f}", flush=True)


if __name__ == "__main__":
    main()
