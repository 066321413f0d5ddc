"""Multi-host process-group entry + host-sharded data loading.

The reference has no distributed backend of any kind (SURVEY.md §2.15); this
module supplies the multi-HOST half of the rebuild's communication stack (the
multi-chip half is parallel/mesh.py + the shard_map kernels):

* `initialize_from_env()` — `jax.distributed.initialize` driven by env vars,
  so the same CLI invocation works on every host of a pod slice:
      GPC_TPU_COORDINATOR=host0:8476 GPC_TPU_NUM_PROCS=4 GPC_TPU_PROC_ID=$i
  (or the cloud-TPU auto-detection path when none are set).
* `load_svml_sharded(path, mesh)` — each process parses ONLY its own row
  slice of an SVM-light file and contributes it to a single global row-sharded
  `jax.Array` via `make_array_from_process_local_data`; no host ever
  materializes the full dataset.

Verified by tests/test_multihost.py, which spawns two real OS processes with a
localhost coordinator and checks the sharded NLML against single-process.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gpc_tpu.parallel.mesh import DATA_AXIS, data_mesh

_INITIALIZED = False


def initialize_from_env() -> bool:
    """Start the jax.distributed process group if env vars request it.

    Returns True if a multi-process group is (now) active.  Safe to call
    multiple times and in single-process runs (no-op).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("GPC_TPU_COORDINATOR")
    nproc = os.environ.get("GPC_TPU_NUM_PROCS")
    pid = os.environ.get("GPC_TPU_PROC_ID")
    if coord is None and nproc is None:
        return False  # single-process (or TPU auto-detect handled by caller)
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def process_row_range(n_rows: int, n_devices: int | None = None):
    """Row slice [lo, hi) owned by this process under equal row-block sharding
    of `n_rows` (already padded to a device multiple) over all devices."""
    n_dev = n_devices if n_devices is not None else jax.device_count()
    assert n_rows % n_dev == 0, "pad rows to a device multiple first"
    block = n_rows // n_dev
    local = jax.local_device_count()
    lo = jax.process_index() * local * block
    return lo, lo + local * block


def _parse_svml_lines(lines, input_dim):
    """Parse SVM-light lines (label idx:val ..., 1-based indices, CR-stripped,
    `#` comments — CClctrl.cpp:55-171)."""
    X = np.zeros((len(lines), input_dim))
    y = np.zeros((len(lines), 1))
    for r, ln in enumerate(lines):
        toks = ln.strip().split()
        y[r, 0] = float(toks[0])
        for tok in toks[1:]:
            if tok.startswith("#"):
                break
            i, v = tok.split(":")
            X[r, int(i) - 1] = float(v)
    return X, y


def load_svml_sharded(path, mesh=None):
    """Host-sharded SVM-light load.

    Every process scans the file once for the row count and feature dimension
    (cheap line scan), then PARSES only its own row block.  Returns
    (X_global, y_global, n_valid): global row-sharded jax.Arrays padded to the
    device count, plus the true row count.
    """
    if mesh is None:
        mesh = data_mesh()
    n_dev = int(np.prod(mesh.devices.shape))

    with open(path) as f:
        lines = [ln for ln in f
                 if ln.strip() and not ln.lstrip().startswith("#")]
    n_valid = len(lines)
    input_dim = 0
    for ln in lines:  # dimension scan (two-pass like CClctrl.cpp:55-171)
        for tok in ln.strip().split()[1:]:
            if tok.startswith("#"):
                break
            input_dim = max(input_dim, int(tok.split(":")[0]))

    n_pad = -(-n_valid // n_dev) * n_dev
    lo, hi = process_row_range(n_pad, n_dev)
    local_lines = lines[min(lo, n_valid):min(hi, n_valid)]
    X_l, y_l = _parse_svml_lines(local_lines, input_dim)
    rows_needed = hi - lo
    if X_l.shape[0] < rows_needed:  # tail padding rows live on the last hosts
        extra = rows_needed - X_l.shape[0]
        X_l = np.concatenate([X_l, np.zeros((extra, input_dim))], axis=0)
        y_l = np.concatenate([y_l, np.zeros((extra, 1))], axis=0)

    x_sh = NamedSharding(mesh, P(DATA_AXIS))
    X = jax.make_array_from_process_local_data(x_sh, X_l, (n_pad, input_dim))
    y = jax.make_array_from_process_local_data(x_sh, y_l, (n_pad, 1))
    return X, y, n_valid
