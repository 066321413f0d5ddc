"""Weak-scaling measurement harness for the distributed GP evidence.

BASELINE.json target: ≥70% weak-scaling efficiency at 2+ hosts.  This harness
measures time-per-evidence-evaluation for the sharded DTC objective with
N proportional to device count (weak scaling: constant per-device rows).
On a real pod slice run it under `jax.distributed`; on a single host it uses
however many devices the backend exposes (virtual CPU devices in tests), which
exercises the identical pjit/shard_map program and collectives.

Run: python -m gpc_tpu.parallel.scaling_bench [rows_per_device] [num_active]
Prints one JSON line per device count: {devices, n, t_ms, efficiency}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu import kernels as K
from gpc_tpu.models.gp import GP
from gpc_tpu.parallel.mesh import data_mesh, pad_rows, shard_rows
from gpc_tpu.parallel.dist_gp import make_dist_objective


def _sync(x):
    return float(jnp.ravel(x)[0])


def run(rows_per_device: int = 2048, num_active: int = 256, q: int = 8,
        device_counts=None):
    all_devs = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= all_devs]
    rng = np.random.default_rng(0)
    results = []
    t1 = None
    for nd in device_counts:
        N = rows_per_device * nd
        X = rng.standard_normal((N, q))
        y = np.sin(X[:, :1])
        kern = K.Cmpnd(input_dim=q, components=(
            K.Rbf(input_dim=q), K.Bias(input_dim=q), K.White(input_dim=q)))
        model = GP(kern, X, y, approx="dtc", num_active=num_active,
                   centre=True, seed=0)
        mesh = data_mesh(nd)
        Xp, _ = pad_rows(X, nd)
        yp, _ = pad_rows(y, nd)
        mask = np.ones(Xp.shape[0])
        mask[N:] = 0.0
        Xs, ys, ms = (shard_rows(mesh, a) for a in (Xp, yp, mask))
        nlml = jax.jit(jax.value_and_grad(make_dist_objective(
            model.spec, mesh, model.bias, model.fixed_scales, N)))
        v, g = nlml(model.theta, Xs, ys, ms)
        _sync(v)  # compile + warm
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            v, g = nlml(model.theta, Xs, ys, ms)
        _sync(v)
        _sync(g)
        t = (time.perf_counter() - t0) / reps
        if t1 is None:
            t1 = t
        eff = t1 / t  # weak scaling: ideal is equal time per step
        results.append(dict(devices=nd, n=N, t_ms=round(t * 1e3, 2),
                            efficiency=round(eff, 4)))
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    rpd = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    na = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    run(rpd, na)
