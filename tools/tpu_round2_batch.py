"""One-process TPU batch: leaf-width sweep (b512/b1024) + N=16k GP-LVM step.

Bundled so the congested shared pool is claimed once.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu.ops.evidence_fast import evidence_left_fast, Policy
from gpc_tpu.ops.lazy_evidence import rbf_block_fn


def sync(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, reps=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    return (time.perf_counter() - t0) / reps


def sweep():
    N, q, D = 16384, 8, 1
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), dtype)
    m = jnp.asarray(rng.standard_normal((N, D)), dtype)
    iw = jnp.asarray(1.0, dtype)
    var = jnp.asarray(1.0, dtype)
    nz = jnp.asarray(0.1, dtype)

    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t_mm = timeit(mm, A1, A2, reps=10)
    roof = 2 * B ** 3 / t_mm / 1e12
    print(f"matmul roofline proxy: {roof:.1f} TFLOP/s", flush=True)
    flops = 2.0 * N * N * q + N ** 3 / 3.0 + 2.0 * N * N * D

    for name, pol in [
        ("bf16 b512  xlainv stack", Policy(512, True, "xla", True)),
        ("bf16 b1024 xlainv stack", Policy(1024, True, "xla", True)),
        ("bf16 b1024 noinv stack", Policy(1024, True, False, True)),
    ]:
        @jax.jit
        def f(X, m, pol=pol):
            kfn = rbf_block_fn(X, iw, var, nz)
            ld, quad = evidence_left_fast(kfn, N, m, pol)
            return ld + quad
        t = timeit(f, X, m)
        tf = flops / t / 1e12
        print(f"{name:28s} {t*1e3:6.1f} ms  {tf:5.1f} TF/s  {tf/roof:5.1%}",
              flush=True)


def gplvm16k():
    import tools.tpu_gplvm16k as g
    g.main()


if __name__ == "__main__":
    sweep()
    print("--- gplvm 16k ---", flush=True)
    gplvm16k()
