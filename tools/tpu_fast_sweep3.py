"""TPU accuracy+speed check of the bf16 evidence at a bench-realistic ridge.

At noise=1e-2 the bench kernel's κ≈100 makes 1-pass bf16 Schur updates
marginal (κ·ε_bf16 ≈ 0.4 — NaN factor observed); at noise=1e-1 (κ≈11, an
ordinary SNR-10 GP regression setting) bf16 is comfortably inside its
stability region.  This sweep validates value-vs-f32HIGH agreement and times
the candidate bench policies at the new ridge.
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


def main():
    N, q, D = 16384, 8, 1
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), dtype)
    m = jnp.asarray(rng.standard_normal((N, D)), dtype)
    iw = jnp.asarray(1.0, dtype)
    var = jnp.asarray(1.0, dtype)

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

    def run(name, pol, noise):
        nz = jnp.asarray(noise, dtype)

        @jax.jit
        def f(X, m):
            kfn = rbf_block_fn(X, iw, var, nz)
            ld, quad = evidence_left_fast(kfn, N, m, pol)
            return jnp.stack([ld, quad])
        out = np.asarray(f(X, m))
        t = timeit(f, X, m)
        tf = flops / t / 1e12
        print(f"{name:30s} noise={noise:4.2f}  {t*1e3:6.1f} ms  {tf:5.1f} TF/s"
              f"  {tf/roof:5.1%}  ld={out[0]:.2f} quad={out[1]:.2f}",
              flush=True)
        return out

    noise = 0.1
    ref = run("f32H  b256 noinv stack", Policy(256, False, False, True), noise)
    for name, pol in [
        ("bf16  b256 noinv stack", Policy(256, True, False, True)),
        ("bf16  b256 xlainv stack", Policy(256, True, "xla", True)),
        ("bf16  b256 pallasinv stack", Policy(256, True, "pallas", True)),
        ("bf16  b512 noinv stack", Policy(512, True, False, True)),
        ("bf16  b512 xlainv stack", Policy(512, True, "xla", True)),
    ]:
        got = run(name, pol, noise)
        rel = np.abs(got - ref) / np.abs(ref)
        print(f"    rel err vs f32H: logdet {rel[0]:.2e}  quad {rel[1]:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
