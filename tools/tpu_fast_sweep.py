"""TPU sweep of evidence_fast policies at N=16k vs the matmul roofline.

Within-session comparison only (the shared TPU pool's absolute throughput
varies run-to-run); every number here is relative to the same-session roofline
proxy.  Run on the real chip:  python tools/tpu_fast_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpc_tpu.ops.evidence_fast import evidence_left_fast, Policy
from gpc_tpu.ops.lazy_evidence import evidence_fused_left, rbf_block_fn


def sync(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, reps=5):
    sync(fn(*args))  # compile + warm
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
    noise = jnp.asarray(1e-2, dtype)

    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t_mm = timeit(mm, A1, A2, reps=10)
    roof = 2 * B ** 3 / t_mm / 1e12
    print(f"matmul roofline proxy: {roof:.1f} TFLOP/s ({t_mm*1e3:.2f} ms)",
          flush=True)

    flops = 2.0 * N * N * q + N ** 3 / 3.0 + 2.0 * N * N * D

    def bench_pol(name, pol):
        @jax.jit
        def f(X, m):
            kfn = rbf_block_fn(X, iw, var, noise)
            ld, quad = evidence_left_fast(kfn, N, m, pol)
            return ld + quad
        t0 = time.perf_counter()
        val = sync(f(X, m))  # compile
        t_compile = time.perf_counter() - t0
        t = timeit(f, X, m)
        tf = flops / t / 1e12
        print(f"{name:34s} {t*1e3:7.1f} ms  {tf:6.1f} TF/s  "
              f"{tf/roof:5.1%} of roof  val={val:.3f}  "
              f"(compile {t_compile:.0f}s)", flush=True)
        return t

    # round-1 pipeline for within-session reference
    @jax.jit
    def r1(X, m):
        kfn = rbf_block_fn(X, iw, var, noise)
        ld, quad, _L = evidence_fused_left(kfn, N, m)
        return ld + quad
    t = timeit(r1, X, m)
    print(f"{'r1 evidence_fused_left (HIGH)':34s} {t*1e3:7.1f} ms  "
          f"{flops/t/1e12:6.1f} TF/s  {flops/t/1e12/roof:5.1%} of roof",
          flush=True)

    bench_pol("b256 f32H inv+stack", Policy(256, False, True, True))
    bench_pol("b256 bf16 inv+stack", Policy(256, True, True, True))
    bench_pol("b256 bf16 inv nostack", Policy(256, True, True, False))
    bench_pol("b256 bf16 noinv stack", Policy(256, True, False, True))
    bench_pol("b512 bf16 inv+stack", Policy(512, True, True, True))
    bench_pol("b512 bf16 noinv stack", Policy(512, True, False, True))


if __name__ == "__main__":
    main()
