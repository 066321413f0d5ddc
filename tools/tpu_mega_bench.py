"""TPU A/B: Pallas mega-kernel evidence vs the XLA-orchestrated pipeline.

Timing discipline (2026-08-21 discovery): on the axon remote backend the
value-fetch sync costs a ~RTT round trip that can exceed 20 ms on congested
pool sessions — EVERY naive per-op timing is inflated by RTT/reps.  This
tool measures RTT explicitly and amortizes (many reps inside one jit, one
sync), reporting RTT-corrected numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.expanduser("~"), ".cache", "gpc_tpu", "xla")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import jax.numpy as jnp
from jax import lax

from gpc_tpu.ops.evidence_fast import Policy, evidence_left_fast
from gpc_tpu.ops.lazy_evidence import rbf_block_fn
from chol_mega_v2 import evidence_mega_rbf


def sync(x):
    return float(jnp.ravel(x)[0])


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    N, q, D = 16384, 8, 1
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), dtype)
    m = jnp.asarray(rng.standard_normal((N, D)), dtype)
    iw = jnp.asarray(1.0, dtype)
    var = jnp.asarray(1.0, dtype)
    nz = jnp.asarray(0.1, dtype)
    flops = 2.0 * N * N * q + N ** 3 / 3.0 + 2.0 * N * N * D

    # --- RTT ---------------------------------------------------------------
    one = jnp.ones((1,), dtype)

    @jax.jit
    def triv(a):
        return a + 1.0
    sync(triv(one))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(triv(one))
    rtt = (time.perf_counter() - t0) / 10
    say(f"sync RTT: {rtt*1e3:.2f} ms")

    # --- roofline, RTT-corrected -------------------------------------------
    B = 8192
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    RMM = 16

    @jax.jit
    def mm_chain(a, b):
        def body(_, acc):
            prod = lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            return (prod / (1.0 + jnp.abs(prod[0, 0]))).astype(a.dtype)
        return lax.fori_loop(0, RMM, body, a)

    sync(mm_chain(A1, A2))
    t0 = time.perf_counter()
    sync(mm_chain(A1, A2))
    t_mm = (time.perf_counter() - t0 - rtt) / RMM
    roof = 2 * B ** 3 / t_mm / 1e12
    say(f"roofline (RTT-corrected): {roof:.1f} TF/s")

    def report(name, t):
        say(f"{name:30s} {t*1e3:7.2f} ms  {flops/t/1e12:5.1f} TF/s "
            f"= {flops/t/1e12/roof:5.1%} of roof")

    REPS = 10

    def chain(evidence):
        @jax.jit
        def run(X, m):
            def body(_, carry):
                acc, Xc = carry
                e = evidence(Xc, m)
                return acc + e, Xc + (e * 0.0)
            return lax.fori_loop(0, REPS, body,
                                 (jnp.zeros((), dtype), X))[0]
        return run

    def time_chain(run):
        sync(run(X, m))
        t0 = time.perf_counter()
        sync(run(X, m))
        return (time.perf_counter() - t0 - rtt) / REPS

    # XLA pipeline, current bench winner policies
    for name, pol in [("xla b512 stack", Policy(512, True, "xla", True)),
                      ("xla b1024 stack", Policy(1024, True, "xla", True))]:
        def ev(Xc, mc, pol=pol):
            kfn = rbf_block_fn(Xc, iw, var, nz)
            ld, quad = evidence_left_fast(kfn, N, mc, pol)
            return ld + quad
        report(name, time_chain(chain(ev)))

    # mega kernel
    def ev_mega(Xc, mc):
        ld, quad = evidence_mega_rbf(Xc, mc, iw, var, nz, b=512)
        return ld + quad
    try:
        report("MEGA b512", time_chain(chain(ev_mega)))
        # accuracy vs f32-HIGH
        @jax.jit
        def ref(Xc, mc):
            kfn = rbf_block_fn(Xc, iw, var, nz)
            ld, quad = evidence_left_fast(
                kfn, N, mc, Policy(256, False, False, True))
            return ld + quad
        r = sync(ref(X, m))
        g = sync(jax.jit(ev_mega)(X, m))
        say(f"mega vs f32-HIGH rel drift: {abs(g-r)/abs(r):.2e}")
    except Exception as e:
        say(f"MEGA FAILED: {str(e)[:400]}")


if __name__ == "__main__":
    main()
