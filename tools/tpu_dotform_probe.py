"""Which dot_general form does Mosaic/MXU run at peak for tall panels?

The mega-kernel's Schur correction is ViᵀVj with Vi,Vj (jb, b) bf16 —
contracting dim 0 of BOTH operands.  If Mosaic inserts operand relayouts
for that form, each correction pays O(jb·b) of VMEM copy, which would
explain the ~9 ms gap between the kernel and its GEMM floor.  Times all
three forms at panel scale inside one Pallas kernel each.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.ravel(x)[0])


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


K, B = 8192, 512     # contraction width x panel
REPS = 1024
FLOPS = 2.0 * K * B * B * REPS


def make_kernel(form):
    def kern(a_ref, b_ref, o_ref):
        A = a_ref[:]
        Bv = b_ref[:]

        def body(_, acc):
            if form == "c0":        # (K,B)ᵀ·(K,B): contract dim0, dim0
                p = lax.dot_general(A, Bv, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.DEFAULT)
            elif form == "std":     # (B,K)·(K,B): contract dim1, dim0
                p = lax.dot_general(A, Bv, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.DEFAULT)
            else:                   # dotT: (B,K)·(B,K): contract dim1, dim1
                p = lax.dot_general(A, Bv, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.DEFAULT)
            return acc + p
        acc = lax.fori_loop(0, REPS, body, jnp.zeros((B, B), jnp.float32))
        o_ref[:] = acc
    return kern


def main():
    rng = np.random.default_rng(0)

    one = jnp.ones((1,), jnp.float32)

    @jax.jit
    def triv(a):
        return a + 1.0
    sync(triv(one))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(triv(one))
    rtt = (time.perf_counter() - t0) / 10
    say(f"sync RTT: {rtt*1e3:.2f} ms")

    for form, sa, sb in [("c0", (K, B), (K, B)),
                         ("std", (B, K), (K, B)),
                         ("dotT", (B, K), (B, K))]:
        A = jnp.asarray(rng.standard_normal(sa), jnp.bfloat16)
        Bv = jnp.asarray(rng.standard_normal(sb), jnp.bfloat16)
        f = pl.pallas_call(
            make_kernel(form),
            out_shape=jax.ShapeDtypeStruct((B, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )
        fj = jax.jit(f)
        try:
            sync(fj(A, Bv))
            t0 = time.perf_counter()
            sync(fj(A, Bv))
            t = time.perf_counter() - t0 - rtt
            say(f"form {form:4s}: {t/REPS*1e6:7.1f} us/dot  "
                f"{FLOPS/t/1e12:6.1f} TF/s")
        except Exception as e:
            say(f"form {form} FAILED: {str(e)[:200]}")

    # same, XLA (non-pallas) for reference
    for form in ("c0", "std", "dotT"):
        sa = (K, B) if form == "c0" else (B, K)
        sb = (K, B) if form in ("c0", "std") else (B, K)
        A = jnp.asarray(rng.standard_normal(sa), jnp.bfloat16)
        Bv = jnp.asarray(rng.standard_normal(sb), jnp.bfloat16)
        dims = {"c0": (((0,), (0,)), ((), ())),
                "std": (((1,), (0,)), ((), ())),
                "dotT": (((1,), (1,)), ((), ()))}[form]

        @jax.jit
        def chain(A, Bv, dims=dims):
            def body(_, acc):
                return acc + lax.dot_general(
                    A, Bv, dims, preferred_element_type=jnp.float32)
            return lax.fori_loop(0, REPS, body,
                                 jnp.zeros((B, B), jnp.float32))
        sync(chain(A, Bv))
        t0 = time.perf_counter()
        sync(chain(A, Bv))
        t = time.perf_counter() - t0 - rtt
        say(f"XLA form {form:4s}: {t/REPS*1e6:7.1f} us/dot  "
            f"{FLOPS/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
