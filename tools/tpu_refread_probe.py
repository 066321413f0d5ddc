"""Does a Pallas ref→value read copy the operand before a dot?

The mega-kernel reads Vi = rowi[slot, 0:j] (→ up to 15.5 MB) before every
correction dot.  If Mosaic materializes that read as a VMEM copy instead of
aliasing, each block-row pays ~O(panel) copy — enough to explain the gap to
the dot floor.  Compares: hoisted read, per-iteration read, per-iteration
reshaped read, and per-iteration dynamic-slot reshaped read.
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


K, B = 8192, 512
NBLK = K // B           # 16 blocks
REPS = 1024
FLOPS = 2.0 * K * B * B * REPS


def dotc0(a, b):
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def kern_hoisted(a_ref, b_ref, o_ref):
    A = a_ref[:]
    Bv = b_ref[:]

    def body(_, acc):
        return acc + dotc0(A, Bv)
    o_ref[:] = lax.fori_loop(0, REPS, body, jnp.zeros((B, B), jnp.float32))


def kern_read_each(a_ref, b_ref, o_ref):
    Bv = b_ref[:]

    def body(_, acc):
        A = a_ref[:]                       # fresh read per iteration
        return acc + dotc0(A, Bv)
    o_ref[:] = lax.fori_loop(0, REPS, body, jnp.zeros((B, B), jnp.float32))


def kern_reshape_each(a3_ref, b_ref, o_ref):
    Bv = b_ref[:]

    def body(_, acc):
        A = jnp.reshape(a3_ref[0:NBLK], (K, B))   # static slice + reshape
        return acc + dotc0(A, Bv)
    o_ref[:] = lax.fori_loop(0, REPS, body, jnp.zeros((B, B), jnp.float32))


def kern_dynslot_each(a4_ref, b_ref, o_ref):
    Bv = b_ref[:]

    def body(it, acc):
        slot = lax.rem(it, 2)
        A = jnp.reshape(a4_ref[slot, 0:NBLK], (K, B))  # the mega pattern
        return acc + dotc0(A, Bv)
    o_ref[:] = lax.fori_loop(0, REPS, body, jnp.zeros((B, B), jnp.float32))


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

    A2 = jnp.asarray(rng.standard_normal((K, B)), jnp.bfloat16)
    A3 = jnp.asarray(rng.standard_normal((NBLK, B, B)), jnp.bfloat16)
    A4 = jnp.asarray(rng.standard_normal((2, NBLK, B, B)), jnp.bfloat16)
    Bv = jnp.asarray(rng.standard_normal((K, B)), jnp.bfloat16)

    for tag, kern, a in [("hoisted", kern_hoisted, A2),
                         ("read each iter", kern_read_each, A2),
                         ("reshape each iter", kern_reshape_each, A3),
                         ("dyn-slot reshape", kern_dynslot_each, A4)]:
        f = jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        ))
        try:
            sync(f(a, Bv))
            t0 = time.perf_counter()
            sync(f(a, Bv))
            t = time.perf_counter() - t0 - rtt
            say(f"{tag:20s} {t/REPS*1e6:7.1f} us/dot  "
                f"{FLOPS/t/1e12:6.1f} TF/s")
        except Exception as e:
            say(f"{tag} FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
