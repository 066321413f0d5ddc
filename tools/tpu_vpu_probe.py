"""In-kernel VPU/edge costs for the mega kernel: exp tiles, D=1 matvecs,
staging copies + HBM write DMAs.  RTT-corrected, one session."""

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


B = 512
REPS = 2048


def kern_exp(a_ref, o_ref):
    A = a_ref[:]

    def body(_, acc):
        return acc * 0.5 + jnp.exp(-(A + acc * 1e-9))
    o_ref[:] = lax.fori_loop(0, REPS, body, jnp.zeros((B, B), jnp.float32))


def kern_gramtile(x_ref, n2_ref, n2r_ref, o_ref):
    X = x_ref[:]

    def body(_, acc):
        G = lax.dot_general(X, X, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        d2 = jnp.maximum(n2_ref[:] + n2r_ref[:] - 2.0 * G + acc[0:1, 0:1] * 1e-9, 0.0)
        return acc * 0.0 + jnp.exp(-d2)
    o_ref[:] = lax.fori_loop(0, REPS, body, jnp.zeros((B, B), jnp.float32))


def kern_matvec(a_ref, v_ref, o_ref):
    A = a_ref[:]

    def body(_, acc):
        p = lax.dot_general(A, acc, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.DEFAULT)
        return p * (1.0 / (1.0 + jnp.abs(p[0:1, 0:1])))
    o_ref[:] = lax.fori_loop(0, REPS // 2, body, v_ref[:])


def kern_store_dma(a_ref, big_ref, o_ref, stage, sem):
    A = a_ref[:]

    def body(it, acc):
        slot = lax.rem(it, 2)

        @pl.when(it >= 2)
        def _():
            pltpu.make_async_copy(stage.at[slot], big_ref.at[lax.rem(it, 64)],
                                  sem.at[slot]).wait()
        stage[slot] = (A + acc * 1e-9).astype(jnp.bfloat16)
        pltpu.make_async_copy(stage.at[slot], big_ref.at[lax.rem(it, 64)],
                              sem.at[slot]).start()
        return acc + 1.0
    acc = lax.fori_loop(0, REPS // 2, body, jnp.zeros((), jnp.float32))
    pltpu.make_async_copy(stage.at[lax.rem(REPS // 2 - 1, 2)],
                          big_ref.at[0], sem.at[lax.rem(REPS // 2 - 1, 2)]).wait()
    pltpu.make_async_copy(stage.at[lax.rem(REPS // 2 - 2, 2)],
                          big_ref.at[1], sem.at[lax.rem(REPS // 2 - 2, 2)]).wait()
    o_ref[:] = jnp.zeros((B, B), jnp.float32) + acc


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

    A = jnp.asarray(rng.standard_normal((B, B)), jnp.float32)

    def run(tag, f, *args, n=REPS):
        fj = jax.jit(f)
        sync(fj(*args))
        t0 = time.perf_counter()
        sync(fj(*args))
        t = time.perf_counter() - t0 - rtt
        say(f"{tag:26s} {t/n*1e6:7.2f} us/iter  (x528 = {t/n*528*1e3:5.2f} ms)")

    run("exp (512,512)", pl.pallas_call(
        kern_exp, out_shape=jax.ShapeDtypeStruct((B, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)), A)

    X = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    n2 = jnp.sum(X * X, axis=1, keepdims=True)
    run("full gram tile", pl.pallas_call(
        kern_gramtile, out_shape=jax.ShapeDtypeStruct((B, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        X, n2, jnp.reshape(n2, (1, B)))

    v = jnp.asarray(rng.standard_normal((B, 1)), jnp.float32)
    run("matvec (512,512)x(512,1)", pl.pallas_call(
        kern_matvec, out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)), A, v,
        n=REPS // 2)

    run("stage copy + HBM write", pl.pallas_call(
        kern_store_dma,
        out_shape=(jax.ShapeDtypeStruct((64, B, B), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, B), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, B, B), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))]), A,
        n=REPS // 2)


if __name__ == "__main__":
    main()
