"""TPU probe: can in-kernel VPU leaf work hide under MXU Schur dots?

The 0.8×roofline target needs the 32 diagonal leaf factorizations (~200 µs
each as standalone Pallas ops) to cost ≈ nothing inside the panel kernel.
BASELINE.md's "TPU is single-stream, leaf latency can't hide" claim was
proven only for XLA op sequences (VERDICT r3 Weak #2); this measures it
INSIDE one Pallas kernel, where the scalar core issues to the MXU and VPU
from one stream but the units pipeline independently:

  dots      — K big bf16 Schur-shaped dots, VMEM-resident operands
  leaves    — M in-VMEM blocked chol+inverse leaves (ops/chol_mega's)
  inter     — dots and leaves INTERLEAVED (leaf after every K/M-th dot)
  seq       — all dots then all leaves (sequential sections)

If t(inter) ≈ max(t(dots), t(leaves)) the units overlap and the panel
kernel's leaf chain is free; if t(inter) ≈ t(dots)+t(leaves) the leaf chain
is real latency and the budget must carry it.  Also measures per-dot rate
in-kernel (op overhead) and the slab DMA stream rate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpc_tpu.ops.chol_panel import _factor_diag

RC, KC, B = 2048, 2048, 512


def _dot_kk(a, b):
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def make_probe(n_dots: int, n_leaves: int, interleave: bool,
               indep: bool = False, overwrite: bool = False):
    """One kernel: n_dots Schur dots (RC,KC)x(B,KC) + n_leaves leaf factors,
    either interleaved or sequential.  All operands VMEM-resident.
    indep=True alternates the accumulation target between two buffers so
    consecutive dots carry NO data dependency (MXU pipelining test — the
    panel kernel can order its chunk loop r-fastest to get this)."""

    def kernel(slab_ref, vrow_ref, aleaf_ref, out_ref, ldout_ref, acc, ld):
        # fori-loop everything: Mosaic compile time explodes on UNROLLED
        # chains of large ops (64 unrolled dots = 370 s to compile)
        ld[:] = jnp.zeros((1, 1), jnp.float32)

        def one_dot(i):
            tgt = lax.rem(i, 2) if indep else 0
            if overwrite:
                acc[tgt] = (_dot_kk(slab_ref[lax.rem(i, 2)], vrow_ref[:, :])
                            + jnp.float32(1e-30) * i.astype(jnp.float32))
            else:
                acc[tgt] = acc[tgt] - _dot_kk(slab_ref[lax.rem(i, 2)],
                                              vrow_ref[:, :])

        def one_leaf(i):
            # feed each leaf slightly different input so nothing is CSE'd
            A = aleaf_ref[:, :] + (jnp.float32(1e-3) * i.astype(jnp.float32)
                                   if hasattr(i, "astype") else
                                   jnp.float32(1e-3 * i)) * jnp.eye(
                B, dtype=jnp.float32)
            Ld, Md = _factor_diag(A, B)
            ld[:, :] = (ld[:, :]
                        + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ld)))
                        + Md[0, 0] * 1e-30)

        if interleave and n_leaves > 0:
            per = max(n_dots // max(n_leaves, 1), 1)

            def body(i, _):
                one_dot(i)

                @pl.when(jnp.logical_and(lax.rem(i, per) == per - 1,
                                         i // per < n_leaves))
                def _():
                    one_leaf(i // per)
                return 0
            lax.fori_loop(0, n_dots, body, 0)
        else:
            def dbody(i, _):
                one_dot(i)
                return 0
            if n_dots:
                lax.fori_loop(0, n_dots, dbody, 0)

            def lbody(i, _):
                one_leaf(i)
                return 0
            if n_leaves:
                lax.fori_loop(0, n_leaves, lbody, 0)
        ldout_ref[:] = ld[:, :]
        out_ref[:] = acc[0, pl.ds(0, 8), pl.ds(0, 128)] + ld[0, 0]

    @jax.jit
    def run(slab, vrow, aleaf):
        out, _ = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((2, RC, B), jnp.float32),
                            pltpu.VMEM((1, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(slab, vrow, aleaf)
        return out

    return run


def make_dma_probe(n_iters: int, n_bufs: int, with_dots: bool):
    """Stream n_iters (RC,KC) bf16 slabs HBM→VMEM double-buffered (cycling
    over n_bufs distinct HBM buffers), with or without a dot per chunk — the
    panel kernel's A-quadrant skeleton."""

    def kernel(hbm_ref, vrow_ref, out_ref, acc, slab, sems):
        pltpu.make_async_copy(hbm_ref.at[0], slab.at[0], sems.at[0]).start()

        def body(i, _):
            slot = lax.rem(i, 2)

            @pl.when(i + 1 < n_iters)
            def _():
                pltpu.make_async_copy(hbm_ref.at[lax.rem(i + 1, n_bufs)],
                                      slab.at[lax.rem(i + 1, 2)],
                                      sems.at[lax.rem(i + 1, 2)]).start()
            pltpu.make_async_copy(hbm_ref.at[lax.rem(i, n_bufs)],
                                  slab.at[slot], sems.at[slot]).wait()
            if with_dots:
                acc[:, :] = acc[:, :] - _dot_kk(slab[slot], vrow_ref[:, :])
            else:
                acc[pl.ds(0, 8), pl.ds(0, 128)] = (
                    acc[pl.ds(0, 8), pl.ds(0, 128)]
                    + slab[slot, pl.ds(0, 8), pl.ds(0, 128)].astype(
                        jnp.float32))
            return 0

        lax.fori_loop(0, n_iters, body, 0)
        out_ref[:] = acc[pl.ds(0, 8), pl.ds(0, 128)]

    @jax.jit
    def run(hbm, vrow):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((RC, B), jnp.float32),
                            pltpu.VMEM((2, RC, KC), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(hbm, vrow)

    return run


def make_leaf_parts_probe(kind: str, n: int):
    """Leaf-cost decomposition: where do _factor_diag(512)'s 192 us go?
      sweep128 — n x _cholinv_leaf(128) alone (the VPU column sweeps)
      gemm512  — n x dependent 512^3 bf16 GEMMs (small-GEMM issue cost)
      gemm128  — n x dependent 128^3 f32 GEMMs (leaf-assembly-sized)
      fdiag    — n x full _factor_diag(512)
      fsweep128 / ffdiag — the chol_panel fast augmented variants
    """
    from gpc_tpu.ops.chol_panel import _cholinv_leaf
    from gpc_tpu.ops.chol_panel import _cholinv_leaf_fast, _factor_diag_fast

    def kernel(a512_ref, a128_ref, out_ref, acc):
        def body(i, _):
            fi = i.astype(jnp.float32)
            if kind == "sweep128":
                A = a128_ref[:, :] + fi * 1e-3
                L, M = _cholinv_leaf(A)
                # consume EVERYTHING (slice-only consumption lets Mosaic
                # dead-code most of the sweep — measured 43.7 us vs real)
                acc[pl.ds(0, 1), pl.ds(0, 128)] = (
                    acc[pl.ds(0, 1), pl.ds(0, 128)]
                    + jnp.sum(L, axis=0, keepdims=True)
                    + jnp.sum(M, axis=0, keepdims=True))
            elif kind == "gemm512":
                prod = lax.dot_general(
                    acc[:, :].astype(jnp.bfloat16),
                    a512_ref[:, :].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.DEFAULT)
                acc[:, :] = prod * 1e-6 + fi * 1e-9
            elif kind == "gemm128":
                sl = acc[pl.ds(0, 128), pl.ds(0, 128)]
                prod = lax.dot_general(
                    sl, a128_ref[:, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
                acc[pl.ds(0, 128), pl.ds(0, 128)] = prod * 1e-6 + fi * 1e-9
            elif kind == "fsweep128":
                A = a128_ref[:, :] + fi * 1e-3
                M = _cholinv_leaf_fast(A)
                acc[pl.ds(0, 1), pl.ds(0, 128)] = (
                    acc[pl.ds(0, 1), pl.ds(0, 128)]
                    + jnp.sum(M, axis=0, keepdims=True))
            elif kind == "ffdiag":
                A = a512_ref[:, :] + fi * 1e-3
                M, ld2 = _factor_diag_fast(A, 512)
                acc[pl.ds(0, 1), pl.ds(0, 128)] = (
                    acc[pl.ds(0, 1), pl.ds(0, 128)]
                    + jnp.sum(M, axis=0, keepdims=True)[:, 0:128] + ld2)
            else:  # fdiag
                A = a512_ref[:, :] + fi * 1e-3
                L, M = _factor_diag(A, 512)
                acc[pl.ds(0, 1), pl.ds(0, 128)] = (
                    acc[pl.ds(0, 1), pl.ds(0, 128)]
                    + jnp.sum(L, axis=0, keepdims=True)[:, 0:128]
                    + jnp.sum(M, axis=0, keepdims=True)[:, 0:128])
            return 0
        lax.fori_loop(0, n, body, 0)
        out_ref[:] = acc[pl.ds(0, 8), pl.ds(0, 128)]

    @jax.jit
    def run(a512, a128):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((512, 512), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(a512, a128)

    return run


def main():
    def sync(x):
        return float(jnp.ravel(x)[0])

    @jax.jit
    def _t(a):
        return a + 1.0
    one = jnp.ones((1,), jnp.float32)
    sync(_t(one))
    rtt = min((lambda t0: (sync(_t(one)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(8))
    print(f"rtt={rtt*1e3:.1f} ms", flush=True)

    # roofline
    Bm = 8192
    rng = np.random.default_rng(0)
    A1 = jnp.asarray(rng.standard_normal((Bm, Bm)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((Bm, Bm)), jnp.bfloat16)

    @jax.jit
    def mm_chain(a, b):
        def body(_, acc):
            prod = lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            return (prod / (1.0 + jnp.abs(prod[0, 0]))).astype(a.dtype)
        return lax.fori_loop(0, 16, body, a)
    sync(mm_chain(A1, A2))
    t0 = time.perf_counter()
    sync(mm_chain(A1, A2))
    t_mm = max(time.perf_counter() - t0 - rtt, 1e-9) / 16
    roof = 2 * Bm ** 3 / t_mm / 1e12
    print(f"roofline {roof:.1f} TF/s bf16", flush=True)

    slab = jnp.asarray(rng.standard_normal((2, RC, KC)), jnp.bfloat16)
    vrow = jnp.asarray(rng.standard_normal((B, KC)), jnp.bfloat16)
    aleaf = jnp.asarray(
        np.eye(B) * 50.0 + rng.standard_normal((B, B)) * 0.01, jnp.float32)

    # all counts are IN-KERNEL reps (single-invocation timings on axon are
    # pure RTT noise — the first version of this probe proved that the hard
    # way); differential pairs remove kernel-launch fixed costs
    cases = [("dots-640", 640, 0, False, False),
             ("dots-64", 64, 0, False, False),
             ("dotsI-640", 640, 0, False, True),
             ("dotsI-64", 64, 0, False, True),
             ("leaves-64", 0, 64, False, False),
             ("leaves-8", 0, 8, False, False),
             ("seq-640+20", 640, 20, False, False),
             ("inter-640+20", 640, 20, True, False),
             ("seq-640+80", 640, 80, False, False),
             ("inter-640+80", 640, 80, True, False)]
    times = {}
    for name, nd, nl, inter, indep in cases:
        try:
            run = make_probe(nd, nl, inter, indep)
            sync(run(slab, vrow, aleaf))
            t0 = time.perf_counter()
            sync(run(slab, vrow, aleaf))
            t = max(time.perf_counter() - t0 - rtt, 1e-9)
            times[name] = t
            extra = ""
            if nd:
                gf = 2 * RC * KC * B * nd / t / 1e12
                extra = f"  ({gf:.1f} TF/s)"
            print(f"{name:14s} {t*1e3:7.2f} ms{extra}", flush=True)
        except Exception as e:
            print(f"{name} FAILED {type(e).__name__}: {str(e)[-180:]}",
                  flush=True)
    if "dots-640" in times and "dots-64" in times:
        us = (times["dots-640"] - times["dots-64"]) / 576 * 1e6
        print(f"per-dot (differential): {us:.1f} us "
              f"({2*RC*KC*B/us/1e6:.1f} TF/s)", flush=True)
    if "dotsI-640" in times and "dotsI-64" in times:
        us = (times["dotsI-640"] - times["dotsI-64"]) / 576 * 1e6
        print(f"per-dot independent (differential): {us:.1f} us "
              f"({2*RC*KC*B/us/1e6:.1f} TF/s)", flush=True)
    if "leaves-64" in times and "leaves-8" in times:
        us = (times["leaves-64"] - times["leaves-8"]) / 56 * 1e6
        print(f"per-leaf (differential): {us:.1f} us", flush=True)
    for nl in (20, 80):
        ks = (f"seq-640+{nl}", f"inter-640+{nl}")
        if all(k in times for k in ks) and "dots-640" in times:
            extra_seq = (times[ks[0]] - times["dots-640"]) * 1e6 / nl
            extra_int = (times[ks[1]] - times["dots-640"]) * 1e6 / nl
            print(f"leaf marginal cost over dots ({nl} leaves): "
                  f"sequential {extra_seq:.1f} us/leaf, "
                  f"interleaved {extra_int:.1f} us/leaf", flush=True)

    # leaf-cost decomposition (differential pairs)
    a512 = jnp.asarray(np.eye(512) * 50.0
                       + rng.standard_normal((512, 512)) * 0.01, jnp.float32)
    a128 = jnp.asarray(np.eye(128) * 50.0
                       + rng.standard_normal((128, 128)) * 0.01, jnp.float32)
    for kind, lo, hi in (("sweep128", 16, 160), ("fsweep128", 16, 160),
                         ("gemm512", 64, 640), ("gemm128", 64, 640),
                         ("fdiag", 8, 80), ("ffdiag", 8, 80)):
        try:
            ts = {}
            for n in (lo, hi):
                run = make_leaf_parts_probe(kind, n)
                sync(run(a512, a128))
                t0 = time.perf_counter()
                sync(run(a512, a128))
                ts[n] = max(time.perf_counter() - t0 - rtt, 1e-9)
            per = (ts[hi] - ts[lo]) / (hi - lo)
            print(f"{kind:10s} {per*1e6:7.1f} us each (differential)",
                  flush=True)
        except Exception as e:
            print(f"{kind} FAILED {type(e).__name__}: {str(e)[-180:]}",
                  flush=True)

    # DMA stream rate (differential over iteration count)
    NB = 64
    hbm = jnp.asarray(rng.standard_normal((NB, RC, KC)), jnp.bfloat16)
    for with_dots in (False, True):
        lab = "dma+dots" if with_dots else "dma-only"
        try:
            ts = {}
            for n_iters in (64, 640):
                run = make_dma_probe(n_iters, NB, with_dots)
                sync(run(hbm, vrow))
                t0 = time.perf_counter()
                sync(run(hbm, vrow))
                ts[n_iters] = max(time.perf_counter() - t0 - rtt, 1e-9)
            per = (ts[640] - ts[64]) / 576
            gb = RC * KC * 2 / per / 1e9
            print(f"{lab:12s} {per*1e6:.1f} us/chunk  ({gb:.0f} GB/s"
                  + (f", {2*RC*KC*B/per/1e12:.1f} TF/s)" if with_dots
                     else ")"), flush=True)
        except Exception as e:
            print(f"{lab} FAILED {type(e).__name__}: {str(e)[-180:]}",
                  flush=True)


if __name__ == "__main__":
    main()
