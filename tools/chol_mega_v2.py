"""v2 whole-evidence Pallas mega-kernel (SUPERSEDED by ops/chol_panel).

Moved out of the package in round 5 (VERDICT r4 ask #8): the v3 panel
schedule (gpc_tpu/ops/chol_panel.py) beats this kernel by ~15% at N=16k
(14.3-15.8 ms vs 17.1, BASELINE.md round 4), and the shared leaf library
(_cholinv_leaf/_factor_diag/_gemm32) now lives in chol_panel.  Kept here as
bench-local A/B code so the recorded round-3/4 measurements
(tools/tpu_mega_*.py, MEASUREMENTS_r4.md) stay reproducible.  Not a product
engine; no model path reaches it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

from gpc_tpu.ops.chol_panel import LEAF, _cholinv_leaf, _factor_diag, _gemm32

_UNROLL = 8


def _dotT(a, b):
    """a @ b\u1d40 with bf16 inputs, f32 accumulation (1-pass MXU)."""
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def _dotc0(a, b):
    """a\u1d40 @ b (contract dim 0) with bf16 inputs, f32 accumulation."""
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def _mega_kernel(b, nb, q, D, mode, xs_ref, n2_ref, n2row_ref, m_ref,
                 var_ref, noise_ref, T_ref, ld_ref, quad_ref,
                 vbuf, stage, rowi, rowj, wsem, rsem_i, rsem_j):
    """One sequential program: the whole N=nb·b factorization (v2 schedule).

    T_ref: HBM (ANY) output holding the SUBDIAGONAL blocks of L, transposed
    (T[tri(i,j)] = L[i,j]ᵀ, tri(i,j) = i(i+1)/2 + j; diagonal slots are
    never written — the evidence needs only logdet/quad).  vbuf: (N, D) f32
    forward-solve state.  stage: (2, b, b) bf16 write staging; rowi:
    (2, nb−2, b, b) bf16 double-buffered row stream (i-rows only stream
    while j ≤ nb−2); rowj: (nb−1, b, b) bf16 current-column row panel."""
    var = var_ref[0, 0]
    noise = noise_ref[0, 0]
    # initialize the forward-solve residual from m (static-offset block
    # copies), so the row phase's right-looking decrements below operate
    # on live values instead of uninitialized VMEM.  NOTE: the two
    # "clean" single-schedule rewrites of this forward solve — (a) drop
    # the row-phase decrement and keep only the left-looking Vj^T.vbuf
    # diag GEMM, or (b) drop that diag GEMM and read the right-looking
    # residual at the diagonal step — BOTH fail to compile in Mosaic at
    # nb=32 (tpu_compile_helper exit 1; nb<=16 compiles), so the
    # redundant-but-compiling both-schedules form stays deliberately.
    for i in range(nb):
        vbuf[pl.ds(i * b, b), :] = m_ref[pl.ds(i * b, b), :]

    def tri0(i):
        return i * (i + 1) // 2  # offset of block (i, 0); static or traced

    def gram(i, j):
        """var·exp(−‖xs_i − xs_j‖²) tile from the pre-scaled inputs.

        n2 comes in BOTH orientations as inputs: Mosaic miscompiles
        (b,1)↔(1,b) transposes on v5e (see chol_pallas._inv_body note)."""
        Xi = xs_ref[pl.ds(i * b, b), :]
        Xj = xs_ref[pl.ds(j * b, b), :]
        G = lax.dot_general(Xi, Xj, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        d2 = jnp.maximum(n2_ref[pl.ds(i * b, b), :] +
                         n2row_ref[:, pl.ds(j * b, b)] - 2.0 * G, 0.0)
        if mode == "nogram":
            return var * d2          # skip the exp map (slice-timing mode)
        return var * jnp.exp(-d2)

    ld_acc = jnp.zeros((1, 1), jnp.float32)
    for j in range(nb):  # static unroll: every dot width below is static
        # ---- fetch this column's own ancestor row (one contiguous DMA) ----
        if j > 0:
            cp = pltpu.make_async_copy(T_ref.at[pl.ds(tri0(j), j)],
                                       rowj.at[pl.ds(0, j)], rsem_j)
            cp.start()
            cp.wait()
            Vj = jnp.reshape(rowj[0:j], (j * b, b))

        # ---- diagonal block ----------------------------------------------
        A = gram(j, j) + jnp.where(
            lax.broadcasted_iota(jnp.int32, (b, 1), 0) ==
            lax.broadcasted_iota(jnp.int32, (1, b), 1), noise, 0.0)
        wj = m_ref[pl.ds(j * b, b), :]
        if j > 0:
            A = A - _dotc0(Vj, Vj)
            wj = wj - _dotc0(Vj, vbuf[pl.ds(0, j * b), :])
        if mode == "noleaf":
            # near-free stand-in: diagonal-only "factorization" keeps all
            # shapes + a data dependency on A (slice-timing mode)
            eye = (lax.broadcasted_iota(jnp.int32, (b, 1), 0) ==
                   lax.broadcasted_iota(jnp.int32, (1, b), 1)).astype(
                       jnp.float32)
            dcol = jnp.max(jnp.abs(A), axis=1, keepdims=True) + 1.0
            Ld = eye * dcol
            Md = eye * lax.reciprocal(dcol)
        else:
            Ld, Md = _factor_diag(A, b)
        ld_acc = ld_acc + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ld)))
        vj = _gemm32(Md, wj)
        vbuf[pl.ds(j * b, b), :] = vj
        Md_bf = Md.astype(jnp.bfloat16)

        # ---- off-diagonal rows: one wide dot per block -------------------
        nwr = nb - 1 - j

        def make_row(j, Vj, Md_bf, vj):
            def row(i, _):
                wslot = lax.rem(i - (j + 1), 2)
                if j > 0 and mode == "nodma":
                    # same-shape, same-flop dot against the RESIDENT rowj
                    # panel — isolates the rowi DMA stream's cost
                    A = gram(i, j) - _dotc0(Vj, Vj)
                elif j > 0:
                    rslot = lax.rem(i - (j + 1), 2)

                    @pl.when(i + 1 < nb)
                    def _():  # prefetch next row while computing this one
                        pltpu.make_async_copy(
                            T_ref.at[pl.ds((i + 1) * (i + 2) // 2, j)],
                            rowi.at[lax.rem(i - j, 2), pl.ds(0, j)],
                            rsem_i.at[lax.rem(i - j, 2)]).start()
                    pltpu.make_async_copy(
                        T_ref.at[pl.ds(tri0(i), j)],
                        rowi.at[rslot, pl.ds(0, j)],
                        rsem_i.at[rslot]).wait()
                    Vi = jnp.reshape(rowi[rslot, 0:j], (j * b, b))
                    if mode == "nodot":
                        # keep the DMA observable, skip the wide dot
                        # (bf16 refs can't scalarize on TPU — slice+cast)
                        A = gram(i, j) + (
                            Vi[0:1, 0:1].astype(jnp.float32) * 1e-30)
                    else:
                        A = gram(i, j) - _dotc0(Vi, Vj)
                else:
                    A = gram(i, j)
                LijT = _dotT(Md_bf, A)           # L_jj⁻¹·Aᵀ = L_ijᵀ
                vbuf[pl.ds(i * b, b), :] = (
                    vbuf[pl.ds(i * b, b), :] - _dotc0(LijT, vj))

                @pl.when(i - (j + 1) >= 2)
                def _():  # reclaim the staging slot before overwrite
                    pltpu.make_async_copy(stage.at[wslot],
                                          T_ref.at[tri0(i) + j],
                                          wsem.at[wslot]).wait()
                stage[wslot] = LijT.astype(jnp.bfloat16)
                pltpu.make_async_copy(stage.at[wslot],
                                      T_ref.at[tri0(i) + j],
                                      wsem.at[wslot]).start()
                return 0
            return row

        if nwr > 0:
            if j > 0:  # prime the first row DMA
                pltpu.make_async_copy(T_ref.at[pl.ds(tri0(j + 1), j)],
                                      rowi.at[0, pl.ds(0, j)],
                                      rsem_i.at[0]).start()
            lax.fori_loop(j + 1, nb, make_row(j, Vj if j > 0 else None,
                                              Md_bf, vj), 0)
            # drain outstanding writes so column j+1 may read them (static)
            pltpu.make_async_copy(stage.at[(nwr - 1) % 2],
                                  T_ref.at[tri0(nb - 1) + j],
                                  wsem.at[(nwr - 1) % 2]).wait()
            if nwr >= 2:
                pltpu.make_async_copy(stage.at[(nwr - 2) % 2],
                                      T_ref.at[tri0(nb - 2) + j],
                                      wsem.at[(nwr - 2) % 2]).wait()

    ld_ref[:] = ld_acc
    v = vbuf[:]
    quad_ref[:] = jnp.sum(v * v, axis=(0, 1), keepdims=True)[:, :]


@functools.partial(jax.jit, static_argnames=("b", "interpret", "mode"))
def evidence_mega_rbf(X, m, inv_width, variance, noise, b: int = 512,
                      interpret: bool = False, mode: str = "full"):
    """(logdet K, Σⱼ mⱼᵀK⁻¹mⱼ) for K = rbf-Gram(X) + noise·I, one kernel.

    N must be a multiple of b (pad upstream); b a multiple of LEAF=128.
    Returns f32 scalars.  bf16 Schur/panel GEMM policy ≡ evidence_fast's
    bench policy; same conditioning caveats apply (the bench gates drift
    against the f32-HIGH path per session)."""
    N, q = X.shape
    D = m.shape[1]
    nb = N // b
    # nb >= 3: at nb == 2 the rowi scratch would be zero-sized VMEM
    assert N % b == 0 and b % LEAF == 0 and nb >= 3
    Xs = (X * jnp.sqrt(0.5 * inv_width)).astype(jnp.float32)
    n2 = jnp.sum(Xs * Xs, axis=1, keepdims=True)
    n2row = jnp.reshape(n2, (1, N))
    var2d = jnp.reshape(variance.astype(jnp.float32), (1, 1))
    noise2d = jnp.reshape(noise.astype(jnp.float32), (1, 1))

    assert mode in ("full", "noleaf", "nodot", "nodma", "nogram")
    kern = functools.partial(_mega_kernel, b, nb, q, D, mode)
    T, ld, quad = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nb * (nb + 1) // 2, b, b), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Xs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # n2 (column)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # n2 (row)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # m
            pl.BlockSpec(memory_space=pltpu.SMEM),   # var
            pl.BlockSpec(memory_space=pltpu.SMEM),   # noise
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),       # Lᵀ blocks (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, D), jnp.float32),              # vbuf
            pltpu.VMEM((2, b, b), jnp.bfloat16),          # write staging
            # i-rows only stream while j ≤ nb−2, so width caps at nb−2
            pltpu.VMEM((2, nb - 2, b, b), jnp.bfloat16),  # row_i stream
            pltpu.VMEM((nb - 1, b, b), jnp.bfloat16),     # row_j panel
            pltpu.SemaphoreType.DMA((2,)),                # write sems
            pltpu.SemaphoreType.DMA((2,)),                # read sems (i)
            pltpu.SemaphoreType.DMA(()),                  # read sem (j)
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # resident set: row streams (3·(nb−1)·b² bf16 ≈ 47 MB at
            # N=16k/b=512) + staging/leaf state; v5e physical VMEM ≳120 MB,
            # far above the 16 MB compiler default
            vmem_limit_bytes=128 * 1024 * 1024),
    )(Xs, n2, n2row, m.astype(jnp.float32), var2d, noise2d)
    del T
    return ld[0, 0], quad[0, 0]
