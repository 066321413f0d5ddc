"""Whole-evidence Pallas mega-kernel: lazy-Gram blocked Cholesky in ONE op.

The XLA-orchestrated fused evidence (ops/evidence_fast.py) reaches ~100% of
the same-session matmul roofline on pool-throttled sessions but only ~55% on
healthy chips: with ~400 separate XLA ops, per-op dispatch, leaf-cholesky
floors and operand-staging copies are invisible when the MXU is slow and
dominant when it is fast.  This kernel runs the ENTIRE left-looking blocked
factorization of the lazily-materialized RBF Gram matrix — tile generation,
bf16/f32-accum Schur corrections, diagonal-leaf chol+inverse, panel solves,
forward substitution of the RHS, logdet — as a single `pallas_call`.

Schedule (v2 — "row-panel" form; v5e has ≳120 MB of physical VMEM, far
above the 16 MB compiler default, so whole block-rows of L stay resident):

  L's subdiagonal blocks are stored TRANSPOSED and flat-packed in HBM at
  tri(i,j) = i(i+1)/2 + j, so block-row i's ancestors L[i,0..j) are ONE
  contiguous (j,b,b) DMA, and every Schur correction collapses to a single
  tall MXU dot:  reshape(row_i,(j·b,b))ᵀ · reshape(row_j,(j·b,b)) =
  Σ_k L[i,k]·L[j,k]ᵀ.  Per column j (Python-unrolled, static widths):

    diag:  A = K(j,j) + noise·I − VjᵀVj;  (L_jj, L_jj⁻¹) in VMEM;
           v_j = L_jj⁻¹·(m_j − Vjᵀ·v[:jb]);  logdet += 2·Σ log diag
    rows:  A = K(i,j) − ViᵀVj          (row_i double-buffered DMA)
           L_ijᵀ = L_jj⁻¹·Aᵀ (one GEMM);  v_i −= L_ij·v_j;  DMA out

The in-VMEM leaf (LEAF=128) produces (L, L⁻¹) in ONE masked column sweep:
the forward Gauss elimination that forms L is applied simultaneously to an
identity block (row scale + rank-1 outer-product update — all VPU, no
per-row MXU dot), so every later panel solve is a pure MXU GEMM.  The
O(N³) work uses the same bf16-input/f32-accumulate policy as
evidence_fast's bench path; leaves are f32.

Replaces (TPU-first) the dpotrf/dtrsv hot block of CGp::logLikelihood
(/root/reference/CGp.cpp:920-937, CMatrix.cpp:371-412).  Forward-only:
parity and training autodiff use ops/lazy_evidence.py / models/gp.py.
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

LEAF = 128
_UNROLL = 8


def _dotT(a, b):
    """a @ bᵀ with bf16 inputs, f32 accumulation (1-pass MXU)."""
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def _dotc0(a, b):
    """aᵀ @ b (contract dim 0) with bf16 inputs, f32 accumulation."""
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def _gemm32(a, b, dims=(((1,), (0,)), ((), ()))):
    """Small f32 GEMM at HIGHEST (Mosaic rejects inherited HIGH)."""
    return lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _cholinv_leaf(A):
    """(L, L⁻¹) of one PD LEAF×LEAF f32 block, single masked column sweep.

    Column c of the Cholesky and the matching Gauss-elimination update of an
    identity block (M[c,:] /= L_cc then M[r>c,:] −= L[r,c]·M[c,:]) — the
    latter is a row extraction + rank-1 outer product, all VPU."""
    n = A.shape[0]
    rows_c = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_r = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def col(c, AM):
        A, M = AM
        ej = (cols_r == c).astype(A.dtype)
        colj = jnp.sum(A * ej, axis=1, keepdims=True)
        pivot = jnp.sum(jnp.where(rows_c == c, colj, 0.0), keepdims=True)
        inv_d = lax.rsqrt(pivot)
        l = jnp.where(rows_c > c, colj * inv_d, 0.0)
        newcol = jnp.where(rows_c == c, pivot * inv_d, l)
        lt = jnp.where(cols_r > c, jnp.transpose(l), 0.0)
        A = A - l * lt
        A = A * (1.0 - ej) + newcol * ej
        # inverse: scale row c by 1/L_cc (= inv_d), eliminate below with the
        # strictly-below chol column l (already divided by L_cc)
        mrow = jnp.sum(jnp.where(rows_c == c, M, 0.0), axis=0,
                       keepdims=True) * inv_d
        M = M - l * mrow
        M = jnp.where(rows_c == c, mrow, M)
        return A, M

    M0 = (rows_c == jnp.transpose(rows_c)).astype(A.dtype)  # identity

    def outer(s, AM):
        c0 = s * _UNROLL
        for u in range(_UNROLL):
            AM = col(c0 + u, AM)
        return AM

    A, M = lax.fori_loop(0, n // _UNROLL, outer, (A, M0))
    L = jnp.where(cols_r <= rows_c, A, 0.0)
    return L, M


def _factor_diag(A, b):
    """(L, L⁻¹) of a PD b×b f32 block via LEAF-blocked elimination.

    Static LEAF-grid blocks only (Mosaic has no dynamic_slice on values):
    leaf chol+inv, panel solves and trailing Schur updates as small GEMMs,
    then the block lower-triangular inverse assembled column-block by
    column-block.  Returns concatenated (L, M)."""
    nb = b // LEAF
    Ab = [[A[i * LEAF:(i + 1) * LEAF, j * LEAF:(j + 1) * LEAF]
           for j in range(nb)] for i in range(nb)]
    Ls = [[None] * nb for _ in range(nb)]
    Ms = [[None] * nb for _ in range(nb)]
    for p in range(nb):
        Lp, Mp = _cholinv_leaf(Ab[p][p])
        Ls[p][p], Ms[p][p] = Lp, Mp
        for i in range(p + 1, nb):
            Ls[i][p] = _gemm32(Ab[i][p], Mp, (((1,), (1,)), ((), ())))
        for i in range(p + 1, nb):
            for j in range(p + 1, i + 1):
                Ab[i][j] = Ab[i][j] - _gemm32(
                    Ls[i][p], Ls[j][p], (((1,), (1,)), ((), ())))
    # block triangular inverse: M[i][j] = −M[i][i]·Σ_{j≤k<i} L[i][k]·M[k][j]
    for j in range(nb):
        for i in range(j + 1, nb):
            acc = _gemm32(Ls[i][j], Ms[j][j])
            for k in range(j + 1, i):
                acc = acc + _gemm32(Ls[i][k], Ms[k][j])
            Ms[i][j] = -_gemm32(Ms[i][i], acc)
    zero = jnp.zeros((LEAF, LEAF), A.dtype)
    L = jnp.concatenate([
        jnp.concatenate([Ls[i][j] if j <= i else zero for j in range(nb)],
                        axis=1) for i in range(nb)], axis=0)
    M = jnp.concatenate([
        jnp.concatenate([Ms[i][j] if j <= i else zero for j in range(nb)],
                        axis=1) for i in range(nb)], axis=0)
    return L, M


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
