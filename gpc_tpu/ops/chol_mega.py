"""Whole-evidence Pallas mega-kernel: lazy-Gram blocked Cholesky in ONE op.

The XLA-orchestrated fused evidence (ops/evidence_fast.py) reaches ~100% of
the same-session matmul roofline on pool-throttled sessions but only ~50% on
healthy chips: with ~400 separate XLA ops, per-op dispatch, leaf-cholesky
floors and operand-staging copies are invisible when the MXU is slow and
dominant when it is fast.  This kernel runs the ENTIRE left-looking blocked
factorization of the lazily-materialized RBF Gram matrix — tile generation,
bf16/f32-accum Schur corrections, diagonal-leaf chol+inverse, panel solves,
forward substitution of the RHS, logdet — as a single `pallas_call`:

  for block-column j (f32 leaves of size LEAF=128 inside b=512 blocks):
    diag:  A = K(j,j) + noise·I − Σ_k L[j,k]·L[j,k]ᵀ    (bf16 MXU, f32 acc)
           L_jj, M_j = blocked chol + explicit inverse   (in VMEM)
           v_j = M_j·(m_j − Σ_k L[j,k]·v_k);  logdet += 2·Σ log diag
    rows:  A = K(i,j) − Σ_k L[i,k]·L[j,k]ᵀ               (double-buffered DMA)
           L_ij = A·M_jᵀ;  v_i −= L_ij·v_j;  DMA out (bf16)

The in-VMEM leaf produces (L, L⁻¹) in ONE masked column sweep: the forward
Gauss elimination that forms L is applied simultaneously to an identity
block (row scale + rank-1 outer-product update — all VPU, no per-row MXU
dot), so every later panel solve is a pure MXU GEMM.  The O(N³) work is the
same bf16-input/f32-accumulate precision policy as evidence_fast's bench
path; leaves are f32.

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


def _dot(a, b):
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


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

    Panel loop is Python-unrolled (b/LEAF panels): leaf chol+inv, panel
    solve as GEMM, trailing Schur update, then the block lower-triangular
    inverse assembled column-block by column-block (all MXU GEMMs)."""
    nb = b // LEAF
    # split into a static LEAF-grid up front (Mosaic has no dynamic_slice on
    # values; Python slicing lowers to static lax.slice which it supports)
    Ab = [[A[i * LEAF:(i + 1) * LEAF, j * LEAF:(j + 1) * LEAF]
           for j in range(nb)] for i in range(nb)]
    Ls = [[None] * nb for _ in range(nb)]   # lower blocks of L
    Ms = [[None] * nb for _ in range(nb)]   # lower blocks of L⁻¹ (diag first)
    # right-looking block elimination, all f32 HIGHEST (stays inside the
    # diagonal block — keep the leaf factorization f32-clean)
    def _gemmT(a, c):
        return lax.dot_general(a, c, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGHEST)

    for p in range(nb):
        Lp, Mp = _cholinv_leaf(Ab[p][p])
        Ls[p][p], Ms[p][p] = Lp, Mp
        for i in range(p + 1, nb):
            Ls[i][p] = _gemmT(Ab[i][p], Mp)
        for i in range(p + 1, nb):
            for j in range(p + 1, i + 1):
                Ab[i][j] = Ab[i][j] - _gemmT(Ls[i][p], Ls[j][p])
    # block triangular inverse: M[i][j] = −M[i][i]·Σ_{j≤k<i} L[i][k]·M[k][j]
    for j in range(nb):
        for i in range(j + 1, nb):
            acc = lax.dot_general(Ls[i][j], Ms[j][j], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
            for k in range(j + 1, i):
                acc = acc + lax.dot_general(
                    Ls[i][k], Ms[k][j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
            Ms[i][j] = -lax.dot_general(
                Ms[i][i], acc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
    zero = jnp.zeros((LEAF, LEAF), A.dtype)
    L = jnp.concatenate([
        jnp.concatenate([Ls[i][j] if j <= i else zero for j in range(nb)],
                        axis=1) for i in range(nb)], axis=0)
    M = jnp.concatenate([
        jnp.concatenate([Ms[i][j] if j <= i else zero for j in range(nb)],
                        axis=1) for i in range(nb)], axis=0)
    return L, M


def _mega_kernel(b, nb, q, D, xs_ref, n2_ref, n2row_ref, m_ref, var_ref,
                 noise_ref, L_ref, ld_ref, quad_ref,
                 vbuf, stage, lik, ljk, wsem, rsem_i, rsem_j):
    """One sequential program: the whole N=nb·b factorization.

    L_ref: HBM (ANY) output holding the lower blocks flat-packed at
    tri(i,j) = i(i+1)/2 + j, bf16.  vbuf: (N, D) f32 forward-solve state.
    stage: (2, b, b) bf16 write staging; lik/ljk: (2, b, b) bf16 read
    double buffers."""
    var = var_ref[0, 0]
    noise = noise_ref[0, 0]

    def tri(i, j):
        return i * (i + 1) // 2 + j

    def gram(i, j):
        """var·exp(−‖xs_i − xs_j‖²) tile from the pre-scaled inputs."""
        Xi = xs_ref[pl.ds(i * b, b), :]
        Xj = xs_ref[pl.ds(j * b, b), :]
        G = lax.dot_general(Xi, Xj, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        # n2 comes in BOTH orientations as inputs: Mosaic miscompiles
        # (b,1)↔(1,b) transposes on v5e (see chol_pallas._inv_body note)
        d2 = jnp.maximum(n2_ref[pl.ds(i * b, b), :] +
                         n2row_ref[:, pl.ds(j * b, b)] - 2.0 * G, 0.0)
        return var * jnp.exp(-d2)

    def read_dma(buf, sem, slot, blk):
        return pltpu.make_async_copy(L_ref.at[blk], buf.at[slot], sem.at[slot])

    def corr_loop(i, j, A, with_v, vacc):
        """A −= Σ_{k<j} L[i,k]·L[j,k]ᵀ (and vacc += L[j,k]·v_k when with_v),
        streaming both operand rows with 2-slot double buffering."""
        same = i == j

        @pl.when(j > 0)
        def _():
            read_dma(ljk, rsem_j, 0, tri(j, 0)).start()

        @pl.when((j > 0) & jnp.logical_not(same))
        def _():
            read_dma(lik, rsem_i, 0, tri(i, 0)).start()

        def kstep(k, Av):
            A, vacc = Av
            slot = lax.rem(k, 2)
            nxt = lax.rem(k + 1, 2)

            @pl.when(k + 1 < j)
            def _():
                read_dma(ljk, rsem_j, nxt, tri(j, k + 1)).start()

            @pl.when((k + 1 < j) & jnp.logical_not(same))
            def _():
                read_dma(lik, rsem_i, nxt, tri(i, k + 1)).start()

            read_dma(ljk, rsem_j, slot, tri(j, k)).wait()
            Ljk = ljk[slot]
            if with_v:
                vacc = vacc + _dot(Ljk, vbuf[pl.ds(k * b, b), :]
                                   .astype(jnp.bfloat16))

            @pl.when(jnp.logical_not(same))
            def _():
                read_dma(lik, rsem_i, slot, tri(i, k)).wait()
            # diagonal blocks reuse the j-stream (lik holds stale data then;
            # select discards it elementwise)
            Lik = lax.select(same, Ljk, lik[slot])
            A = A - lax.dot_general(Lik, Ljk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.DEFAULT)
            return A, vacc

        return lax.fori_loop(0, j, kstep, (A, vacc))

    def write_block(widx, blk, value):
        slot = lax.rem(widx, 2)

        @pl.when(widx >= 2)
        def _():
            pltpu.make_async_copy(stage.at[slot], L_ref.at[blk],
                                  wsem.at[slot]).wait()
        stage[slot] = value.astype(jnp.bfloat16)
        pltpu.make_async_copy(stage.at[slot], L_ref.at[blk],
                              wsem.at[slot]).start()

    def column(j, ld):
        # ---- diagonal block ------------------------------------------------
        # noise ridge via thin-iota mask (no resident b×b identity constant
        # — scoped VMEM is tight at 16 MB)
        A = gram(j, j) + jnp.where(
            lax.broadcasted_iota(jnp.int32, (b, 1), 0) ==
            lax.broadcasted_iota(jnp.int32, (1, b), 1), noise, 0.0)
        vacc = jnp.zeros((b, D), jnp.float32)
        A, vacc = corr_loop(j, j, A, True, vacc)
        Ld, Md = _factor_diag(A, b)
        write_block(0, tri(j, j), Ld)
        ld = ld + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ld)))
        vj = lax.dot_general(Md, m_ref[pl.ds(j * b, b), :] - vacc,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
        vbuf[pl.ds(j * b, b), :] = vj
        Md_bf = Md.astype(jnp.bfloat16)

        # ---- off-diagonal rows --------------------------------------------
        def row(i, _):
            A = gram(i, j)
            A, _v = corr_loop(i, j, A, False,
                              jnp.zeros((b, D), jnp.float32))
            Lij = lax.dot_general(A.astype(jnp.bfloat16), Md_bf,
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.DEFAULT)
            write_block(i - j, tri(i, j), Lij)
            vbuf[pl.ds(i * b, b), :] = (vbuf[pl.ds(i * b, b), :]
                                        - _dot(Lij, vj.astype(jnp.bfloat16)))
            return 0

        lax.fori_loop(j + 1, nb, row, 0)

        # drain outstanding write DMAs so column j+1 may read this column
        nwrites = nb - j

        @pl.when(nwrites >= 1)
        def _():
            pltpu.make_async_copy(stage.at[lax.rem(nwrites - 1, 2)],
                                  L_ref.at[tri(nb - 1, j)],
                                  wsem.at[lax.rem(nwrites - 1, 2)]).wait()

        @pl.when(nwrites >= 2)
        def _():
            pltpu.make_async_copy(stage.at[lax.rem(nwrites - 2, 2)],
                                  L_ref.at[tri(nb - 2, j)],
                                  wsem.at[lax.rem(nwrites - 2, 2)]).wait()
        return ld

    ld = lax.fori_loop(0, nb, column, jnp.zeros((1, 1), jnp.float32))
    ld_ref[:] = ld
    v = vbuf[:]
    quad_ref[:] = jnp.sum(v * v, axis=(0, 1), keepdims=True)[:, :]


@functools.partial(jax.jit, static_argnames=("b", "interpret"))
def evidence_mega_rbf(X, m, inv_width, variance, noise, b: int = 512,
                      interpret: bool = False):
    """(logdet K, Σⱼ mⱼᵀK⁻¹mⱼ) for K = rbf-Gram(X) + noise·I, one kernel.

    N must be a multiple of b (pad upstream); b a multiple of LEAF=128.
    Returns f32 scalars.  bf16 Schur/panel GEMM policy ≡ evidence_fast's
    bench policy; same conditioning caveats apply."""
    N, q = X.shape
    D = m.shape[1]
    nb = N // b
    assert N % b == 0 and b % LEAF == 0
    Xs = (X * jnp.sqrt(0.5 * inv_width)).astype(jnp.float32)
    n2 = jnp.sum(Xs * Xs, axis=1, keepdims=True)
    n2row = jnp.reshape(n2, (1, N))
    var2d = jnp.reshape(variance.astype(jnp.float32), (1, 1))
    noise2d = jnp.reshape(noise.astype(jnp.float32), (1, 1))

    kern = functools.partial(_mega_kernel, b, nb, q, D)
    L, ld, quad = pl.pallas_call(
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
            pl.BlockSpec(memory_space=pltpu.ANY),    # L blocks (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, D), jnp.float32),         # vbuf
            pltpu.VMEM((2, b, b), jnp.bfloat16),     # write staging
            pltpu.VMEM((2, b, b), jnp.bfloat16),     # L[i,k] stream
            pltpu.VMEM((2, b, b), jnp.bfloat16),     # L[j,k] stream
            pltpu.SemaphoreType.DMA((2,)),           # write sems
            pltpu.SemaphoreType.DMA((2,)),           # read sems (i)
            pltpu.SemaphoreType.DMA((2,)),           # read sems (j)
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the kernel's resident set (streams+staging+leaf state) peaks
            # ~17 MB transiently; raise the scoped-vmem budget above the
            # 16 MB compiler default
            vmem_limit_bytes=100 * 1024 * 1024),
    )(Xs, n2, n2row, m.astype(jnp.float32), var2d, noise2d)
    del L
    return ld[0, 0], quad[0, 0]
