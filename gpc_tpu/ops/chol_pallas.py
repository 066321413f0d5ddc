"""Pallas in-VMEM Cholesky for the blocked factorization's base case.

Measured on v5e: XLA's cholesky has a flat ~1.3 ms floor for any size ≤1024 —
at N=16k/BASE=512 the 32 base-case factorizations ARE the entire 40 ms cost of
the recursive blocked Cholesky (the GEMMs are nearly free).  This kernel
factors one block that lives entirely in VMEM with a fori_loop of vectorized
column steps (one rsqrt + masked rank-1 trailing update per column, all VPU),
eliminating XLA's per-factorization overhead.

The whole update is expressed with masks instead of dynamic slices so every
step is a full-block vector operation: ~5·n³ VPU flops total, ≈40 µs for
n=256 — ~30× under XLA's floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _chol_body(n):
    # everything stays 2-D, and the index masks stay THIN ((n,1)/(1,n)):
    # Mosaic's layout engine rejects 1-D relayouts, and full (n,n) int32
    # iotas cost 2·4n² bytes of VMEM stack (the 1024-leaf overflowed the
    # 16 MB scoped limit with them — masks are now built from outer
    # products of thin comparisons instead).
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(j, A):
        ej = (cols_r == j).astype(A.dtype)                     # one-hot column
        colj = jnp.sum(A * ej, axis=1, keepdims=True)          # (n, 1) = A[:, j]
        pivot = jnp.sum(jnp.where(rows_c == j, colj, 0.0),
                        keepdims=True)                         # (1, 1)
        inv_d = jax.lax.rsqrt(pivot)
        l = jnp.where(rows_c > j, colj * inv_d, 0.0)           # (n, 1)
        newcol = jnp.where(rows_c == j, pivot * inv_d, l)
        # trailing update A[j+1:, j+1:] -= l·lᵀ: mask each outer-product
        # factor instead of the (n,n) product ((rows>j)&(cols>j) ≡ the
        # outer product of the masked factors because l is zero at row ≤ j)
        lt = jnp.where(cols_r > j, jnp.transpose(l), 0.0)      # (1, n)
        A = A - l * lt
        # write finished column j (zeros above the diagonal)
        A = A * (1.0 - ej) + newcol * ej
        return A

    return body


UNROLL = 8  # columns per loop step: the TPU scalar-core loop overhead (~µs per
            # iteration) dominates the tiny per-column vector work otherwise


def _chol_kernel(n, a_ref, out_ref):
    A = a_ref[:]
    col_step = _chol_body(n)

    def outer(i, A):
        j0 = i * UNROLL
        for c in range(UNROLL):  # unrolled at trace time
            A = col_step(j0 + c, A)
        return A

    A = jax.lax.fori_loop(0, n // UNROLL, outer, A)
    for j in range(n - (n % UNROLL), n):  # static remainder (n % UNROLL ≠ 0)
        A = col_step(j, A)
    # zero the strict upper triangle (untouched input remnants); thin iotas
    # broadcast to an (n,n) i1 mask without (n,n) int32 scratch
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_ref[:] = jnp.where(cols_r <= rows_c, A, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_block(A, interpret: bool = False):
    """Lower Cholesky of a single VMEM-resident block (n ≤ ~1024, f32)."""
    n = A.shape[0]
    if not _HAVE_PALLAS:
        return jnp.linalg.cholesky(A)
    return pl.pallas_call(
        functools.partial(_chol_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        interpret=interpret,
    )(A)


def _inv_body(n):
    """One forward-substitution row step of M = L⁻¹ (masked, all 2-D).

    Row i: M[i, :] = (e_i − L[i, :i]·M[:i, :]) / L[i, i].  Since M[k, j] = 0
    for j > k and the sum only touches k < i, the result is automatically
    lower-triangular — no extra masking of the output row is needed.
    """
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, LM):
        L, M = LM
        lrow = jnp.sum(jnp.where(rows_c == i, L, 0.0), axis=0, keepdims=True)
        lrow_lo = jnp.where(cols_r < i, lrow, 0.0)            # L[i, :i]
        # (1,n)·(n,n) on the MXU — a (n,1)↔(1,n) transpose relayout here is
        # rejected/miscompiled by Mosaic (non-finite output on v5e).
        # Explicit HIGHEST: Mosaic rejects an inherited Precision.HIGH, and
        # the inverse must be full f32 (it feeds every later panel GEMM).
        contrib = jax.lax.dot_general(lrow_lo, M, (((1,), (0,)), ((), ())),
                                      preferred_element_type=L.dtype,
                                      precision=jax.lax.Precision.HIGHEST)
        pivot = jnp.sum(jnp.where(cols_r == i, lrow, 0.0),
                        keepdims=True)                        # (1, 1)
        ei = (cols_r == i).astype(L.dtype)
        mrow = (ei - contrib) / pivot
        M = M + jnp.where(rows_c == i, mrow, 0.0)
        return L, M

    return body


def _chol_inv_kernel(n, a_ref, l_ref, m_ref):
    A = a_ref[:]
    col_step = _chol_body(n)

    def outer(i, A):
        j0 = i * UNROLL
        for c in range(UNROLL):
            A = col_step(j0 + c, A)
        return A

    A = jax.lax.fori_loop(0, n // UNROLL, outer, A)
    for j in range(n - (n % UNROLL), n):
        A = col_step(j, A)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    L = jnp.where(cols_r <= rows_c, A, 0.0)

    row_step = _inv_body(n)

    def outer_inv(i, LM):
        j0 = i * UNROLL
        for c in range(UNROLL):
            LM = row_step(j0 + c, LM)
        return LM

    LM = jax.lax.fori_loop(0, n // UNROLL, outer_inv,
                           (L, jnp.zeros((n, n), A.dtype)))
    for j in range(n - (n % UNROLL), n):
        LM = row_step(j, LM)
    L, M = LM
    l_ref[:] = L
    m_ref[:] = M


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inv_block(A, interpret: bool = False):
    """(L, L⁻¹) of one VMEM-resident PD block in a single kernel.

    The explicit triangular inverse is the MAGMA dtrtri trick: with M = L⁻¹ on
    hand, every panel solve in the blocked factorization becomes a pure GEMM
    on the MXU instead of an XLA triangular_solve (which has a ~ms floor per
    call on TPU regardless of size).  Leaf blocks of a jittered kernel matrix
    are well-conditioned (diag ≈ var + noise), so the explicit inverse is safe
    in f32 — and the reference itself builds explicit inverses via dpotri
    (CMatrix.cpp:421-442).

    For n a multiple of 128 this dispatches to the fused Gauss-Jordan
    kernel (`chol_inv_block_fused`): the masked column sweep updates L and
    L⁻¹ together (rank-1 outer products, all VPU), avoiding this module's
    original per-row (1,n)·(n,n) MXU recursion — which made the "pallas"
    leaf mode LOSE to plain XLA chol in the round-1/2 sweeps.
    """
    n = A.shape[0]
    if not _HAVE_PALLAS:
        L = jnp.linalg.cholesky(A)
        from jax.scipy.linalg import solve_triangular
        return L, solve_triangular(L, jnp.eye(n, dtype=A.dtype), lower=True)
    if n % 128 == 0:
        return chol_inv_block_fused(A, interpret=interpret)
    return pl.pallas_call(
        functools.partial(_chol_inv_kernel, n),
        out_shape=(jax.ShapeDtypeStruct((n, n), A.dtype),
                   jax.ShapeDtypeStruct((n, n), A.dtype)),
        interpret=interpret,
    )(A)


def _chol_inv_fused_kernel(n, a_ref, l_ref, m_ref):
    from gpc_tpu.ops.chol_panel import _cholinv_leaf, _factor_diag
    if n == 128:
        L, M = _cholinv_leaf(a_ref[:])
    else:
        L, M = _factor_diag(a_ref[:], n)
    l_ref[:] = L
    m_ref[:] = M


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inv_block_fused(A, interpret: bool = False):
    """(L, L⁻¹) via the chol_mega fused Gauss-Jordan factorization, one op.

    128-blocked elimination where each leaf's inverse is maintained by the
    same rank-1 column updates as the Cholesky itself (no per-row MXU
    dots); panel solves / trailing updates / inverse assembly are small
    HIGHEST-precision GEMMs.  n must be a multiple of 128."""
    n = A.shape[0]
    assert n % 128 == 0
    return pl.pallas_call(
        functools.partial(_chol_inv_fused_kernel, n),
        out_shape=(jax.ShapeDtypeStruct((n, n), A.dtype),
                   jax.ShapeDtypeStruct((n, n), A.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else _fused_params(),
    )(A)


def _fused_params():
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
