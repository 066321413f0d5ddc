"""Whole-evidence Pallas kernel, v3 "panel" schedule: XLA-flat op structure
in ONE kernel.

Round-3 attribution (BASELINE.md): the XLA flat schedule runs the
correction+panel dots at the compute-bound floor (9.1 ms at N=16k) but pays
4.7 ms for the SERIAL leaf chain and 2.7 ms misc; the v2 Pallas mega kernel
(tools/chol_mega_v2.py) hides the leaves (FAKELEAF ≡ normal, measured) but loses
~8 ms to per-block-row op overhead — its Schur work is 496 row iterations of
~10 small Mosaic ops each.  This kernel keeps BOTH wins: per column j the
Schur correction is a handful of LARGE chunked GEMMs against a flat
row-major L buffer in HBM — (RC×KC)·(b×KC)ᵀ chunks, double-buffered DMA —
so the whole factorization is a few hundred MXU-saturating ops, while the
diagonal leaves and the forward solve stay in-VMEM.

Compile-time discipline (measured: 64 UNROLLED big dots cost 370 s of
Mosaic compile; the same dots in a fori_loop compile in seconds): the
column loop itself is ONE lax.fori_loop over j.  Chunk-tail sizes are the
only per-column statics; with RC = KC = 4b and nb ≡ 0 (mod 4) they depend
on j only through j mod 4, so the fori body is a lax.switch over FOUR
static tail variants.  Within a variant everything is traced-offset /
static-size: full-chunk counts (kfull = j//4, rfull) are traced fori trip
counts; the (rows × k) correction space splits into exact quadrants —

  A: full RC × full KC — flattened fori, slab slots {0,1}, prefetch inside
  B: full RC × k-tail  — fori over rows, slots {2,3}
  C: r-tail × full KC  — fori over k, slots {0,1} (A drained; head primed
                         right after A so it overlaps B)
  D: r-tail × k-tail   — one dot, slot 2 (primed after B)

— zero wasted FLOPs, zero unrolled big-op chains.

Layout: L is ONE (N, N) bf16 row-major HBM buffer (pallas out, ANY memory).
Column j reads slabs L[r0:r0+rows, k0:k0+kw] (2-D strided DMA, ≥1 KB rows)
and the j-row L[jb:(j+1)b, 0:jb]; it writes only the subdiagonal panel
L[(j+1)b:, jb:(j+1)b].  Corrections contract the k axis directly
(slab · j-rowᵀ), so no transposed storage and no reshape games (the v2
Mosaic-fragility source).

Per column j (its j-row ancestor copy was STARTED at the end of column j−1,
so it only waits here):

  prime slab streams; wait vrow
  acc[r] = var·exp(−d2(r, j))                  (panel Gram fill, chunked)
  acc[r] −= slab·vrowᵀ                         (quadrant dots, bf16/f32)
  A_d = acc[diag] + noise·I;  L_jj⁻¹ + logdet = in-VMEM fast-sweep leaves
  v_j = v_row·L_jj⁻ᵀ        (forward-solve state is row-stored (D, N))
  per 2·RC solve span: Lp = acc·L_jj⁻ᵀ;  v −= v_j·Lpᵀ;  stage → writeback
  start column j+1's vrow copy

Replaces (TPU-first) the dpotrf/dtrsv hot block of CGp::logLikelihood
(/root/reference/CGp.cpp:920-937, CMatrix.cpp:371-412).  Forward-only: the
parity/training paths are ops/lazy_evidence.py + jax.grad.
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

CB = 4  # chunk size in b-blocks: RC = KC = CB·b; nb must divide by CB
LEAF = 128
_UNROLL = 16
_UNROLL_OLD = 8   # the v2 masked sweep's unroll (kept for A/B stability)


def _gemm32(a, b, dims=(((1,), (0,)), ((), ()))):
    """Small f32 GEMM at HIGHEST (Mosaic rejects inherited HIGH)."""
    return lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _cholinv_leaf(A):
    """(L, L⁻¹) of one PD LEAF×LEAF f32 block, single MASKED column sweep —
    the v2 (chol_mega) leaf, kept as the mode="oldleaf" A/B reference and
    for ops/chol_pallas's fused (L, L⁻¹) op.  ~23 ops/column vs the fast
    augmented sweep's ~13 (see _cholinv_leaf_fast; measured 54.3 vs 5.7 µs
    per 128-sweep, BASELINE.md round 4)."""
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
        c0 = s * _UNROLL_OLD
        for u in range(_UNROLL_OLD):
            AM = col(c0 + u, AM)
        return AM

    A, M = lax.fori_loop(0, n // _UNROLL_OLD, outer, (A, M0))
    L = jnp.where(cols_r <= rows_c, A, 0.0)
    return L, M


def _factor_diag(A, b):
    """(L, L⁻¹) of a PD b×b f32 block via LEAF-blocked elimination with the
    MASKED v2 leaves — the mode="oldleaf" A/B reference (the default path is
    _factor_diag_fast).  Static LEAF-grid blocks only (Mosaic has no
    dynamic_slice on values)."""
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


def _cholinv_leaf_fast(A):
    """L⁻¹ of one PD LEAF×LEAF f32 block — augmented-matrix column sweep.

    The leaf chain is pure op-ISSUE latency on the single-stream TPU core
    (measured: ~0.35 µs per matrix column; VPU/MXU overlap does NOT exist —
    tools/tpu_overlap_probe.py), so the only lever is ops per column.  This
    sweep maintains W = [A | M] and applies ONE unmasked rank-1 row update
    per column (~13 ops/col vs ~23 in chol_mega._cholinv_leaf):

      · the A half's trailing (r > c, k > c) block receives the exact
        symmetric Schur update, because row c of A equals column c by
        symmetry — so the update row (rowc·d^-½) doubles as both the
        Gauss-Jordan elimination row for M and lᵀ for A;
      · columns ≤ c of the A half get corrupted by the unmasked update and
        are NEVER read again (future columns read only k > c);
      · L is never stored: the caller takes logdet from diag(M) = 1/diag(L).

    Returns M = L⁻¹ (lower triangular, exact rows; strictly-upper garbage is
    zeroed by the final mask)."""
    n = A.shape[0]
    rows_c = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_r = lax.broadcasted_iota(jnp.int32, (1, 2 * n), 1)
    colmask = cols_r[:, :n]
    W0 = jnp.concatenate(
        [A, (rows_c == colmask).astype(A.dtype)], axis=1)

    def col(c, W):
        rowsel = (rows_c == c).astype(A.dtype)
        rowc = jnp.sum(W * rowsel, axis=0, keepdims=True)        # (1, 2n)
        pivot = jnp.sum(jnp.where(cols_r == c, rowc, 0.0), keepdims=True)
        inv_d = lax.rsqrt(pivot)
        colj = jnp.sum(jnp.where(colmask == c, W[:, :n], 0.0), axis=1,
                       keepdims=True)                            # (n, 1)
        l = jnp.where(rows_c > c, colj, 0.0) * inv_d
        urow = rowc * inv_d
        W = W - l * urow
        return jnp.where(rows_c == c, urow, W)

    def outer(s, W):
        c0 = s * _UNROLL
        for u in range(_UNROLL):
            W = col(c0 + u, W)
        return W

    W = lax.fori_loop(0, n // _UNROLL, outer, W0)
    M = W[:, n:]
    return jnp.where(colmask <= rows_c, M, 0.0)


def _factor_diag_fast(A, b, prec=None, leaf=LEAF):
    """(L_jj⁻¹, logdet) of a PD b×b block: leaf-blocked elimination with the
    fast augmented leaves — never materializes L (_factor_diag's structure
    minus the L bookkeeping; logdet = −2 Σ log diag(leaf M)).
    prec overrides the assembly-GEMM precision (HIGHEST default; DEFAULT =
    fewer MXU passes, mode "leafdef").  `leaf` sets the sweep width: 256
    (mode "leaf256") halves the leaf count per block — total sweep columns
    are unchanged (b), but the inter-leaf assembly GEMM count shrinks
    O((b/leaf)³) → the round-5 leaf-chain lever (VERDICT r4 ask #1b)."""
    if prec is None:
        gemm = _gemm32
    else:
        def gemm(a, bm, dims=(((1,), (0,)), ((), ()))):
            return lax.dot_general(a, bm, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    LEAF_ = leaf
    nb = b // LEAF_
    Ab = [[A[i * LEAF_:(i + 1) * LEAF_, j * LEAF_:(j + 1) * LEAF_]
           for j in range(nb)] for i in range(nb)]
    Ls = [[None] * nb for _ in range(nb)]
    Ms = [[None] * nb for _ in range(nb)]
    ld = jnp.zeros((), jnp.float32)
    for p in range(nb):
        Mp = _cholinv_leaf_fast(Ab[p][p])
        Ms[p][p] = Mp
        ld = ld - 2.0 * jnp.sum(jnp.log(jnp.diagonal(Mp)))
        for i in range(p + 1, nb):
            Ls[i][p] = gemm(Ab[i][p], Mp, (((1,), (1,)), ((), ())))
        for i in range(p + 1, nb):
            for j in range(p + 1, i + 1):
                Ab[i][j] = Ab[i][j] - gemm(
                    Ls[i][p], Ls[j][p], (((1,), (1,)), ((), ())))
    for j in range(nb):
        for i in range(j + 1, nb):
            acc = gemm(Ls[i][j], Ms[j][j])
            for k in range(j + 1, i):
                acc = acc + gemm(Ls[i][k], Ms[k][j])
            Ms[i][j] = -gemm(Ms[i][i], acc)
    zero = jnp.zeros((LEAF_, LEAF_), A.dtype)
    M = jnp.concatenate([
        jnp.concatenate([Ms[i][j] if j <= i else zero for j in range(nb)],
                        axis=1) for i in range(nb)], axis=0)
    return M, ld


def _vrow_gemm(v, M):
    """v·Mᵀ for ROW-stored solve state: v (D, n), M (m, n) → (D, m).

    The forward-solve state lives as (D, N) — an (N, 1) column vector would
    pad its lane dimension 1 → 128 in VMEM (8.4 MB for 64 KB of data; m and
    vbuf together tipped the 128 MB budget) — and the row form needs no
    (n,1)↔(1,n) transposes (a known Mosaic miscompile pattern)."""
    return lax.dot_general(v.astype(jnp.bfloat16), M.astype(jnp.bfloat16),
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def _dot_kk(a, b):
    """a · bᵀ (contract the shared k axis, dim 1) — bf16 in, f32 accum."""
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT)


def _panel_kernel(b, nb, q, D, nv, mode,
                  xs_ref, n2row_ref, m_ref, var_ref, noise_ref,
                  T_ref, ld_ref, quad_ref, v_ref,
                  acc, slab, vrow, stage, vbuf, ldacc, dstage,
                  rsem, vsem, wsem, dsem):
    N = nb * b
    RC = KC = CB * b

    def dsb(off, sz):
        """pl.ds with a divisibility hint: every dynamic offset in this
        kernel is a multiple of b, which Mosaic cannot prove on its own
        ("Failed to prove that a tile index ... is divisible by the
        tiling") — pl.multiple_of carries the proof."""
        if isinstance(off, int):
            return pl.ds(off, sz)
        return pl.ds(pl.multiple_of(off, b), sz)
    var = var_ref[0, 0]
    noise = noise_ref[0, 0]
    modes = frozenset(mode.split("+"))   # slice modes compose: "fakeleaf+notail"
    dma = "nodma" not in modes

    vbuf[:, :] = m_ref[:, :]           # row-stored residual (D, N)
    ldacc[:, :] = jnp.zeros((1, 1), jnp.float32)

    def rd(slot, r0, rows, k0, kw):
        return pltpu.make_async_copy(
            T_ref.at[dsb(r0, rows), dsb(k0, kw)],
            slab.at[slot, dsb(0, rows), dsb(0, kw)],
            rsem.at[slot])

    def make_variant(c):
        """Column body for j ≡ c (mod CB): tail sizes are static here."""
        ktail = c * b                         # = jb mod KC
        rtail = ((-c) % CB) * b               # = (N - jb) mod RC
        stail = ((CB - 1 - c) % CB) * b       # = (N - jb - b) mod RC

        def col(j, _):
            jb = j * b
            nrem = N - jb
            kfull = j // CB
            rfull = (nb - j) // CB
            nA = rfull * kfull
            rt0 = jb + rfull * RC             # r-tail start row (traced)

            # -- j-row ancestors + prime A/B heads --------------------------
            # The j-row copy was STARTED at the end of column j−1 (its panels
            # were drained by then), so by now the DMA has had a whole
            # solve+drain phase to land — this column only WAITS.  DMA sizes
            # must be STATIC: kfull KC-wide chunks (traced offsets) + the
            # static k-tail, one semaphore, waited in start order.
            def vrow_cp(t):
                return pltpu.make_async_copy(
                    T_ref.at[dsb(jb, b), dsb(t * KC, KC)],
                    vrow.at[:, dsb(t * KC, KC)], vsem)

            def vrow_tail_cp():
                return pltpu.make_async_copy(
                    T_ref.at[dsb(jb, b), dsb(kfull * KC, ktail)],
                    vrow.at[:, dsb(kfull * KC, ktail)], vsem)

            if dma:
                @pl.when(nA > 0)
                def _():
                    rd(0, jb, RC, 0, KC).start()
                if ktail > 0 and "notail" not in modes:
                    @pl.when(rfull > 0)
                    def _():
                        rd(2, jb, RC, kfull * KC, ktail).start()

            def vwait(t, _):
                vrow_cp(t).wait()
                return 0
            lax.fori_loop(0, kfull, vwait, 0)
            if ktail > 0:
                vrow_tail_cp().wait()

            # -- panel Gram (VALUE producer; stored by the k0==0 chunks) ----
            def gram_val(r0, rows):
                Xi = xs_ref[dsb(r0, rows), :]
                Xj = xs_ref[dsb(jb, b), :]
                G = lax.dot_general(Xi, Xj, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)
                # row norms derived in-kernel (a padded (N,1) f32 input costs
                # 8.4 MB of VMEM — it tipped the 128 MB budget)
                n2i = jnp.sum(Xi * Xi, axis=1, keepdims=True)
                d2 = jnp.maximum(n2i +
                                 n2row_ref[:, dsb(jb, b)] - 2.0 * G, 0.0)
                g = var * d2 if "nogram" in modes else var * jnp.exp(-d2)
                if "zerogram" in modes:   # isolate the whole gram-fill cost
                    g = jnp.full((rows, b), var, jnp.float32)
                if nv < N:
                    # ragged-N padding: rows/cols ≥ nv carry NO kernel mass —
                    # the pad block factors as √noise·I (its logdet correction
                    # is analytic at the caller).  Static gate: the bench
                    # geometry (nv == N) compiles to the identical program.
                    ri = r0 + lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
                    cj = jb + lax.broadcasted_iota(jnp.int32, (1, b), 1)
                    g = jnp.where((ri < nv) & (cj < nv), g, 0.0)
                return g

            # column j = 0 has no correction chunks: fill acc directly
            if c == 0:
                @pl.when(j == 0)
                def _():
                    def gram_body(t, _):
                        acc[dsb(t * RC, RC), :] = gram_val(t * RC, RC)
                        return 0
                    lax.fori_loop(0, rfull, gram_body, 0)

            peel = "peelgram" in modes and "fusegram" not in modes
            if "fusegram" not in modes and not peel:
                # DEFAULT: separate gram prepass + unconditional subtract
                # chunks.  The "fused" alternative (gram stored by the k0==0
                # chunk under pl.when) was measured ~1 ms SLOWER at N=16k —
                # two predicated stores per chunk cost more than one full
                # acc pass — and is kept behind mode "fusegram"
                @pl.when(j > 0)
                def _():
                    def gram_body(t, _):
                        acc[dsb(t * RC, RC), :] = gram_val(jb + t * RC, RC)
                        return 0
                    lax.fori_loop(0, rfull, gram_body, 0)
                if rtail > 0:
                    @pl.when(j > 0)
                    def _():
                        acc[dsb(rt0 - jb, rtail), :] = gram_val(rt0, rtail)
            if peel and c != 0:
                # "peelgram": the k0==0 chunk of each quadrant initializes
                # acc (STATICALLY peeled A0/C0 loops below — no per-chunk
                # predication, the fusegram killer), so the prepass is
                # needed only for correction-free geometry: kfull == 0
                # (j < CB, c ≠ 0).  Traced trip counts keep it branch-free.
                def gram_body(t, _):
                    acc[dsb(t * RC, RC), :] = gram_val(jb + t * RC, RC)
                    return 0
                lax.fori_loop(0, jnp.where(kfull == 0, rfull, 0),
                              gram_body, 0)
                if rtail > 0:
                    def gram_tail(t, _):
                        acc[dsb(rt0 - jb, rtail), :] = gram_val(rt0, rtail)
                        return 0
                    lax.fori_loop(0, jnp.where(kfull == 0, 1, 0),
                                  gram_tail, 0)

            def sub_chunk(slot, r0, rows, k0, kw, first=False):
                """One correction chunk.  Under "fusegram" (traced) or
                "peelgram" (static `first`), the k0==0 chunk of each row
                range INITIALIZES acc with the Gram panel minus its dot —
                fusing the separate Gram pass into the first correction
                (saves one full acc write+read pass per column)."""
                if "fusegram" not in modes:
                    if first:   # peelgram: statically-peeled k0==0 chunk
                        acc[dsb(r0 - jb, rows), :] = (
                            gram_val(r0, rows)
                            - _dot_kk(slab[slot, dsb(0, rows), dsb(0, kw)],
                                      vrow[:, dsb(k0, kw)]))
                    elif "nodot" not in modes:  # nodot: skip the subtract
                        acc[dsb(r0 - jb, rows), :] = (   # in this branch too
                            acc[dsb(r0 - jb, rows), :]
                            - _dot_kk(slab[slot, dsb(0, rows), dsb(0, kw)],
                                      vrow[:, dsb(k0, kw)]))
                    return
                first = k0 == 0
                if "nodot" in modes:
                    @pl.when(first)
                    def _():
                        acc[dsb(r0 - jb, rows), :] = gram_val(r0, rows)
                    return
                d = _dot_kk(slab[slot, dsb(0, rows), dsb(0, kw)],
                            vrow[:, dsb(k0, kw)])

                @pl.when(first)
                def _():
                    acc[dsb(r0 - jb, rows), :] = gram_val(r0, rows) - d

                @pl.when(jnp.logical_not(first))
                def _():
                    acc[dsb(r0 - jb, rows), :] = (
                        acc[dsb(r0 - jb, rows), :] - d)

            # -- quadrant A --------------------------------------------------
            if not peel:
                def A_body(idx, _):
                    r0 = jb + (idx // kfull) * RC
                    k0 = (idx % kfull) * KC
                    slot = lax.rem(idx, 2)
                    if dma:
                        @pl.when(idx + 1 < nA)
                        def _():
                            nidx = idx + 1
                            rd(lax.rem(nidx, 2), jb + (nidx // kfull) * RC,
                               RC, (nidx % kfull) * KC, KC).start()
                        rd(slot, r0, RC, k0, KC).wait()
                    sub_chunk(slot, r0, RC, k0, KC)
                    return 0
                lax.fori_loop(0, nA, A_body, 0)
            else:
                # peeled A0 (k0 == 0, initializing stores) then A' (k ≥ 1,
                # subtracts) — identical chunk set, zero predication
                def A0_body(t, _):
                    r0 = jb + t * RC
                    slot = lax.rem(t, 2)
                    if dma:
                        @pl.when(t + 1 < rfull)
                        def _():
                            rd(lax.rem(t + 1, 2), jb + (t + 1) * RC, RC,
                               0, KC).start()
                        rd(slot, r0, RC, 0, KC).wait()
                    sub_chunk(slot, r0, RC, 0, KC, first=True)
                    return 0
                lax.fori_loop(0, jnp.where(kfull > 0, rfull, 0), A0_body, 0)
                nA1 = rfull * jnp.maximum(kfull - 1, 0)
                kdiv = jnp.maximum(kfull - 1, 1)
                # the A'/C0 primes use STATIC offset KC (trace-validated
                # even under pl.when); at N < 2·KC no column ever has
                # kfull > 1, so the primes are statically dead there
                if dma and N >= 2 * KC:
                    @pl.when(nA1 > 0)
                    def _():
                        rd(0, jb, RC, KC, KC).start()   # prime A'(r=0, k=1)

                def A1_body(idx, _):
                    r = idx // kdiv
                    k = 1 + lax.rem(idx, kdiv)
                    slot = lax.rem(idx, 2)
                    if dma:
                        @pl.when(idx + 1 < nA1)
                        def _():
                            nidx = idx + 1
                            rd(lax.rem(nidx, 2), jb + (nidx // kdiv) * RC,
                               RC, (1 + lax.rem(nidx, kdiv)) * KC, KC).start()
                        rd(slot, jb + r * RC, RC, k * KC, KC).wait()
                    sub_chunk(slot, jb + r * RC, RC, k * KC, KC)
                    return 0
                lax.fori_loop(0, nA1, A1_body, 0)

            notail = "notail" in modes
            # prime C's head (slots 0/1 drained): overlaps quadrant B
            if dma and rtail > 0 and not notail:
                @pl.when(kfull > 0)
                def _():
                    rd(0, rt0, rtail, 0, KC).start()

            # -- quadrant B --------------------------------------------------
            if ktail > 0 and not notail:
                def B_body(t, _):
                    r0 = jb + t * RC
                    slot = 2 + lax.rem(t, 2)
                    if dma:
                        @pl.when(t + 1 < rfull)
                        def _():
                            rd(2 + lax.rem(t + 1, 2), jb + (t + 1) * RC, RC,
                               kfull * KC, ktail).start()
                        rd(slot, r0, RC, kfull * KC, ktail).wait()
                    sub_chunk(slot, r0, RC, kfull * KC, ktail)
                    return 0
                lax.fori_loop(0, rfull, B_body, 0)

            # prime D (slot 2 free: B fully drained, or never ran)
            if dma and rtail > 0 and ktail > 0 and not notail:
                rd(2, rt0, rtail, kfull * KC, ktail).start()

            # -- quadrant C --------------------------------------------------
            if rtail > 0 and not notail:
                def C_body(t, _):
                    slot = lax.rem(t, 2)
                    if dma:
                        @pl.when(t + 1 < kfull)
                        def _():
                            rd(lax.rem(t + 1, 2), rt0, rtail,
                               (t + 1) * KC, KC).start()
                        rd(slot, rt0, rtail, t * KC, KC).wait()
                    sub_chunk(slot, rt0, rtail, t * KC, KC)
                    return 0
                if not peel:
                    lax.fori_loop(0, kfull, C_body, 0)
                else:
                    # peeled C0 (k0 == 0 initializing store for the r-tail
                    # rows), then C' from t=1 — C_body unchanged
                    def C0_body(t, _):
                        if dma:
                            if N >= 2 * KC:
                                @pl.when(kfull > 1)
                                def _():
                                    rd(1, rt0, rtail, KC, KC).start()
                            rd(0, rt0, rtail, 0, KC).wait()
                        sub_chunk(0, rt0, rtail, 0, KC, first=True)
                        return 0
                    lax.fori_loop(0, jnp.where(kfull > 0, 1, 0), C0_body, 0)
                    lax.fori_loop(1, kfull, C_body, 0)

            # -- quadrant D --------------------------------------------------
            if rtail > 0 and ktail > 0 and not notail:
                if dma:
                    rd(2, rt0, rtail, kfull * KC, ktail).wait()
                sub_chunk(2, rt0, rtail, kfull * KC, ktail)

            # -- diagonal leaf ----------------------------------------------
            A = acc[dsb(0, b), :] + jnp.where(
                lax.broadcasted_iota(jnp.int32, (b, 1), 0) ==
                lax.broadcasted_iota(jnp.int32, (1, b), 1), noise, 0.0)
            if "fakeleaf" in modes:
                eye = (lax.broadcasted_iota(jnp.int32, (b, 1), 0) ==
                       lax.broadcasted_iota(jnp.int32, (1, b), 1)).astype(
                           jnp.float32)
                dcol = jnp.max(jnp.abs(A), axis=1, keepdims=True) + 1.0
                Md = eye * lax.reciprocal(dcol)
                ldj = jnp.sum(jnp.log(dcol))
            elif "oldleaf" in modes:    # chol_mega's leaf, for A/B timing
                Ld, Md = _factor_diag(A, b)
                ldj = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ld)))
            else:
                Md, ldj = _factor_diag_fast(
                    A, b, prec=(lax.Precision.DEFAULT
                                if "leafdef" in modes else None),
                    leaf=(256 if "leaf256" in modes else LEAF))
            ldacc[:, :] = ldacc[:, :] + ldj
            # vj (D, b) = v_row·Mdᵀ — f32-ish via the bf16 policy
            vj = _vrow_gemm(vbuf[:, dsb(jb, b)], Md)
            vbuf[:, dsb(jb, b)] = vj
            Md_bf = Md.astype(jnp.bfloat16)
            if "diag" in modes:
                # product-engine residual: store L_jj⁻¹ into T's diagonal
                # block (the leaves never materialize L_jj itself) so the
                # analytic custom-VJP backward can reconstruct L⁻¹
                # (ops/panel_engine).  Off the product path (the bench) the
                # diag blocks stay unwritten and unread.
                dstage[:, :] = Md_bf
                dcp = pltpu.make_async_copy(
                    dstage.at[:, :], T_ref.at[dsb(jb, b), dsb(jb, b)], dsem)
                dcp.start()
                dcp.wait()

            # -- panel solve + writeback + forward-solve --------------------
            sfull = (nrem - b - stail) // RC   # exact: divisible by RC
            last = j + 1 >= nb

            def prefetch_next_vrow():
                # START the next column's j-row ancestor copy: this column's
                # panel writes are drained by the time this is called, so row
                # block j+1 (incl. its new column-j block) is readable; the
                # copy overlaps the switch dispatch + next column's primes,
                # and column j+1 only WAITS
                nkfull = (j + 1) // CB
                nktail = ((c + 1) % CB) * b

                @pl.when(j + 1 < nb)
                def _():
                    def nvstart(t, _):
                        pltpu.make_async_copy(
                            T_ref.at[dsb((j + 1) * b, b), dsb(t * KC, KC)],
                            vrow.at[:, dsb(t * KC, KC)], vsem).start()
                        return 0
                    lax.fori_loop(0, nkfull, nvstart, 0)
                    if nktail > 0:
                        pltpu.make_async_copy(
                            T_ref.at[dsb((j + 1) * b, b),
                                     dsb(nkfull * KC, nktail)],
                            vrow.at[:, dsb(nkfull * KC, nktail)], vsem).start()

            if "nosolve" in modes:
                # slice-timing mode: skip panel solve + writeback + forward
                # solve entirely (future corrections then read garbage —
                # values are meaningless, timing isolates the solve phase)
                prefetch_next_vrow()
                return 0

            # solve spans of 2·RC halve the per-chunk op overhead (one dot +
            # one vbuf GEMM + one stage write per 4096 rows); single-RC
            # leftovers keep the grid exact for odd sfull.  At small N a
            # wide slice would exceed the acc buffer at TRACE time, so the
            # span falls back to RC there.  Mode "span4" widens to 4·RC
            # (the round-5 solve-misc lever — fewer, larger solve ops).
            SRBmax = 4 if "span4" in modes else 2
            SRB = SRBmax if N >= SRBmax * RC + b else (
                2 if N >= 2 * RC + b else 1)
            SR = SRB * RC
            spairs = sfull // SRB
            sodd = sfull - SRB * spairs

            def S_body(t, _):
                r0 = jb + b + t * SR
                slot = lax.rem(t, 2)
                Lp = lax.dot_general(
                    acc[dsb(b + t * SR, SR), :].astype(jnp.bfloat16),
                    Md_bf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.DEFAULT).astype(jnp.bfloat16)
                vbuf[:, dsb(r0, SR)] = (
                    vbuf[:, dsb(r0, SR)] - _vrow_gemm(vj, Lp))

                @pl.when(jnp.logical_not(last))
                def _():
                    @pl.when(t >= 2)
                    def _():
                        pltpu.make_async_copy(
                            stage.at[slot, dsb(0, SR), :],
                            T_ref.at[dsb(r0 - 2 * SR, SR), dsb(jb, b)],
                            wsem.at[slot]).wait()
                    stage[slot, dsb(0, SR), :] = Lp
                    pltpu.make_async_copy(
                        stage.at[slot, dsb(0, SR), :],
                        T_ref.at[dsb(r0, SR), dsb(jb, b)],
                        wsem.at[slot]).start()
                return 0
            lax.fori_loop(0, spairs, S_body, 0)

            # drain the last ≤2 outstanding span writes
            def drain(t):
                @pl.when(jnp.logical_and(jnp.logical_not(last), t >= 0))
                def _():
                    pltpu.make_async_copy(
                        stage.at[lax.rem(t, 2), dsb(0, SR), :],
                        T_ref.at[dsb(jb + b + t * SR, SR), dsb(jb, b)],
                        wsem.at[lax.rem(t, 2)]).wait()
            drain(spairs - 2)
            drain(spairs - 1)

            def odd_body(t, _):
                r0 = jb + b + spairs * SR + t * RC
                Lp = lax.dot_general(
                    acc[dsb(b + spairs * SR + t * RC, RC), :].astype(
                        jnp.bfloat16),
                    Md_bf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.DEFAULT).astype(jnp.bfloat16)
                vbuf[:, dsb(r0, RC)] = (
                    vbuf[:, dsb(r0, RC)] - _vrow_gemm(vj, Lp))

                @pl.when(jnp.logical_not(last))
                def _():
                    stage[0, dsb(0, RC), :] = Lp
                    cp = pltpu.make_async_copy(
                        stage.at[0, dsb(0, RC), :],
                        T_ref.at[dsb(r0, RC), dsb(jb, b)],
                        wsem.at[0])
                    cp.start()
                    cp.wait()
                return 0
            lax.fori_loop(0, sodd, odd_body, 0)

            if stail > 0:
                st0 = jb + b + sfull * RC
                Lp = lax.dot_general(
                    acc[dsb(b + sfull * RC, stail), :].astype(jnp.bfloat16),
                    Md_bf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.DEFAULT).astype(jnp.bfloat16)
                vbuf[:, dsb(st0, stail)] = (
                    vbuf[:, dsb(st0, stail)] - _vrow_gemm(vj, Lp))

                @pl.when(jnp.logical_not(last))
                def _():
                    stage[0, dsb(0, stail), :] = Lp
                    cp = pltpu.make_async_copy(
                        stage.at[0, dsb(0, stail), :],
                        T_ref.at[dsb(st0, stail), dsb(jb, b)],
                        wsem.at[0])
                    cp.start()
                    cp.wait()

            prefetch_next_vrow()
            return 0
        return col

    variants = [make_variant(c) for c in range(CB)]

    def column(j, _):
        return lax.switch(lax.rem(j, CB), variants, j, 0)
    lax.fori_loop(0, nb, column, 0)

    ld_ref[:] = ldacc[:, :]
    v = vbuf[:, :]
    # full RHS Gram G = v·vᵀ (D, D): diag entries are the per-column quad
    # forms mⱼᵀK⁻¹mⱼ; off-diagonals serve the rank-1 bias/white
    # Sherman-Morrison split (ops/panel_engine.py) from the SAME solve
    quad_ref[:, :] = lax.dot_general(v, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=lax.Precision.HIGHEST)
    v_ref[:, :] = v


@functools.partial(jax.jit,
                   static_argnames=("b", "interpret", "mode", "n_valid"))
def panel_state_rbf(X, m, inv_width, variance, noise, b: int = 512,
                    interpret: bool = False, mode: str = "full",
                    n_valid: int = 0):
    """Full panel-kernel state for K = rbf-Gram(X) + noise·I: returns
    (logdet, G, v, L) where G = vᵀKv-Gram of the RHS columns ((D, D) f32,
    G[i, j] = mᵢᵀK⁻¹mⱼ), v = L⁻¹m row-stored ((D, N) f32), and L the bf16
    (N, N) factor buffer.  `n_valid` < N masks rows/cols ≥ n_valid out of
    the Gram so pad rows factor as √noise·I (the caller corrects logdet by
    (N − n_valid)·log noise); 0 means N.  This is the product-engine entry
    (ops/panel_engine.py) — L and v feed the analytic reverse sweeps."""
    N, q = X.shape
    D = m.shape[1]
    nv = n_valid if n_valid else N
    nb = N // b
    assert N % b == 0 and nb % CB == 0 and nb >= CB
    assert 0 < nv <= N
    RC = KC = CB * b
    Xs = (X * jnp.sqrt(0.5 * inv_width)).astype(jnp.float32)
    n2 = jnp.sum(Xs * Xs, axis=1, keepdims=True)
    n2row = jnp.reshape(n2, (1, N))
    var2d = jnp.reshape(variance.astype(jnp.float32), (1, 1))
    noise2d = jnp.reshape(noise.astype(jnp.float32), (1, 1))
    for part in mode.split("+"):
        assert part in ("full", "fakeleaf", "oldleaf", "nodot", "nodma",
                        "nogram", "nosolve", "notail", "zerogram",
                        "fusegram", "leafdef", "diag", "leaf256",
                        "span4", "peelgram"), part

    kern = functools.partial(_panel_kernel, b, nb, q, D, nv, mode)
    T, ld, G, v = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((N, N), jnp.bfloat16),   # L (lower panels)
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),    # RHS Gram vᵀv
            jax.ShapeDtypeStruct((D, N), jnp.float32),    # v = L⁻¹m
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Xs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # n2 (row)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # m
            pl.BlockSpec(memory_space=pltpu.SMEM),   # var
            pl.BlockSpec(memory_space=pltpu.SMEM),   # noise
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, b), jnp.float32),          # acc (panel)
            pltpu.VMEM((4, RC, KC), jnp.bfloat16),    # slab slots
            pltpu.VMEM((b, N), jnp.bfloat16),         # vrow (j-row ancestors)
            pltpu.VMEM((2, (4 if "span4" in mode else 2) * RC, b),
                       jnp.bfloat16),                 # panel write staging
            pltpu.VMEM((D, N), jnp.float32),          # vbuf (row-stored)
            pltpu.VMEM((1, 1), jnp.float32),          # logdet accumulator
            pltpu.VMEM((b, b), jnp.bfloat16),         # diag-block staging
            pltpu.SemaphoreType.DMA((4,)),            # slab read sems
            pltpu.SemaphoreType.DMA(()),              # vrow sem
            pltpu.SemaphoreType.DMA((2,)),            # write sems
            pltpu.SemaphoreType.DMA(()),              # diag write sem
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(Xs, n2row, m.astype(jnp.float32).T, var2d, noise2d)
    return ld[0, 0], G, v, T


@functools.partial(jax.jit,
                   static_argnames=("b", "interpret", "mode"))
def evidence_panel_rbf(X, m, inv_width, variance, noise, b: int = 512,
                       interpret: bool = False, mode: str = "full"):
    """(logdet K, Σⱼ mⱼᵀK⁻¹mⱼ) for K = rbf-Gram(X) + noise·I — one kernel,
    v3 panel schedule.  N must be a multiple of CB·b (= 4b).  bf16-input/
    f32-accum Schur+panel GEMMs (the bench policy); leaves f32.
    Slice-timing / A-B modes (composable with "+"): fakeleaf | oldleaf |
    nodot | nodma | nogram | nosolve | notail | zerogram | fusegram |
    leafdef."""
    ld, G, _v, _T = panel_state_rbf(X, m, inv_width, variance, noise, b=b,
                                    interpret=interpret, mode=mode)
    return ld, jnp.trace(G)
