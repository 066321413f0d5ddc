"""Compiled-mode (Mosaic, non-interpret) panel-kernel correctness sweep.

VERDICT r4 ask #4: the panel kernel's compiled path was pinned only by the
bench's 1e-2 drift gate at ONE configuration (N=16384, b=512, D=1, SNR 10);
every other geometry ran interpret-mode only — and the chol_mega history
says compiled ≠ interpret for Mosaic.  This sweeps {b, D, N, n_valid, diag
mode, SNR} through the COMPILED kernel on the real TPU against the f32-HIGH
lazy evidence, printing one PASS/FAIL line per geometry.

Run directly (pays the one-time axon session claim) or via the slow pytest
wrapper tests/test_panel_tpu_compiled.py (GPC_TPU_RUN_SLOW=1).
Exit code 0 = every gated geometry within tolerance.
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "axon,cpu")
    assert jax.default_backend() not in ("cpu",), "needs the real TPU"

    from gpc_tpu.ops.chol_panel import evidence_panel_rbf, panel_state_rbf
    from gpc_tpu.ops.evidence_fast import Policy, evidence_left_fast
    from gpc_tpu.ops.lazy_evidence import rbf_block_fn

    rng = np.random.default_rng(0)

    def ref_f32(X, m, iw, var, noise, nv=None):
        n = X.shape[0] if nv is None else nv
        kfn = rbf_block_fn(X[:n], iw, var, noise)
        ld, quad = evidence_left_fast(
            kfn, n, m[:n], Policy(base=256, bf16=False, leafinv=False,
                                  stack=True))
        return float(ld), float(quad)

    failures = []

    # {b, D, N, SNR} compiled sweep + ragged n_valid + diag-mode geometries.
    # noise=1e-2 is the documented κ-edge (CLAUDE.md: κ≈100 is marginal for
    # the 1-pass bf16 policy) — reported, gated at a looser 5e-2.
    cases = [
        # (tag, N, b, D, noise, n_valid, mode, tol)
        ("b512-D1-snr10", 2048, 512, 1, 1e-1, None, "full", 1e-2),
        ("b512-D3-snr10", 4096, 512, 3, 1e-1, None, "full", 1e-2),
        ("b256-D1-snr10", 2048, 256, 1, 1e-1, None, "full", 1e-2),
        ("b128-D2-snr10", 1024, 128, 2, 1e-1, None, "full", 1e-2),
        ("b512-N8b-snr10", 4096, 512, 1, 1e-1, None, "full", 1e-2),
        ("b512-D1-kedge", 2048, 512, 1, 1e-2, None, "full", 5e-2),
        ("b512-ragged", 2048, 512, 2, 1e-1, 1800, "full", 1e-2),
        ("b512-diagmode", 2048, 512, 1, 1e-1, None, "full+diag", 1e-2),
    ]
    for tag, N, b, D, noise, nv, mode, tol in cases:
        q = 8
        X = jnp.asarray(rng.standard_normal((N, q)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
        if nv is not None:
            # zero pad rows exactly as ops/panel_engine does
            X = X.at[nv:].set(0.0)
            m = m.at[nv:].set(0.0)
        iw = jnp.float32(1.0)
        var = jnp.float32(1.0)
        nz = jnp.float32(noise)
        try:
            ld, G, _v, _T = panel_state_rbf(
                X, m, iw, var, nz, b=b, mode=mode,
                n_valid=(nv if nv is not None else 0))
            ld = float(ld) - (0 if nv is None else (N - nv) * np.log(noise))
            quad = float(jnp.trace(G))
        except Exception as e:
            print(f"FAIL {tag}: compile/exec error {type(e).__name__}: {e}")
            failures.append(tag)
            continue
        ld_r, quad_r = ref_f32(np.asarray(X), np.asarray(m), iw, var, nz,
                               nv=nv)
        combo = abs((ld + quad) - (ld_r + quad_r)) / abs(ld_r + quad_r)
        dl = abs(ld - ld_r) / max(abs(ld_r), 1.0)
        dq = abs(quad - quad_r) / abs(quad_r)
        ok = dl < tol and dq < tol
        print(f"{'PASS' if ok else 'FAIL'} {tag}: N={N} b={b} D={D} "
              f"noise={noise} nv={nv} mode={mode} "
              f"drift ld={dl:.2e} quad={dq:.2e} combo={combo:.2e} tol={tol}")
        if not ok:
            failures.append(tag)

    # sanity: bench geometry one-shot (evidence_panel_rbf wrapper)
    X = jnp.asarray(rng.standard_normal((2048, 8)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((2048, 1)), jnp.float32)
    ld, quad = evidence_panel_rbf(X, m, jnp.float32(1.0), jnp.float32(1.0),
                                  jnp.float32(0.1), b=512)
    ld_r, quad_r = ref_f32(np.asarray(X), np.asarray(m), jnp.float32(1.0),
                           jnp.float32(1.0), jnp.float32(0.1))
    ok = abs(float(ld) - ld_r) / abs(ld_r) < 1e-2
    print(f"{'PASS' if ok else 'FAIL'} wrapper-api: ld drift "
          f"{abs(float(ld)-ld_r)/abs(ld_r):.2e}")
    if not ok:
        failures.append("wrapper-api")

    print(f"panel compiled sweep: {len(cases)+1-len(failures)}/"
          f"{len(cases)+1} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
