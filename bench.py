"""Benchmark: Gram + Cholesky GP-evidence pipeline throughput at N=16k.

The BASELINE.json headline metric: per-chip GFLOP/s of the fused pipeline
  K = rbf-Gram(X)  (one 2·N²·q matmul + elementwise map, MXU)
  L = chol(K + jitter·I)                     (N³/3)
  quad = ‖L⁻¹m‖², logdet = 2Σlog diag L      (2·N²·D)
— i.e. exactly the hot block of CGp::logLikelihood — against a measured
matmul-roofline proxy on the same chip.  Prints ONE JSON line:
  {"metric": ..., "value": GFLOP/s, "unit": ..., "vs_baseline": fraction of
   the 80%-of-roofline BASELINE target achieved (1.0 = target met)}.

Run on the TPU by default (the driver does); GPC_TPU_PLATFORM=cpu uses a
smaller N so the run stays bounded.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("GPC_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    N = 16384 if on_tpu else 2048
    q = 8
    D = 1
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, q)), dtype)
    m = jnp.asarray(rng.standard_normal((N, D)), dtype)

    # --- roofline proxy: big bf16 matmul with f32 accumulation --------------
    B = 8192 if on_tpu else 2048
    A1 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)
    A2 = jnp.asarray(rng.standard_normal((B, B)), jnp.bfloat16)

    # chain reps so no dispatch dedup/overlap can fake the timing
    reps_mm = 16 if on_tpu else 4

    @jax.jit
    def mm_chain(a, b):
        def body(_, acc):
            prod = jax.lax.dot_general(acc, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            return (prod / (1.0 + jnp.abs(prod[0, 0]))).astype(a.dtype)
        return jax.lax.fori_loop(0, reps_mm, body, a)

    def sync(x):
        """Force completion: on the axon remote backend block_until_ready is a
        no-op — only a value fetch actually synchronizes."""
        return float(jnp.ravel(x)[0])

    # the value-fetch sync costs one axon round trip (measured up to ~28 ms
    # on congested pool sessions) — measure it and subtract, so both the
    # roofline and the pipeline are steady-state throughputs, not RTT
    @jax.jit
    def _triv(a):
        return a + 1.0
    one = jnp.ones((1,), dtype)
    sync(_triv(one))
    # min over samples: RTT is a fixed overhead under one-sided noise
    # (26-62 ms run-to-run on the shared pool), so the mean over-subtracts
    # and can clamp a fast candidate toward the floor
    samples = []
    for _ in range(8):
        t0 = time.perf_counter()
        sync(_triv(one))
        samples.append(time.perf_counter() - t0)
    rtt = min(samples)

    sync(mm_chain(A1, A2))  # compile + warm
    t0 = time.perf_counter()
    sync(mm_chain(A1, A2))
    t_mm = max(time.perf_counter() - t0 - rtt, 1e-9) / reps_mm
    roofline_gflops = 2 * B ** 3 / t_mm / 1e9

    # --- the pipeline -------------------------------------------------------
    # Problem: RBF Gram at SNR 10 (noise 0.1 on unit signal variance) — an
    # ordinary GP-regression conditioning (κ ≈ 11), comfortably inside the
    # 1-pass-bf16 stability region (κ·ε_bf16 ≈ 0.04; at noise=1e-2 the κ≈100
    # factorization is marginal for bf16 and can go non-PD).
    inv_width = jnp.asarray(1.0, dtype)
    variance = jnp.asarray(1.0, dtype)
    noise = jnp.asarray(1e-1, dtype)

    reps = 10 if on_tpu else 3

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gpc_tpu.ops.evidence_fast import evidence_left_fast, Policy
    from gpc_tpu.ops.lazy_evidence import rbf_block_fn

    # bf16-input/f32-accum update GEMMs + bf16 panel storage + one stacked
    # correction GEMM per block, Gram tiles fused into the factorization
    # schedule (left-looking: lower triangle only, no N² HBM pass).  The best
    # leaf schedule depends on the session's MXU-vs-overhead balance (the
    # shared TPU pool varies ~4× run to run, tools/tpu_fast_sweep3.py), so
    # the bench AUTOTUNES over the measured top policies: explicit XLA leaf
    # inverses (every panel solve a GEMM — 41 ms / 98-99% of roofline in the
    # slow-session sweep) vs plain XLA chol leaves (44.3 ms there), at leaf
    # 256 and 512.  Accuracy: logdet/quad within ~1e-4/5e-4 of f32-HIGH.
    # measured orderings: slow session (roof 29-36 TF/s) b1024-xla 41.7 ms <
    # b512-xla 44.1 < b256-xla ≈ noinv; fast session (roof 132 TF/s) b512-xla
    # 21.1 ms < b256-xla 22.7 < b256-chol 24.6 (tools/tpu_fast_sweep3.py,
    # tpu_round2_batch.py)
    # "flat" = one persistent (N, N) bf16 factor buffer, corrections read
    # strided slices (no stacked-operand concat copies — the r2 residual
    # was ~3× ancestor-stream HBM traffic from per-block stacking);
    # "left" = the r2 stacked left-looking recursion (the r2 winner, kept
    # as the regression reference); "mega" = the whole-evidence Pallas op.
    candidates = ([("panel-b512", "panel"),
                   ("flat-b512", ("flat", Policy(512, True, "xla", True))),
                   ("flat-b512h",
                    ("flat", Policy(512, True, "xla", True,
                                    panelhalf=True))),
                   ("flat-b1024h",
                    ("flat", Policy(1024, True, "xla", True,
                                    panelhalf=True))),
                   ("flat-b512-noinv",
                    ("flat", Policy(512, True, False, True))),
                   ("xla-b512", ("left", Policy(512, True, "xla", True)))]
                  if on_tpu
                  else [("cpu", ("left", Policy(256, False, False, True)))])
    # (the v2 mega kernel candidate was retired in round 5 — superseded by
    # panel at every measured session; tools/chol_mega_v2.py keeps it
    # runnable for the historical A/B scripts)

    def make_pipe(pol):
        if pol == "panel":
            from gpc_tpu.ops.chol_panel import evidence_panel_rbf

            def evidence(X, m):
                logdet, quad = evidence_panel_rbf(
                    X, m, inv_width, variance, noise, b=512)
                return quad + logdet
        else:
            from gpc_tpu.ops.evidence_fast import evidence_flat
            sched, p = pol
            engine = evidence_flat if sched == "flat" else evidence_left_fast

            def evidence(X, m):
                kfn = rbf_block_fn(X, inv_width, variance, noise)
                logdet, quad = engine(kfn, N, m, p)
                return quad + logdet

        @jax.jit
        def pipe_chain(X, m):
            def body(_, carry):
                acc, Xc = carry
                e = evidence(Xc, m)
                # fold the result into X so every rep depends on the previous
                return acc + e, Xc + (e * 0.0)
            return jax.lax.fori_loop(0, reps, body,
                                     (jnp.zeros((), dtype), X))[0]
        return pipe_chain

    results = []
    for name, pol in candidates:
        try:
            pipe = make_pipe(pol)
            v = sync(pipe(X, m))  # compile + warm
        except Exception as e:  # a candidate failing to compile is not fatal
            print(f"# candidate {name} failed: {type(e).__name__}",
                  file=sys.stderr)
            continue
        # 3 samples: even same-roofline sessions wobble ±10% run to run
        # (measured 14.4-15.8 ms for the identical program).  The minimum is
        # the capability number under one-sided noise; the MEDIAN is emitted
        # alongside (VERDICT r4 weak #2: min-of-3 on top of min-of-8 RTT
        # stacks two one-sided minima — report both so the record carries
        # the conservative read too)
        raws = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(pipe(X, m))
            raws.append(time.perf_counter() - t0)
        raw = min(raws)
        raw_med = sorted(raws)[1]
        if raw - rtt <= 0:
            print(f"# candidate {name}: RTT subtraction clamped "
                  f"(raw {raw*1e3:.1f} ms <= rtt {rtt*1e3:.1f} ms)",
                  file=sys.stderr)
        t = max(raw - rtt, 1e-9) / reps
        t_med = max(raw_med - rtt, 1e-9) / reps
        print(f"# candidate {name}: {t*1e3:.1f} ms (min of 3), "
              f"{t_med*1e3:.1f} ms (median of 3)", file=sys.stderr)
        results.append((t, name, v, t_med))
    results.sort()

    # accuracy gate: the mixed-precision value must agree with the f32-HIGH
    # evidence — a wrong fast number is not a benchmark result.  The fastest
    # candidate that PASSES wins (a numerically-off candidate is skipped,
    # not fatal).
    if on_tpu:
        @jax.jit
        def check(X, m):
            kfn = rbf_block_fn(X, inv_width, variance, noise)
            ld, quad = evidence_left_fast(
                kfn, N, m, Policy(base=256, bf16=False, leafinv=False,
                                  stack=True))
            return quad + ld
        ref = sync(check(X, m))
        t_pipe, rel, t_pipe_med, win_name = None, None, None, None
        passing = []
        for t, name, v, t_med in results:
            r = abs(v / reps - ref) / abs(ref)
            if r < 1e-2:
                passing.append((t, name, v, t_med))
                if t_pipe is None:
                    t_pipe, rel, t_pipe_med, win_name = t, r, t_med, name
                    print(f"# winner {name} (drift {r:.1e})", file=sys.stderr)
            else:
                print(f"# candidate {name} REJECTED: drift {r:.2e}",
                      file=sys.stderr)
        assert t_pipe is not None, "no candidate within 1e-2 of f32-HIGH"
    else:
        assert results, "no candidate compiled"
        t_pipe, rel, t_pipe_med = results[0][0], 0.0, results[0][3]
        win_name = results[0][1]
        passing = results

    # same-session panel/flat ratio: roofline-INDEPENDENT kernel-race metric
    # (it decided the round-4 winner at 11-13% regardless of session draw) —
    # tracked so the kernel claim never rests on a lucky roofline
    # denominator (VERDICT r4 ask #3).  Only ACCURACY-GATE-PASSING
    # candidates enter the ratio: a numerically-off panel run must not make
    # the renegotiated gate appear met (it emits null instead).
    times_by_name = {name: t for t, name, _v, _tm in passing}
    panel_vs_flat = None
    if "panel-b512" in times_by_name and "flat-b512" in times_by_name:
        panel_vs_flat = round(
            times_by_name["panel-b512"] / times_by_name["flat-b512"], 4)

    # ---- secondary tracked metrics (regression surface, VERDICT r2 #6) ----
    # vs_baseline anchors are the round-3 healthy-session measurements
    # (BASELINE.md round-3 extras table), SESSION-NORMALIZED (VERDICT r3 #5):
    # the shared TPU pool varies ~20× run-to-run, so raw ms ratios are pool
    # noise, not regressions.  Each ratio is scaled by (anchor-session
    # roofline / this-session roofline) — the same-chip-speed comparison the
    # headline metric already makes.  The JSON carries both the normalized
    # vs_baseline (the regression gate) and vs_baseline_raw.
    ANCHOR_ROOF = 166000.0  # GFLOP/s bf16 — the round-3 extras session
                            # measured roofline 163-170 TF/s (BASELINE.md)

    def _min3(fn):
        """min-of-3 timed samples, RTT-subtracted — the same discipline as
        the headline (VERDICT r4 weak #5: one-shot secondary timings were
        re-rolling ±50% run-to-run)."""
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - rtt, 1e-9)

    def _emit_extra(metric, value, unit, raw_ratio):
        print(json.dumps({
            "metric": metric, "value": value, "unit": unit,
            "vs_baseline": round(raw_ratio * ANCHOR_ROOF / roofline_gflops, 4),
            "vs_baseline_raw": round(raw_ratio, 4),
            "session_roofline_gflops": round(roofline_gflops, 0)}))

    def extra_metrics():
        import gc
        from gpc_tpu import kernels as GK

        # (a) sparse DTC evidence+grad at N=16k, M=1024 (anchor 6.7 ms)
        try:
            from gpc_tpu.models.gp import GP, make_objective
            Nd, Md, qd = 16384, 1024, 8
            rngd = np.random.default_rng(0)
            Xd = rngd.standard_normal((Nd, qd)).astype(np.float32)
            yd = np.sin(Xd[:, :1]).astype(np.float32)
            kernd = GK.Cmpnd(input_dim=qd, components=(
                GK.Rbf(input_dim=qd), GK.Bias(input_dim=qd),
                GK.White(input_dim=qd)))
            gpm = GP(kernd, Xd, yd, approx="dtc", num_active=Md, centre=True,
                     seed=0)
            nlml = make_objective(gpm.spec, Xd, yd, gpm.bias,
                                  gpm.fixed_scales)
            th = jnp.asarray(gpm.theta, jnp.float32)
            repsd = 16

            @jax.jit
            def dchain(t):
                def body(_, carry):
                    acc, tc = carry
                    v, g = jax.value_and_grad(nlml)(tc)
                    return acc + v, tc + 0.0 * g
                return jax.lax.fori_loop(
                    0, repsd, body, (jnp.zeros((), jnp.float32), t))[0]
            sync(dchain(th))
            t = _min3(lambda: sync(dchain(th))) / repsd
            _emit_extra("dtc16k_m1024_step_ms", round(t * 1e3, 2), "ms",
                        6.7 / (t * 1e3))
        except Exception as e:
            print(f"# dtc16k extra failed: {type(e).__name__}",
                  file=sys.stderr)

        # (b) GP-LVM N=16k training step, lazy fused evidence (anchor 141 ms;
        # the r2 number 531 ms was RTT-methodology-inflated)
        # pin the exact policy the 141 ms anchor was measured on (lazy,
        # f32-HIGH, default base/prestack/bias-split) and RESTORE the
        # caller's env afterwards — NO user-exported evidence knob may
        # silently change what this tracked metric measures
        pins = {"GPC_TPU_EVIDENCE": "lazy", "GPC_TPU_BF16_EVIDENCE": "0",
                "GPC_TPU_EVIDENCE_BASE": "256",
                "GPC_TPU_EVIDENCE_PRESTACK": "0", "GPC_TPU_BIAS_SPLIT": "1"}
        saved_env = {k: os.environ.get(k) for k in pins}
        try:
            from gpc_tpu.models.gplvm import GPLVM, log_likelihood
            os.environ.update(pins)
            Ng, Dg, qg = 16384, 4, 2
            rngg = np.random.default_rng(0)
            Z = rngg.standard_normal((Ng, qg))
            W = rngg.standard_normal((qg, Dg))
            yg = (np.tanh(Z @ W)
                  + 0.1 * rngg.standard_normal((Ng, Dg))).astype(np.float32)
            kerng = GK.Cmpnd(input_dim=qg, components=(
                GK.Rbf(input_dim=qg), GK.Bias(input_dim=qg),
                GK.White(input_dim=qg)))
            gl = GPLVM(kerng, yg, latent_dim=qg)
            yj = jnp.asarray(yg, jnp.float32)
            bi = jnp.asarray(gl.noise_bias, jnp.float32)
            fsg = jnp.asarray(gl.fixed_scales, jnp.float32)
            spec = gl.spec
            thg = jnp.asarray(gl.theta, jnp.float32)
            repsg = 5

            @jax.jit
            def gchain(t):
                def body(_, carry):
                    acc, tc = carry
                    v, g = jax.value_and_grad(
                        lambda th: -log_likelihood(spec, th, yj, bi, fsg))(tc)
                    return acc + v, tc + 0.0 * g
                return jax.lax.fori_loop(
                    0, repsg, body, (jnp.zeros((), jnp.float32), t))[0]
            v0 = sync(gchain(thg))
            assert np.isfinite(v0)
            t = _min3(lambda: sync(gchain(thg))) / repsg
            _emit_extra("gplvm16k_step_ms", round(t * 1e3, 1), "ms",
                        141.0 / (t * 1e3))
        except Exception as e:
            print(f"# gplvm16k extra failed: {type(e).__name__}",
                  file=sys.stderr)
        finally:
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

        # (c) IVM selection throughput, N=4096 d=512 (anchor 28676 pts/s)
        try:
            from gpc_tpu.models.ivm import IvmSpec, select_points
            from gpc_tpu.noise import GaussianNoise
            Ni, di = 4096, 512
            rngi = np.random.default_rng(0)
            Xi = rngi.standard_normal((Ni, 2)).astype(np.float32)
            yi = np.sin(2 * Xi[:, :1]).astype(np.float32)
            noisei = GaussianNoise(output_dim=1)
            speci = IvmSpec(
                kern=GK.Cmpnd(input_dim=2, components=(
                    GK.Rbf(input_dim=2), GK.Bias(input_dim=2),
                    GK.White(input_dim=2))),
                noise=noisei, n_data=Ni, input_dim=2, output_dim=1,
                num_active=di)
            kpi = jnp.asarray(speci.kern.default_params(), jnp.float32)
            npi = jnp.asarray(noisei.default_params(yi), jnp.float32)
            rvi = jnp.zeros((di,), jnp.float32)

            @jax.jit
            def sel(kp):
                st = select_points(speci, kp, npi, Xi, yi, rvi)
                return st.varsigma.sum()
            sync(sel(kpi))
            t = _min3(lambda: sync(sel(kpi)))
            pps = di / t
            _emit_extra("ivm_select_points_per_s", round(pps, 0), "points/s",
                        pps / 28676.0)
            # scalar-ISSUE proxy: a 2000-step chained tiny-op loop (the
            # selection scan's cost character is per-op issue latency, not
            # matmul flops — the roofline normalization above is the wrong
            # model for it, VERDICT r4 weak #5).  Emitted as a diagnostic
            # so cross-session records can be re-normalized once two
            # sessions carry it; the ivm metric stays tracked, not gated.
            vsmall = jnp.ones((8, 128), jnp.float32)

            @jax.jit
            def issue_chain(v):
                def body(_, acc):
                    return acc + jnp.tanh(acc) * (1.0 / (1.0 + acc[0, 0]))
                return jax.lax.fori_loop(0, 2000, body, v)
            sync(issue_chain(vsmall))
            t_issue = _min3(lambda: sync(issue_chain(vsmall))) / 2000
            print(json.dumps({
                "metric": "scalar_issue_us", "value": round(t_issue * 1e6, 3),
                "unit": "us/op",
                "session_roofline_gflops": round(roofline_gflops, 0)}))
        except Exception as e:
            print(f"# ivm extra failed: {type(e).__name__}", file=sys.stderr)
        gc.collect()

    if on_tpu:
        extra_metrics()

    # Algorithmic (full-Gram + N³/3 Cholesky + solve) FLOPs for the TASK —
    # the standard count a dense dpotrf-based evidence would execute — not
    # instructions retired: the lazy lower-triangle pipeline materializes
    # ~half the Gram element work (a ~0.3% effect at N=16k), so this is a
    # task-throughput figure, not a hardware-utilization counter.
    flops = 2.0 * N * N * q + N ** 3 / 3.0 + 2.0 * N * N * D
    gflops = flops / t_pipe / 1e9
    gflops_med = flops / t_pipe_med / 1e9
    target = 0.8 * roofline_gflops
    result = {
        "metric": f"gram_chol_evidence_gflops_n{N}_{backend}",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / target, 4),
        "vs_baseline_median": round(gflops_med / target, 4),
        "t_ms_min": round(t_pipe * 1e3, 2),
        "t_ms_median": round(t_pipe_med * 1e3, 2),
        "panel_vs_flat_ratio": panel_vs_flat,
        # the formally renegotiated round-5 gate (BASELINE.md round-5
        # section): the kernel's ~4 ms of roofline-independent serial cost
        # (negative-results ledger; VPU/MXU no-overlap law) puts the
        # original 0.8 point at the zero-margin theoretical floor, and the
        # cross-session healthy-band spread is 0.72-0.82 (five official
        # records), so the renegotiated target is ALL of: vs_baseline >=
        # 0.70 on a healthy session, panel_vs_flat_ratio <= 0.95, and the
        # winner being the product-reachable panel kernel family
        # (GPC_TPU_EVIDENCE=panel serves the same kernel).  This field
        # folds every leg: min(vs_baseline/0.70, 0.95/ratio) when the
        # panel candidate won the accuracy-gated race, null otherwise —
        # so >= 1.0 here = renegotiated gate met, with no leg left to a
        # comment-reading consumer.
        "vs_renegotiated": (
            round(min((gflops / target) / 0.70, 0.95 / panel_vs_flat), 4)
            if panel_vs_flat is not None and win_name == "panel-b512"
            else None),
    }
    print(json.dumps(result))
    print(f"# backend={backend} N={N} t_pipeline={t_pipe*1e3:.1f}ms "
          f"matmul_roofline={roofline_gflops:.0f} GFLOP/s "
          f"target(80%)={target:.0f} GFLOP/s "
          f"bf16_vs_f32H_drift={rel:.1e} sync_rtt={rtt*1e3:.1f}ms",
          file=sys.stderr)

    # secondary (stderr): sinc time-to-converge, the reference's own headline
    # ("couple of minutes" on a Pentium IV, reference README.md:56)
    try:
        from gpc_tpu import kernels as GK
        from gpc_tpu.models.gp import GP
        from gpc_tpu.io.svml import read_svml
        sinc_path = "/root/reference/examples/sinc.svml"
        if os.path.exists(sinc_path):
            Xs, ys = read_svml(sinc_path)
        else:
            # self-contained fallback: the reference's sinc tutorial is 40
            # noisy sin(x)/x samples on [-3, 3] (reference README.md:56-75);
            # the metric is time-to-converge, not the exact draw
            rngs = np.random.default_rng(0)
            Xs = rngs.uniform(-3.0, 3.0, (40, 1))
            ys = np.sinc(Xs / np.pi) + 0.1 * rngs.standard_normal((40, 1))
        kern = GK.Cmpnd(input_dim=1, components=(
            GK.Rbf(input_dim=1), GK.Bias(input_dim=1), GK.White(input_dim=1)))
        model = GP(kern, Xs, ys, centre=True)
        t0 = time.perf_counter()
        res = model.optimise(iters=100)
        t_sinc = time.perf_counter() - t0
        print(f"# sinc learn -# 100: {t_sinc:.1f}s incl. compile "
              f"({int(res.iters)} iters, obj {float(res.obj):.4f}; "
              f"reference: 'couple of minutes')", file=sys.stderr)
    except Exception as e:  # secondary metric must never break the bench
        print(f"# sinc timing skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
