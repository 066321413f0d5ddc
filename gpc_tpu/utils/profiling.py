"""Tracing / profiling utilities.

The reference has no profiling beyond verbosity-gated cout (SURVEY.md §5);
this module supplies the TPU-native replacements: jax.profiler trace capture,
per-step wall timing with robust device synchronization, and achieved-FLOPs
accounting for the standard GP pipelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def sync(x):
    """Force device completion and return the first element as a float.

    On the axon remote-TPU backend `block_until_ready` is effectively a no-op;
    a value fetch is the only reliable synchronization point, so every timing
    helper here syncs by fetching.
    """
    return float(jnp.ravel(x)[0])


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# module scope so jax's jit cache (keyed on function identity) reuses one
# executable per process — a per-call closure would retrace+recompile on
# every measure_rtt/time_fn invocation
@jax.jit
def _triv(a):
    return a + 1.0


def measure_rtt(samples: int = 8) -> float:
    """Min-of-`samples` cost of one trivial fetch-sync — the fixed per-fetch
    round trip (26-62 ms on axon pool sessions) that every timing must
    subtract (the repo-wide methodology; see bench.py and CLAUDE.md)."""
    one = jnp.ones((1,), jnp.float32)
    sync(_triv(one))
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        sync(_triv(one))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_fn(fn: Callable, *args, reps: int = 10, warmup: int = 1):
    """RTT-corrected mean seconds per call over `reps`, after `warmup`
    untimed calls.  One fetch of the FIRST output leaf closes the timed
    window (fetching any value forces the whole execution on axon) and its
    measured round-trip cost is subtracted, per the repo methodology —
    naive per-op sync loops are pure RTT noise.  fn must return at least
    one array."""
    def _sync_first(out):
        sync(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warmup):
        _sync_first(fn(*args))
    rtt = measure_rtt()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync_first(out)
    return max(time.perf_counter() - t0 - rtt, 0.0) / reps


def evidence_flops(n: int, q: int, d: int) -> float:
    """FLOPs of the FTC evidence pipeline: Gram (2N²q) + Cholesky (N³/3) +
    solves (2N²D)."""
    return 2.0 * n * n * q + n ** 3 / 3.0 + 2.0 * n * n * d


def step_report(name: str, seconds: float, flops: float | None = None) -> str:
    msg = f"[gpc_tpu] {name}: {seconds * 1e3:.2f} ms"
    if flops:
        msg += f" ({flops / seconds / 1e9:.1f} GFLOP/s)"
    return msg
