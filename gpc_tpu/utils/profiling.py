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


def time_fn(fn: Callable, *args, reps: int = 5, warmup: int = 1):
    """Median-free simple timing: mean seconds per call over `reps`, after
    `warmup` untimed calls.  fn must return at least one array."""
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: sync(a), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: sync(a), out)
    return (time.perf_counter() - t0) / reps


def evidence_flops(n: int, q: int, d: int) -> float:
    """FLOPs of the FTC evidence pipeline: Gram (2N²q) + Cholesky (N³/3) +
    solves (2N²D)."""
    return 2.0 * n * n * q + n ** 3 / 3.0 + 2.0 * n * n * d


def step_report(name: str, seconds: float, flops: float | None = None) -> str:
    msg = f"[gpc_tpu] {name}: {seconds * 1e3:.2f} ms"
    if flops:
        msg += f" ({flops / seconds / 1e9:.1f} GFLOP/s)"
    return msg
