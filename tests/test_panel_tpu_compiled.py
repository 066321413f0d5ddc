"""Compiled-mode (Mosaic) panel-kernel sweep on the REAL TPU — slow opt-in.

The interpret-mode tests (test_chol_panel.py, test_panel_engine.py) cannot
catch Mosaic-specific miscompiles (CLAUDE.md: mathematically-equivalent
rewrites of chol_mega failed to COMPILE; compiled ≠ interpret).  This
wrapper subprocess-runs tools/tpu_panel_compiled_sweep.py on the axon TPU —
a fresh process, because the test session pins jax to CPU at import.

Costs one axon session claim (~6-8 min) on a cold pool session; enable with
GPC_TPU_RUN_SLOW=1.
"""

import os
import subprocess
import sys

import pytest

slow = pytest.mark.skipif(os.environ.get("GPC_TPU_RUN_SLOW") != "1",
                          reason="set GPC_TPU_RUN_SLOW=1 to run (TPU claim)")


@slow
def test_panel_compiled_sweep_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "GPC_TPU_PLATFORM")}
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/tpu_panel_compiled_sweep.py"],
        env=env, capture_output=True, text=True, timeout=3600)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, "compiled panel sweep reported failures"
