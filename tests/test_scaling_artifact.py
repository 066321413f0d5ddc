"""Weak-scaling proxy artifact (parallel/scaling_bench.weak_scaling_artifact).

The dryrun prints this record every round (MULTICHIP artifact); pin its
shape and the presence of the collective census so a refactor can't
silently break the driver-visible output.
"""

import jax
import pytest

from gpc_tpu.parallel.scaling_bench import collective_stats, weak_scaling_artifact


def test_artifact_shape():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rec = weak_scaling_artifact(8)["weak_scaling_proxy"]
    assert rec["n_devices"] == 8
    assert rec["n"] == 8 * rec["rows_per_device"]
    stats = rec["collectives_static"]
    assert "all-gather" in stats and stats["all-gather"]["count"] >= 1
    assert stats["all-gather"]["bytes"] > 0
    assert rec["analytic_bytes_per_forward"] == rec["n"] ** 2 * 8  # f64 CPU
    assert rec["panel_trip_count"] == 8


def test_collective_stats_counts_psum():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from gpc_tpu.parallel.mesh import DATA_AXIS, data_mesh, shard_rows

    mesh = data_mesh(8)

    def f(x):
        return jax.shard_map(
            lambda xl: jax.lax.psum(xl.sum(), DATA_AXIS),
            mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
            check_vma=False)(x)

    xs = shard_rows(mesh, jnp.ones((64,)))
    stats = collective_stats(f, xs)
    assert "all-reduce" in stats and stats["all-reduce"]["count"] >= 1

    # XLA's combiner merges multiple psums into ONE tuple-shaped all-reduce
    # ("= (f32[], f32[]) all-reduce(...)") — the census must count it
    def g(x):
        def local(xl):
            return (jax.lax.psum(xl.sum(), DATA_AXIS),
                    jax.lax.psum((xl * 2.0).sum(), DATA_AXIS))
        return jax.shard_map(local, mesh=mesh, in_specs=P(DATA_AXIS),
                             out_specs=(P(), P()), check_vma=False)(x)

    stats2 = collective_stats(g, xs)
    assert "all-reduce" in stats2 and stats2["all-reduce"]["count"] >= 1, (
        stats2)
