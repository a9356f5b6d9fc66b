"""Utils subsystem: metrics aggregation, profiling measure, checkpointing."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig, default_problem, make_solver
from kissmpc_tpu.utils.checkpoint import CheckpointManager, FleetCheckpoint
from kissmpc_tpu.utils.metrics import MetricsAggregator, PhaseTimer
from kissmpc_tpu.utils.profiling import measure


def test_metrics_aggregation():
    cfg = MPCConfig(horizon=10, time_step=0.1)
    solver = make_solver(cfg)
    agg = MetricsAggregator()
    import time

    for i in range(3):
        t0 = time.perf_counter()
        sol = solver(
            default_problem(
                cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.1 * i, 0.0]),
                dtype=jnp.float64,
            )
        )
        jax.block_until_ready(sol)
        agg.record_tick(time.perf_counter() - t0, sol.diagnostics)
    s = agg.summary()
    assert s["ticks"] == 3
    assert s["latency_p99_ms"] >= s["latency_p50_ms"] > 0
    assert s["converged_fraction_mean"] == 1.0
    lines = agg.to_jsonl().splitlines()
    assert len(lines) == 3
    import json

    rec = json.loads(lines[0])
    assert "kkt_stat" in rec and "latency_s" in rec


def test_phase_timer():
    t = PhaseTimer()
    import time

    with t.span("a"):
        time.sleep(0.01)
    with t.span("a"):
        time.sleep(0.01)
    with t.span("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.02
    assert "b" in s


def test_measure_separates_compile():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    stats = measure(f, x, reps=3)
    assert stats["compile_s"] >= stats["best_s"]
    assert stats["best_s"] > 0


def test_checkpoint_roundtrip():
    from kissmpc_tpu import environment as env_mod

    cfg = MPCConfig(horizon=6, time_step=0.1)
    env = env_mod.init_env(
        cfg, jnp.array([0.1, 0.2, 0.3]),
        waypoints=jnp.array([[1.0, 0.0, 0.0]]), dtype=jnp.float32,
    )
    state = FleetCheckpoint(
        env_state=env,
        rng_key=jax.random.PRNGKey(7),
        scenario_cursor=jnp.asarray(42),
        tick=jnp.asarray(1337),
    )
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(os.path.join(d, "ckpt"))
        mgr.save(5, state)
        assert mgr.latest_step() == 5
        restored = mgr.restore(5, jax.tree.map(np.asarray, state))
        mgr.close()
    np.testing.assert_allclose(
        np.asarray(restored.env_state.agent.initial_state),
        [0.1, 0.2, 0.3],
        atol=1e-7,
    )
    assert int(restored.scenario_cursor) == 42
    assert int(restored.tick) == 1337
