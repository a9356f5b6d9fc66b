"""Real multi-process distributed coverage (VERDICT r1 item 4).

Launches 2 OS processes, each with 4 virtual CPU devices, joined via
`jax.distributed.initialize` on 127.0.0.1 — the CI stand-in for a 2-host TPU
pod slice.  Exercises `initialize_distributed`, `make_pod_mesh`,
`distribute_local_batch`, `health_check` and a sharded fleet solve, and
checks the replicated metrics against a single-process solve of the same
global batch.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig
from kissmpc_tpu.scenarios import free_problems
from kissmpc_tpu.solver.api import make_batch_solver

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_fleet_solve():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # the workers configure their own platform/device count; strip any
        # CPU-mesh forcing the test session exported
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        lines = [l for l in stdout.splitlines() if l.startswith("WORKER ")]
        assert lines, f"no WORKER line:\n{stdout}\n{stderr}"
        outs.append(json.loads(lines[-1][len("WORKER "):]))

    # Replicated metrics agree across processes and report healthy.
    for o in outs:
        assert o["health"] is True
    assert outs[0]["converged_fraction"] == outs[1]["converged_fraction"]
    assert outs[0]["mean_cost"] == outs[1]["mean_cost"]

    # Single-process reference on the same global batch (host order: the
    # global array is host-0 shard then host-1 shard).
    cfg = MPCConfig(horizon=10, time_step=0.1)
    p0 = free_problems(cfg, 8, seed=0)
    p1 = free_problems(cfg, 8, seed=1)
    glob = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), p0, p1)
    sol = make_batch_solver(cfg)(glob)
    conv = float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32)))
    cost = float(jnp.mean(sol.diagnostics.final_cost))
    np.testing.assert_allclose(outs[0]["converged_fraction"], conv, atol=1e-6)
    np.testing.assert_allclose(outs[0]["mean_cost"], cost, rtol=1e-5)


_FAULT_WORKER = os.path.join(os.path.dirname(__file__), "_fault_worker.py")


def test_failure_injection_detect_and_recover(tmp_path):
    """Kill one of two processes mid-run: the survivor must *detect* the dead
    peer (health_check timeout — the collective otherwise hangs forever) and
    *recover* by resuming its checkpointed fleet shard on local devices
    (SURVEY.md 5.3 elastic recovery; VERDICT r2 item 6)."""
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _FAULT_WORKER, str(pid), "2", str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    stdout1, _ = procs[1].communicate(timeout=540)
    assert procs[1].returncode == 13, stdout1  # died as instructed
    stdout0, stderr0 = procs[0].communicate(timeout=540)
    assert procs[0].returncode == 0, f"survivor failed:\n{stdout0}\n{stderr0}"
    lines = [l for l in stdout0.splitlines() if l.startswith("WORKER ")]
    assert lines, f"no WORKER line:\n{stdout0}\n{stderr0}"
    out = json.loads(lines[-1][len("WORKER "):])
    assert out["healthy_before"] is True
    assert out["detected_failure"] is True
    assert out["resumed_tick"] == 1
    # Warm-started from the checkpointed solution, the resumed shard solves.
    assert out["recovered_converged_fraction"] >= 0.9
    assert out["recovered_cost_finite"] is True
