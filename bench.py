"""Headline benchmark: batched MPC solves/sec/chip at N=50.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no benchmark numbers (BASELINE.md); its implied
real-time envelope is the research config's replanning budget — one IPOPT
solve per dt = 0.041 s tick (~24.4 solves/sec for a single robot,
`mpc/agent.py:99-100`).  ``vs_baseline`` is therefore the ratio of this
engine's batched throughput per chip to that 24.4 solves/sec budget: how many
reference robots one chip can replan for in real time.
"""

import json
import time

import numpy as np

BASELINE_SOLVES_PER_SEC = 1.0 / 0.041  # implied reference budget (24.39 Hz)


def main():
    import jax

    # Persistent compilation cache: repeated bench runs (driver, CI) skip the
    # multi-minute remote compile.
    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.solver.api import make_batch_solver
    from __graft_entry__ import _example_problems

    import dataclasses

    # Benchmark configuration: N=50 research horizon; 32 IPM iterations is
    # the measured sweet spot (highest converged fraction AND throughput on
    # the random receding-horizon scenario set — extra iterations past ~30
    # no longer improve f32 convergence); B=8192 saturates the chip.
    cfg = MPCConfig(horizon=50, time_step=0.041)
    cfg = cfg.replace(
        solver=dataclasses.replace(cfg.solver, iterations=32)
    )
    batch = 8192
    problems = _example_problems(cfg, batch=batch, dtype=jnp.float32)
    solver = make_batch_solver(cfg)

    def run_once():
        sol = solver(problems)
        # Sync by value: pulling a scalar to the host is the only fence that
        # is reliable across PJRT transports (block_until_ready on a remote
        # backend can return before execution completes).
        float(jnp.sum(sol.controls))
        return sol

    # Warm-up / compile.
    sol = run_once()

    # Steady state: several timed repetitions, take the best (device-bound).
    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sol = run_once()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    solves_per_sec = batch / dt

    conv = float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32)))
    backend = cfg.solver.solve_backend
    result = {
        "metric": (
            f"MPC solves/sec/chip (N=50, batch={batch}, f32, 32 IPM iters, "
            f"{backend} backend)"
        ),
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 1),
        "extra": {
            "batch": batch,
            "latency_ms": round(dt * 1e3, 2),
            "converged_fraction": round(conv, 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
