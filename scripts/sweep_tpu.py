"""One-off TPU tuning sweep for the fused IPM kernel.

Measures throughput + converged fraction for one candidate configuration.
Run on the real chip:

  python scripts/sweep_tpu.py NAME BT LS_ITERS ITERATIONS [BATCH]

e.g.  python scripts/sweep_tpu.py default 128 4 32 8192
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, bt, ls_iters, iterations, batch=8192):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.solver.api import make_batch_solver
    from __graft_entry__ import _example_problems

    # The tile size is threaded through the static config (mutating the
    # module-level BT has no effect once defaults are bound).
    cfg = MPCConfig(horizon=50, time_step=0.041)
    cfg = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver, iterations=iterations, ls_iters=ls_iters,
            fused_block=bt,
        )
    )
    problems = _example_problems(cfg, batch=batch, dtype=jnp.float32)
    solver = make_batch_solver(cfg)

    def run_once():
        sol = solver(problems)
        float(jnp.sum(sol.controls))
        return sol

    t0 = time.perf_counter()
    sol = run_once()  # compile + warm
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sol = run_once()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    conv = float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32)))
    out = {
        "variant": name,
        "BT": bt,
        "ls": ls_iters,
        "iters": iterations,
        "solves_per_s": round(batch / dt, 1),
        "latency_ms": round(dt * 1e3, 2),
        "converged": round(conv, 4),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    name, bt, ls, iters = sys.argv[1:5]
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 8192
    run_variant(name, int(bt), int(ls), int(iters), batch=batch)
