"""Headline benchmark: batched MPC solves/sec/chip at N=50.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, "extra": {...}}

`value` is the obstacle-free headline throughput (batch / median latency over
many distinct problem batches).  `extra` carries the full latency
distribution (p50/p99/mean over >=50 timed solver calls on distinct
batches), the converged fraction, and the same measurements for the
obstacle-laden production config (K=8 circles + dynamic tracks — the
reference's actual workload, `mpc/optimizer.py:198-258`).

The reference publishes no benchmark numbers (BASELINE.md); its implied
real-time envelope is the research config's replanning budget — one IPOPT
solve per dt = 0.041 s tick (~24.4 solves/sec for a single robot,
`mpc/agent.py:99-100`).  ``vs_baseline`` is therefore the ratio of this
engine's batched throughput per chip to that 24.4 solves/sec budget: how many
reference robots one chip can replan for in real time.
"""

import dataclasses
import json
import time

import numpy as np

BASELINE_SOLVES_PER_SEC = 1.0 / 0.041  # implied reference budget (24.39 Hz)

BATCH = 8192
POOL = 16384  # distinct scenarios to draw timed batches from
CALLS = 50  # timed solver calls, each on a distinct batch composition

# Staged tail refinement (see SolverConfig.refine_stages).  The ls=2
# ladder (r3) lifts unrefined K=8 convergence 0.71 -> 0.93, so the stage-1
# net shrank from 0.32 to 0.125 of the batch (SCALING.md r3).
STAGES_FREE = ((0.05, 64, 0.2),)
STAGES_OBST = ((0.125, 64, 0.2), (0.04, 96, 0.7), (0.02, 128, 0.5))


def _bench_config(jnp, jax, cfg, problems_pool, rng):
    """Time CALLS distinct-batch solves; return stats dict."""
    from kissmpc_tpu.solver.api import make_batch_solver

    solver = make_batch_solver(cfg)
    pool_n = problems_pool.initial_state.shape[0]

    def batch_at(perm):
        idx = jnp.asarray(perm)
        return jax.tree.map(lambda x: x[idx], problems_pool)

    # Warm-up / compile on one batch.
    first = batch_at(rng.permutation(pool_n)[:BATCH])
    t0 = time.time()
    sol = solver(first)
    float(jnp.sum(sol.controls))  # value-sync fence (reliable across PJRT)
    compile_s = time.time() - t0

    lat = []
    conv = []
    for _ in range(CALLS):
        batch = batch_at(rng.permutation(pool_n)[:BATCH])
        jax.block_until_ready(batch)
        t0 = time.perf_counter()
        sol = solver(batch)
        float(jnp.sum(sol.controls))
        lat.append(time.perf_counter() - t0)
        conv.append(
            float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32)))
        )
    lat_ms = np.asarray(lat) * 1e3
    p50 = float(np.percentile(lat_ms, 50))
    return {
        "batch": BATCH,
        "calls": CALLS,
        "solves_per_s": round(BATCH / (p50 / 1e3), 1),
        "latency_p50_ms": round(p50, 2),
        "latency_p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "latency_mean_ms": round(float(lat_ms.mean()), 2),
        "latency_max_ms": round(float(lat_ms.max()), 2),
        "converged_fraction": round(float(np.mean(conv)), 4),
        "compile_s": round(compile_s, 1),
    }


def main():
    import jax

    # Persistent compilation cache: repeated bench runs (driver, CI) skip the
    # multi-minute remote compile.
    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.scenarios import free_problems, obstacle_problems

    rng = np.random.default_rng(0)

    # --- headline: obstacle-free, N=50, f32, staged refine ---
    # fused_sublanes=2 (bt=256 as (2, 128) sub-blocks): +6% measured on the
    # obstacle-free config (sweep_sublanes.py); K=8 exceeds VMEM at bt=256
    # so the obstacle config stays at the flat default.
    cfg0 = MPCConfig(horizon=50, time_step=0.041)
    cfg0 = cfg0.replace(
        solver=dataclasses.replace(
            cfg0.solver, iterations=32, refine_stages=STAGES_FREE,
            fused_block=256, fused_sublanes=2,
        )
    )
    pool0 = free_problems(cfg0, POOL, seed=0)
    head = _bench_config(jnp, jax, cfg0, pool0, rng)

    # --- production obstacle config: K=8 circles, 2 dynamic tracks ---
    # fused_affine_tracks: scenario tracks are constant-velocity (the
    # reference's prediction model), so the kernel reconstructs them from
    # (c0, delta) rows — measured +5% at K=8/bt=128 (less input DMA).
    cfgK = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfgK = cfgK.replace(
        solver=dataclasses.replace(
            cfgK.solver, iterations=32, refine_stages=STAGES_OBST,
            fused_affine_tracks=True,
            # Per-scenario adaptive centering: converts merit-stalled
            # scenarios inside the base solve at zero latency cost
            # (scripts/sweep_fleet_schedule.py, r3).
            mu_sigma_max=0.7,
        )
    )
    poolK = obstacle_problems(cfgK, POOL, seed=0, n_dynamic=2)
    obst = _bench_config(jnp, jax, cfgK, poolK, rng)

    result = {
        "metric": (
            f"MPC solves/sec/chip (N=50, batch={BATCH}, f32, 32+staged-"
            f"refine IPM iters, fused backend)"
        ),
        "value": head["solves_per_s"],
        "unit": "solves/s",
        "vs_baseline": round(
            head["solves_per_s"] / BASELINE_SOLVES_PER_SEC, 1
        ),
        "extra": {
            "headline_free": head,
            "obstacles_k8_dyn2": obst,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
