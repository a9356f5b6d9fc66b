"""Closed-loop fleet episode benchmark on TPU (config 5 of BASELINE.md).

Runs >= 4096 concurrent receding-horizon episodes with obstacle fields for
>= 100 ticks through `environment.fleet_step` (fused batched solves), feeding
`MetricsAggregator` for an honest per-tick latency distribution (p50/p99).

Run (background, generous timeout):
  cd /root/repo && python scripts/bench_fleet_episodes.py [batch] [ticks] [policy]

``policy``: "repair" (default; geometric warm-start repair only) or "full"
(repair + threshold-gated feasibility completion).  Measured at B=4096/K=8
x 100 ticks: repair-only converges MORE (0.940 vs 0.913 thresholded vs
0.784 ungated) and runs faster (p50 71.6 vs 76.2 vs 78.7 ms) — in a
receding-horizon loop the carried plan is the best warm start there is, and
replacing it with the tracking rollout only ever loses information.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    policy = sys.argv[3] if len(sys.argv) > 3 else "repair"
    # "refine" = full staged-refinement schedule (certified-convergence
    # mode); "base" = 32 base iterations only (real-time mode — uncertified
    # ticks ride the agent's shifted-plan fallback gate).
    schedule = sys.argv[4] if len(sys.argv) > 4 else "refine"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.scenarios import episode_worlds
    from kissmpc_tpu.utils.metrics import MetricsAggregator

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver,
            iterations=32,
            refine_stages=(
                ((0.125, 64, 0.2), (0.02, 96, 0.7))
                if schedule == "refine"
                else ()
            ),
            # Episode obstacle fields are constant-velocity tracks
            # (scenarios.episode_worlds), so the kernel can reconstruct
            # them from (c0, delta) rows (+5% measured at K=8).
            fused_affine_tracks=True,
        )
    )
    params = AgentParams(complete_warm_starts=(policy == "full"))

    t0 = time.time()
    env, obstacles = episode_worlds(
        cfg, batch, n_waypoints=3, seed=0, n_dynamic=2
    )
    jax.block_until_ready(env)
    print(f"worlds built in {time.time() - t0:.1f}s", flush=True)

    stepper = jax.jit(lambda e, o: env_mod.fleet_step(cfg, params, e, o))
    t0 = time.time()
    env_w, info = stepper(env, obstacles)
    _ = float(jnp.sum(info.diagnostics.final_cost))  # value-sync fence
    print(f"compile+first tick {time.time() - t0:.1f}s", flush=True)
    env = env_w

    agg = MetricsAggregator()
    usable = []
    t_start = time.time()
    for t in range(ticks):
        t0 = time.perf_counter()
        env, info = stepper(env, obstacles)
        _ = float(jnp.sum(info.diagnostics.final_cost))
        agg.record_tick(time.perf_counter() - t0, info.diagnostics)
        # A plan is *usable* when it passes the agent's fallback gate
        # (equality/constraint residual below fallback_feasibility) even if
        # strict KKT convergence was not certified — the robot acts on it.
        usable.append(
            float(
                jnp.mean(
                    (
                        info.diagnostics.kkt_feasibility
                        <= params.fallback_feasibility
                    ).astype(jnp.float32)
                )
            )
        )
        if t % 20 == 0:
            conv = float(
                jnp.mean(info.diagnostics.converged.astype(jnp.float32))
            )
            done = float(
                jnp.mean(info.final_goal_reached.astype(jnp.float32))
            )
            print(
                f"tick {t:4d} conv={conv:.4f} done={done:.3f} "
                f"lat={agg.records[-1].latency_s * 1e3:.1f}ms",
                flush=True,
            )
    wall = time.time() - t_start

    s = agg.summary()
    done = float(jnp.mean(info.final_goal_reached.astype(jnp.float32)))
    out = {
        "batch": batch,
        "ticks": ticks,
        "warm_start_policy": policy,
        "schedule": schedule,
        "episode_ticks_per_s": round(ticks / wall, 2),
        "solves_per_s": round(batch * ticks / wall, 1),
        "latency_p50_ms": round(s["latency_p50_ms"], 2),
        "latency_p99_ms": round(s["latency_p99_ms"], 2),
        "latency_mean_ms": round(s["latency_mean_ms"], 2),
        "converged_fraction_mean": round(s["converged_fraction_mean"], 4),
        "usable_fraction_mean": round(float(np.mean(usable)), 4),
        "final_goal_reached": round(done, 4),
        "within_tick_budget": s["latency_p99_ms"] / 1e3 <= cfg.time_step,
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
