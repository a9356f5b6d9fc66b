"""Real-time frontier: free-running closed-loop device tick vs fleet size.

VERDICT r3 #4: BASELINE's ">= 4096 concurrent scenarios per tick" is met
open-loop, but the closed-loop real-time frontier (max B whose device tick
fits the 41 ms replanning budget on ONE chip) was never mapped — only
B=2048 (28.6 ms) and B=4096 (54.6 ms) were measured.  This sweeps B over
{2048, 2560, 3072, 3584, 4096}, same process, measuring the free-running
device tick (5-tick chunks, median) for the full production tick
(problem build + fused solve + staged refine + waypoint bookkeeping +
moving obstacles) with grid-planned waypoint chains.

Run (TPU, background):  cd /root/repo && python scripts/r4_frontier.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.obstacles.obstacles import advance
    from kissmpc_tpu.scenarios import episode_worlds

    t00 = time.time()
    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver,
            iterations=32,
            refine_stages=((0.125, 64, 0.2), (0.02, 96, 0.7)),
            mu_sigma_max=0.7,
            fused_affine_tracks=True,
        )
    )
    params = AgentParams(prediction_dt=cfg.time_step)

    def tick_fn(e, o):
        new_env, info = env_mod.fleet_step(cfg, params, e, o)
        new_obs = jax.vmap(lambda oo: advance(oo, cfg.time_step))(o)
        scal = jnp.stack([
            jnp.mean(info.diagnostics.converged.astype(jnp.float32)),
            jnp.mean(info.final_goal_reached.astype(jnp.float32)),
        ])
        return new_env, new_obs, scal

    stepper = jax.jit(tick_fn)
    budget_ms = cfg.time_step * 1e3
    rows = []
    for B in (2048, 3072, 4096, 5120, 6144, 7168):
        env, obstacles = episode_worlds(
            cfg, B, n_waypoints=3, seed=0, n_dynamic=2,
            route_around_obstacles=True, router="grid", planner_grid=96,
        )
        jax.block_until_ready(env)
        t0 = time.time()
        env, obstacles, scal = stepper(env, obstacles)
        _ = np.asarray(scal)
        compile_s = time.time() - t0
        # settle: a few warm ticks so refine-tail sizes are realistic
        for _ in range(10):
            env, obstacles, scal = stepper(env, obstacles)
        _ = np.asarray(scal[0])
        chunks = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _ in range(5):
                env, obstacles, scal = stepper(env, obstacles)
            _ = np.asarray(scal[0])
            chunks.append((time.perf_counter() - t0) / 5)
        chunks = np.asarray(chunks) * 1e3
        dev_ms = float(np.median(chunks))
        r = {
            "B": B,
            "device_tick_ms": round(dev_ms, 2),
            "device_tick_worst_chunk_ms": round(float(chunks.max()), 2),
            "throughput_solves_per_s": round(B / (dev_ms / 1e3), 1),
            "converged": round(float(np.asarray(scal)[0]), 4),
            "within_41ms": bool(dev_ms <= budget_ms),
            "compile_s": round(compile_s, 1),
            "t_total_s": round(time.time() - t00, 1),
        }
        rows.append(r)
        print("RESULT " + json.dumps(r), flush=True)
    print("FRONTIER " + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
