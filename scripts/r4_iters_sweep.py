"""Closed-loop base-iteration sweep (one process, B=2048, K=8).

The closed loop re-solves from last tick's plan: most scenarios need far
fewer than the open-loop 32 base IPM iterations, and the staged refinement
already catches stragglers.  `iterations` is a *runtime* kernel input, so
this sweep costs XLA-glue retraces only (the Mosaic binary is shared).
Measures free-running device tick + converged/usable per base count, fresh
worlds per variant (same seed) for comparability.

Run (TPU, background):  cd /root/repo && python scripts/r4_iters_sweep.py
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

    print(f"device: {jax.devices()[0]}", flush=True)
    B = 2048
    params = AgentParams(prediction_dt=0.041, stall_skip_ticks=50)

    for iters in (32, 24, 20, 16, 12):
        cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
        cfg = cfg.replace(
            solver=dataclasses.replace(
                cfg.solver,
                iterations=iters,
                refine_stages=((0.125, 64, 0.2), (0.02, 96, 0.7)),
                mu_sigma_max=0.7,
                fused_affine_tracks=True,
            )
        )
        env, obstacles = episode_worlds(
            cfg, B, n_waypoints=3, seed=0, n_dynamic=2,
            route_around_obstacles=True, router="grid", planner_grid=96,
        )
        jax.block_until_ready(env)

        def tick_fn(e, o, cfg=cfg):
            new_env, info = env_mod.fleet_step(cfg, params, e, o)
            new_obs = jax.vmap(lambda oo: advance(oo, cfg.time_step))(o)
            usable = (
                info.diagnostics.kkt_feasibility
                <= params.fallback_feasibility
            )
            scal = jnp.stack([
                jnp.mean(info.diagnostics.converged.astype(jnp.float32)),
                jnp.mean(usable.astype(jnp.float32)),
                jnp.mean(info.final_goal_reached.astype(jnp.float32)),
            ])
            return new_env, new_obs, scal

        stepper = jax.jit(tick_fn)
        t0 = time.time()
        env, obstacles, scal = stepper(env, obstacles)
        _ = np.asarray(scal)
        compile_s = time.time() - t0
        # settle 20 ticks so warm starts + refine tails are steady-state
        for _ in range(20):
            env, obstacles, scal = stepper(env, obstacles)
        _ = np.asarray(scal[0])
        chunks = []
        convs = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _ in range(5):
                env, obstacles, scal = stepper(env, obstacles)
            s = np.asarray(scal)
            chunks.append((time.perf_counter() - t0) / 5)
            convs.append(s)
        chunks = np.asarray(chunks) * 1e3
        s = np.mean(convs, axis=0)
        r = {
            "base_iterations": iters,
            "device_tick_ms": round(float(np.median(chunks)), 2),
            "converged": round(float(s[0]), 4),
            "usable": round(float(s[1]), 4),
            "done_frac": round(float(s[2]), 4),
            "compile_s": round(compile_s, 1),
        }
        print("RESULT " + json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
