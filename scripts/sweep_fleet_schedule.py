"""Closed-loop refine-schedule sweep: convert the ~2% non-usable ticks.

VERDICT r2 item 1 demands usable-plan >= 0.99 at B >= 2048.  Measured r3
baseline (schedule A): converged 0.974, usable 0.981.  This script runs the
same 2048-episode world through several refinement schedules IN ONE PROCESS
(cross-run tunnel drift makes separate-process comparisons worthless below
~15%) and reports converged/usable/latency per schedule.

Run: python scripts/sweep_fleet_schedule.py [batch] [ticks]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEDULES = {
    # A: round-2/3 production default
    "A_base": dict(stages=((0.125, 64, 0.2), (0.02, 96, 0.7)), sig_max=0.0),
    # B: third deep stage at a medium barrier pace
    "B_3stage": dict(
        stages=((0.125, 64, 0.2), (0.04, 96, 0.7), (0.02, 128, 0.5)),
        sig_max=0.0,
    ),
    # C: A + per-scenario adaptive centering in every solve
    "C_adaptive": dict(
        stages=((0.125, 64, 0.2), (0.02, 96, 0.7)), sig_max=0.7
    ),
    # D: wider stage-1 net
    "D_wide": dict(stages=((0.25, 64, 0.2), (0.05, 96, 0.7)), sig_max=0.0),
    # E: adaptive centering + third deep stage (the two best combined)
    "E_adaptive_3stage": dict(
        stages=((0.125, 64, 0.2), (0.04, 96, 0.7), (0.02, 128, 0.5)),
        sig_max=0.7,
    ),
    # F: adaptive + wide net
    "F_adaptive_wide": dict(
        stages=((0.25, 64, 0.2), (0.05, 96, 0.7)), sig_max=0.7
    ),
}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 40
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
    results = {}
    for name, sched in SCHEDULES.items():
        cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
        cfg = cfg.replace(
            solver=dataclasses.replace(
                cfg.solver,
                iterations=32,
                refine_stages=sched["stages"],
                mu_sigma_max=sched["sig_max"],
                fused_affine_tracks=True,
            )
        )
        params = AgentParams(
            complete_warm_starts=False, prediction_dt=cfg.time_step
        )
        env, obstacles = episode_worlds(
            cfg, batch, n_waypoints=3, seed=0, n_dynamic=2
        )

        def tick_fn(e, o, cfg=cfg, params=params):
            new_env, info = env_mod.fleet_step(cfg, params, e, o)
            new_obs = jax.vmap(lambda oo: advance(oo, cfg.time_step))(o)
            usable = (
                info.diagnostics.kkt_feasibility
                <= params.fallback_feasibility
            )
            return new_env, new_obs, jnp.stack(
                [
                    jnp.mean(info.diagnostics.converged.astype(jnp.float32)),
                    jnp.mean(usable.astype(jnp.float32)),
                ]
            )

        stepper = jax.jit(tick_fn)
        t0 = time.time()
        env, obstacles, scal = stepper(env, obstacles)
        _ = np.asarray(scal)
        compile_s = time.time() - t0
        conv, usable, lat = [], [], []
        pending = None
        t_prev = time.perf_counter()
        for _ in range(ticks):
            env, obstacles, scal = stepper(env, obstacles)
            try:
                scal.copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                row = np.asarray(pending)
                conv.append(float(row[0]))
                usable.append(float(row[1]))
                now = time.perf_counter()
                lat.append(now - t_prev)
                t_prev = now
            pending = scal
        row = np.asarray(pending)
        conv.append(float(row[0]))
        usable.append(float(row[1]))
        r = {
            "converged": round(float(np.mean(conv)), 4),
            "converged_last10": round(float(np.mean(conv[-10:])), 4),
            "usable": round(float(np.mean(usable)), 4),
            "usable_min": round(float(np.min(usable)), 4),
            "lat_p50_ms": round(float(np.percentile(lat, 50) * 1e3), 2),
            "compile_s": round(compile_s, 1),
        }
        results[name] = r
        print(f"{name}: {json.dumps(r)}", flush=True)
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
