"""Decompose the fleet-tick latency on TPU: problem build / solve / apply.

The closed-loop tick (scripts/bench_fleet_episodes.py) measured ~79 ms at
B=4096 while the open-loop K=8 solve implies ~36 ms — this script times each
phase of `environment.fleet_step` separately to locate the overhead.

Run: python scripts/profile_fleet_tick.py [batch]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # value-sync fence: pull one scalar
    leaf = jax.tree.leaves(out)[0]
    float(leaf.reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(leaf.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best * 1e3:8.2f} ms", flush=True)
    return out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu import agent as agent_mod
    from kissmpc_tpu.scenarios import episode_worlds
    from kissmpc_tpu.solver.api import solve_batch, _dispatch

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver,
            iterations=32,
            refine_stages=((0.125, 64, 0.2), (0.02, 96, 0.7)),
        )
    )
    cfg_norefine = cfg.replace(
        solver=dataclasses.replace(cfg.solver, refine_stages=())
    )
    # match the production fleet bench: repair-only warm starts, plan-step
    # track prediction, grid-planned waypoint chains
    params = AgentParams(
        complete_warm_starts=False, prediction_dt=cfg.time_step,
        stall_skip_ticks=50,
    )
    env, obstacles = episode_worlds(
        cfg, batch, n_waypoints=3, seed=0, n_dynamic=2,
        route_around_obstacles=True, router="grid", planner_grid=96,
    )
    # tunnel-RTT baseline: every timeit row below includes one of these
    trivial = jax.jit(lambda x: x + 1.0)
    timeit("sync overhead (x+1)", trivial, jnp.zeros((8, 8), jnp.float32))

    build = jax.jit(
        lambda e, o: jax.vmap(
            lambda a, ob: agent_mod.build_problem(cfg, params, a, ob)
        )(e.agent, o)
    )
    build_norepair = jax.jit(
        lambda e, o: jax.vmap(
            lambda a, ob: __import__(
                "kissmpc_tpu.solver.problem", fromlist=["problem_with_obstacles"]
            ).problem_with_obstacles(
                cfg,
                agent_mod.current_state(a),
                a.goal_state,
                ob,
                sensor_radius=params.sensor_radius,
                control_bounds=params.control_bounds,
                state_bounds=params.state_bounds,
                inflation_radius=params.inflation_radius,
                warm_states=a.states_matrix,
                warm_controls=a.controls_matrix,
                repair_warm_start_states=False,
            )
        )(e.agent, o)
    )
    solve_full = jax.jit(lambda p: solve_batch(cfg, p))
    solve_base = jax.jit(lambda p: _dispatch(cfg_norefine, p))
    apply_fn = jax.jit(
        lambda e, s: jax.vmap(
            lambda a, ss: agent_mod.apply_solution(params, a, ss)
        )(e.agent, s)
    )
    full = jax.jit(lambda e, o: env_mod.fleet_step(cfg, params, e, o))

    problems = timeit("build_problem (repair+complete)", build, env, obstacles)
    timeit("build_problem (no repair)", build_norepair, env, obstacles)
    sol = timeit("solve_batch (with refine stages)", solve_full, problems)
    timeit("solve base only (no refine)", solve_base, problems)
    timeit("apply_solution", apply_fn, env, sol)
    timeit("full fleet_step", full, env, obstacles)


if __name__ == "__main__":
    main()
