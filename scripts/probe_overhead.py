"""Measure the per-call host<->device round-trip floor and the pipelined
(steady-state) fleet-tick rate on TPU.

Hypothesis (r3): the closed-loop tick's "batch-independent floor" is the
axon tunnel's per-call dispatch + scalar-fetch round trip (~25 ms), not
device compute — profile_fleet_tick measured apply_solution (a trivial
vmapped where over [B,51,3]) at 25 ms.  If true, a *pipelined* loop that
submits tick t+1 before syncing tick t's metrics runs at device speed, and
the honest per-tick latency on locally-attached hardware is the pipelined
inter-completion time.

Run: python scripts/probe_overhead.py [batch] [ticks]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.scenarios import episode_worlds

    print(f"device: {jax.devices()[0]}", flush=True)

    # 1. Raw round-trip floor: trivial jitted op + scalar fetch.
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    rts = []
    for _ in range(30):
        t0 = time.perf_counter()
        float(f(x))
        rts.append(time.perf_counter() - t0)
    rts = np.array(rts) * 1e3
    print(
        f"trivial-op round trip: p50 {np.percentile(rts, 50):.2f} ms "
        f"min {rts.min():.2f} ms max {rts.max():.2f} ms",
        flush=True,
    )

    # 2. Dispatch-only cost (no fetch): submit trivial ops back to back.
    t0 = time.perf_counter()
    y = x
    for _ in range(100):
        y = f(y)
    float(y)
    print(
        f"chained dispatch (100 trivial ops + 1 fetch): "
        f"{(time.perf_counter() - t0) * 1e3:.2f} ms total",
        flush=True,
    )

    # 3. Fleet tick: synced-every-tick vs pipelined.
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver,
            iterations=32,
            refine_stages=((0.125, 64, 0.2), (0.02, 96, 0.7)),
            fused_affine_tracks=True,
        )
    )
    params = AgentParams(complete_warm_starts=False)
    env, obstacles = episode_worlds(cfg, batch, n_waypoints=3, seed=0,
                                    n_dynamic=2)
    stepper = jax.jit(lambda e, o: env_mod.fleet_step(cfg, params, e, o))
    t0 = time.time()
    env1, info = stepper(env, obstacles)
    float(jnp.sum(info.diagnostics.final_cost))
    print(f"compile+first tick {time.time() - t0:.1f}s", flush=True)

    # synced every tick (the round-2 bench methodology)
    e = env1
    lat = []
    for _ in range(ticks):
        t0 = time.perf_counter()
        e, info = stepper(e, obstacles)
        float(jnp.sum(info.diagnostics.final_cost))
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat) * 1e3
    print(
        f"synced tick:    p50 {np.percentile(lat, 50):.2f} ms  "
        f"p99 {np.percentile(lat, 99):.2f} ms",
        flush=True,
    )

    # pipelined: sync each tick's metrics one tick late (depth-1 pipeline);
    # the device-side dependency chain is untouched.
    e = env1
    pending = None
    lat = []
    t_prev = time.perf_counter()
    for _ in range(ticks):
        e, info = stepper(e, obstacles)
        if pending is not None:
            float(jnp.sum(pending))
            now = time.perf_counter()
            lat.append(now - t_prev)
            t_prev = now
        pending = info.diagnostics.final_cost
    float(jnp.sum(pending))
    lat = np.array(lat) * 1e3
    print(
        f"pipelined tick: p50 {np.percentile(lat, 50):.2f} ms  "
        f"p99 {np.percentile(lat, 99):.2f} ms",
        flush=True,
    )

    # free-running: no per-tick fetch at all, one sync at the end.
    e = env1
    t0 = time.perf_counter()
    infos = []
    for _ in range(ticks):
        e, info = stepper(e, obstacles)
        infos.append(info.diagnostics.final_cost)
    jax.block_until_ready(e)
    wall = time.perf_counter() - t0
    print(
        f"free-running:   {wall / ticks * 1e3:.2f} ms/tick "
        f"({ticks} ticks, sync at end)",
        flush=True,
    )


if __name__ == "__main__":
    main()
