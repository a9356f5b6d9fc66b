"""Perception-in-the-loop fleet tick cost (VERDICT r4 #7).

Each tick, a replayed synthetic frame stream (io/frames.py, the rosbag
stand-in) drives B independent perception pipelines — projection, per-
instance DBSCAN, tracker update (`obstacle_handling/human_tracking.py:
179-316` semantics) — whose tracked humans (offset into each episode's
frame, placed on the robot's path) become the episode's dynamic
ObstacleSet for the fused fleet tick.  Reports ms/tick with the perception
fold-in vs solver-only on identical worlds; the difference is the
batch-scale perception cost.

Run: cd /root/repo && python scripts/bench_perception_tick.py [batch] [ticks] [cpu]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    import jax

    if "cpu" in sys.argv[3:]:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.io.frames import FrameReplayer, record_synthetic_walk
    from kissmpc_tpu.perception import pipeline as pipe
    from kissmpc_tpu.perception import tracker as trk
    from kissmpc_tpu.scenarios import episode_worlds

    print(f"device: {jax.devices()[0]}", flush=True)

    # --- recorded session -> stacked device arrays ------------------------
    path = "/tmp/kissmpc_synthetic_walk.npz"
    record_synthetic_walk(path, n_frames=ticks + 1, dt=0.1)
    frames = list(FrameReplayer(path).synced())
    geom = frames[0].geometry
    F = len(frames)
    pts = jnp.asarray(np.stack([f.points for f in frames]))  # [F, P, 3]
    pmask = jnp.asarray(np.stack([f.point_mask for f in frames]))
    imask = jnp.asarray(np.stack([f.instance_masks for f in frames]))
    ivalid = jnp.asarray(np.stack([f.instance_valid for f in frames]))
    print(f"session: {F} synced frames", flush=True)

    # --- episode worlds (K=8 solver slots; static field + tracked human) --
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, iterations=32,
        refine_stages=((0.125, 64, 0.2), (0.02, 96, 0.7)),
        mu_sigma_max=0.7,
    ))
    params = AgentParams(prediction_dt=cfg.time_step,
                         complete_warm_starts=False, stall_skip_ticks=50)
    env, static_obs = episode_worlds(
        cfg, batch, n_waypoints=2, seed=0, n_dynamic=0,
        route_around_obstacles=True, router="grid",
    )
    # Each episode sees the tracked human relative to its own start pose
    # (the walk crosses ~1.5 m ahead of the robot).
    start_xy = np.asarray(env.agent.states_matrix[:, 0, :2])
    offsets = jnp.asarray(start_xy + np.array([1.2, 0.0], np.float32))

    tcfg = trk.TrackerConfig()
    CAP = 4
    pstate0 = jax.vmap(
        lambda _: pipe.init_perception(capacity=CAP, dtype=jnp.float32)
    )(jnp.arange(batch))

    def merge(static, tracked):
        """Concat the episode's static field with the tracked humans."""
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), static, tracked
        )

    def tick_perception(env, pstate, fidx):
        frame = (pts[fidx], pmask[fidx], imask[fidx], ivalid[fidx])

        def one(ps, off):
            ps2, obs = pipe.step(tcfg, ps, geom, *frame, dt=0.1)
            obs = obs._replace(position=obs.position + off[None, :])
            return ps2, obs

        pstate2, tracked = jax.vmap(one)(pstate, offsets)
        obstacles = jax.vmap(merge)(static_obs, tracked)
        new_env, info = env_mod.fleet_step(cfg, params, env, obstacles)
        scal = jnp.stack([
            jnp.mean(info.diagnostics.converged.astype(jnp.float32)),
            jnp.mean(info.final_goal_reached.astype(jnp.float32)),
            jnp.sum(jax.vmap(lambda o: jnp.sum(o.active))(tracked)),
        ])
        return new_env, pstate2, scal

    def tick_solver_only(env, pstate, fidx):
        del fidx
        new_env, info = env_mod.fleet_step(cfg, params, env, static_obs)
        scal = jnp.stack([
            jnp.mean(info.diagnostics.converged.astype(jnp.float32)),
            jnp.mean(info.final_goal_reached.astype(jnp.float32)),
            jnp.zeros(()),
        ])
        return new_env, pstate, scal

    # Interleaved measurement: the two variants alternate in 8-tick chunks
    # so host/tunnel contention hits both equally (a sequential layout let
    # a contended first pass read 3x slow — r5 log).
    results = {}
    states = {}
    for name, fn in (("solver_only", tick_solver_only),
                     ("with_perception", tick_perception)):
        stepper = jax.jit(fn)
        t0 = time.time()
        e, p, scal = stepper(env, pstate0, 0)
        _ = np.asarray(scal)
        states[name] = {
            "step": stepper, "e": e, "p": p, "lat": [], "row": None,
            "compile_s": round(time.time() - t0, 1),
        }
    CHUNK = 8
    rounds = max(1, (ticks - 1) // CHUNK)
    for r in range(rounds):
        for name, st in states.items():
            t_prev = time.perf_counter()
            for j in range(CHUNK):
                t = (r * CHUNK + j) % F
                st["e"], st["p"], scal = st["step"](st["e"], st["p"], t)
                _ = np.asarray(scal)
                now = time.perf_counter()
                st["lat"].append(now - t_prev)
                t_prev = now
            st["row"] = np.asarray(scal)
    for name, st in states.items():
        lat = np.asarray(st["lat"]) * 1e3
        row = st["row"]
        results[name] = {
            "tick_p50_ms": round(float(np.percentile(lat, 50)), 2),
            "tick_p99_ms": round(float(np.percentile(lat, 99)), 2),
            "converged": round(float(row[0]), 4),
            "tracked_total": float(row[2]),
            "compile_s": st["compile_s"],
        }
        print(f"{name}: {results[name]}", flush=True)

    results["perception_added_ms"] = round(
        results["with_perception"]["tick_p50_ms"]
        - results["solver_only"]["tick_p50_ms"], 2,
    )
    results["batch"] = batch
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
