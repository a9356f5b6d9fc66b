"""End-to-end example: occupancy map -> circle world -> receding-horizon run.

The full config-3 pipeline of BASELINE.md on the reference's own lab map:

 1. read `rrc_lab.pgm` (1522x817 occupancy grid) and extract the static
    obstacle circle set with the native EDT + greedy packing tool;
 2. convert to world-frame meters, pick start/goal in free space;
 3. run the jitted receding-horizon environment loop against the K nearest
    circles with a safety margin, printing per-tick telemetry.

Usage:  python examples/lab_navigation.py [--map PATH] [--ticks 120]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_MAP = "/root/reference/obstacle_handling/rrc_lab.pgm"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default=DEFAULT_MAP)
    ap.add_argument("--ticks", type=int, default=150)
    ap.add_argument("--resolution", type=float, default=0.05)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import agent as agent_mod
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.obstacles import static_set
    from kissmpc_tpu.obstacles.mapping import (
        circles_to_world,
        pack_circles,
        read_pgm,
    )
    from kissmpc_tpu.utils.metrics import MetricsAggregator

    if not os.path.exists(args.map):
        print(f"map not found: {args.map}")
        return 1

    t0 = time.time()
    img = read_pgm(args.map)
    centers_px, radii_px = pack_circles(img, min_radius=3.0, max_circles=400)
    centers, radii = circles_to_world(
        centers_px, radii_px, resolution=args.resolution,
        map_height_px=img.shape[0],
    )
    print(
        f"map {img.shape[1]}x{img.shape[0]} -> {len(radii)} circles "
        f"in {time.time() - t0:.2f}s"
    )

    # Start/goal in open space: probe a clearance field over candidates.
    rng = np.random.default_rng(0)
    extent = np.array([img.shape[1], img.shape[0]]) * args.resolution

    def clearance(p):
        return np.min(np.linalg.norm(centers - p, axis=1) - radii)

    candidates = rng.uniform([1, 1], extent - 1, size=(4000, 2))
    clear = np.array([clearance(p) for p in candidates])
    open_pts = candidates[clear > 0.8]
    start_xy = open_pts[0]
    # goal: the open point farthest from start but within ~4 m
    d = np.linalg.norm(open_pts - start_xy, axis=1)
    goal_xy = open_pts[np.argmax(np.where(d < 4.0, d, -1.0))]
    print(f"start {start_xy.round(2)} -> goal {goal_xy.round(2)}")

    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=8)
    # NOTE: the reference's research default state box is (-20, 20)
    # (`mpc/agent.py:106`); the lab map's world frame spans ~76 x 41 m, so
    # the box must cover it or the pinned start itself is infeasible (the
    # solver then reports infeasibility and the agent's fallback policy
    # parks the robot — by design).
    world_hi = float(max(extent)) + 1.0
    params = AgentParams(
        radius=0.3, sensor_radius=5.0, state_bounds=(-1.0, world_hi)
    )
    heading = np.arctan2(*(goal_xy - start_xy)[::-1])
    obstacles = static_set(
        centers, radii, max_obstacles=len(radii), dtype=jnp.float32
    )
    env = env_mod.init_env(
        cfg,
        jnp.asarray([start_xy[0], start_xy[1], heading], jnp.float32),
        waypoints=jnp.asarray([[goal_xy[0], goal_xy[1], heading]], jnp.float32),
        dtype=jnp.float32,
    )

    stepper = jax.jit(lambda e: env_mod.step(cfg, params, e, obstacles))
    agg = MetricsAggregator()
    for tick in range(args.ticks):
        t0 = time.perf_counter()
        env, info = stepper(env)
        jax.block_until_ready(env)
        agg.record_tick(time.perf_counter() - t0, info.diagnostics)
        pos = np.asarray(agent_mod.position(env.agent))
        c = clearance(pos)
        if tick % 10 == 0:
            print(
                f"tick {tick:4d} pos=({pos[0]:6.2f},{pos[1]:6.2f}) "
                f"clearance={c:5.2f} v={float(env.agent.linear_velocity):+.3f}"
            )
        assert c > 0, "collision!"
        if bool(env_mod.final_goal_reached(params, env)):
            print(f"goal reached at tick {tick}")
            break
    import json

    print(json.dumps(agg.summary(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
