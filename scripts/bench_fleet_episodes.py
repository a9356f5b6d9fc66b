"""Closed-loop fleet episode benchmark on TPU (config 5 of BASELINE.md).

Runs >= 2048 concurrent receding-horizon episodes with obstacle fields for
>= 100 ticks through `environment.fleet_step` (fused batched solves), and
reports, per VERDICT r2 items 1-2:

 * latency, measured two ways: **synced** (host blocks on every tick's
   metrics — includes the axon tunnel's per-call round trip, ~20+ ms of
   pure host<->device transport on this rig) and **pipelined** (tick t+1 is
   submitted before tick t's metrics are fetched — the device-side episode
   dependency chain is untouched, so this is the true device tick rate and
   what locally-attached hardware would see per tick).  The budget verdict
   uses the pipelined number; both are printed.
 * safety over the *executed* trajectories: obstacles now actually move in
   the world (`obstacles.advance` each tick — the reference's humans move
   between solves; a frozen world cannot measure closed-loop clearance),
   and each tick records the true uninflated clearance
   min_k |p - c_k| - r_k - r_robot at the executed state.  Collision rate =
   fraction of episodes ever below 0.
 * goal progress: final-goal-reached fraction per tick (the curve), plus a
   classification of episodes not at the goal after the run
   (progressing / stuck / oscillating) from the executed positions.

Run (background, generous timeout):
  cd /root/repo && python scripts/bench_fleet_episodes.py [batch] [ticks] \
      [policy] [schedule]

``policy``: "repair" (default) or "full" (repair + gated completion).
``schedule``: "refine" (default; staged-refinement certification) or
"base".  (An r4 "sorted" early-exit schedule was measured — 28.85 ms vs
29.06 ms, noise — and removed with the kernel flag; the r4 exit probe, git history.)
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
    schedule = sys.argv[4] if len(sys.argv) > 4 else "refine"
    # "plan" (default since r4) routes waypoints with the batched
    # grid-Dijkstra global planner (planner.py — the Nav2-plan equivalent);
    # "route" keeps the r3 one-detour stand-in; "direct" the raw random
    # hops (harder than the reference's operating envelope: straight legs
    # through the field).
    routing = sys.argv[5] if len(sys.argv) > 5 else "plan"
    # route chain density (grid router): planned points per leg
    ppl = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    # periodic global replanning (ticks; 0 = off): every R ticks the grid
    # planner re-routes each episode from its CURRENT pose to its final
    # goal (host-side, like the reference's Nav2 /plan re-ingestion,
    # `ros2interface.py:109-174`).  The replanned chain reuses the same
    # [B, W', 3] shape (W'-1 route points + the final goal), so the tick
    # program is untouched.  This is what unsticks pressed-at-boundary
    # local minima: a fresh route FROM the pressed pose knows the way
    # around the disk, while the original chain only knew the way from
    # where the robot was supposed to be.
    replan_every = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.obstacles.obstacles import advance, clearance_to_point
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
            # Per-scenario adaptive centering: +1.2pt converged / +0.3pt
            # usable at zero latency cost (scripts/sweep_fleet_schedule.py,
            # schedule C vs A).
            mu_sigma_max=0.7,
            # Episode obstacle fields are constant-velocity tracks
            # (scenarios.episode_worlds), so the kernel can reconstruct
            # them from (c0, delta) rows (+5% measured at K=8).
            fused_affine_tracks=True,
        )
    )
    params = AgentParams(
        complete_warm_starts=(policy == "full"),
        # Predict at the plan step so track column t matches the moving
        # world at t plan steps (the reference hardcodes 0.1 s).
        prediction_dt=cfg.time_step,
        # Skip a non-final route point after 50 stalled ticks (~2 s): the
        # r4 stuck cohort was parked at inflated boundaries re-attracted
        # to an awkward intermediate point (dist p50 1.03 m, clearance
        # pinned at 0.1) — skipping forward hands the MPC the next point
        # on the planned chain instead.
        stall_skip_ticks=50,
    )

    t0 = time.time()
    env, obstacles, winfo = episode_worlds(
        cfg, batch, n_waypoints=3, seed=0, n_dynamic=2,
        route_around_obstacles=(routing != "direct"),
        router=("grid" if routing == "plan" else "detour"),
        planner_grid=96, points_per_leg=ppl, return_info=True,
    )
    leg_unreachable = ~np.asarray(winfo["leg_reachable"])  # [B, W]
    ep_unreachable = leg_unreachable.any(axis=1)
    jax.block_until_ready(env)
    print(f"worlds built in {time.time() - t0:.1f}s "
          f"(W={env.waypoints.shape[1]})", flush=True)

    # Generator sanity: fraction of episodes with any waypoint inside a
    # *static* obstacle's inflated disk (such a waypoint is unreachable and
    # its episode reads "stuck" no matter what the solver does).
    wp = np.asarray(env.waypoints)  # [B, W, 3]
    oc = np.asarray(obstacles.position)  # [B, K, 2]
    orad = np.asarray(obstacles.radius)
    static_m = (np.asarray(obstacles.linear_velocity) == 0.0) & (
        np.asarray(obstacles.active) > 0.5
    )
    dwp = np.linalg.norm(
        wp[:, :, None, :2] - oc[:, None, :, :], axis=-1
    )  # [B, W, K]
    blocked = (
        (dwp < (orad[:, None, :] + params.inflation_radius))
        & static_m[:, None, :]
    ).any(axis=(1, 2))
    print(f"episodes with a blocked waypoint: {blocked.mean():.4f}",
          flush=True)

    def tick_fn(e, o):
        new_env, info = env_mod.fleet_step(cfg, params, e, o)
        new_obs = jax.vmap(lambda oo: advance(oo, cfg.time_step))(o)
        pos = new_env.agent.states_matrix[:, 1, :2]  # executed state
        clr = jax.vmap(
            lambda oo, p: clearance_to_point(oo, p, params.radius)
        )(new_obs, pos)
        usable = (
            info.diagnostics.kkt_feasibility <= params.fallback_feasibility
        )
        scalars = jnp.stack(
            [
                jnp.mean(info.diagnostics.converged.astype(jnp.float32)),
                jnp.mean(usable.astype(jnp.float32)),
                jnp.mean(info.final_goal_reached.astype(jnp.float32)),
                jnp.min(clr),
                jnp.max(info.diagnostics.kkt_stationarity),
                jnp.max(info.diagnostics.kkt_feasibility),
                jnp.mean(info.diagnostics.final_cost),
            ]
        )
        return new_env, new_obs, scalars, pos, clr, usable

    stepper = jax.jit(tick_fn)
    t0 = time.time()
    env_w, obs_w, scal, _, _, _ = stepper(env, obstacles)
    _ = np.asarray(scal)
    print(f"compile+first tick {time.time() - t0:.1f}s", flush=True)
    env, obstacles = env_w, obs_w

    # --- measured loop: depth-1 pipeline --------------------------------
    # Tick t's device->host copies are enqueued *immediately* after tick t
    # (copy_to_host_async), i.e. BEFORE tick t+1 is dispatched — on the
    # serialized tunnel stream a fetch enqueued after the next tick's
    # compute would wait for it, adding a full round trip to every tick
    # (measured: scripts/probe_overhead.py).  The values are then read one
    # tick late, by which time the copy has landed; pipelined latency =
    # inter-completion time.  A separate synced pass measures the blocking
    # (tunnel-round-trip-inclusive) number, and a free-running pass the
    # pure device tick rate.
    agg = MetricsAggregator()
    rows = []  # per-tick scalar rows
    pos_hist = []
    clr_hist = []
    pending = None
    t_prev = time.perf_counter()
    pipe_lat = []
    t_start = time.time()
    usab_hist = []
    n_replans = 0
    replan_s = 0.0
    from kissmpc_tpu.planner import plan_waypoint_chain

    for t in range(ticks):
        if replan_every and t > 0 and t % replan_every == 0:
            # Nav2-style global replan from current poses (host-side,
            # CPU planner); same chain shape, so no recompile.  The
            # surgery pause is excluded from the latency samples AND
            # (via replan_s) from the throughput wall clock below, so
            # ticks/s stays a device-throughput number.
            t_rp0 = time.perf_counter()
            Wn = env.waypoints.shape[1]
            pos3 = np.asarray(env.agent.states_matrix[:, 1, :])
            final_wp = np.asarray(env.waypoints[:, -1:, :])
            new_wps, _ = plan_waypoint_chain(
                pos3, final_wp, oc, orad, static_m,
                params.inflation_radius, points_per_leg=Wn - 1, grid=96,
            )
            env = env._replace(
                agent=env.agent._replace(
                    goal_state=jnp.asarray(new_wps[:, 0])
                ),
                waypoints=jnp.asarray(new_wps),
                waypoint_index=jnp.zeros((batch,), jnp.int32),
                stall_ticks=jnp.zeros((batch,), jnp.int32),
            )
            n_replans += 1
            replan_s += time.perf_counter() - t_rp0
            t_prev = time.perf_counter()
        env, obstacles, scal, pos, clr, usab = stepper(env, obstacles)
        for a in (scal, pos, clr, usab):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        if pending is not None:
            row = np.asarray(pending[0])
            rows.append(row)
            pos_hist.append(np.asarray(pending[1]))
            clr_hist.append(np.asarray(pending[2]))
            usab_hist.append(np.asarray(pending[3]))
            now = time.perf_counter()
            pipe_lat.append(now - t_prev)
            t_prev = now
            agg.record_tick(
                pipe_lat[-1],
                converged_fraction=float(row[0]),
                usable=float(row[1]),
                done=float(row[2]),
                min_clearance=float(row[3]),
            )
        pending = (scal, pos, clr, usab)
        if t % 20 == 0 and rows:
            print(
                f"tick {t:4d} conv={rows[-1][0]:.4f} done={rows[-1][2]:.3f} "
                f"min_clr={rows[-1][3]:.3f} lat={pipe_lat[-1] * 1e3:.1f}ms",
                flush=True,
            )
    row = np.asarray(pending[0])
    rows.append(row)
    pos_hist.append(np.asarray(pending[1]))
    clr_hist.append(np.asarray(pending[2]))
    usab_hist.append(np.asarray(pending[3]))
    pipe_lat.append(time.perf_counter() - t_prev)
    # Device-throughput wall: host-side global-replan pauses are a planner
    # cost, not solver throughput — report them separately (replan_total_s).
    wall = time.time() - t_start - replan_s
    # Snapshot the waypoint state NOW: the synced + free-running passes
    # below advance env ~60 more ticks, and the cohort geometry must pair
    # pos_hist[-1] with the waypoint state of the same tick.
    wp_snapshot = np.asarray(env.waypoints)
    idx_snapshot = np.asarray(env.waypoint_index)

    # --- synced-latency pass (short) -------------------------------------
    sync_lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        env, obstacles, scal, pos, clr, usab = stepper(env, obstacles)
        _ = np.asarray(scal)
        sync_lat.append(time.perf_counter() - t0)

    # --- free-running pass: pure device tick rate (sync per 5-tick chunk;
    # chunk means give a latency distribution without per-tick fetches) ----
    chunks = []
    for _ in range(8):
        t0 = time.perf_counter()
        for _ in range(5):
            env, obstacles, scal, pos, clr, usab = stepper(env, obstacles)
        _ = np.asarray(scal[0])
        chunks.append((time.perf_counter() - t0) / 5)
    chunks = np.asarray(chunks)
    free_ms = float(np.median(chunks) * 1e3)
    free_worst_ms = float(chunks.max() * 1e3)

    rows = np.stack(rows)  # [T, 7]
    pos_hist = np.stack(pos_hist)  # [T, B, 2]
    clr_hist = np.stack(clr_hist)  # [T, B]
    pipe_lat = np.asarray(pipe_lat)
    sync_lat = np.asarray(sync_lat)

    # --- safety over executed trajectories -------------------------------
    min_clr_ep = clr_hist.min(axis=0)  # [B]
    collided = min_clr_ep < 0.0
    # Per-episode usable structure: is the ~1-2% non-usable tail a few
    # persistent episodes (structural: near-infeasible geometry) or scattered
    # one-off ticks (solver noise)?
    usab_hist_a = np.stack(usab_hist)  # [T, B] bool
    unus_frac_ep = 1.0 - usab_hist_a.mean(axis=0)  # [B]
    ever_unusable = unus_frac_ep > 0.0
    chronic = unus_frac_ep > 0.1
    # --- goal progress + end-state classification ------------------------
    final_goal = wp_snapshot[:, -1, :2]  # [B, 2]
    dist_goal = np.linalg.norm(pos_hist - final_goal[None], axis=-1)  # [T,B]
    done_frac_curve = rows[:, 2]
    W = min(20, len(rows) - 1)
    at_goal_end = dist_goal[-1] <= (0.5 + params.radius)
    disp = np.linalg.norm(
        pos_hist[-1] - pos_hist[-1 - W], axis=-1
    )
    trend = dist_goal[-1 - W] - dist_goal[-1]  # >0 = approaching
    not_done = ~at_goal_end
    stuck = not_done & (disp < 0.05)
    progressing = not_done & ~stuck & (trend > 0.05)
    oscillating = not_done & ~stuck & ~progressing

    # --- cohort geometry (VERDICT r3 #3: what ARE the stuck/chronic
    # episodes doing?) -----------------------------------------------------
    wp_all = wp_snapshot  # [B, W', 3] (same tick as pos_hist[-1])
    cur_idx = np.clip(idx_snapshot, 0, wp_all.shape[1] - 1)
    cur_wp = wp_all[np.arange(batch), cur_idx]  # [B, 3]
    d_cur_wp = np.linalg.norm(pos_hist[-1] - cur_wp[:, :2], axis=-1)
    # is the *current* waypoint itself inside a static inflated disk?
    d_wp_obs = np.linalg.norm(
        cur_wp[:, None, :2] - oc, axis=-1
    ) - (orad + params.inflation_radius)
    wp_blocked_now = ((d_wp_obs < 0.0) & static_m).any(axis=1)
    end_clr = clr_hist[-1]

    # Widest-corridor analysis for every unfinished episode: the best
    # bottleneck margin (beyond r+inflation) ANY path from the end pose to
    # the final goal can achieve.  If it is ~0, no global planner can hand
    # the MPC a comfortable route — the episode is squeeze-limited geometry,
    # not a stack gap (VERDICT r3 #3's "measured proof" branch).
    from kissmpc_tpu.planner import bottleneck_clearance

    bneck = bottleneck_clearance(
        np.concatenate([pos_hist[-1], np.zeros((batch, 1))], axis=1),
        final_goal,
        oc, orad, static_m, params.inflation_radius,
    )

    def cohort_stats(mask):
        if not mask.any():
            return None
        return {
            "n": int(mask.sum()),
            "dist_to_waypoint_p50": round(
                float(np.percentile(d_cur_wp[mask], 50)), 3
            ),
            "end_clearance_p50": round(
                float(np.percentile(end_clr[mask], 50)), 3
            ),
            "end_clearance_p10": round(
                float(np.percentile(end_clr[mask], 10)), 3
            ),
            "waypoint_blocked_frac": round(
                float(wp_blocked_now[mask].mean()), 3
            ),
            "waypoints_done_p50": round(
                float(np.percentile(cur_idx[mask], 50)), 1
            ),
            "bottleneck_margin_p50": round(
                float(np.percentile(bneck[mask], 50)), 3
            ),
            "squeeze_limited_frac": round(
                float((bneck[mask] < 0.05).mean()), 3
            ),
        }

    out = {
        "batch": batch,
        "ticks": ticks,
        "warm_start_policy": policy,
        "schedule": schedule,
        "routing": routing,
        "points_per_leg": ppl,
        "replan_every": replan_every,
        "n_replans": n_replans,
        "replan_total_s": round(replan_s, 2),
        "episode_ticks_per_s": round(ticks / wall, 2),
        "solves_per_s": round(batch * ticks / wall, 1),
        "latency_pipelined_p50_ms": round(
            float(np.percentile(pipe_lat, 50) * 1e3), 2
        ),
        "latency_pipelined_p99_ms": round(
            float(np.percentile(pipe_lat, 99) * 1e3), 2
        ),
        "latency_synced_p50_ms": round(
            float(np.percentile(sync_lat, 50) * 1e3), 2
        ),
        "latency_synced_p99_ms": round(
            float(np.percentile(sync_lat, 99) * 1e3), 2
        ),
        "latency_device_ms": round(free_ms, 2),
        "latency_device_worst_chunk_ms": round(free_worst_ms, 2),
        "blocked_waypoint_fraction": round(float(blocked.mean()), 4),
        "converged_fraction_mean": round(float(rows[:, 0].mean()), 4),
        "usable_fraction_mean": round(float(rows[:, 1].mean()), 4),
        "final_goal_reached": round(float(at_goal_end.mean()), 4),
        "goal_reached_curve": [
            round(float(x), 4) for x in done_frac_curve[:: max(1, ticks // 20)]
        ],
        # soak observables (VERDICT r3 #7): does the usable fraction decay
        # and the clearance floor erode over long horizons?
        "usable_curve": [
            round(float(x), 4) for x in rows[:, 1][:: max(1, ticks // 20)]
        ],
        "min_clearance_per_100t": [
            round(float(clr_hist[i : i + 100].min()), 4)
            for i in range(0, len(clr_hist), 100)
        ],
        "collision_rate": round(float(collided.mean()), 6),
        "episodes_ever_unusable": round(float(ever_unusable.mean()), 4),
        "episodes_chronically_unusable": round(float(chronic.mean()), 4),
        "unusable_episode_min_clearance_p50": (
            round(float(np.percentile(min_clr_ep[ever_unusable], 50)), 4)
            if ever_unusable.any() else None
        ),
        "min_clearance_p0": round(float(min_clr_ep.min()), 4),
        "min_clearance_p1": round(float(np.percentile(min_clr_ep, 1)), 4),
        "min_clearance_p50": round(float(np.percentile(min_clr_ep, 50)), 4),
        "endstate_progressing": round(float(progressing.mean()), 4),
        "endstate_stuck": round(float(stuck.mean()), 4),
        "endstate_oscillating": round(float(oscillating.mean()), 4),
        "stuck_cohort": cohort_stats(stuck),
        "oscillating_cohort": cohort_stats(oscillating),
        "chronic_cohort": cohort_stats(chronic),
        # geometry decomposition of all not-done episodes: a squeeze-limited
        # episode has NO path to the goal with >= 5 cm margin beyond the
        # inflated radius — unreachable-in-comfort even under a perfect
        # planner
        "notdone_squeeze_limited_frac": (
            round(float((bneck[not_done] < 0.05).mean()), 4)
            if not_done.any() else None
        ),
        "notdone_bottleneck_p50": (
            round(float(np.percentile(bneck[not_done], 50)), 3)
            if not_done.any() else None
        ),
        "unreachable_leg_episodes": round(float(ep_unreachable.mean()), 4),
        "done_or_squeezelimited_or_blocked": round(
            float(
                (
                    at_goal_end | (bneck < 0.05) | wp_blocked_now
                    | ep_unreachable
                ).mean()
            ), 4
        ),
        # Budget verdicts.  The device one is what locally-attached hardware
        # sees per tick: median 5-tick free-running chunk AND pipelined p50
        # must both fit.  The worst chunk is reported but not gating — it
        # reliably contains one ~150 ms tunnel stall on a 32-byte fetch
        # (scripts/probe_overhead.py measured the same stall on a trivial
        # op; device compute cannot produce it, and the 50-tick free-running
        # *mean* of 25.9 ms bounds any real device-side spike).  The strict
        # p99 verdict over the pipelined pass (tunnel jitter included) is
        # reported alongside.
        "within_tick_budget": bool(
            free_ms / 1e3 <= cfg.time_step
            and np.percentile(pipe_lat, 50) <= cfg.time_step
        ),
        "within_tick_budget_pipelined_p99": bool(
            np.percentile(pipe_lat, 99) <= cfg.time_step
        ),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
