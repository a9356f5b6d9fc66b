"""Benchmark / test scenario generation.

The reference has no scenario tooling — its "benchmark" is a robot driving
the RRC lab (`mpc/environment.py:39-80`).  Batched TPU solving needs
*populations* of scenarios; this module samples receding-horizon-style
problems, with and without obstacle fields, through the production problem
construction path (`problem_with_obstacles`: sensor top-K filter, track
prediction, warm-start repair + feasible completion).

Geometry of the obstacle worlds: circles are seeded along the start->goal
segment with lateral scatter, so the constraint set is *active* for most
scenarios (a circle field the straight-line plan never touches benchmarks
nothing).  Radii follow the reference's scale — humans are r=0.3
(`obstacle_handling/dynamic_obstacle.py:9`), lab-map circles pack down to
r~0.15 (`obstacle_handling/static_obstacle.py:37-56`); a subset moves with
constant velocity like the reference's predicted human tracks
(`obstacle_handling/dynamic_obstacle.py:30-37`).
"""

from __future__ import annotations

import numpy as np

# Reference inflation: robot radius 0.3 + 0.1 margin (`mpc/agent.py:149`).
DEFAULT_INFLATION = 0.4


def sample_endpoints(cfg, batch: int, rng: np.random.Generator):
    """Random receding-horizon (start, goal) pairs: goals within ~1.2x the
    horizon's reachable range (matches `__graft_entry__._example_problems`)."""
    starts = np.concatenate(
        [rng.uniform(-2, 2, (batch, 2)), rng.uniform(-3.1, 3.1, (batch, 1))],
        axis=1,
    ).astype(np.float32)
    reach = cfg.horizon * cfg.time_step * 0.5  # v_max = 0.5
    r = rng.uniform(0.1, 1.2 * reach, (batch, 1))
    ang = rng.uniform(-np.pi, np.pi, (batch, 1))
    goals = np.concatenate(
        [
            starts[:, 0:1] + r * np.cos(ang),
            starts[:, 1:2] + r * np.sin(ang),
            rng.uniform(-3.1, 3.1, (batch, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    return starts, goals


def sample_obstacle_field(
    starts: np.ndarray,  # [B, 3]
    goals: np.ndarray,  # [B, 3]
    k: int,
    rng: np.random.Generator,
    *,
    n_dynamic: int = 0,
    inflation: float = DEFAULT_INFLATION,
    radius_range=(0.15, 0.45),
    lateral_sigma: float = 0.35,
    endpoint_margin: float = 0.12,
    clear_points=(),
):
    """Sample K circles per scenario straddling the start->goal segment.

    Returns (centers [B,K,2], radii [B,K], orientation [B,K], v [B,K]) with
    both endpoints guaranteed outside every inflated circle (the initial
    state is *pinned* — a start inside an obstacle is an infeasible NLP by
    construction, which is a different benchmark).  ``n_dynamic`` of the K
    slots get a constant velocity in [0.3, 1.0] m/s with random heading.
    """
    B = starts.shape[0]
    seg = goals[:, :2] - starts[:, :2]  # [B, 2]
    seg_len = np.maximum(np.linalg.norm(seg, axis=1, keepdims=True), 1e-6)
    d_hat = seg / seg_len
    perp = np.stack([-d_hat[:, 1], d_hat[:, 0]], axis=1)  # [B, 2]

    frac = rng.uniform(0.2, 0.9, (B, k)).astype(np.float32)
    lat = rng.normal(0.0, lateral_sigma, (B, k)).astype(np.float32)
    centers = (
        starts[:, None, :2]
        + frac[..., None] * seg[:, None, :]
        + lat[..., None] * perp[:, None, :]
    ).astype(np.float32)
    radii = rng.uniform(*radius_range, (B, k)).astype(np.float32)

    # Push circles clear of both endpoints.  The *start* clearance is
    # feasibility-critical (the initial state is pinned; a start inside an
    # inflated circle is an infeasible NLP), so the alternating passes END
    # with a start push: when start and goal are closer than the two
    # clearance disks allow, the goal side keeps a (harmless) residual
    # violation — a goal inside an obstacle just parks the optimum at the
    # boundary.
    # ``clear_points`` extends the clearing to further waypoints (episode
    # worlds): a waypoint swallowed by a circle is unreachable and parks its
    # episode at the boundary forever.  The start push stays LAST and all
    # clearing precedes the dynamic-sweep guard below (moving a dynamic
    # obstacle after the guard would stale its redirect and let its track
    # sweep the pinned start — measured as rare closed-loop collisions).
    need = radii + inflation + endpoint_margin
    points = [goals[:, :2]] + [np.asarray(p)[:, :2] for p in clear_points]
    for _ in range(3 + 2 * bool(len(clear_points))):
        for p in points + [starts[:, :2]]:
            d = centers - p[:, None, :]  # [B, K, 2]
            dist = np.maximum(np.linalg.norm(d, axis=-1), 1e-6)
            push = np.maximum(need - dist, 0.0)
            centers = centers + d / dist[..., None] * push[..., None]

    orientation = rng.uniform(-np.pi, np.pi, (B, k)).astype(np.float32)
    v = np.zeros((B, k), np.float32)
    if n_dynamic > 0:
        v[:, :n_dynamic] = rng.uniform(0.3, 1.0, (B, n_dynamic))
        # Feasibility guard: the initial state is *pinned*, so a moving
        # obstacle whose straight-line track sweeps the start makes the NLP
        # (near-)infeasible by construction — that benchmarks the generator,
        # not the solver.  Redirect such obstacles radially away from the
        # start (distance then increases monotonically along the track).
        rel = centers - starts[:, None, :2]  # [B, K, 2]
        dist0 = np.maximum(np.linalg.norm(rel, axis=-1), 1e-6)
        u = np.stack([np.cos(orientation), np.sin(orientation)], axis=-1)
        # closest approach of c(t) = c0 + v t u to the start: project -rel
        # onto u, clamp to forward time.
        t_star = np.clip(-np.sum(rel * u, axis=-1), 0.0, None)
        closest = np.linalg.norm(
            rel + t_star[..., None] * u, axis=-1
        )
        sweep = (v > 0) & (closest < radii + inflation + endpoint_margin)
        away = np.arctan2(rel[..., 1], rel[..., 0]).astype(np.float32)
        orientation = np.where(sweep, away, orientation)
    return centers, radii, orientation, v


def obstacle_problems(
    cfg,
    batch: int,
    *,
    seed: int = 0,
    n_dynamic: int = 2,
    inflation: float = DEFAULT_INFLATION,
    dtype=None,
):
    """Batched obstacle-laden Problems through the production build path.

    Uses `problem_with_obstacles` (vmapped): sensor-radius top-K selection,
    per-timestep constant-velocity track prediction at the plan's own dt,
    warm-start repair + collision-gated feasible completion.
    """
    import jax
    import jax.numpy as jnp

    from .obstacles.obstacles import ObstacleSet
    from .solver.problem import problem_with_obstacles

    if dtype is None:
        dtype = jnp.float32
    K = cfg.max_obstacles
    assert K > 0, "obstacle_problems needs cfg.max_obstacles > 0"
    rng = np.random.default_rng(seed)
    starts, goals = sample_endpoints(cfg, batch, rng)
    centers, radii, orientation, v = sample_obstacle_field(
        starts, goals, K, rng, n_dynamic=n_dynamic, inflation=inflation
    )
    obs = ObstacleSet(
        position=jnp.asarray(centers, dtype),
        radius=jnp.asarray(radii, dtype),
        orientation=jnp.asarray(orientation, dtype),
        linear_velocity=jnp.asarray(v, dtype),
        angular_velocity=jnp.zeros((batch, K), dtype),
        active=jnp.ones((batch, K), dtype),
    )

    def build(s, g, o):
        return problem_with_obstacles(
            cfg,
            s,
            g,
            o,
            sensor_radius=5.0,
            prediction_dt=cfg.time_step,
            inflation_radius=inflation,
            dtype=dtype,
        )

    build_jit = jax.jit(jax.vmap(build))
    return build_jit(
        jnp.asarray(starts, dtype), jnp.asarray(goals, dtype), obs
    )


def route_waypoints(
    starts: np.ndarray,  # [B, 3]
    waypoints: np.ndarray,  # [B, W, 3]
    centers: np.ndarray,  # [B, K, 2]
    radii: np.ndarray,  # [B, K]
    static_mask: np.ndarray,  # [B, K] bool — only static circles are routed
    inflation: float,
    margin: float = 0.25,
):
    """Insert one detour point per leg around the worst blocking circle.

    Coarse stand-in for the reference's global planner: its waypoints are a
    decimated Nav2 `/plan` (`ros2interface.py:155-170`), i.e. a path that
    already routes around *static* obstacles — straight start->goal legs
    through an obstacle field are a harder problem than the reference ever
    hands its MPC.  For each leg p->q, find the static circle whose
    inflated disk the segment cuts deepest; the detour is the foot of the
    perpendicular pushed out to (radius + inflation + margin) on the far
    side.  Unblocked legs get their midpoint (keeps the output shape
    static: [B, 2W, 3], detour-before-hop interleave).
    """
    B, W, _ = waypoints.shape
    out = np.zeros((B, 2 * W, 3), waypoints.dtype)
    prev = starts[:, :2]
    need = radii + inflation  # [B, K]
    for w in range(W):
        q = waypoints[:, w, :2]
        d = q - prev  # [B, 2]
        L2 = np.maximum(np.sum(d * d, axis=1, keepdims=True), 1e-9)
        t = np.clip(
            np.einsum("bkd,bd->bk", centers - prev[:, None, :], d) / L2,
            0.0, 1.0,
        )  # [B, K]
        foot = prev[:, None, :] + t[..., None] * d[:, None, :]  # [B, K, 2]
        away = foot - centers  # [B, K, 2]
        dist = np.linalg.norm(away, axis=-1)  # [B, K]
        depth = np.where(static_mask, need - dist, -np.inf)
        k = np.argmax(depth, axis=1)  # worst blocker per episode
        bi = np.arange(B)
        blocked = depth[bi, k] > 0.0
        a = away[bi, k]
        an = np.linalg.norm(a, axis=1, keepdims=True)
        # Dead-center fallback: go perpendicular-left of the leg.
        left = np.stack([-d[:, 1], d[:, 0]], axis=1) / np.sqrt(L2)
        a_hat = np.where(an > 1e-6, a / np.maximum(an, 1e-9), left)
        detour = centers[bi, k] + a_hat * (
            (need[bi, k] + margin)[:, None]
        )
        mid = 0.5 * (prev + q)
        pt = np.where(blocked[:, None], detour, mid)
        heading = np.arctan2(q[:, 1] - pt[:, 1], q[:, 0] - pt[:, 0])
        out[:, 2 * w, :2] = pt
        out[:, 2 * w, 2] = heading
        out[:, 2 * w + 1] = waypoints[:, w]
        prev = q
    # The inserted points (and detours themselves) can land inside *other*
    # circles — a planner would never emit such a point.  Project every
    # routed waypoint out of every static disk (waypoint-side, so obstacle
    # positions — and the dynamic-sweep feasibility guard applied to them —
    # stay untouched).
    for _ in range(6):
        for w in range(2 * W):
            p = out[:, w, :2]
            d = p[:, None, :] - centers  # [B, K, 2]
            dist = np.maximum(np.linalg.norm(d, axis=-1), 1e-6)
            depth = np.where(
                static_mask, need + margin * 0.5 - dist, -np.inf
            )
            push = np.maximum(depth, 0.0)  # [B, K]
            # Sum over ALL violating circles: a point inside an
            # intersection of overlapping disks cycles forever under
            # worst-only pushes, but moves along the combined gradient here.
            out[:, w, :2] = p + np.sum(
                d / dist[..., None] * push[..., None], axis=1
            )
    return out


def episode_worlds(
    cfg,
    batch: int,
    *,
    n_waypoints: int = 3,
    seed: int = 0,
    n_dynamic: int = 2,
    inflation: float = DEFAULT_INFLATION,
    route_around_obstacles: bool = False,
    router: str = "detour",
    points_per_leg: int = 3,
    planner_grid: int = 64,
    return_info: bool = False,
    dtype=None,
):
    """Batched receding-horizon episode worlds for the fleet-episode bench
    (config 5 of BASELINE.md): per episode, a start pose, a waypoint chain of
    reachable hops, and an obstacle field seeded along the first leg.

    Returns ``(env: EnvState[B], obstacles: ObstacleSet[B])`` ready for
    `environment.fleet_step` / `parallel.fleet.make_fleet_env_stepper`;
    with ``return_info=True`` a third element carries generator
    diagnostics — currently ``{"leg_reachable": [B, W] bool}`` from the
    grid router (all-True otherwise), so trap-geometry episodes are
    measurable instead of folded into "stuck" (the planner's contract).
    """
    import jax
    import jax.numpy as jnp

    from . import environment as env_mod
    from .obstacles.obstacles import ObstacleSet

    if dtype is None:
        dtype = jnp.float32
    K = cfg.max_obstacles
    rng = np.random.default_rng(seed)
    starts, first_goal = sample_endpoints(cfg, batch, rng)
    # Per-leg reachability diagnostic from the grid router ([B, W] bool);
    # stays None (-> all-True) on every other path, including K == 0.
    leg_reach = None

    # Waypoint chain: first hop = sampled goal, further hops random steps of
    # comparable length (a decimated global plan, `ros2interface.py:155-170`).
    hop_len = cfg.horizon * cfg.time_step * 0.5
    hops = [first_goal]
    for _ in range(n_waypoints - 1):
        r = rng.uniform(0.3 * hop_len, 1.0 * hop_len, (batch, 1))
        ang = rng.uniform(-np.pi, np.pi, (batch, 1))
        prev = hops[-1]
        hops.append(
            np.concatenate(
                [
                    prev[:, 0:1] + r * np.cos(ang),
                    prev[:, 1:2] + r * np.sin(ang),
                    rng.uniform(-3.1, 3.1, (batch, 1)),
                ],
                axis=1,
            ).astype(np.float32)
        )
    waypoints = np.stack(hops, axis=1)  # [B, W, 3]

    if K > 0:
        # Waypoints must be *reachable*: the reference's waypoints come from
        # a global planner that places them in free space by construction
        # (`ros2interface.py:109-174`); clear_points pushes circles off every
        # hop (measured r3: without it 33% of episodes read "stuck", largely
        # waypoints swallowed by obstacles re-failing the solve every tick).
        centers, radii, orientation, v = sample_obstacle_field(
            starts, first_goal, K, rng, n_dynamic=n_dynamic,
            inflation=inflation, clear_points=hops[1:],
        )
        obstacles = ObstacleSet(
            position=jnp.asarray(centers, dtype),
            radius=jnp.asarray(radii, dtype),
            orientation=jnp.asarray(orientation, dtype),
            linear_velocity=jnp.asarray(v, dtype),
            angular_velocity=jnp.zeros((batch, K), dtype),
            active=jnp.ones((batch, K), dtype),
        )
        if route_around_obstacles:
            if router == "grid":
                # Real global planner (batched grid Dijkstra over the
                # static circles — planner.py): P route points per leg +
                # the original waypoint, reachability-guaranteed wherever
                # the grid is connected.  The reference's Nav2 plan
                # equivalent (`ros2interface.py:155-170`).
                from .planner import plan_waypoint_chain

                waypoints, leg_reach = plan_waypoint_chain(
                    starts, waypoints, centers, radii, v == 0.0, inflation,
                    points_per_leg=points_per_leg, grid=planner_grid,
                )
            else:
                waypoints = route_waypoints(
                    starts, waypoints, centers, radii, v == 0.0, inflation
                )
    else:
        from .obstacles import empty

        obstacles = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), empty(0, dtype)
        )
    env = jax.vmap(
        lambda s, w: env_mod.init_env(cfg, s, w, dtype=dtype)
    )(jnp.asarray(starts, dtype), jnp.asarray(waypoints, dtype))
    if return_info:
        if leg_reach is None:
            leg_reach = np.ones((batch, waypoints.shape[1]), bool)
        return env, obstacles, {"leg_reachable": leg_reach}
    return env, obstacles


def free_problems(cfg, batch: int, *, seed: int = 0, dtype=None):
    """Batched obstacle-free Problems (the round-1 headline scenario set)."""
    import jax
    import jax.numpy as jnp

    from .solver.problem import default_problem

    if dtype is None:
        dtype = jnp.float32
    rng = np.random.default_rng(seed)
    starts, goals = sample_endpoints(cfg, batch, rng)
    return jax.vmap(lambda s, g: default_problem(cfg, s, g, dtype=dtype))(
        jnp.asarray(starts), jnp.asarray(goals)
    )


def lab_worlds(
    cfg,
    batch: int,
    *,
    map_path: str = "/root/reference/obstacle_handling/rrc_lab.pgm",
    resolution: float = 0.05,
    seed: int = 0,
    goal_range=(2.0, 4.5),
    circles_per_episode: int = 24,
    max_circles: int = 400,
    inflation: float = DEFAULT_INFLATION,
    points_per_leg: int = 3,
    planner_grid: int = 96,
    n_dynamic: int = 0,
    dtype=None,
):
    """Batched episode worlds on a real occupancy map (config 3 at fleet
    scale — the reference's own operating envelope,
    `mpc/environment.py:39-80` + `obstacle_handling/static_obstacle.py`).

    Packs the map into circles, samples start/goal pairs in free space
    (clearance > inflation + 0.25 m, goal distance in ``goal_range``),
    routes each episode with the batched grid planner, and hands each
    episode its ``circles_per_episode`` nearest circles — the per-tick
    sensor top-K (`solver/problem.problem_with_obstacles`) selects the
    solver's K from these, mirroring the reference's sensor-radius filter
    (`mpc/environment.py:48-65`).

    ``n_dynamic`` adds that many walking humans per episode (r = 0.3, the
    reference's human radius, constant velocity 0.3-1.0 m/s near the
    route — `obstacle_handling/dynamic_obstacle.py:8-9`), appended after
    the M static circles; humans whose straight-line track would sweep
    the pinned start are redirected radially away (the
    `sample_obstacle_field` feasibility guard).  Advance them in the
    world with `obstacles.advance` each tick.

    Returns ``(env: EnvState[B], obstacles: ObstacleSet[B, M+n_dynamic],
    info: dict)`` with ``info["extent"]`` the map extent in meters and
    ``info["leg_reachable"]`` the router's per-leg connectivity.  NOTE:
    map frames are large (rrc_lab spans ~76 x 41 m) — pass AgentParams
    ``state_bounds`` that cover ``info["extent"]``.
    """
    import jax
    import jax.numpy as jnp

    from . import environment as env_mod
    from .obstacles.mapping import circles_to_world, pack_circles, read_pgm
    from .obstacles.obstacles import ObstacleSet
    from .planner import plan_waypoint_chain

    if dtype is None:
        dtype = jnp.float32
    img = read_pgm(map_path)
    centers_px, radii_px = pack_circles(
        img, min_radius=3.0, max_circles=max_circles
    )
    centers, radii = circles_to_world(
        centers_px, radii_px, resolution=resolution,
        map_height_px=img.shape[0],
    )
    rng = np.random.default_rng(seed)
    extent = np.array([img.shape[1], img.shape[0]]) * resolution

    def clearances(P):
        d = np.linalg.norm(
            P[:, None, :] - centers[None], axis=-1
        ) - radii
        return d.min(axis=1)

    pool = rng.uniform([0.5, 0.5], extent - 0.5, size=(120000, 2))
    pool = pool[clearances(pool) > inflation + 0.25]
    if len(pool) < 1000:
        raise ValueError("free-space pool too small for this map")

    starts_xy = np.zeros((batch, 2), np.float32)
    goals_xy = np.zeros((batch, 2), np.float32)
    n_done = 0
    while n_done < batch:
        s = pool[rng.integers(0, len(pool), batch)]
        g = pool[rng.integers(0, len(pool), batch)]
        d = np.linalg.norm(s - g, axis=1)
        ok = (d > goal_range[0]) & (d < goal_range[1])
        take = min(batch - n_done, int(ok.sum()))
        starts_xy[n_done:n_done + take] = s[ok][:take]
        goals_xy[n_done:n_done + take] = g[ok][:take]
        n_done += take

    starts = np.concatenate(
        [starts_xy, rng.uniform(-np.pi, np.pi, (batch, 1))], axis=1
    ).astype(np.float32)
    goals = np.concatenate(
        [goals_xy, rng.uniform(-np.pi, np.pi, (batch, 1))], axis=1
    ).astype(np.float32)

    M = circles_per_episode
    mid = 0.5 * (starts_xy + goals_xy)
    d_mid = np.linalg.norm(
        mid[:, None, :] - centers[None], axis=-1
    ) - radii
    idx = np.argsort(d_mid, axis=1)[:, :M]
    ep_centers = centers[idx].astype(np.float32)
    ep_radii = radii[idx].astype(np.float32)

    waypoints, leg_reach = plan_waypoint_chain(
        starts, goals[:, None, :], ep_centers, ep_radii,
        np.ones((batch, M), bool), inflation,
        points_per_leg=points_per_leg, grid=planner_grid,
    )
    all_centers = ep_centers
    all_radii = ep_radii
    orientation = np.zeros((batch, M), np.float32)
    lin_v = np.zeros((batch, M), np.float32)
    if n_dynamic > 0:
        D = n_dynamic
        HUMAN_R = 0.3  # `obstacle_handling/dynamic_obstacle.py:9`
        frac = rng.uniform(0.3, 0.7, (batch, D)).astype(np.float32)
        seg = goals_xy - starts_xy
        lat = rng.uniform(0.5, 1.5, (batch, D)).astype(np.float32)
        lat *= rng.choice([-1.0, 1.0], (batch, D)).astype(np.float32)
        perp = np.stack([-seg[:, 1], seg[:, 0]], axis=1)
        perp /= np.maximum(np.linalg.norm(perp, axis=1, keepdims=True), 1e-6)
        h_pos = (
            starts_xy[:, None, :]
            + frac[..., None] * seg[:, None, :]
            + lat[..., None] * perp[:, None, :]
        ).astype(np.float32)
        # push clear of goal then start (start last: the pinned initial
        # state inside an inflated human is infeasible by construction)
        need = HUMAN_R + inflation + 0.12
        for p in (goals_xy, starts_xy):
            d = h_pos - p[:, None, :]
            dist = np.maximum(np.linalg.norm(d, axis=-1), 1e-6)
            push = np.maximum(need - dist, 0.0)
            h_pos = h_pos + d / dist[..., None] * push[..., None]
        h_ori = rng.uniform(-np.pi, np.pi, (batch, D)).astype(np.float32)
        h_v = rng.uniform(0.3, 1.0, (batch, D)).astype(np.float32)
        # redirect tracks that would sweep the pinned start
        rel = h_pos - starts_xy[:, None, :]
        u = np.stack([np.cos(h_ori), np.sin(h_ori)], axis=-1)
        t_star = np.clip(-np.sum(rel * u, axis=-1), 0.0, None)
        closest = np.linalg.norm(rel + t_star[..., None] * u, axis=-1)
        sweep = closest < need
        away = np.arctan2(rel[..., 1], rel[..., 0]).astype(np.float32)
        h_ori = np.where(sweep, away, h_ori)
        all_centers = np.concatenate([ep_centers, h_pos], axis=1)
        all_radii = np.concatenate(
            [ep_radii, np.full((batch, D), HUMAN_R, np.float32)], axis=1
        )
        orientation = np.concatenate([orientation, h_ori], axis=1)
        lin_v = np.concatenate([lin_v, h_v], axis=1)
    MT = M + n_dynamic
    obstacles = ObstacleSet(
        position=jnp.asarray(all_centers, dtype),
        radius=jnp.asarray(all_radii, dtype),
        orientation=jnp.asarray(orientation, dtype),
        linear_velocity=jnp.asarray(lin_v, dtype),
        angular_velocity=jnp.zeros((batch, MT), dtype),
        active=jnp.ones((batch, MT), dtype),
    )
    env = jax.vmap(
        lambda s, w: env_mod.init_env(cfg, s, w, dtype=dtype)
    )(jnp.asarray(starts, dtype), jnp.asarray(waypoints, dtype))
    info = {
        "extent": extent,
        "leg_reachable": np.asarray(leg_reach),
        "n_circles": int(len(radii)),
    }
    return env, obstacles, info
