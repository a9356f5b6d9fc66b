"""Problem / Solution pytrees for the batched MPC solver.

In the reference every per-tick quantity is rebuilt into a fresh CasADi NLP
object (`mpc/optimizer.py:334-354`).  TPU-native, the NLP *structure* is fixed
by `MPCConfig` (static, compiled once) and everything that varies per tick —
start, goal, obstacle tracks, bounds, warm start — is data in a `Problem`
pytree.  Batching is a leading axis on every leaf (`jax.vmap`), pod scale is
`shard_map` over that axis.

Obstacles are padded to a static count K = ``cfg.max_obstacles`` with a mask,
replacing the reference's dynamic python lists (`mpc/optimizer.py:198-221`)
and its sensor-radius filter (`mpc/environment.py:48-65`).  Obstacle centers
are *per-timestep* tracks ``[K, N, 2]`` — the intended semantics in which a
`DynamicObstacle`'s constraint at step t uses its predicted position at step t
(`obstacle_handling/dynamic_obstacle.py:47-56`); a static obstacle is simply a
constant track (`obstacle_handling/obstacle.py:37-45`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MPCConfig


class Problem(NamedTuple):
    """One MPC scenario (or a batch of them with a leading axis)."""

    initial_state: jax.Array  # [3]  (x, y, theta) — P[0:3] of the reference
    goal_state: jax.Array  # [3]  — P[3:6] (`mpc/optimizer.py:70-72,390`)
    control_lower: jax.Array  # [2]  (v_lb, omega_lb)  `mpc/optimizer.py:118-137`
    control_upper: jax.Array  # [2]
    state_lower: jax.Array  # [3]  (+-inf for unbounded rows)  `:111-116`
    state_upper: jax.Array  # [3]
    obstacle_centers: jax.Array  # [K, N, 2] per-timestep tracks (t = 1..N)
    obstacle_radii: jax.Array  # [K]
    obstacle_mask: jax.Array  # [K]  1.0 = real, 0.0 = padding
    inflation_radius: jax.Array  # scalar — robot radius + 0.1 (`mpc/agent.py:149`)
    warm_states: jax.Array  # [N+1, 3] warm start  (`mpc/optimizer.py:376-385`)
    warm_controls: jax.Array  # [N, 2]


class Diagnostics(NamedTuple):
    """Per-scenario solver diagnostics (all shapes scalar per problem)."""

    converged: jax.Array  # bool: final KKT residuals below cfg.solver.kkt_tol
    kkt_stationarity: jax.Array  # inf-norm of Lagrangian gradient wrt (x, u)
    kkt_feasibility: jax.Array  # inf-norm of equality residuals (defects, pin)
    kkt_complementarity: jax.Array  # inf-norm of s * nu
    final_cost: jax.Array  # objective value at the solution
    final_mu: jax.Array  # last barrier parameter


class Solution(NamedTuple):
    states: jax.Array  # [N+1, 3]
    controls: jax.Array  # [N, 2]
    diagnostics: Diagnostics


def repair_warm_start(
    warm_states: jax.Array,
    obstacle_centers: jax.Array,  # [K, N, 2] tracks
    obstacle_radii: jax.Array,  # [K]
    obstacle_mask: jax.Array,  # [K]
    inflation_radius,
    margin: float = 0.02,
    passes: int = 3,
) -> jax.Array:
    """Project warm-start states out of obstacle interiors.

    An interior-point solver started from a trajectory that cuts *through* an
    obstacle faces the restoration-phase problem (IPOPT dedicates a whole
    sub-solver to it).  Receding-horizon warm starts are feasible by
    construction — except when a newly sensed obstacle overlaps the previous
    plan, which is exactly this repair.

    Violating states are pushed *laterally* — perpendicular to the local
    trajectory direction, on the side the state already leans to (left by
    convention when dead-center) — by the exact magnitude that clears the
    inflated surface.  A radial push (the naive choice) is useless precisely
    in the hard case: a trajectory cutting through the obstacle on a symmetry
    axis has its radial normals *along* the motion, so radial projection
    leaves the warm start on the axis and the barrier problem at a symmetric
    saddle the Newton iteration cannot escape (the same degeneracy IPOPT's
    restoration phase breaks via its own perturbations).  The lateral push
    reduces to the radial one for grazing contact (motion tangent there is
    perpendicular to the radial) and turns through-the-middle warm starts
    into go-around ones.  States with no usable tangent (e.g. the reference's
    tiled current-state warm start, `mpc/agent.py:82-90`) fall back to the
    radial push; a few fixed passes handle overlapping obstacles.
    """
    states = warm_states
    needed = (
        obstacle_radii[None, :] + inflation_radius + margin
    )  # [1, K] broadcast over time
    eps = jnp.asarray(1e-9, states.dtype)

    for _ in range(passes):
        p = states[1:, :2]  # [N, 2]
        diff = p[:, None, :] - jnp.swapaxes(obstacle_centers, 0, 1)  # [N,K,2]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # [N, K]
        active = obstacle_mask[None, :] > 0.5
        push = jnp.where(active, jnp.maximum(needed - dist, 0.0), 0.0)  # [N,K]
        # Worst obstacle per state, selected with a one-hot sum instead of
        # take_along_axis: four small gathers per pass lowered to gather
        # HLOs that dominated the fleet tick's construction phase
        # (scripts/profile_fleet_tick.py); the one-hot contraction is pure
        # elementwise + reduce, which XLA fuses.
        k_star = jnp.argmax(push, axis=1)  # worst obstacle per state
        onehot = jax.nn.one_hot(k_star, push.shape[1], dtype=push.dtype)
        push_star = jnp.sum(push * onehot, axis=1)
        diff_star = jnp.sum(diff * onehot[:, :, None], axis=1)
        dist_star = jnp.maximum(jnp.sum(dist * onehot, axis=1), eps)
        needed_star = jnp.sum(
            jnp.broadcast_to(needed, dist.shape) * onehot, axis=1
        )
        n = jnp.where(
            dist_star[:, None] > 1e-6,
            diff_star / dist_star[:, None],
            jnp.array([1.0, 0.0], states.dtype),
        )

        # Local trajectory tangent (central difference; the initial state
        # anchors the first row, the last row uses a backward difference).
        p_prev = jnp.concatenate([states[0:1, :2], p[:-1]], axis=0)
        p_next = jnp.concatenate([p[1:], p[-1:]], axis=0)
        t = p_next - p_prev
        t_norm = jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True))
        have_t = t_norm[:, 0] > 1e-9
        t_hat = t / jnp.maximum(t_norm, eps)
        lateral = jnp.stack([-t_hat[:, 1], t_hat[:, 0]], axis=1)  # rot90(t)
        a_signed = jnp.sum(diff_star * lateral, axis=1)
        # Keep the side the state already leans to; dead-center goes left.
        lateral = jnp.where(a_signed[:, None] < 0, -lateral, lateral)
        a = jnp.abs(a_signed)
        # Exact lateral clearing distance: |p + d*L - c| = needed with
        # dot(p - c, L) = a  =>  d = -a + sqrt(a^2 + needed^2 - dist^2).
        d_lat = -a + jnp.sqrt(
            jnp.maximum(a * a + needed_star**2 - dist_star**2, 0.0)
        )
        direction = jnp.where(have_t[:, None], lateral, n)
        magnitude = jnp.where(have_t, d_lat, push_star)
        magnitude = jnp.where(push_star > 0, magnitude, 0.0)
        p_new = p + direction * magnitude[:, None]
        states = states.at[1:, :2].set(p_new)
    return states


def complete_warm_start(
    warm_states: jax.Array,  # [N+1, 3] target path (positions repaired)
    initial_state: jax.Array,  # [3]
    control_lower: jax.Array,  # [2]
    control_upper: jax.Array,  # [2]
    obstacle_centers: jax.Array,  # [K, N, 2] tracks
    obstacle_radii: jax.Array,  # [K]
    obstacle_mask: jax.Array,  # [K]
    inflation_radius,
    dt,
):
    """Re-roll a (possibly unreachable) repaired path through the real
    dynamics with a collision-gated tracking controller.

    `repair_warm_start` fixes the *geometry* of a warm start but not its
    *reachability*: a detour wide enough to clear an obstacle can require
    several times the velocity/turn-rate budget, and an interior-point
    iteration started there converges to a local minimum of infeasibility —
    pressed between the barrier wall (clearance) and the reachable tube
    (dynamics defects), the same failure IPOPT's restoration phase reports as
    "converged to a point of local infeasibility".

    This completion makes the warm start *feasible by construction*: scan the
    real forward-Euler dynamics, each step steering toward the repaired
    path's next waypoint with bound-clipped (v, omega), scaling speed by the
    heading error, and capping v so the next position cannot enter any
    (inflated) obstacle disk — the cap is the exact positive root of
    |p + v*dt*u - c|^2 = R^2 along the current heading u.  The result has
    zero dynamics defects and nonnegative clearance, so the solver starts
    inside the feasible region and only has to optimize, never to restore.
    When the cap blocks progress toward the waypoint, steering retargets the
    obstacle *tangent* (classic wall-following), so the rollout slides around
    the disk instead of parking against it.  When the target path is itself a
    bound-respecting rollout the controller reproduces it exactly (e = 0,
    v_des = |dq|/dt), so feasible warm starts pass through unchanged.
    """
    dtype = warm_states.dtype
    v_lb = jnp.maximum(control_lower[0], 0.0)  # never reverse while tracking
    v_ub = control_upper[0]
    w_lb, w_ub = control_lower[1], control_upper[1]
    R = jnp.where(
        obstacle_mask > 0.5,
        obstacle_radii + inflation_radius,
        -jnp.inf,
    )  # [K]
    targets = warm_states[1:, :2]  # [N, 2]
    centers = jnp.swapaxes(obstacle_centers, 0, 1)  # [N, K, 2]

    def caps(p, th, c_t):
        # Collision gate along heading th: f(v) = a v^2 + b v + c0 with
        # f >= 0 iff the next position clears obstacle k.
        u = jnp.array([jnp.cos(th), jnp.sin(th)])
        rel = p[None, :] - c_t  # [K, 2]
        a = dt * dt
        b = 2.0 * dt * (rel @ u)  # [K]
        c0 = jnp.sum(rel * rel, axis=1) - R * R  # [K]
        disc = b * b - 4.0 * a * c0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        v1 = (-b - sq) / (2.0 * a)  # entry root
        v2 = (-b + sq) / (2.0 * a)  # exit root
        # From outside (c0 >= 0): f < 0 exactly on (v1, v2), so forward
        # motion is capped at max(v1, 0) whenever that interval reaches
        # forward speeds — max(v1, 0), not a v1 > 0 test, because rounding
        # can put a boundary point's entry root at -epsilon while every
        # positive speed still enters the disk.  From inside (c0 < 0): depth
        # strictly improves for any v > 0 when b > 0 (f is increasing), so
        # escape freely; moving inward (b <= 0), stop.
        cap_out = jnp.where(
            (disc > 0.0) & (v2 > 0.0), jnp.maximum(v1, 0.0), jnp.inf
        )
        cap = jnp.where(c0 < 0.0, jnp.where(b > 0.0, jnp.inf, 0.0), cap_out)
        cap = jnp.where(jnp.isfinite(R), cap, jnp.inf)
        return cap, rel

    def body(state, inputs):
        q, c_t = inputs  # [2], [K, 2]
        p, th = state[:2], state[2]
        to_q = q - p
        dist_q = jnp.sqrt(jnp.sum(to_q * to_q) + 1e-18)
        phi = jnp.where(dist_q > 1e-6, jnp.arctan2(to_q[1], to_q[0]), th)
        e = jnp.arctan2(jnp.sin(phi - th), jnp.cos(phi - th))
        v_des = jnp.clip(dist_q / dt * jnp.maximum(jnp.cos(e), 0.0), v_lb, v_ub)
        if obstacle_radii.shape[0] == 0:
            # Obstacle-free problems (K = 0): no gate, no wall-following —
            # zero-size reductions below have no identity.
            cap_min = jnp.asarray(jnp.inf, dtype)
            phi_eff = phi
        else:
            cap, rel = caps(p, th, c_t)
            cap_min = jnp.min(cap)

            # Wall-following: when the gate blocks the waypoint direction,
            # steer along the blocking obstacle's tangent on the waypoint's
            # side.
            k_blk = jnp.argmin(cap)
            rel_b = rel[k_blk]
            rel_n = jnp.sqrt(jnp.sum(rel_b * rel_b) + 1e-18)
            tang = jnp.array([-rel_b[1], rel_b[0]]) / rel_n
            # Side choice: the waypoint's side; dead-center ties (path
            # straight through the disk) break to the left of the approach
            # direction, matching `repair_warm_start`'s convention.
            left = jnp.array([-to_q[1], to_q[0]])
            score = jnp.dot(tang, to_q) + 1e-6 * jnp.dot(tang, left)
            tang = jnp.where(score < 0.0, -tang, tang)
            blocked = cap_min < v_des
            phi_eff = jnp.where(blocked, jnp.arctan2(tang[1], tang[0]), phi)
        e_eff = jnp.arctan2(jnp.sin(phi_eff - th), jnp.cos(phi_eff - th))
        om = jnp.clip(e_eff / dt, w_lb, w_ub)
        v = jnp.clip(jnp.minimum(v_des, cap_min), v_lb, jnp.minimum(v_ub, cap_min))
        v = jnp.maximum(v, 0.0)
        control = jnp.stack([v, om])
        nxt = jnp.stack(
            [
                p[0] + v * jnp.cos(th) * dt,
                p[1] + v * jnp.sin(th) * dt,
                th + om * dt,
            ]
        )
        return nxt, (nxt, control)

    x0 = initial_state.astype(dtype)
    _, (tail, controls) = jax.lax.scan(body, x0, (targets, centers))
    states = jnp.concatenate([x0[None], tail], axis=0)
    return states, controls


def problem_with_obstacles(
    cfg: MPCConfig,
    initial_state,
    goal_state,
    obstacles,
    *,
    sensor_radius: float = 5.0,
    prediction_dt: float | None = None,
    repair_warm_start_states: bool = True,
    complete_warm_start_states: bool = True,
    completion_threshold: float = 0.05,
    **kwargs,
) -> Problem:
    """Build a Problem from an `ObstacleSet`, applying the sensor filter and
    constant-velocity track prediction.

    Mirrors one tick of the reference's environment -> agent -> planner data
    flow: sensor-radius filtering (`mpc/environment.py:48-65`, radius default
    5 per `mpc/agent.py:101`), per-timestep predicted tracks for dynamic
    obstacles (`obstacle_handling/dynamic_obstacle.py:30-37`), padded to the
    static K = cfg.max_obstacles.

    ``repair_warm_start_states`` projects warm-start states out of obstacle
    interiors (cheap, vectorized); ``complete_warm_start_states`` additionally
    re-rolls moved warm starts through the real dynamics (a horizon-length
    sequential scan), but only when the repair displaced a state by more than
    ``completion_threshold``.  The threshold matters in receding-horizon
    loops: the carried plan is near-optimal, and dynamic-obstacle drift
    clips it by epsilon almost every tick — replacing the whole plan with
    the crude tracking rollout over such a clip *destroys* the warm start
    (measured closed-loop converged fraction 0.78 -> 0.94 at B=4096/K=8 when
    epsilon-repairs keep the carried plan; scripts/bench_fleet_episodes.py).
    Deep intrusions (a newly sensed obstacle overlapping the plan) still get
    the feasibility rollout.  The two switches are independent: completion
    with ``repair_warm_start_states=False`` gates on the warm start's own
    worst inflated-obstacle intrusion instead of the repair displacement.
    """
    from ..obstacles import obstacles as obs_mod

    initial_state = jnp.asarray(initial_state)
    nearest = obs_mod.select_nearest(
        obstacles, initial_state[:2], sensor_radius, cfg.max_obstacles
    )
    dt = obs_mod.PREDICTION_DT if prediction_dt is None else prediction_dt
    tracks = obs_mod.predict_tracks(nearest, cfg.horizon, dt)
    problem = default_problem(
        cfg,
        initial_state,
        goal_state,
        obstacle_centers=tracks,
        obstacle_radii=nearest.radius,
        obstacle_mask=nearest.active,
        **kwargs,
    )
    if cfg.max_obstacles > 0 and (
        repair_warm_start_states or complete_warm_start_states
    ):
        if repair_warm_start_states:
            repaired = repair_warm_start(
                problem.warm_states,
                problem.obstacle_centers,
                problem.obstacle_radii,
                problem.obstacle_mask,
                problem.inflation_radius,
            )
        else:
            repaired = problem.warm_states
        # Unmoved warm starts pass through bit-identical (the repair's push
        # magnitude is exactly zero there); epsilon-moved ones keep the
        # repaired geometry with the carried controls; only substantially
        # moved ones (reachability genuinely in question) get the rollout.
        # Without repair, completion gates on the warm start's own worst
        # (inflated) obstacle intrusion instead of the repair displacement.
        if complete_warm_start_states:
            if repair_warm_start_states:
                moved = jnp.max(jnp.abs(repaired - problem.warm_states))
            else:
                diff = (
                    problem.warm_states[1:, None, :2]
                    - jnp.swapaxes(problem.obstacle_centers, 0, 1)
                )  # [N, K, 2]
                dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
                intrusion = (
                    problem.obstacle_radii[None, :]
                    + problem.inflation_radius
                    - dist
                )
                moved = jnp.max(
                    jnp.where(
                        problem.obstacle_mask[None, :] > 0.5, intrusion, 0.0
                    )
                )
            rolled_states, rolled_controls = complete_warm_start(
                repaired,
                problem.initial_state,
                problem.control_lower,
                problem.control_upper,
                problem.obstacle_centers,
                problem.obstacle_radii,
                problem.obstacle_mask,
                problem.inflation_radius,
                cfg.time_step,
            )
            roll = moved > completion_threshold
            problem = problem._replace(
                warm_states=jnp.where(roll, rolled_states, repaired),
                warm_controls=jnp.where(
                    roll, rolled_controls, problem.warm_controls
                ),
            )
        else:
            problem = problem._replace(warm_states=repaired)
    return problem


def default_problem(
    cfg: MPCConfig,
    initial_state,
    goal_state,
    *,
    control_bounds=((-0.2, 0.5), (-0.5, 0.5)),
    state_bounds=(-20.0, 20.0),
    obstacle_centers=None,
    obstacle_radii=None,
    obstacle_mask=None,
    inflation_radius=0.0,
    warm_states=None,
    warm_controls=None,
    dtype=jnp.float32,
) -> Problem:
    """Build a single (unbatched) Problem with reference-default bounds.

    ``control_bounds`` follows `EgoAgent` defaults v in (-0.2, 0.5),
    omega in (-0.5, 0.5) (`mpc/agent.py:104-105`); ``state_bounds`` the
    (-20, 20) box applied to x (and y iff ``cfg.bound_y``) — the reference
    leaves y, theta unbounded (`mpc/optimizer.py:114-115`).
    """
    N, K = cfg.horizon, cfg.max_obstacles
    initial_state = jnp.asarray(initial_state, dtype)
    goal_state = jnp.asarray(goal_state, dtype)
    (v_lb, v_ub), (w_lb, w_ub) = control_bounds
    lo, hi = state_bounds
    inf = jnp.inf
    state_lower = jnp.array([lo, lo if cfg.bound_y else -inf, -inf], dtype)
    state_upper = jnp.array([hi, hi if cfg.bound_y else inf, inf], dtype)

    if obstacle_centers is None:
        obstacle_centers = jnp.zeros((K, N, 2), dtype)
    else:
        obstacle_centers = jnp.asarray(obstacle_centers, dtype)
        if obstacle_centers.ndim == 2:  # [K, 2] constant centers -> tracks
            obstacle_centers = jnp.broadcast_to(
                obstacle_centers[:, None, :], (K, N, 2)
            )
    if obstacle_radii is None:
        obstacle_radii = jnp.zeros((K,), dtype)
    if obstacle_mask is None:
        obstacle_mask = jnp.ones((K,), dtype) if K else jnp.zeros((K,), dtype)

    if warm_states is None:
        # Reference warm start: current state tiled across the horizon
        # (`mpc/agent.py:59,82-90`).
        warm_states = jnp.tile(initial_state[None], (N + 1, 1))
    if warm_controls is None:
        warm_controls = jnp.zeros((N, 2), dtype)

    return Problem(
        initial_state=initial_state,
        goal_state=goal_state,
        control_lower=jnp.array([v_lb, w_lb], dtype),
        control_upper=jnp.array([v_ub, w_ub], dtype),
        state_lower=state_lower,
        state_upper=state_upper,
        obstacle_centers=obstacle_centers,
        obstacle_radii=jnp.asarray(obstacle_radii, dtype),
        obstacle_mask=jnp.asarray(obstacle_mask, dtype),
        inflation_radius=jnp.asarray(inflation_radius, dtype),
        warm_states=jnp.asarray(warm_states, dtype),
        warm_controls=jnp.asarray(warm_controls, dtype),
    )
