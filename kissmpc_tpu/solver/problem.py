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
    plan, which is exactly this repair: push each violating state along the
    obstacle normal to the inflated surface.  A few fixed passes handle
    overlapping obstacles; states exactly at a center get an arbitrary fixed
    direction.
    """
    states = warm_states
    needed = (
        obstacle_radii[None, :] + inflation_radius + margin
    )  # [1, K] broadcast over time

    for _ in range(passes):
        p = states[1:, :2]  # [N, 2]
        diff = p[:, None, :] - jnp.swapaxes(obstacle_centers, 0, 1)  # [N,K,2]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # [N, K]
        active = obstacle_mask[None, :] > 0.5
        push = jnp.where(active, jnp.maximum(needed - dist, 0.0), 0.0)  # [N,K]
        k_star = jnp.argmax(push, axis=1)  # worst obstacle per state
        push_star = jnp.take_along_axis(push, k_star[:, None], axis=1)[:, 0]
        diff_star = jnp.take_along_axis(
            diff, k_star[:, None, None], axis=1
        )[:, 0, :]
        dist_star = jnp.maximum(
            jnp.take_along_axis(dist, k_star[:, None], axis=1)[:, 0], 1e-9
        )
        n = jnp.where(
            dist_star[:, None] > 1e-6,
            diff_star / dist_star[:, None],
            jnp.array([1.0, 0.0], states.dtype),
        )
        p_new = p + n * push_star[:, None]
        states = states.at[1:, :2].set(p_new)
    return states


def problem_with_obstacles(
    cfg: MPCConfig,
    initial_state,
    goal_state,
    obstacles,
    *,
    sensor_radius: float = 5.0,
    prediction_dt: float | None = None,
    repair_warm_start_states: bool = True,
    **kwargs,
) -> Problem:
    """Build a Problem from an `ObstacleSet`, applying the sensor filter and
    constant-velocity track prediction.

    Mirrors one tick of the reference's environment -> agent -> planner data
    flow: sensor-radius filtering (`mpc/environment.py:48-65`, radius default
    5 per `mpc/agent.py:101`), per-timestep predicted tracks for dynamic
    obstacles (`obstacle_handling/dynamic_obstacle.py:30-37`), padded to the
    static K = cfg.max_obstacles.
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
    if repair_warm_start_states and cfg.max_obstacles > 0:
        problem = problem._replace(
            warm_states=repair_warm_start(
                problem.warm_states,
                problem.obstacle_centers,
                problem.obstacle_radii,
                problem.obstacle_mask,
                problem.inflation_radius,
            )
        )
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
