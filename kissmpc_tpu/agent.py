"""Receding-horizon agent — functional rebuild of `mpc/agent.py`.

The reference `Agent`/`EgoAgent` is a mutable object holding warm-start
matrices, commanded velocities and goal state, whose `step()` mutates all of
them (`mpc/agent.py:130-155`).  TPU-native the agent is a pure state
transition: ``AgentState -> AgentState`` with everything in one pytree, so it
vmaps across fleets and scans across episodes, and the race the reference has
between its odom callback and control timer (SURVEY.md section 5.2) cannot
exist.

Reference semantics preserved:
 * ``state`` is column 1 of the last solution — the robot is assumed to have
   advanced one plan step (`mpc/agent.py:70-72`);
 * after a solve, commanded velocities latch U[:, 0] (`mpc/agent.py:154-155`)
   and the new matrices become the next warm start (`mpc/optimizer.py:376-385`,
   reset-between-ticks is commented out at `mpc/agent.py:136-137`);
 * ``at_goal`` is surface-distance-to-goal <= goal_radius (0.5)
   (`mpc/agent.py:65,78-80`, with the repaired distance of
   `obstacle_handling/geometry.py:46-51` — the numeric twin at `:39-44` is
   bugged, SURVEY.md 2.4 item 4);
 * obstacle inflation radius = robot radius + 0.1 (`mpc/agent.py:149`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import MPCConfig
from .obstacles import ObstacleSet
from .solver import ipm
from .solver.problem import Diagnostics, Problem, problem_with_obstacles


@dataclasses.dataclass(frozen=True)
class AgentParams:
    """Static agent parameters (defaults: `mpc/agent.py:92-106`)."""

    radius: float = 0.3
    sensor_radius: float = 5.0
    goal_radius: float = 0.5
    inflation_margin: float = 0.1  # added to radius (`mpc/agent.py:149`)
    control_bounds: Tuple[Tuple[float, float], Tuple[float, float]] = (
        (-0.2, 0.5),
        (-0.5, 0.5),
    )
    state_bounds: Tuple[float, float] = (-20.0, 20.0)
    # A solve with equality/constraint residual above this is treated as
    # failed and the previous (shifted) plan is kept (SURVEY.md 5.3).
    fallback_feasibility: float = 1e-2
    # Prediction step for dynamic-obstacle tracks.  None reproduces the
    # reference's hardcoded dt = 0.1 (`obstacle_handling/dynamic_obstacle.py:21`)
    # — which the reference applies even when the *plan* step is 0.041, so
    # its predicted humans move 2.4x faster than world time.  Closed-loop
    # benches that advance obstacles in the world should set this to
    # cfg.time_step so track column t matches the world at t plan steps.
    prediction_dt: Optional[float] = None
    # Warm-start conditioning before each solve.  Repair (lateral projection
    # out of obstacle interiors) is vectorized and cheap; completion (re-roll
    # through the real dynamics) is a horizon-length sequential scan that
    # costs ~half a solve inside a batched tick.  Receding-horizon loops warm
    # start from last tick's feasible plan, so completion almost never fires
    # there — the default keeps it for cold starts / adversarial batches,
    # fleet loops that trust their warm starts turn it off for ~1.4x tick
    # throughput (measured: scripts/profile_fleet_tick.py).
    complete_warm_starts: bool = True
    # Waypoint stall-skip (environment policy): a *non-final* waypoint not
    # reached within this many consecutive ticks is skipped (0 disables —
    # reference semantics).  See environment._advance_waypoint.  Caveat:
    # the counter measures failure-to-advance, which cannot distinguish a
    # pressed-at-boundary minimum from a robot legitimately yielding to a
    # crossing dynamic obstacle; pick the limit well above any plausible
    # yield time (a 1 m/s human clears a corridor in ~1-2 s; the fleet
    # bench uses 50 ticks ~ 2 s) and note the final goal is never skipped,
    # so the worst case is an earlier hand-off to the next route point.
    stall_skip_ticks: int = 0

    @property
    def inflation_radius(self) -> float:
        return self.radius + self.inflation_margin


class AgentState(NamedTuple):
    """Everything the reference `Agent` mutates, as one pytree."""

    states_matrix: jax.Array  # [N+1, 3] last solution / warm start
    controls_matrix: jax.Array  # [N, 2]
    linear_velocity: jax.Array  # scalar — commanded v (U[0, 0])
    angular_velocity: jax.Array  # scalar — commanded omega
    goal_state: jax.Array  # [3]
    initial_state: jax.Array  # [3] — odometry-corrected pose


def init_agent(
    cfg: MPCConfig,
    initial_state,
    goal_state=None,
    dtype=jnp.float32,
) -> AgentState:
    """Fresh agent: matrices tiled from the initial state, zero controls
    (`mpc/agent.py:59-60`); goal defaults to the initial state
    (`mpc/agent.py:39-43`)."""
    initial_state = jnp.asarray(initial_state, dtype)
    goal = initial_state if goal_state is None else jnp.asarray(goal_state, dtype)
    return AgentState(
        states_matrix=jnp.tile(initial_state[None], (cfg.horizon + 1, 1)),
        controls_matrix=jnp.zeros((cfg.horizon, 2), dtype),
        linear_velocity=jnp.zeros((), dtype),
        angular_velocity=jnp.zeros((), dtype),
        goal_state=goal,
        initial_state=initial_state,
    )


def current_state(agent: AgentState) -> jax.Array:
    """Reference `Agent.state`: second column of the last solution
    (`mpc/agent.py:70-72`)."""
    return agent.states_matrix[1]


def position(agent: AgentState) -> jax.Array:
    return current_state(agent)[:2]


def at_goal(params: AgentParams, agent: AgentState) -> jax.Array:
    """Surface distance to goal <= goal_radius (`mpc/agent.py:78-80`)."""
    d = jnp.linalg.norm(position(agent) - agent.goal_state[:2]) - params.radius
    return d - params.goal_radius <= 0.0


def update_goal(agent: AgentState, goal) -> AgentState:
    """`mpc/agent.py:67-68`: None-like semantics handled by the caller."""
    return agent._replace(goal_state=jnp.asarray(goal, agent.goal_state.dtype))


def reset(
    cfg: MPCConfig,
    agent: AgentState,
    matrices_only: bool = False,
    to_initial_state: bool = True,
) -> AgentState:
    """`mpc/agent.py:82-90`: re-tile warm-start matrices, zero controls; a
    full reset also zeroes commanded velocities."""
    base = agent.initial_state if to_initial_state else current_state(agent)
    new = agent._replace(
        states_matrix=jnp.tile(base[None], (cfg.horizon + 1, 1)),
        controls_matrix=jnp.zeros_like(agent.controls_matrix),
    )
    if not matrices_only:
        zero = jnp.zeros((), agent.linear_velocity.dtype)
        new = new._replace(linear_velocity=zero, angular_velocity=zero)
    return new


def build_problem(
    cfg: MPCConfig,
    params: AgentParams,
    agent: AgentState,
    obstacles: Optional[ObstacleSet] = None,
    state_override: bool = False,
) -> Problem:
    """Problem construction for one tick: sensor filter, track prediction,
    warm-start repair/completion (`mpc/agent.py:139-152` data flow).

    ``state_override=True`` plans from ``initial_state`` (the odometry pose)
    instead of the advanced plan column — the deployment path the ROS node
    uses (`mpc/agent.py:140`, `ros2interface.py:91-107`).
    """
    start = jnp.where(
        state_override, agent.initial_state, current_state(agent)
    ) if isinstance(state_override, jax.Array) else (
        agent.initial_state if state_override else current_state(agent)
    )
    dtype = agent.states_matrix.dtype
    if obstacles is None:
        from .obstacles import empty

        obstacles = empty(cfg.max_obstacles, dtype)
    return problem_with_obstacles(
        cfg,
        start,
        agent.goal_state,
        obstacles,
        sensor_radius=params.sensor_radius,
        prediction_dt=params.prediction_dt,
        control_bounds=params.control_bounds,
        state_bounds=params.state_bounds,
        inflation_radius=params.inflation_radius,
        warm_states=agent.states_matrix,
        warm_controls=agent.controls_matrix,
        complete_warm_start_states=params.complete_warm_starts,
        dtype=dtype,
    )


def apply_solution(
    params: AgentParams, agent: AgentState, sol
) -> Tuple[AgentState, Diagnostics]:
    """Post-solve agent update with the failure policy (SURVEY.md 5.3).

    The reference applies whatever a failed IPOPT solve returns
    (`mpc/agent.py:139-155`).  Here a solve whose equality/constraint
    residual is unusable falls back to the previous plan *shifted by one
    step* — the robot keeps executing the last good trajectory instead of
    garbage.
    """
    # NaN-safe gate: a diverged solve reports NaN feasibility, and
    # `NaN > thresh` is False — the comparison must be written so NaN
    # lands on the *fallback* side.
    bad = ~(sol.diagnostics.kkt_feasibility <= params.fallback_feasibility)
    shifted_states = jnp.concatenate(
        [agent.states_matrix[1:], agent.states_matrix[-1:]], axis=0
    )
    shifted_controls = jnp.concatenate(
        [agent.controls_matrix[1:], jnp.zeros_like(agent.controls_matrix[-1:])],
        axis=0,
    )
    pick = lambda good, fb: jnp.where(bad, fb, good)
    new = agent._replace(
        states_matrix=pick(sol.states, shifted_states),
        controls_matrix=pick(sol.controls, shifted_controls),
        linear_velocity=pick(sol.controls[0, 0], shifted_controls[0, 0]),
        angular_velocity=pick(sol.controls[0, 1], shifted_controls[0, 1]),
    )
    return new, sol.diagnostics


def step(
    cfg: MPCConfig,
    params: AgentParams,
    agent: AgentState,
    obstacles: Optional[ObstacleSet] = None,
    state_override: bool = False,
) -> Tuple[AgentState, Diagnostics]:
    """One receding-horizon tick (`EgoAgent.step`, `mpc/agent.py:130-155`).

    Single-scenario path (jnp solver).  Fleets should batch the tick through
    `environment.fleet_step`, which routes all solves through the fused
    TPU kernel via `solver.api.solve_batch`.
    """
    problem = build_problem(cfg, params, agent, obstacles, state_override)
    sol = ipm.solve(cfg, problem)
    return apply_solution(params, agent, sol)
