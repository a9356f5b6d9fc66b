"""Waypoint-following episode loop — functional rebuild of `mpc/environment.py`.

The reference `ROSEnvironment` sequences waypoints, filters obstacles by
sensor radius, steps the agent and advances the goal when reached
(`mpc/environment.py:39-80`).  Here the whole loop is a pure transition on an
`EnvState` pytree so a full episode is one `lax.scan` (jit-able, vmappable
across thousands of scenarios — config 5 of BASELINE.md), instead of a Python
while-loop around a per-tick NLP rebuild.

Waypoints are a fixed [W, 3] array with the index clamped at the final row —
the reference's `current_waypoint` returns None past the end
(`mpc/environment.py:23-29`) and `update_goal(None)` falls back to the initial
state (`mpc/agent.py:67-68`); with a clamped index the goal simply stays the
final waypoint, which is the intended behavior of the episode loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import agent as agent_mod
from .agent import AgentParams, AgentState
from .config import MPCConfig
from .obstacles import ObstacleSet, empty
from .solver.problem import Diagnostics


class EnvState(NamedTuple):
    agent: AgentState
    waypoint_index: jax.Array  # int32 scalar
    waypoints: jax.Array  # [W, 3]
    # ticks since the waypoint index last advanced (drives the optional
    # stall-skip policy; see AgentParams.stall_skip_ticks)
    stall_ticks: jax.Array


class StepInfo(NamedTuple):
    diagnostics: Diagnostics
    # bool: reached the current OR any later waypoint this tick (skip-ahead
    # advances past swallowed intermediate hops — a deliberate divergence
    # from the reference's strictly per-waypoint at_goal,
    # `mpc/environment.py:77-80`)
    at_goal: jax.Array
    final_goal_reached: jax.Array  # bool (`mpc/environment.py:31-33`)
    waypoint_index: jax.Array


def init_env(
    cfg: MPCConfig,
    initial_state,
    waypoints,
    dtype=jnp.float32,
) -> EnvState:
    waypoints = jnp.asarray(waypoints, dtype).reshape(-1, 3)
    agent = agent_mod.init_agent(
        cfg, initial_state, goal_state=waypoints[0], dtype=dtype
    )
    return EnvState(
        agent=agent,
        waypoint_index=jnp.zeros((), jnp.int32),
        waypoints=waypoints,
        stall_ticks=jnp.zeros((), jnp.int32),
    )


def current_waypoint(env: EnvState) -> jax.Array:
    idx = jnp.clip(env.waypoint_index, 0, env.waypoints.shape[0] - 1)
    return env.waypoints[idx]


def final_goal_reached(params: AgentParams, env: EnvState) -> jax.Array:
    is_last = env.waypoint_index >= env.waypoints.shape[0] - 1
    return is_last & agent_mod.at_goal(params, env.agent)


def step(
    cfg: MPCConfig,
    params: AgentParams,
    env: EnvState,
    obstacles: Optional[ObstacleSet] = None,
) -> Tuple[EnvState, StepInfo]:
    """One environment tick (`mpc/environment.py:39-80`).

    The sensor-radius filter lives inside the agent's problem construction
    (top-K masked selection replacing the python sort-filter of
    `mpc/environment.py:48-65`).  Waypoint advance: if the agent reached the
    current waypoint and it is not the last, move to the next and re-goal
    (`mpc/environment.py:77-80`).
    """
    if obstacles is None:
        obstacles = empty(cfg.max_obstacles, env.agent.states_matrix.dtype)

    new_agent, diag = agent_mod.step(cfg, params, env.agent, obstacles)
    return _advance_waypoint(params, env, new_agent, diag)


def _advance_waypoint(
    params: AgentParams, env: EnvState, new_agent, diag
) -> Tuple[EnvState, StepInfo]:
    """Post-solve waypoint bookkeeping (`mpc/environment.py:77-80`).

    Two policies beyond the reference's advance-one-on-reach (both matter
    once waypoints are a dense planned chain rather than sparse hops — the
    reference's Nav2 plan is consumed the same way a pure-pursuit follower
    does, not gate-by-gate):

    * **skip-ahead**: reaching ANY not-yet-visited waypoint advances the
      index past the furthest one reached — a robot that cuts a corner of
      its route chain must not be dragged back to an intermediate point
      behind it (measured r4: episodes parked at an inflated boundary
      re-attracted to a bypassed route point read "stuck").
    * **stall-skip** (``params.stall_skip_ticks > 0``): a *non-final*
      waypoint the agent has failed to reach for that many consecutive
      ticks is skipped — the closed-loop analogue of a global replan when
      the local optimizer sits in a pressed-at-boundary minimum.  The
      final waypoint is never skipped, so `final_goal_reached` semantics
      are untouched.
    """
    W = env.waypoints.shape[0]
    pos = agent_mod.position(new_agent)
    d = (
        jnp.linalg.norm(env.waypoints[:, :2] - pos[None], axis=1)
        - params.radius
    )  # surface distance, as agent.at_goal
    idx_row = jnp.arange(W, dtype=jnp.int32)
    hit = (d <= params.goal_radius) & (idx_row >= env.waypoint_index)
    furthest = jnp.max(jnp.where(hit, idx_row, -1))
    reached = furthest >= 0  # reached the current or any later waypoint
    new_index = jnp.where(
        reached,
        jnp.minimum(furthest + 1, W - 1),
        env.waypoint_index,
    )
    # final goal: the last waypoint itself was reached (not merely targeted)
    final_reached = hit[W - 1]
    # stall-skip (never past the final waypoint)
    stall_limit = getattr(params, "stall_skip_ticks", 0)
    advanced = new_index > env.waypoint_index
    stall = jnp.where(advanced, 0, env.stall_ticks + 1)
    if stall_limit:
        skip = (
            (stall >= stall_limit)
            & (new_index < W - 1)
            & ~final_reached
        )
        new_index = new_index + skip.astype(jnp.int32)
        stall = jnp.where(skip, 0, stall)
    new_env = EnvState(
        agent=new_agent._replace(
            goal_state=env.waypoints[jnp.clip(new_index, 0, W - 1)]
        ),
        waypoint_index=new_index,
        waypoints=env.waypoints,
        stall_ticks=stall,
    )
    info = StepInfo(
        diagnostics=diag,
        at_goal=reached,
        final_goal_reached=final_reached,
        waypoint_index=new_index,
    )
    return new_env, info


def fleet_step(
    cfg: MPCConfig,
    params: AgentParams,
    env: EnvState,
    obstacles: Optional[ObstacleSet] = None,
) -> Tuple[EnvState, StepInfo]:
    """One tick for a *batch* of episodes (leading axis B on every leaf).

    Identical semantics to `step` per episode, but the B solves run as one
    batched `solver.api.solve_batch` call — on TPU that is the fused Pallas
    megakernel (+ optional tail refinement) instead of B vmapped jnp solves.
    This is the config-5 production path (BASELINE.md: batched fleet
    planning): problem construction and waypoint bookkeeping vmap around the
    one dense solve.
    """
    from .solver.api import solve_batch

    if obstacles is None:
        B = env.waypoint_index.shape[0]
        obstacles = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape),
            empty(cfg.max_obstacles, env.agent.states_matrix.dtype),
        )
    problems = jax.vmap(
        lambda a, o: agent_mod.build_problem(cfg, params, a, o)
    )(env.agent, obstacles)
    sol = solve_batch(cfg, problems)
    new_agents, diag = jax.vmap(
        lambda a, s: agent_mod.apply_solution(params, a, s)
    )(env.agent, sol)
    return jax.vmap(
        lambda e, a, d: _advance_waypoint(params, e, a, d)
    )(env, new_agents, diag)


def run_episode(
    cfg: MPCConfig,
    params: AgentParams,
    env: EnvState,
    num_steps: int,
    obstacles: Optional[ObstacleSet] = None,
) -> Tuple[EnvState, StepInfo]:
    """Roll a fixed-length episode with `lax.scan` (stacked StepInfo out)."""

    def body(carry, _):
        new_env, info = step(cfg, params, carry, obstacles)
        return new_env, info

    return jax.lax.scan(body, env, None, length=num_steps)
