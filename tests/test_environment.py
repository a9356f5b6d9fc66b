"""Receding-horizon integration tests (reference L2/L3 semantics).

Episode loops reaching waypoints, warm-start carry-over, obstacle avoidance
in closed loop — the rebuild of the `ROSEnvironment.step` research loop
(`mpc/environment.py:39-80`) exercised end-to-end as jitted scans.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kissmpc_tpu import MPCConfig
from kissmpc_tpu import agent as agent_mod
from kissmpc_tpu import environment as env_mod
from kissmpc_tpu.agent import AgentParams
from kissmpc_tpu.obstacles import dynamic_set, empty, static_set


def _cfg(**kw):
    base = dict(horizon=20, time_step=0.1)
    base.update(kw)
    return MPCConfig(**base)


def test_agent_step_semantics():
    cfg = _cfg()
    params = AgentParams()
    agent = agent_mod.init_agent(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.5, 0.0]),
        dtype=jnp.float64,
    )
    new, diag = agent_mod.step(cfg, params, agent)
    assert bool(diag.converged)
    # commanded velocities latch U[:, 0] (`mpc/agent.py:154-155`)
    np.testing.assert_allclose(
        float(new.linear_velocity), float(new.controls_matrix[0, 0])
    )
    np.testing.assert_allclose(
        float(new.angular_velocity), float(new.controls_matrix[0, 1])
    )
    # `state` is column 1 of the plan (`mpc/agent.py:70-72`)
    np.testing.assert_allclose(
        np.asarray(agent_mod.current_state(new)), np.asarray(new.states_matrix[1])
    )


def test_agent_reset_semantics():
    cfg = _cfg()
    agent = agent_mod.init_agent(
        cfg, jnp.array([0.5, -0.5, 1.0]), jnp.array([1.0, 0.5, 0.0]),
        dtype=jnp.float64,
    )
    agent, _ = agent_mod.step(cfg, AgentParams(), agent)
    r = agent_mod.reset(cfg, agent, matrices_only=True)
    # matrices re-tiled from initial state; velocities preserved
    np.testing.assert_allclose(
        np.asarray(r.states_matrix),
        np.tile(np.asarray(agent.initial_state), (cfg.horizon + 1, 1)),
    )
    np.testing.assert_allclose(np.asarray(r.controls_matrix), 0.0)
    assert float(r.linear_velocity) == float(agent.linear_velocity)

    r2 = agent_mod.reset(cfg, agent, matrices_only=False)
    assert float(r2.linear_velocity) == 0.0


def test_episode_reaches_single_waypoint():
    cfg = _cfg()
    params = AgentParams()
    env = env_mod.init_env(
        cfg, jnp.array([0.0, 0.0, 0.0]),
        waypoints=jnp.array([[1.5, 0.5, 0.0]]), dtype=jnp.float64,
    )
    env, infos = env_mod.run_episode(cfg, params, env, num_steps=40)
    assert bool(env_mod.final_goal_reached(params, env))
    # goal reached within surface distance + goal radius
    pos = np.asarray(agent_mod.position(env.agent))
    assert np.linalg.norm(pos - np.array([1.5, 0.5])) <= 0.5 + params.radius + 1e-6
    # every tick's solve converged
    assert bool(jnp.all(infos.diagnostics.converged))


def test_episode_advances_waypoints_in_order():
    cfg = _cfg()
    params = AgentParams()
    waypoints = jnp.array(
        [[0.8, 0.0, 0.0], [1.6, 0.6, 0.0], [2.4, 0.0, 0.0]]
    )
    env = env_mod.init_env(
        cfg, jnp.array([0.0, 0.0, 0.0]), waypoints, dtype=jnp.float64
    )
    env, infos = env_mod.run_episode(cfg, params, env, num_steps=120)
    idx = np.asarray(infos.waypoint_index)
    assert np.all(np.diff(idx) >= 0), "waypoint index must be monotone"
    assert int(env.waypoint_index) == 2
    assert bool(env_mod.final_goal_reached(params, env))


def test_episode_with_obstacle_no_collision():
    # Obstacle offset from the start-goal line so the detour is locally
    # favorable.  (A *centered* obstacle traps the goal-tracking formulation
    # in the stationary point right in front of it — that is a property of
    # the reference's cost, not of the solver; IPOPT parks there too.)
    cfg = _cfg(max_obstacles=2)
    params = AgentParams(radius=0.15)
    obs = static_set(
        [[1.0, 0.3], [5.0, 5.0]], [0.25, 0.25], max_obstacles=2,
        dtype=jnp.float64,
    )
    env = env_mod.init_env(
        cfg, jnp.array([0.0, 0.0, 0.0]),
        waypoints=jnp.array([[2.2, 0.0, 0.0]]), dtype=jnp.float64,
    )

    stepper = jax.jit(lambda e: env_mod.step(cfg, params, e, obs))
    positions = []
    for _ in range(60):
        env, info = stepper(env)
        positions.append(np.asarray(agent_mod.position(env.agent)))
    positions = np.stack(positions)
    # executed path never penetrates the inflated obstacle (r 0.25 + robot
    # radius 0.15)
    dist = np.linalg.norm(positions - np.array([1.0, 0.3]), axis=1)
    assert np.min(dist) >= 0.25 + params.radius - 1e-3, f"min dist {np.min(dist)}"
    assert bool(env_mod.final_goal_reached(params, env))


def test_episode_jit_scan_compiles_once():
    # The whole episode must be one compiled scan (no per-tick retrace).
    cfg = _cfg()
    params = AgentParams()

    @jax.jit
    def rollout(env):
        return env_mod.run_episode(cfg, params, env, num_steps=30)

    env = env_mod.init_env(
        cfg, jnp.array([0.0, 0.0, 0.0]),
        waypoints=jnp.array([[1.0, 0.3, 0.0]]), dtype=jnp.float64,
    )
    env2, infos = rollout(env)
    assert infos.diagnostics.converged.shape == (30,)
    assert bool(env_mod.final_goal_reached(params, env2))


def test_batched_episodes_vmap():
    # Config-5 pattern: many scenarios' episodes advanced in lockstep.
    cfg = _cfg()
    params = AgentParams()
    starts = jnp.asarray(
        np.concatenate(
            [np.random.default_rng(0).uniform(-0.5, 0.5, (4, 2)), np.zeros((4, 1))],
            axis=1,
        )
    )
    waypoints = jnp.tile(jnp.array([[[1.2, 0.4, 0.0]]]), (4, 1, 1))

    def make_env(s, w):
        return env_mod.init_env(cfg, s, w, dtype=jnp.float64)

    envs = jax.vmap(make_env)(starts, waypoints)

    def ep(env):
        return env_mod.run_episode(cfg, params, env, num_steps=40)

    envs2, infos = jax.jit(jax.vmap(ep))(envs)
    reached = jax.vmap(lambda e: env_mod.final_goal_reached(params, e))(envs2)
    assert bool(jnp.all(reached))


def test_failed_solve_falls_back_to_shifted_plan():
    # Force an unusable solve: start pinned inside an obstacle's inflation
    # margin (genuinely infeasible NLP).  The agent must keep executing the
    # previous (shifted) plan, not apply garbage — the reference applies
    # whatever IPOPT returns (`mpc/agent.py:139-155`, SURVEY.md 5.3).
    from kissmpc_tpu.obstacles import static_set

    cfg = _cfg(max_obstacles=1)
    params = AgentParams(radius=0.2, fallback_feasibility=1e-2)
    agent = agent_mod.init_agent(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([2.0, 0.0, 0.0]),
        dtype=jnp.float64,
    )
    # seed a known-good plan first (no obstacles)
    agent, diag = agent_mod.step(cfg, params, agent)
    assert bool(diag.converged)
    good_states = np.asarray(agent.states_matrix)
    good_controls = np.asarray(agent.controls_matrix)

    # now an obstacle right on top of the current state -> infeasible solve
    obs = static_set([[float(good_states[1, 0]), float(good_states[1, 1])]],
                     [0.3], dtype=jnp.float64)
    agent2, diag2 = agent_mod.step(cfg, params, agent, obs)
    assert float(diag2.kkt_feasibility) > 1e-2
    # fallback: the new plan is the old plan shifted by one step
    np.testing.assert_allclose(
        np.asarray(agent2.states_matrix)[:-1], good_states[1:], atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(agent2.controls_matrix)[:-1], good_controls[1:], atol=1e-9
    )
    np.testing.assert_allclose(
        float(agent2.linear_velocity), good_controls[1, 0], atol=1e-9
    )


def test_episode_with_crossing_human():
    # Config-4 closed loop: a human crosses the robot's path; each tick the
    # environment receives the *current* obstacle state (as perception
    # would publish it) and the solver plans against its predicted track.
    from kissmpc_tpu.obstacles import dynamic_set

    cfg = _cfg(max_obstacles=1)
    params = AgentParams(radius=0.15)
    env = env_mod.init_env(
        cfg, jnp.array([0.0, 0.0, 0.0]),
        waypoints=jnp.array([[2.4, 0.0, 0.0]]), dtype=jnp.float64,
    )

    human_start = np.array([1.4, -1.2])
    human_v = 0.4  # m/s heading +y, crossing the robot's line
    stepper = jax.jit(
        lambda e, o: env_mod.step(cfg, params, e, o)
    )
    min_sep = np.inf
    for tick in range(70):
        t = tick * cfg.time_step
        human_pos = human_start + np.array([0.0, human_v * t])
        obs = dynamic_set(
            [human_pos], orientations=np.pi / 2, linear_velocities=human_v,
            dtype=jnp.float64,
        )
        env, info = stepper(env, obs)
        pos = np.asarray(agent_mod.position(env.agent))
        min_sep = min(min_sep, float(np.linalg.norm(pos - human_pos)))
    # never closer than human radius (0.3) + robot radius (0.15)
    assert min_sep >= 0.3 + params.radius - 1e-2, f"min separation {min_sep}"
    assert bool(env_mod.final_goal_reached(params, env))


def test_waypoint_skip_ahead_and_stall_skip():
    # skip-ahead: reaching a LATER waypoint advances past it even if the
    # current one was never visited; stall-skip: a non-final waypoint not
    # reached within stall_skip_ticks is skipped, the final never is.
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams, init_agent

    cfg = MPCConfig(horizon=6, time_step=0.1)
    params = AgentParams(stall_skip_ticks=3)
    wps = jnp.asarray(
        [[5.0, 5.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]], jnp.float32
    )
    env = env_mod.init_env(cfg, jnp.zeros(3, jnp.float32), wps)

    # robot sits on waypoint 1 (index 1) while current index is 0
    agent = init_agent(cfg, jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    env2, info = env_mod._advance_waypoint(
        params, env, agent, None
    )
    assert int(env2.waypoint_index) == 2  # skipped past wp 0 AND wp 1
    assert not bool(info.final_goal_reached)

    # stall-skip: agent far from everything; after 3 stalled ticks the
    # (non-final) waypoint is skipped
    far = init_agent(cfg, jnp.asarray([9.0, -9.0, 0.0], jnp.float32))
    env_s = env_mod.init_env(cfg, jnp.zeros(3, jnp.float32), wps)
    for t in range(3):
        assert int(env_s.waypoint_index) == 0
        env_s, _ = env_mod._advance_waypoint(params, env_s, far, None)
    assert int(env_s.waypoint_index) == 1
    # keep stalling: advances to the final index but never past it, and
    # final_goal_reached stays False
    for _ in range(10):
        env_s, info = env_mod._advance_waypoint(params, env_s, far, None)
    assert int(env_s.waypoint_index) == 2
    assert not bool(info.final_goal_reached)

    # reaching the final waypoint directly flags final_goal_reached
    at_final = init_agent(cfg, jnp.asarray([2.0, 0.0, 0.0], jnp.float32))
    _, info = env_mod._advance_waypoint(params, env_s, at_final, None)
    assert bool(info.final_goal_reached)
