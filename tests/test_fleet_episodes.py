"""Batched fleet episodes: `environment.fleet_step` and its sharded wrapper.

fleet_step must be semantically identical to vmapping the single-scenario
`environment.step` (same problem construction, solve, fallback and waypoint
logic — only the solve batching differs), and the shard_map wrapper must
match the unsharded call on the CI CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig
from kissmpc_tpu import environment as env_mod
from kissmpc_tpu.agent import AgentParams
from kissmpc_tpu.parallel.fleet import (
    make_fleet_env_stepper,
    make_mesh,
    shard_problems,
)
from kissmpc_tpu.scenarios import episode_worlds

CFG = MPCConfig(horizon=16, time_step=0.1, max_obstacles=4)
PARAMS = AgentParams()


def test_fleet_step_matches_vmapped_step():
    env, obstacles = episode_worlds(CFG, 8, seed=0, n_dynamic=1)
    e1, info1 = jax.jit(
        lambda e, o: env_mod.fleet_step(CFG, PARAMS, e, o)
    )(env, obstacles)
    e2, info2 = jax.jit(
        jax.vmap(lambda e, o: env_mod.step(CFG, PARAMS, e, o))
    )(env, obstacles)
    for a, b in zip(jax.tree.leaves(e1), jax.tree.leaves(e2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(info1.waypoint_index), np.asarray(info2.waypoint_index)
    )


def test_fleet_step_default_obstacles():
    cfg = MPCConfig(horizon=12, time_step=0.1)
    env, _ = episode_worlds(cfg, 4, seed=1)
    e1, info = jax.jit(lambda e: env_mod.fleet_step(cfg, PARAMS, e))(env)
    assert bool(jnp.all(info.diagnostics.converged))


def test_sharded_episode_stepper_matches_unsharded():
    mesh = make_mesh()
    B = 2 * mesh.size
    env, obstacles = episode_worlds(CFG, B, seed=2, n_dynamic=1)
    env_s = shard_problems(env, mesh)
    obs_s = shard_problems(obstacles, mesh)
    stepper = make_fleet_env_stepper(CFG, PARAMS, mesh)
    e_sh, info_sh, metrics = stepper(env_s, obs_s)
    e_un, info_un = jax.jit(
        lambda e, o: env_mod.fleet_step(CFG, PARAMS, e, o)
    )(env, obstacles)
    for a, b in zip(jax.tree.leaves(e_sh), jax.tree.leaves(e_un)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    conv = float(jnp.mean(info_un.diagnostics.converged.astype(jnp.float32)))
    np.testing.assert_allclose(
        float(metrics.converged_fraction), conv, atol=1e-6
    )


def test_episodes_make_progress_and_stay_clear():
    env, obstacles = episode_worlds(CFG, 8, seed=3, n_dynamic=1)
    stepper = jax.jit(lambda e, o: env_mod.fleet_step(CFG, PARAMS, e, o))
    start_pos = np.asarray(env.agent.initial_state)[:, :2]
    for _ in range(25):
        env, info = stepper(env, obstacles)
        # clearance at the executed state (plan column 1) vs current obstacle
        # positions: fleet episodes must not drive through obstacles
        pos = np.asarray(env.agent.states_matrix)[:, 1, :2]
        c = np.asarray(obstacles.position)
        d = (
            np.linalg.norm(pos[:, None, :] - c, axis=-1)
            - np.asarray(obstacles.radius)
        )
        d = np.where(np.asarray(obstacles.active) > 0.5, d, np.inf)
        assert d.min() > 0.0, f"collision in fleet episode: {d.min()}"
    # at least some episodes advanced their waypoint chain
    assert int(np.asarray(env.waypoint_index).sum()) > 0
