"""Sharded fleet solve on the 8-virtual-device CPU mesh.

The distributed analogue of the reference's multi-process ROS graph
(SURVEY.md section 5.8): scenario batch sharded over a mesh, metrics reduced
with collectives.  Exercises the same code path the driver's
``dryrun_multichip`` validates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kissmpc_tpu import MPCConfig, default_problem
from kissmpc_tpu.parallel.fleet import (
    make_fleet_solver,
    make_mesh,
    shard_problems,
)
from kissmpc_tpu.solver.api import make_batch_solver


def _problems(cfg, batch, dtype=jnp.float64, seed=0):
    rng = np.random.default_rng(seed)
    starts = np.concatenate(
        [rng.uniform(-2, 2, (batch, 2)), rng.uniform(-3, 3, (batch, 1))], axis=1
    )
    goals = np.concatenate(
        [rng.uniform(-2, 2, (batch, 2)), rng.uniform(-3, 3, (batch, 1))], axis=1
    )
    return jax.vmap(lambda s, g: default_problem(cfg, s, g, dtype=dtype))(
        jnp.asarray(starts, dtype), jnp.asarray(goals, dtype)
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_fleet_solve_matches_unsharded():
    cfg = MPCConfig(horizon=10, time_step=0.1)
    mesh = make_mesh()
    batch = 16
    problems = _problems(cfg, batch)
    sharded = shard_problems(problems, mesh)

    fleet = make_fleet_solver(cfg, mesh)
    sol_sharded, metrics = fleet(sharded)

    sol_ref = make_batch_solver(cfg)(problems)

    np.testing.assert_allclose(
        np.asarray(sol_sharded.controls), np.asarray(sol_ref.controls), atol=1e-10
    )
    conv_ref = float(jnp.mean(sol_ref.diagnostics.converged.astype(jnp.float32)))
    assert abs(float(metrics.converged_fraction) - conv_ref) < 1e-6
    assert float(metrics.converged_fraction) > 0.9


def test_fleet_solution_stays_sharded():
    cfg = MPCConfig(horizon=8, time_step=0.1)
    mesh = make_mesh()
    problems = shard_problems(_problems(cfg, 8), mesh)
    fleet = make_fleet_solver(cfg, mesh)
    sol, _ = fleet(problems)
    # One shard of the batch per device — no implicit all-gather of solutions.
    sharding = sol.controls.sharding
    assert sharding.num_devices == 8


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    sol = jax.jit(fn)(*args)
    jax.block_until_ready(sol)
    assert sol.controls.shape[0] == 8


def test_pod_mesh_2d_cpu():
    # 8 CPU devices as a (2 hosts x 4 chips) grid exercises the 2-D layout
    # without a pod (process_count == 1 here, so build the grid manually).
    from jax.sharding import Mesh

    from kissmpc_tpu.parallel import multihost

    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, ("host", "chip"))
    sharding = multihost.batch_sharding(mesh)
    x = jax.device_put(jnp.arange(32.0), sharding)
    assert float(jax.jit(jnp.sum)(x)) == 496.0
    assert multihost.health_check(mesh)


def test_fleet_solver_on_2d_mesh():
    from jax.sharding import Mesh, PartitionSpec as P

    cfg = MPCConfig(horizon=8, time_step=0.1)
    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, ("host", "chip"))
    problems = _problems(cfg, 16)
    sharded = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, P(("host", "chip")))
        ),
        problems,
    )
    fleet = make_fleet_solver(cfg, mesh, axis_name=("host", "chip"))
    sol, metrics = fleet(sharded)
    ref = make_batch_solver(cfg)(problems)
    np.testing.assert_allclose(
        np.asarray(sol.controls), np.asarray(ref.controls), atol=1e-10
    )
    assert float(metrics.converged_fraction) > 0.9


def test_nan_scenario_isolation():
    # A poisoned scenario (NaN start) must not corrupt its batch neighbors —
    # scenario independence is the fault-isolation boundary (SURVEY.md 5.3).
    cfg = MPCConfig(horizon=10, time_step=0.1)
    problems = _problems(cfg, 8)
    poisoned = jax.tree.map(lambda x: x, problems)
    poisoned = poisoned._replace(
        initial_state=poisoned.initial_state.at[3, 0].set(jnp.nan)
    )
    sol_clean = make_batch_solver(cfg)(problems)
    sol_poisoned = make_batch_solver(cfg)(poisoned)
    ok = [i for i in range(8) if i != 3]
    np.testing.assert_allclose(
        np.asarray(sol_poisoned.controls)[ok],
        np.asarray(sol_clean.controls)[ok],
        atol=1e-12,
    )
    assert not bool(sol_poisoned.diagnostics.converged[3])
    assert bool(jnp.all(sol_poisoned.diagnostics.converged[jnp.array(ok)]))


def test_fleet_tick_collective_census_constant_in_mesh_size():
    # Weak-scaling structure guard (VERDICT r4 #5): the fleet tick's
    # compiled HLO must contain a collective count that does NOT vary with
    # mesh size — the only collectives are the fixed FleetMetrics
    # reduction set (pmean/pmax lower to all-reduce even on one device).
    # A solver/environment change that adds cross-device traffic inside
    # the solve fails this.  Wall-clock trend lives in
    # scripts/weak_scaling.py + SCALING.md r5.
    import dataclasses
    import re

    import jax

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.parallel.fleet import make_fleet_env_stepper, make_mesh
    from kissmpc_tpu.scenarios import episode_worlds

    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=2)
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, iterations=6))
    params = AgentParams(complete_warm_starts=False)
    pat = re.compile(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)"
    )
    counts = []
    for nd in (1, 2, 8):
        mesh = make_mesh(jax.devices()[:nd])
        env, obs = episode_worlds(cfg, 8 * nd, n_waypoints=2, seed=0,
                                  n_dynamic=1)
        stepper = make_fleet_env_stepper(cfg, params, mesh)
        hlo = stepper.lower(env, obs).compile().as_text()
        counts.append(len(pat.findall(hlo)))
    assert len(set(counts)) == 1, counts
    assert counts[0] <= 16, counts
