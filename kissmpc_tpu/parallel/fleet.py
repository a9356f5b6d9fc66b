"""Fleet-scale batched planning over a TPU device mesh.

The reference's only distribution substrate is ROS 2 / DDS pub-sub between OS
processes (`ros2interface.py:45-49`; SURVEY.md section 5.8).  TPU-native, the
compute plane is a `jax.sharding.Mesh` with the scenario batch sharded along a
``data`` axis: `shard_map` runs the vmapped interior-point solver on each
device's shard, and the only cross-device traffic is the metric/convergence
reduction (`psum`/`pmean` over ICI) — scenarios themselves are independent.

Works identically on a real multi-chip slice and on the 8-virtual-device CPU
mesh used in CI (SURVEY.md section 4, point 4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MPCConfig
from ..solver.problem import Problem, Solution


class FleetMetrics(NamedTuple):
    """Replicated (mesh-wide) summary statistics, reduced over ICI."""

    converged_fraction: jax.Array  # scalar in [0, 1]
    max_kkt_stationarity: jax.Array
    max_kkt_feasibility: jax.Array
    mean_cost: jax.Array


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_fleet_solver(cfg: MPCConfig, mesh: Mesh, axis_name: str = "data"):
    """Compiled sharded solver: Problem[B, ...] -> (Solution[B, ...], FleetMetrics).

    The batch axis B must be divisible by the mesh size.  Solution comes back
    sharded along the mesh; metrics are replicated (one `pmean`/`pmax` over
    ICI per call).
    """

    from ..solver.api import solve_batch

    def _local(problems: Problem):
        sol = solve_batch(cfg, problems)
        d = sol.diagnostics
        n_local = d.converged.shape[0]
        metrics = FleetMetrics(
            converged_fraction=jax.lax.pmean(
                jnp.mean(d.converged.astype(jnp.float32)), axis_name
            ),
            max_kkt_stationarity=jax.lax.pmax(
                jnp.max(d.kkt_stationarity), axis_name
            ),
            max_kkt_feasibility=jax.lax.pmax(
                jnp.max(d.kkt_feasibility), axis_name
            ),
            mean_cost=jax.lax.pmean(jnp.mean(d.final_cost), axis_name),
        )
        return sol, metrics

    sharded = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_fleet_env_stepper(cfg: MPCConfig, params, mesh: Mesh,
                           axis_name: str = "data"):
    """Compiled sharded episode tick: (EnvState[B], ObstacleSet[B]) ->
    (EnvState[B], StepInfo[B], FleetMetrics).

    Config 5 of BASELINE.md: thousands of concurrent receding-horizon
    episodes, each tick one fused batched solve per device shard plus the
    ICI metric reduction.  Semantics per episode match `environment.step`.
    """
    from .. import environment as env_mod

    def _local(env, obstacles):
        new_env, info = env_mod.fleet_step(cfg, params, env, obstacles)
        d = info.diagnostics
        metrics = FleetMetrics(
            converged_fraction=jax.lax.pmean(
                jnp.mean(d.converged.astype(jnp.float32)), axis_name
            ),
            max_kkt_stationarity=jax.lax.pmax(
                jnp.max(d.kkt_stationarity), axis_name
            ),
            max_kkt_feasibility=jax.lax.pmax(
                jnp.max(d.kkt_feasibility), axis_name
            ),
            mean_cost=jax.lax.pmean(jnp.mean(d.final_cost), axis_name),
        )
        return new_env, info, metrics

    sharded = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_problems(problems: Problem, mesh: Mesh, axis_name: str = "data") -> Problem:
    """Device-put a batched Problem with its leading axis sharded on the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), problems)
