"""Public solve API: jitted single / batched / sharded solvers.

The reference's entry point is `MotionPlanner.solve(...)`
(`mpc/optimizer.py:319-333`) which rebuilds the NLP per call.  Here
`make_solver(cfg)` returns a compiled function closed over the static config;
`make_batch_solver` vmaps it over a leading scenario axis; mesh sharding lives
in `kissmpc_tpu.parallel.fleet`.
"""

from __future__ import annotations

import functools

import jax

from ..config import MPCConfig
from . import ipm
from .problem import Problem, Solution


def make_solver(cfg: MPCConfig):
    """Compiled single-scenario solver: Problem -> Solution."""

    @jax.jit
    def _solve(problem: Problem) -> Solution:
        return ipm.solve(cfg, problem)

    return _solve


def make_batch_solver(cfg: MPCConfig):
    """Compiled batched solver: Problem with leading axis [B] -> Solution [B].

    ``cfg.solver.solve_backend == "fused"`` routes to the single-megakernel
    path on TPU (see SolverConfig for the compile-time tradeoff).
    """
    import jax.numpy as jnp

    use_fused = (
        cfg.solver.solve_backend == "fused"
        and not cfg.solver.elastic_obstacles
        and jax.devices()[0].platform != "cpu"
    )

    @jax.jit
    def _solve(problems: Problem) -> Solution:
        # dtype is static at trace time: the fused kernel is f32-only,
        # f64 batches take the jnp path.
        if use_fused and problems.initial_state.dtype == jnp.float32:
            from ..ops.pallas.ipm_fused import solve_batch_fused

            return solve_batch_fused(cfg, problems)
        return jax.vmap(functools.partial(ipm.solve, cfg))(problems)

    return _solve
