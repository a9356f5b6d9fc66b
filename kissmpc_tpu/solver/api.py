"""Public solve API: jitted single / batched / sharded solvers.

The reference's entry point is `MotionPlanner.solve(...)`
(`mpc/optimizer.py:319-333`) which rebuilds the NLP per call.  Here
`make_solver(cfg)` returns a compiled function closed over the static config;
`make_batch_solver` vmaps it over a leading scenario axis; mesh sharding lives
in `kissmpc_tpu.parallel.fleet`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import MPCConfig
from . import ipm
from .problem import Problem, Solution


def make_solver(cfg: MPCConfig):
    """Compiled single-scenario solver: Problem -> Solution."""

    @jax.jit
    def _solve(problem: Problem) -> Solution:
        return ipm.solve(cfg, problem)

    return _solve


def _dispatch(cfg: MPCConfig, problems: Problem, *,
              iterations: int | None = None,
              mu_sigma=None) -> Solution:
    """Backend dispatch for one batched solve (no refinement, no jit).

    ``iterations`` / ``mu_sigma`` are per-call schedule overrides (refine
    stages): the fused kernel takes them as *runtime* inputs so all stages
    share one compiled binary; the jnp path folds them into the config
    (it retraces cheaply).  ``mu_sigma`` may be a scalar or a per-scenario
    ``[B]`` array — the array form is fused-path-only (the jnp fold stores
    it in a *static* config, which would make the config unhashable and the
    sigma scenario-global; guarded below).
    """
    on_accel = jax.devices()[0].platform != "cpu"
    if cfg.solver.elastic_obstacles and cfg.solver.mehrotra != "off":
        raise ValueError(
            "mehrotra predictor-corrector does not support "
            "elastic_obstacles (the elastic condensation has no affine/"
            "corrector split); disable one of the two flags"
        )
    use_fused = cfg.solver.solve_backend == "fused" and on_accel
    # dtype is static at trace time: the fused kernel is f32-only,
    # f64 batches take the jnp path.
    if use_fused and problems.initial_state.dtype == jnp.float32:
        from ..ops.pallas.ipm_fused import solve_batch_fused

        return solve_batch_fused(
            cfg, problems, iterations=iterations, mu_sigma=mu_sigma
        )
    if iterations is not None or mu_sigma is not None:
        if mu_sigma is not None and getattr(mu_sigma, "ndim", 0):
            raise ValueError(
                "per-scenario mu_sigma arrays are supported by the fused "
                "backend only; the jnp path folds mu_sigma into the static "
                "config (pass a scalar, or use solve_backend='fused')"
            )
        cfg = cfg.replace(
            solver=dataclasses.replace(
                cfg.solver,
                iterations=(
                    cfg.solver.iterations if iterations is None
                    else iterations
                ),
                mu_sigma=(
                    cfg.solver.mu_sigma if mu_sigma is None else mu_sigma
                ),
            )
        )
    return jax.vmap(functools.partial(ipm.solve, cfg))(problems)


def _refine_stages(cfg: MPCConfig):
    """Normalized refinement plan: ((fraction, iterations, mu_sigma), ...).

    ``refine_stages`` wins when set; otherwise the legacy single-stage pair
    ``refine_fraction``/``refine_iterations`` (at the config's own mu_sigma).
    """
    if cfg.solver.refine_stages:
        return tuple(
            (float(f), int(it), float(ms))
            for f, it, ms in cfg.solver.refine_stages
        )
    if cfg.solver.refine_fraction > 0.0:
        return (
            (
                cfg.solver.refine_fraction,
                cfg.solver.refine_iterations,
                cfg.solver.mu_sigma,
            ),
        )
    return ()


def solve_batch(cfg: MPCConfig, problems: Problem) -> Solution:
    """Batched solve with staged second-chance refinement.

    Each refinement stage gathers the worst ``fraction`` of the batch by
    convergence into a dense sub-batch, re-solves it for ``iterations``
    more iterations at the stage's ``mu_sigma`` — warm-started from the
    current iterates, with the restart's dual/slack re-centering acting as
    the perturbation that unsticks merit-stalled scenarios — and scatters
    back wherever the re-solve converged and the running solution had not.
    Scenarios untouched by refinement come back bit-identical.  Stage list
    comes from ``cfg.solver.refine_stages`` (or the legacy
    ``refine_fraction``/``refine_iterations`` pair); see SolverConfig for
    why late stages slow the barrier schedule.

    Trace-time loop only (the plan is static config); call under `jax.jit`
    (or use `make_batch_solver`).
    """
    sol = _dispatch(cfg, problems)
    B = problems.initial_state.shape[0]
    for frac, iters, mu_sigma in _refine_stages(cfg):
        n = min(B, max(1, int(round(B * frac))))
        score = 1.0 - sol.diagnostics.converged.astype(jnp.float32)
        _, idx = jax.lax.top_k(score, n)  # non-converged first
        sub = jax.tree.map(lambda x: x[idx], problems)
        sub = sub._replace(
            warm_states=sol.states[idx], warm_controls=sol.controls[idx]
        )
        sol2 = _dispatch(cfg, sub, iterations=iters, mu_sigma=mu_sigma)
        take = sol2.diagnostics.converged & ~sol.diagnostics.converged[idx]

        def merge(full, new, take=take, idx=idx):
            t = take.reshape(take.shape + (1,) * (new.ndim - 1))
            return full.at[idx].set(jnp.where(t, new, full[idx]))

        sol = jax.tree.map(merge, sol, sol2)
    return sol


def make_batch_solver(cfg: MPCConfig):
    """Compiled batched solver: Problem with leading axis [B] -> Solution [B].

    ``cfg.solver.solve_backend == "fused"`` routes to the single-megakernel
    path on TPU (see SolverConfig for the compile-time tradeoff);
    ``cfg.solver.refine_fraction`` adds the second-chance tail re-solve.
    """
    return jax.jit(functools.partial(solve_batch, cfg))
