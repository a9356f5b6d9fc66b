"""Control-sequence parity vs the independent NLP oracle.

North-star metric (BASELINE.md): ``max |u - u_oracle| <= 1e-3`` over the
horizon, per benchmark config.  The oracle (tests/oracle.py) solves the same
repaired NLP with scipy trust-constr — a solver implementation fully
independent of kissmpc_tpu.

Configs covered here:
  1. single point-to-goal unicycle solve, N=20, no obstacles;
  2. goal tracking with full control/state bounds and asymmetric velocity
     penalty, N=50;
(Static/dynamic obstacle configs 3-4 are exercised in test_obstacles.py.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kissmpc_tpu import CostConfig, MPCConfig, default_problem, make_solver

from .oracle import solve_oracle

PARITY_TOL = 1e-3


def _solve_both(cfg: MPCConfig, start, goal, dtype=jnp.float64, **oracle_kw):
    solver = make_solver(cfg)
    problem = default_problem(cfg, jnp.asarray(start), jnp.asarray(goal), dtype=dtype)
    sol = solver(problem)
    assert bool(sol.diagnostics.converged), (
        f"IPM did not converge: stat={float(sol.diagnostics.kkt_stationarity):.2e} "
        f"feas={float(sol.diagnostics.kkt_feasibility):.2e}"
    )
    X, U, res = solve_oracle(
        horizon=cfg.horizon,
        time_step=cfg.time_step,
        initial_state=np.asarray(start),
        goal_state=np.asarray(goal),
        control_lower=np.asarray(problem.control_lower),
        control_upper=np.asarray(problem.control_upper),
        state_lower=np.asarray(problem.state_lower),
        state_upper=np.asarray(problem.state_upper),
        goal_cost_mode=cfg.cost.goal_cost_mode,
        reverse_penalty_mode=cfg.cost.reverse_penalty_mode,
        **oracle_kw,
    )
    assert res.status in (1, 2), f"oracle failed: {res.message}"
    return sol, U


@pytest.mark.parametrize(
    "start,goal",
    [
        ((0.0, 0.0, 0.0), (1.0, 0.5, 0.0)),
        ((0.0, 0.0, 1.57), (0.8, -0.6, 0.5)),
        ((-0.5, 0.3, -2.0), (0.4, 0.9, 1.0)),
    ],
)
def test_config1_point_to_goal_n20(start, goal):
    cfg = MPCConfig(horizon=20, time_step=0.1)
    sol, U_oracle = _solve_both(cfg, start, goal)
    err = np.max(np.abs(np.asarray(sol.controls) - U_oracle))
    assert err <= PARITY_TOL, f"max|u - u_oracle| = {err:.2e}"


def test_config2_bounds_and_asymmetric_penalty_n50():
    # Research config: N=50, dt=0.041 (`mpc/agent.py:99-100`), goal far enough
    # that v rides its upper bound; goal behind tests the reverse penalty.
    cfg = MPCConfig(horizon=50, time_step=0.041)
    sol, U_oracle = _solve_both(cfg, (0.0, 0.0, 0.0), (1.5, 0.2, 0.0))
    err = np.max(np.abs(np.asarray(sol.controls) - U_oracle))
    assert err <= PARITY_TOL, f"max|u - u_oracle| = {err:.2e}"


def test_config2_goal_behind_n50():
    cfg = MPCConfig(horizon=50, time_step=0.041)
    sol, U_oracle = _solve_both(cfg, (0.0, 0.0, 0.0), (-0.8, 0.4, 3.0))
    err = np.max(np.abs(np.asarray(sol.controls) - U_oracle))
    assert err <= PARITY_TOL, f"max|u - u_oracle| = {err:.2e}"


def test_as_written_exclude_terminal_mode():
    # Committed-code goal-cost slice [:, 1:-1] (SURVEY.md 2.4 item 10) with
    # the well-posed squared reverse penalty: parity must hold.
    # With the terminal state excluded, the *final* control influences only
    # x_N which carries no cost, so v_{N-1} is underdetermined on [0, ub]
    # (flat objective) — an artifact of the committed-code slice, present for
    # IPOPT too.  Parity is asserted on the determined prefix.
    cfg = MPCConfig(
        horizon=20,
        time_step=0.1,
        cost=CostConfig(goal_cost_mode="exclude_terminal"),
    )
    sol, U_oracle = _solve_both(cfg, (0.0, 0.0, 0.0), (1.0, -0.3, 0.0))
    err = np.max(np.abs(np.asarray(sol.controls)[:-1] - U_oracle[:-1]))
    assert err <= PARITY_TOL, f"max|u - u_oracle| = {err:.2e}"


def test_as_written_linear_reverse_penalty_nondegenerate():
    # Committed-code linear min(v, 0) penalty (SURVEY.md 2.4 item 2 — it
    # *rewards* reversing).  With the full goal cost and a goal ahead, the
    # goal term dominates and the KKT point is isolated, so parity is
    # well-defined.  (In the fully as-written combination exclude_terminal +
    # linear, the final control's objective is flat for v >= 0 and decreasing
    # for v < 0: multiple KKT points by construction, including a bang-bang
    # family with solver-dependent switch times — no 1e-3 parity can exist
    # there, for IPOPT or anything else.)
    cfg = MPCConfig(
        horizon=20,
        time_step=0.1,
        cost=CostConfig(reverse_penalty_mode="linear"),
    )
    sol, U_oracle = _solve_both(cfg, (0.0, 0.0, 0.0), (1.2, 0.4, 0.0))
    err = np.max(np.abs(np.asarray(sol.controls) - U_oracle))
    assert err <= PARITY_TOL, f"max|u - u_oracle| = {err:.2e}"


@pytest.mark.parametrize(
    "start,goal",
    [
        ((0.0, 0.0, 0.0), (1.5, 0.2, 0.0)),
        ((0.3, -0.4, 1.0), (-0.5, 0.5, -1.0)),
    ],
)
def test_float32_n50_production_config(start, goal):
    # Production dtype + horizon with the DEFAULT solver config (no relaxed
    # tolerances): must report convergence via the dtype-aware KKT floor and
    # match the oracle within the 1e-3 budget (VERDICT r1 item 9a).
    cfg = MPCConfig(horizon=50, time_step=0.041)
    solver = make_solver(cfg)
    problem = default_problem(
        cfg, jnp.asarray(start), jnp.asarray(goal), dtype=jnp.float32
    )
    sol = solver(problem)
    assert bool(sol.diagnostics.converged), (
        f"f32/N=50 default config did not converge: "
        f"stat={float(sol.diagnostics.kkt_stationarity):.2e} "
        f"feas={float(sol.diagnostics.kkt_feasibility):.2e}"
    )
    X, U_oracle, res = solve_oracle(
        horizon=cfg.horizon,
        time_step=cfg.time_step,
        initial_state=np.asarray(start),
        goal_state=np.asarray(goal),
        control_lower=np.asarray(problem.control_lower),
        control_upper=np.asarray(problem.control_upper),
        state_lower=np.asarray(problem.state_lower),
        state_upper=np.asarray(problem.state_upper),
    )
    assert res.status in (1, 2), f"oracle failed: {res.message}"
    err = np.max(np.abs(np.asarray(sol.controls, dtype=np.float64) - U_oracle))
    assert err <= PARITY_TOL, f"f32/N=50 max|u - u_oracle| = {err:.2e}"


def test_float32_parity():
    # f32 (the TPU-native dtype) must stay within the 1e-3 budget too.
    cfg = MPCConfig(horizon=20, time_step=0.1)
    cfg32 = cfg.replace(
        solver=cfg.solver.__class__(mu_min=1e-7, kkt_tol=1e-3)
    )
    solver = make_solver(cfg32)
    problem = default_problem(
        cfg32, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.5, 0.0]),
        dtype=jnp.float32,
    )
    sol = solver(problem)
    X, U_oracle, res = solve_oracle(
        horizon=cfg.horizon,
        time_step=cfg.time_step,
        initial_state=[0.0, 0.0, 0.0],
        goal_state=[1.0, 0.5, 0.0],
        control_lower=np.asarray(problem.control_lower),
        control_upper=np.asarray(problem.control_upper),
        state_lower=np.asarray(problem.state_lower),
        state_upper=np.asarray(problem.state_upper),
    )
    err = np.max(np.abs(np.asarray(sol.controls, dtype=np.float64) - U_oracle))
    assert err <= PARITY_TOL, f"f32 max|u - u_oracle| = {err:.2e}"
