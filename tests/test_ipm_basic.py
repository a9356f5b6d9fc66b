"""IPM solver smoke tests: KKT convergence and qualitative behavior.

Config 1 of BASELINE.md: single point-to-goal unicycle solve, N=20, no
obstacles.  The parity harness against an independent NLP oracle lives in
test_oracle_parity.py; here we assert internal KKT conditions and physics.
"""

import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig, default_problem, make_solver


def _cfg(horizon=20, **kw):
    return MPCConfig(horizon=horizon, time_step=0.1, **kw)


def test_point_to_goal_converges():
    cfg = _cfg()
    solver = make_solver(cfg)
    problem = default_problem(
        cfg,
        initial_state=jnp.array([0.0, 0.0, 0.0]),
        goal_state=jnp.array([1.0, 0.5, 0.0]),
        dtype=jnp.float64,
    )
    sol = solver(problem)
    d = sol.diagnostics
    assert bool(d.converged), (
        f"stat={float(d.kkt_stationarity):.2e} "
        f"feas={float(d.kkt_feasibility):.2e} "
        f"comp={float(d.kkt_complementarity):.2e}"
    )
    # The plan must head toward the goal and respect control bounds.
    assert float(sol.states[-1, 0]) > 0.4
    v = np.asarray(sol.controls[:, 0])
    w = np.asarray(sol.controls[:, 1])
    assert np.all(v <= 0.5 + 1e-6) and np.all(v >= -0.2 - 1e-6)
    assert np.all(np.abs(w) <= 0.5 + 1e-6)


def test_goal_behind_does_not_reverse_much():
    # With the squared reverse penalty (README semantics) the robot should
    # prefer turning over reversing at speed.
    cfg = _cfg()
    solver = make_solver(cfg)
    problem = default_problem(
        cfg,
        initial_state=jnp.array([0.0, 0.0, 0.0]),
        goal_state=jnp.array([-1.0, 0.0, jnp.pi]),
        dtype=jnp.float64,
    )
    sol = solver(problem)
    assert bool(sol.diagnostics.converged)
    v = np.asarray(sol.controls[:, 0])
    assert np.all(v >= -0.2 - 1e-6)


def test_already_at_goal_stays():
    cfg = _cfg()
    solver = make_solver(cfg)
    start = jnp.array([0.3, -0.2, 0.7])
    problem = default_problem(cfg, start, start, dtype=jnp.float64)
    sol = solver(problem)
    assert bool(sol.diagnostics.converged)
    np.testing.assert_allclose(np.asarray(sol.controls), 0.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sol.states), np.tile(np.asarray(start), (cfg.horizon + 1, 1)),
        atol=1e-4,
    )


def test_dynamics_feasible_at_solution():
    cfg = _cfg()
    solver = make_solver(cfg)
    problem = default_problem(
        cfg, jnp.array([0.0, 0.0, 1.2]), jnp.array([0.8, -0.6, 0.0]),
        dtype=jnp.float64,
    )
    sol = solver(problem)
    from kissmpc_tpu.models import unicycle

    d = unicycle.defects(sol.states, sol.controls, cfg.time_step)
    assert float(jnp.max(jnp.abs(d))) < 1e-6
    np.testing.assert_allclose(
        np.asarray(sol.states[0]), np.asarray(problem.initial_state), atol=1e-6
    )


def test_active_velocity_bound():
    # Far goal straight ahead: optimal plan should ride the v <= 0.5 bound.
    cfg = _cfg(horizon=30)
    solver = make_solver(cfg)
    problem = default_problem(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([50.0, 0.0, 0.0]),
        dtype=jnp.float64,
    )
    sol = solver(problem)
    assert bool(sol.diagnostics.converged)
    v = np.asarray(sol.controls[:, 0])
    assert np.all(v <= 0.5 + 1e-7)
    assert np.max(v) > 0.5 - 1e-3


def test_ros_deployment_preset():
    # Deployment config of the reference node: N=7, dt=0.8, bounds +-0.3
    # (`ros2interface.py:28-38`).
    from kissmpc_tpu.config import ROS_DEPLOYMENT

    cfg = ROS_DEPLOYMENT
    solver = make_solver(cfg)
    problem = default_problem(
        cfg, jnp.array([0.0, 0.0, jnp.pi / 2]), jnp.array([0.0, 2.0, jnp.pi / 2]),
        control_bounds=((-0.3, 0.3), (-0.3, 0.3)),
        dtype=jnp.float64,
    )
    sol = solver(problem)
    assert bool(sol.diagnostics.converged)
    v = np.asarray(sol.controls[:, 0])
    assert np.all(np.abs(v) <= 0.3 + 1e-7)
    assert v[0] > 0.1  # drives toward the goal ahead


def test_tiny_horizon():
    cfg = MPCConfig(horizon=1, time_step=0.5)
    sol = make_solver(cfg)(
        default_problem(cfg, jnp.array([0.0, 0.0, 0.0]),
                        jnp.array([0.3, 0.0, 0.0]), dtype=jnp.float64)
    )
    assert bool(sol.diagnostics.converged)
    assert sol.controls.shape == (1, 2)


def test_adaptive_sigma_preserves_easy_convergence():
    # mu_sigma_max > 0 turns on per-scenario adaptive centering (jnp path).
    # On healthy problems sigma must decay back to the configured schedule
    # and the solution must match the fixed-schedule one within tolerance.
    import dataclasses

    cfg = MPCConfig(horizon=30, time_step=0.1)
    cfg_ad = cfg.replace(
        solver=dataclasses.replace(cfg.solver, mu_sigma_max=0.7)
    )
    problem = default_problem(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.5, 0.8, 0.5]),
        dtype=jnp.float64,
    )
    base = make_solver(cfg)(problem)
    adapt = make_solver(cfg_ad)(problem)
    assert bool(base.diagnostics.converged)
    assert bool(adapt.diagnostics.converged)
    err = float(jnp.max(jnp.abs(adapt.controls - base.controls)))
    assert err <= 1e-4, err


def test_mehrotra_pc_matches_baseline_solution():
    # Mehrotra predictor-corrector ("pc") must converge to the same KKT
    # point as the baseline schedule on a standard problem (f64), and the
    # "soc"/"pc" + elastic combination must be refused.
    import dataclasses

    import pytest

    cfg = MPCConfig(horizon=30, time_step=0.1)
    cfg_pc = cfg.replace(
        solver=dataclasses.replace(cfg.solver, mehrotra="pc")
    )
    problem = default_problem(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.5, 0.8, 0.5]),
        dtype=jnp.float64,
    )
    base = make_solver(cfg)(problem)
    pc = make_solver(cfg_pc)(problem)
    assert bool(base.diagnostics.converged)
    assert bool(pc.diagnostics.converged), (
        f"stat={float(pc.diagnostics.kkt_stationarity):.2e} "
        f"feas={float(pc.diagnostics.kkt_feasibility):.2e}"
    )
    err = float(jnp.max(jnp.abs(pc.controls - base.controls)))
    assert err <= 1e-4, err

    cfg_bad = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver, mehrotra="pc", elastic_obstacles=True
        )
    )
    with pytest.raises(ValueError, match="elastic"):
        make_solver(cfg_bad)(problem)


def test_mehrotra_pc_obstacle_family_corrector():
    # The _Corr terms feed the obstacle family too; pin pc-vs-baseline
    # agreement on a constrained problem (f64, active obstacle).
    import dataclasses

    from kissmpc_tpu import problem_with_obstacles
    from kissmpc_tpu.obstacles import static_set

    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=2)
    cfg_pc = cfg.replace(
        solver=dataclasses.replace(cfg.solver, mehrotra="pc")
    )
    obs = static_set(
        [[0.8, 0.05], [2.5, 2.5]], [0.25, 0.3], max_obstacles=2,
        dtype=jnp.float64,
    )
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.6, 0.1, 0.0]), obs,
        inflation_radius=0.4, dtype=jnp.float64,
    )
    base = make_solver(cfg)(problem)
    pc = make_solver(cfg_pc)(problem)
    assert bool(base.diagnostics.converged)
    assert bool(pc.diagnostics.converged)
    err = float(jnp.max(jnp.abs(pc.controls - base.controls)))
    assert err <= 1e-4, err
    # both clear the active obstacle by the margin
    p = np.asarray(pc.states[1:, :2])
    d = np.linalg.norm(p - np.array([0.8, 0.05]), axis=1) - 0.25
    assert float(d.min()) >= 0.4 - 1e-6
