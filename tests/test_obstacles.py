"""Obstacle model + obstacle-constrained solves (configs 3-4 of BASELINE.md).

Covers: repaired distance semantics, constant-velocity prediction, top-K
sensor filtering, static/dynamic obstacle avoidance with oracle parity, and
per-timestep dynamic tracks (the intended semantics of
`obstacle_handling/dynamic_obstacle.py:47-56`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import (
    MPCConfig,
    default_problem,
    make_solver,
    problem_with_obstacles,
)
from kissmpc_tpu.obstacles import (
    ObstacleSet,
    concatenate,
    distance_to_point,
    dynamic_set,
    predict_tracks,
    select_nearest,
    static_set,
)

from .oracle import solve_oracle

PARITY_TOL = 1e-3


def test_distance_repaired_semantics():
    obs = static_set([[3.0, 4.0]], [1.0], dtype=jnp.float64)
    # |p - c| - r, not |(p - c) - r| (reference bug 2.4-4).
    d = distance_to_point(obs, jnp.array([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(d), [4.0], atol=1e-12)


def test_predict_tracks_constant_velocity():
    # Reference human: v=1.0, heading 90deg, dt=0.1
    # (`obstacle_handling/dynamic_obstacle.py:8-9,21`): moves +y by 0.1/step.
    obs = dynamic_set(
        [[1.0, 2.0]], orientations=np.deg2rad(90.0), linear_velocities=1.0,
        dtype=jnp.float64,
    )
    tracks = predict_tracks(obs, horizon=4, dt=0.1)
    expected = np.array(
        [[[1.0, 2.0], [1.0, 2.1], [1.0, 2.2], [1.0, 2.3]]]
    )
    np.testing.assert_allclose(np.asarray(tracks), expected, atol=1e-12)


def test_predict_tracks_turning():
    obs = dynamic_set(
        [[0.0, 0.0]], orientations=0.0, linear_velocities=1.0,
        angular_velocities=0.5, dtype=jnp.float64,
    )
    tracks = np.asarray(predict_tracks(obs, horizon=3, dt=0.1))
    # manual rollout
    p, th = np.zeros(2), 0.0
    expect = []
    for _ in range(3):
        expect.append(p.copy())
        p = p + np.array([np.cos(th), np.sin(th)]) * 0.1
        th += 0.05
    np.testing.assert_allclose(tracks[0], np.stack(expect), atol=1e-12)


def test_select_nearest_topk_and_radius():
    centers = np.array([[1.0, 0.0], [3.0, 0.0], [10.0, 0.0], [2.0, 0.0]])
    obs = static_set(centers, np.full(4, 0.5), dtype=jnp.float64)
    sel = select_nearest(obs, jnp.array([0.0, 0.0]), sensor_radius=5.0, k=3)
    # nearest three: x = 1, 2, 3; the x=10 one is both beyond k and radius
    pos = np.asarray(sel.position)[np.asarray(sel.active) > 0.5]
    assert sorted(pos[:, 0].tolist()) == [1.0, 2.0, 3.0]


def test_select_nearest_masks_beyond_radius():
    centers = np.array([[1.0, 0.0], [30.0, 0.0]])
    obs = static_set(centers, np.full(2, 0.5), dtype=jnp.float64)
    sel = select_nearest(obs, jnp.array([0.0, 0.0]), sensor_radius=5.0, k=2)
    active = np.asarray(sel.active)
    assert active.sum() == 1.0


def test_config3_static_obstacle_parity():
    # Config 3: static circular obstacle directly on the path to the goal.
    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=2)
    obs = static_set(
        [[0.8, 0.05], [2.5, 2.5]], [0.25, 0.3], max_obstacles=2,
        dtype=jnp.float64,
    )
    inflation = 0.3 + 0.1  # robot radius + 0.1 (`mpc/agent.py:149`)
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.6, 0.1, 0.0]), obs,
        inflation_radius=inflation, dtype=jnp.float64,
    )
    solver = make_solver(cfg)
    sol = solver(problem)
    assert bool(sol.diagnostics.converged)

    # trajectory must clear the obstacle by the inflation margin
    p = np.asarray(sol.states[1:, :2])
    d = np.linalg.norm(p - np.array([0.8, 0.05]), axis=1) - 0.25
    assert np.min(d) >= inflation - 1e-6

    X, U_oracle, res = solve_oracle(
        horizon=cfg.horizon,
        time_step=cfg.time_step,
        initial_state=[0.0, 0.0, 0.0],
        goal_state=[1.6, 0.1, 0.0],
        control_lower=np.asarray(problem.control_lower),
        control_upper=np.asarray(problem.control_upper),
        state_lower=np.asarray(problem.state_lower),
        state_upper=np.asarray(problem.state_upper),
        obstacle_centers=np.asarray(problem.obstacle_centers),
        obstacle_radii=np.asarray(problem.obstacle_radii),
        inflation_radius=inflation,
    )
    assert res.status in (1, 2)
    err = np.max(np.abs(np.asarray(sol.controls) - U_oracle))
    assert err <= PARITY_TOL, f"max|u - u_oracle| = {err:.2e}"


def test_config4_dynamic_obstacle_parity():
    # Config 4: a predicted human track crossing the robot's path.
    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=1)
    obs = dynamic_set(
        [[1.2, -0.6]], orientations=np.deg2rad(90.0), linear_velocities=0.5,
        dtype=jnp.float64,
    )
    inflation = 0.4
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([2.0, 0.0, 0.0]), obs,
        inflation_radius=inflation, prediction_dt=cfg.time_step,
        dtype=jnp.float64,
    )
    solver = make_solver(cfg)
    sol = solver(problem)
    assert bool(sol.diagnostics.converged)

    # Per-timestep clearance vs the *moving* center (intended semantics).
    tracks = np.asarray(problem.obstacle_centers)[0]  # [N, 2]
    p = np.asarray(sol.states[1:, :2])
    d = np.linalg.norm(p - tracks, axis=1) - float(problem.obstacle_radii[0])
    assert np.min(d) >= inflation - 1e-6

    X, U_oracle, res = solve_oracle(
        horizon=cfg.horizon,
        time_step=cfg.time_step,
        initial_state=[0.0, 0.0, 0.0],
        goal_state=[2.0, 0.0, 0.0],
        control_lower=np.asarray(problem.control_lower),
        control_upper=np.asarray(problem.control_upper),
        state_lower=np.asarray(problem.state_lower),
        state_upper=np.asarray(problem.state_upper),
        obstacle_centers=np.asarray(problem.obstacle_centers),
        obstacle_radii=np.asarray(problem.obstacle_radii),
        inflation_radius=inflation,
    )
    assert res.status in (1, 2)
    err = np.max(np.abs(np.asarray(sol.controls) - U_oracle))
    assert err <= PARITY_TOL, f"max|u - u_oracle| = {err:.2e}"


def test_infeasible_warm_start_recovers():
    # Restoration-phase hard case: a warm start driving straight through an
    # obstacle at bound speed.  The geometric repair alone lands on a local
    # minimum of infeasibility (the detour it draws needs ~5x the turn-rate
    # budget; IPOPT's restoration phase fails here too — and so does the
    # scipy trust-constr oracle, status 0).  `complete_warm_start` re-rolls
    # the repaired path through the real dynamics with a collision-gated
    # tracking controller, so the solver starts feasible-by-construction and
    # converges honestly to a nearby local optimum.
    # A warm-start *trajectory* that drives straight through the obstacle
    # (slacks would need log of a negative constraint without the slack
    # reformulation) must still land on a feasible, converged solution.
    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=1)
    obs = static_set([[0.4, 0.0]], [0.2], dtype=jnp.float64)
    inflation = 0.2
    # warm start: straight line through the obstacle center
    warm_controls = np.tile(np.array([0.5, 0.0]), (cfg.horizon, 1))
    warm_states = np.stack(
        [
            np.linspace(0.0, 1.0, cfg.horizon + 1),
            np.zeros(cfg.horizon + 1),
            np.zeros(cfg.horizon + 1),
        ],
        axis=1,
    )
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]), obs,
        inflation_radius=inflation,
        warm_states=jnp.asarray(warm_states),
        warm_controls=jnp.asarray(warm_controls),
        dtype=jnp.float64,
    )
    sol = make_solver(cfg)(problem)
    assert bool(sol.diagnostics.converged)
    p = np.asarray(sol.states[1:, :2])
    d = np.linalg.norm(p - np.array([0.4, 0.0]), axis=1) - 0.2
    assert np.min(d) >= inflation - 1e-6
    assert bool(jnp.all(jnp.isfinite(sol.states)))


def test_complete_warm_start_feasible_by_construction():
    # The completion's contract: whatever (possibly unreachable) path the
    # geometric repair produced, the completed warm start has (a) exactly
    # zero dynamics defects, (b) bound-respecting controls, and (c) no state
    # inside any inflated obstacle disk.
    from kissmpc_tpu import complete_warm_start
    from kissmpc_tpu.models import unicycle

    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=1)
    obs = static_set([[0.4, 0.0]], [0.2], dtype=jnp.float64)
    warm_states = np.stack(
        [
            np.linspace(0.0, 1.0, cfg.horizon + 1),
            np.zeros(cfg.horizon + 1),
            np.zeros(cfg.horizon + 1),
        ],
        axis=1,
    )
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]), obs,
        inflation_radius=0.2,
        warm_states=jnp.asarray(warm_states),
        warm_controls=jnp.tile(jnp.array([0.5, 0.0]), (cfg.horizon, 1)),
        repair_warm_start_states=False,
        complete_warm_start_states=False,  # raw warm start; completed below
        dtype=jnp.float64,
    )
    states, controls = complete_warm_start(
        problem.warm_states, problem.initial_state,
        problem.control_lower, problem.control_upper,
        problem.obstacle_centers, problem.obstacle_radii,
        problem.obstacle_mask, problem.inflation_radius, cfg.time_step,
    )
    d = unicycle.defects(states, controls, cfg.time_step)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)
    u = np.asarray(controls)
    assert np.all(u[:, 0] <= float(problem.control_upper[0]) + 1e-12)
    assert np.all(u[:, 1] >= float(problem.control_lower[1]) - 1e-12)
    assert np.all(u[:, 1] <= float(problem.control_upper[1]) + 1e-12)
    p = np.asarray(states[1:, :2])
    clear = np.linalg.norm(p - np.array([0.4, 0.0]), axis=1) - (0.2 + 0.2)
    assert np.min(clear) >= -1e-9


def test_clean_warm_start_passes_through_unchanged():
    # A warm start that never violates must come out of problem construction
    # bit-identical: the repair + completion pipeline only activates when the
    # repair actually moved a state.
    cfg = MPCConfig(horizon=10, time_step=0.1, max_obstacles=1)
    obs = static_set([[5.0, 5.0]], [0.2], dtype=jnp.float64)
    warm_controls = np.tile(np.array([0.3, 0.1]), (cfg.horizon, 1))
    from kissmpc_tpu.models import unicycle
    warm_states = unicycle.rollout(
        jnp.array([0.0, 0.0, 0.0], jnp.float64),
        jnp.asarray(warm_controls), cfg.time_step,
    )
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]), obs,
        inflation_radius=0.1,
        warm_states=warm_states,
        warm_controls=jnp.asarray(warm_controls),
        dtype=jnp.float64,
    )
    np.testing.assert_array_equal(
        np.asarray(problem.warm_states), np.asarray(warm_states)
    )
    np.testing.assert_array_equal(
        np.asarray(problem.warm_controls), warm_controls
    )


def test_epsilon_repair_keeps_carried_plan():
    # Receding-horizon regression: when an obstacle drifts into the carried
    # plan by epsilon, the repair must nudge only the geometry — replacing
    # the whole near-optimal plan with the tracking rollout destroys the
    # warm start (measured closed-loop converged fraction 0.78 -> 0.94,
    # SCALING.md).  Displacements <= completion_threshold keep the carried
    # controls; the repaired states clear the obstacle.
    cfg = MPCConfig(horizon=10, time_step=0.1, max_obstacles=1)
    warm_controls = np.tile(np.array([0.3, 0.0]), (cfg.horizon, 1))
    from kissmpc_tpu.models import unicycle
    warm_states = unicycle.rollout(
        jnp.array([0.0, 0.0, 0.0], jnp.float64),
        jnp.asarray(warm_controls), cfg.time_step,
    )
    # Obstacle whose inflated disk overlaps the straight plan by ~0.01.
    obs = static_set([[0.15, -0.29]], [0.1], dtype=jnp.float64)
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]), obs,
        inflation_radius=0.2,
        warm_states=warm_states,
        warm_controls=jnp.asarray(warm_controls),
        dtype=jnp.float64,
    )
    moved = np.max(np.abs(np.asarray(problem.warm_states - warm_states)))
    assert 0.0 < moved <= 0.05, moved  # epsilon repair, below the threshold
    np.testing.assert_array_equal(  # carried controls preserved
        np.asarray(problem.warm_controls), warm_controls
    )
    p = np.asarray(problem.warm_states[1:, :2])
    clear = np.linalg.norm(p - np.array([0.15, -0.29]), axis=1) - 0.3
    assert np.min(clear) >= 0.0157  # repaired geometry clears (margin 0.02)


def test_complete_warm_start_no_obstacles():
    # K = 0 (obstacle-free config): the completion must degrade to plain
    # waypoint tracking instead of crashing on zero-size gate reductions.
    from kissmpc_tpu import complete_warm_start
    from kissmpc_tpu.models import unicycle

    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=0)
    goal = jnp.array([1.0, 0.5, 0.0], jnp.float64)
    target = jnp.tile(goal[None], (cfg.horizon + 1, 1))
    states, controls = complete_warm_start(
        target,
        jnp.array([0.0, 0.0, 0.0], jnp.float64),
        jnp.array([-0.2, -0.5], jnp.float64),
        jnp.array([0.5, 0.5], jnp.float64),
        jnp.zeros((0, cfg.horizon, 2), jnp.float64),
        jnp.zeros((0,), jnp.float64),
        jnp.zeros((0,), jnp.float64),
        jnp.asarray(0.0, jnp.float64),
        cfg.time_step,
    )
    d = unicycle.defects(states, controls, cfg.time_step)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)
    u = np.asarray(controls)
    assert np.all(u[:, 0] >= 0.0) and np.all(u[:, 0] <= 0.5 + 1e-12)
    assert np.all(np.abs(u[:, 1]) <= 0.5 + 1e-12)
    # It must actually make progress toward the target.
    d0 = np.linalg.norm(np.asarray(states[0, :2]) - np.asarray(goal[:2]))
    d1 = np.linalg.norm(np.asarray(states[-1, :2]) - np.asarray(goal[:2]))
    assert d1 < d0


def test_infeasible_problem_degrades_gracefully():
    # Start pinned *inside* the inflation margin: the NLP is genuinely
    # infeasible for the first few timesteps (the robot cannot teleport out).
    # The fixed-iteration solver must not NaN and must report not-converged
    # rather than pretending success (the reference applies garbage from a
    # failed IPOPT solve without checking, `mpc/agent.py:139-155` —
    # SURVEY.md section 5.3).
    cfg = MPCConfig(horizon=15, time_step=0.1, max_obstacles=1)
    obs = static_set([[0.0, 0.0]], [0.3], dtype=jnp.float64)
    problem = problem_with_obstacles(
        cfg, jnp.array([0.25, 0.0, 0.0]), jnp.array([1.5, 0.0, 0.0]), obs,
        inflation_radius=0.2, dtype=jnp.float64,
    )
    sol = make_solver(cfg)(problem)
    assert bool(jnp.all(jnp.isfinite(sol.states)))
    assert bool(jnp.all(jnp.isfinite(sol.controls)))
    d = sol.diagnostics
    # feasibility residual must reflect the violation, not hide it
    assert float(d.kkt_feasibility) > 1e-3
    assert not bool(d.converged)


def test_padding_mask_is_inert():
    # A padded (inactive) obstacle sitting right on the path must not deflect.
    cfg0 = MPCConfig(horizon=15, time_step=0.1, max_obstacles=0)
    cfg2 = MPCConfig(horizon=15, time_step=0.1, max_obstacles=2)
    start, goal = jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0])
    sol0 = make_solver(cfg0)(default_problem(cfg0, start, goal, dtype=jnp.float64))
    prob2 = default_problem(
        cfg2, start, goal,
        obstacle_centers=jnp.tile(jnp.array([[0.5, 0.0]]), (2, 1)),
        obstacle_radii=jnp.array([0.3, 0.3]),
        obstacle_mask=jnp.zeros(2),
        inflation_radius=0.2,
        dtype=jnp.float64,
    )
    sol2 = make_solver(cfg2)(prob2)
    np.testing.assert_allclose(
        np.asarray(sol0.controls), np.asarray(sol2.controls), atol=1e-8
    )


def test_completion_honored_without_repair():
    # ADVICE r2: complete_warm_start_states used to be silently ignored when
    # repair_warm_start_states=False; it must act independently, gated on the
    # warm start's own obstacle intrusion.
    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.obstacles import static_set
    from kissmpc_tpu.solver.problem import problem_with_obstacles

    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=1)
    obs = static_set([[0.6, 0.0]], [0.2], max_obstacles=1, dtype=jnp.float32)
    # Straight-through warm start: cuts the inflated disk by construction.
    warm = jnp.stack(
        [
            jnp.linspace(0.0, 1.2, cfg.horizon + 1),
            jnp.zeros(cfg.horizon + 1),
            jnp.zeros(cfg.horizon + 1),
        ],
        axis=1,
    ).astype(jnp.float32)
    kw = dict(
        inflation_radius=0.25,
        warm_states=warm,
        dtype=jnp.float32,
    )
    p = problem_with_obstacles(
        cfg, jnp.zeros(3, jnp.float32),
        jnp.asarray([1.2, 0.0, 0.0], jnp.float32), obs,
        repair_warm_start_states=False, complete_warm_start_states=True, **kw
    )
    moved = float(jnp.max(jnp.abs(p.warm_states - warm)))
    assert moved > 0.05, "completion did not fire without repair"
    # The completed warm start clears the inflated disk.
    d = jnp.linalg.norm(
        p.warm_states[1:, :2] - jnp.asarray([0.6, 0.0]), axis=1
    )
    assert float(jnp.min(d)) >= 0.2 + 0.25 - 1e-3

    # Both off: warm start passes through untouched.
    p0 = problem_with_obstacles(
        cfg, jnp.zeros(3, jnp.float32),
        jnp.asarray([1.2, 0.0, 0.0], jnp.float32), obs,
        repair_warm_start_states=False, complete_warm_start_states=False,
        **kw
    )
    assert float(jnp.max(jnp.abs(p0.warm_states - warm))) == 0.0


def test_mu_sigma_above_cap_is_legal():
    # mu_sigma > mu_sigma_max must construct: refine stages fold their
    # (possibly higher) mu_sigma into the static config on the jnp path
    # (solver/api._dispatch), and the adaptive growth cap is
    # max(mu_sigma_max, mu_sigma) on both backends, so the combination is
    # coherent (sigma pins at mu_sigma) rather than oscillating.
    from kissmpc_tpu.config import SolverConfig

    SolverConfig(mu_sigma=0.2, mu_sigma_max=0.0)
    SolverConfig(mu_sigma=0.2, mu_sigma_max=0.7)
    SolverConfig(mu_sigma=0.9, mu_sigma_max=0.7)


def test_advance_and_clearance():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu.obstacles.obstacles import (
        ObstacleSet, advance, clearance_to_point, predict_tracks,
    )

    obs = ObstacleSet(
        position=jnp.array([[1.0, 0.0], [0.0, 2.0]], jnp.float32),
        radius=jnp.array([0.3, 0.2], jnp.float32),
        orientation=jnp.array([0.0, jnp.pi / 2], jnp.float32),
        linear_velocity=jnp.array([1.0, 0.5], jnp.float32),
        angular_velocity=jnp.array([0.0, 0.1], jnp.float32),
        active=jnp.array([1.0, 0.0], jnp.float32),
    )
    dt = 0.1
    stepped = advance(obs, dt)
    np.testing.assert_allclose(
        np.asarray(stepped.position[0]), [1.1, 0.0], atol=1e-6
    )
    # Inactive slots do not move.
    np.testing.assert_allclose(
        np.asarray(stepped.position[1]), [0.0, 2.0], atol=1e-6
    )
    # advance iterated = predict_tracks columns (same model, same dt).
    track = predict_tracks(obs, 4, dt)  # [K, 4, 2]; col t = pos after t steps
    o = obs
    for t in range(4):
        np.testing.assert_allclose(
            np.asarray(o.position[0]), np.asarray(track[0, t]), atol=1e-5
        )
        o = advance(o, dt)

    # True clearance: |p - c| - r - r_robot, inactive -> +inf ignored.
    clr = clearance_to_point(obs, jnp.array([0.0, 0.0]), robot_radius=0.3)
    np.testing.assert_allclose(float(clr), 1.0 - 0.3 - 0.3, atol=1e-6)
