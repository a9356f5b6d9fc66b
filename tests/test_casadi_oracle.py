"""CasADi/IPOPT parity twin — the literal north-star referee.

BASELINE.md's parity metric is ``max |u - u_casadi| <= 1e-3`` against the
*repaired* reference formulation (`/root/reference/mpc/optimizer.py:319-400`
with the SURVEY.md section-2.4 fixes).  casadi is not installable in the
build environment (re-verified every round), so the scipy trust-constr
oracle (tests/oracle.py) stands in; this module carries the ready-to-run
casadi twin so the day the package installs, the north-star metric runs
unmodified: ``pytest tests/test_casadi_oracle.py``.

The NLP built here mirrors the reference's *intended* semantics:
  * decision vector z = [vec(X); vec(U)], X in R^{3x(N+1)}, U in R^{2xN}
    (`mpc/optimizer.py:62-77`);
  * goal-tracking quadratic diag(100,100,50) summed over t=1..N (README
    semantics; the committed [:, 1:-1] slice is SURVEY 2.4-10);
  * squared reverse penalty 300*sum(min(v,0)^2) (SURVEY 2.4-2) + 10*sum w^2;
  * initial pin + forward-Euler unicycle defects (`mpc/optimizer.py:163-196`);
  * per-timestep obstacle distance >= r + inflation against the predicted
    track (`obstacle_handling/dynamic_obstacle.py:47-56`, SURVEY 2.4-3/-5);
  * IPOPT options mirroring `mpc/optimizer.py:344-352`.
"""

import numpy as np
import pytest

ca = pytest.importorskip("casadi")

import jax.numpy as jnp  # noqa: E402

from kissmpc_tpu import MPCConfig, default_problem, make_solver  # noqa: E402

PARITY_TOL = 1e-3


def solve_casadi(
    *,
    horizon,
    time_step,
    initial_state,
    goal_state,
    control_lower,
    control_upper,
    state_lower,
    state_upper,
    goal_weights=(100.0, 100.0, 50.0),
    negative_velocity_weight=300.0,
    angular_velocity_weight=10.0,
    obstacle_centers=None,  # [K, N, 2] per-timestep tracks
    obstacle_radii=None,
    inflation_radius=0.0,
    warm_states=None,
    warm_controls=None,
):
    """Repaired reference NLP in casadi; returns (X [N+1,3], U [N,2])."""
    N = horizon
    T = time_step
    X = ca.SX.sym("X", 3, N + 1)
    U = ca.SX.sym("U", 2, N)
    z = ca.vertcat(ca.reshape(X, -1, 1), ca.reshape(U, -1, 1))

    g = np.asarray(goal_state, float)
    W = np.asarray(goal_weights, float)
    cost = 0
    for t in range(1, N + 1):
        e = X[:, t] - g
        cost += W[0] * e[0] ** 2 + W[1] * e[1] ** 2 + W[2] * e[2] ** 2
    for t in range(N):
        cost += negative_velocity_weight * ca.fmin(U[0, t], 0.0) ** 2
        cost += angular_velocity_weight * U[1, t] ** 2

    cons = [X[:, 0] - np.asarray(initial_state, float)]
    for t in range(N):
        f = ca.vertcat(
            X[0, t] + U[0, t] * ca.cos(X[2, t]) * T,
            X[1, t] + U[0, t] * ca.sin(X[2, t]) * T,
            X[2, t] + U[1, t] * T,
        )
        cons.append(X[:, t + 1] - f)
    n_eq = 3 * (N + 1)
    lbg = [0.0] * n_eq
    ubg = [0.0] * n_eq

    if obstacle_centers is not None and len(obstacle_centers):
        for k, track in enumerate(np.asarray(obstacle_centers, float)):
            r = float(np.asarray(obstacle_radii, float)[k])
            for t in range(N):
                d = ca.sqrt(
                    (X[0, t + 1] - track[t, 0]) ** 2
                    + (X[1, t + 1] - track[t, 1]) ** 2
                )
                cons.append(d - r)
                lbg.append(float(inflation_radius))
                ubg.append(np.inf)

    # z layout: ca.reshape is column-major, so vec(X) stacks columns =
    # time-major (x_t, y_t, th_t) triples — exactly the C-order flatten of
    # our [N+1, 3] / [N, 2] bound arrays.
    sl = np.broadcast_to(np.asarray(state_lower, float), (N + 1, 3))
    su = np.broadcast_to(np.asarray(state_upper, float), (N + 1, 3))
    cl = np.broadcast_to(np.asarray(control_lower, float), (N, 2))
    cu = np.broadcast_to(np.asarray(control_upper, float), (N, 2))
    lbx = np.concatenate([sl.reshape(-1), cl.reshape(-1)])
    ubx = np.concatenate([su.reshape(-1), cu.reshape(-1)])

    nlp = {"x": z, "f": cost, "g": ca.vertcat(*cons)}
    solver = ca.nlpsol(
        "solver",
        "ipopt",
        nlp,
        {
            # mirrors `mpc/optimizer.py:344-352`
            "ipopt.max_iter": 2000,
            "ipopt.acceptable_tol": 1e-8,
            "ipopt.acceptable_obj_change_tol": 1e-6,
            "ipopt.print_level": 0,
            "print_time": 0,
        },
    )
    if warm_states is not None:
        x0 = np.concatenate(
            [
                np.asarray(warm_states, float).reshape(-1),
                np.asarray(warm_controls, float).reshape(-1),
            ]
        )
    else:
        x0 = np.zeros(z.shape[0])
    res = solver(x0=x0, lbx=lbx, ubx=ubx, lbg=lbg, ubg=ubg)
    zv = np.asarray(res["x"]).reshape(-1)
    Xv = zv[: 3 * (N + 1)].reshape(N + 1, 3)
    Uv = zv[3 * (N + 1):].reshape(N, 2)
    return Xv, Uv


def _problem_arrays(cfg, problem):
    N = cfg.horizon
    sl = np.broadcast_to(np.asarray(problem.state_lower), (N + 1, 3))
    su = np.broadcast_to(np.asarray(problem.state_upper), (N + 1, 3))
    cl = np.broadcast_to(np.asarray(problem.control_lower), (N, 2))
    cu = np.broadcast_to(np.asarray(problem.control_upper), (N, 2))
    return sl, su, cl, cu


def test_casadi_config1_point_to_goal():
    cfg = MPCConfig(horizon=20, time_step=0.1)
    problem = default_problem(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.5, 0.0]),
        dtype=jnp.float64,
    )
    sol = make_solver(cfg)(problem)
    assert bool(sol.diagnostics.converged)
    sl, su, cl, cu = _problem_arrays(cfg, problem)
    _, U = solve_casadi(
        horizon=cfg.horizon,
        time_step=cfg.time_step,
        initial_state=np.asarray(problem.initial_state),
        goal_state=np.asarray(problem.goal_state),
        control_lower=cl, control_upper=cu,
        state_lower=sl, state_upper=su,
        warm_states=np.asarray(problem.warm_states),
        warm_controls=np.asarray(problem.warm_controls),
    )
    err = float(np.max(np.abs(np.asarray(sol.controls) - U)))
    assert err <= PARITY_TOL, f"max|u - u_casadi| = {err:.2e}"


def test_casadi_config3_static_obstacle():
    from kissmpc_tpu.obstacles import static_set
    from kissmpc_tpu.solver.problem import problem_with_obstacles

    cfg = MPCConfig(horizon=20, time_step=0.1, max_obstacles=1)
    obs = static_set([[0.8, 0.05]], [0.25], max_obstacles=1,
                     dtype=jnp.float64)
    problem = problem_with_obstacles(
        cfg, jnp.array([0.0, 0.0, 0.0]), jnp.array([1.6, 0.1, 0.0]), obs,
        inflation_radius=0.4, dtype=jnp.float64,
    )
    sol = make_solver(cfg)(problem)
    assert bool(sol.diagnostics.converged)
    sl, su, cl, cu = _problem_arrays(cfg, problem)
    _, U = solve_casadi(
        horizon=cfg.horizon,
        time_step=cfg.time_step,
        initial_state=np.asarray(problem.initial_state),
        goal_state=np.asarray(problem.goal_state),
        control_lower=cl, control_upper=cu,
        state_lower=sl, state_upper=su,
        obstacle_centers=np.asarray(problem.obstacle_centers),
        obstacle_radii=np.asarray(problem.obstacle_radii),
        inflation_radius=0.4,
        warm_states=np.asarray(problem.warm_states),
        warm_controls=np.asarray(problem.warm_controls),
    )
    err = float(np.max(np.abs(np.asarray(sol.controls) - U)))
    assert err <= PARITY_TOL, f"max|u - u_casadi| = {err:.2e}"
