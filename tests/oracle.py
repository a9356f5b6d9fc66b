"""Independent NLP oracle for parity testing (stands in for CasADi/IPOPT).

The north-star metric is ``max |u - u_oracle| <= 1e-3`` over the horizon
(BASELINE.md).  The reference's oracle would be the repaired CasADi + IPOPT
formulation (`mpc/optimizer.py`, with the fixes catalogued in SURVEY.md
section 2.4); casadi is not installable in this environment, so the oracle is
the *same repaired NLP* implemented in plain numpy and solved with scipy's
``trust-constr`` — an interior-point-family solver wholly independent of the
kissmpc_tpu solver code.

Formulation (README "Optimization Problem Formulation" + repaired semantics):

    min  sum_{t in S} (s_t - g)' W (s_t - g)
         + W_v^- sum min(0, v_t)^2  + W_w sum w_t^2   [+ W_v^+ sum max(0,v)^2]
    s.t. x_0 = x_init
         x_{t+1} = f(x_t, u_t)       (forward-Euler unicycle)
         bounds on v, w, and state rows
         ||p_t - c_{k,t}|| - r_k >= inflation   (t = 1..N, active obstacles)

Decision vector z = [X.flatten(); U.flatten()] with time-major X: [N+1, 3],
U: [N, 2] (same layout as the package, so comparisons are index-aligned).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import Bounds, NonlinearConstraint, minimize


def _unpack(z, N):
    X = z[: (N + 1) * 3].reshape(N + 1, 3)
    U = z[(N + 1) * 3 :].reshape(N, 2)
    return X, U


def solve_oracle(
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
    positive_velocity_weight=0.0,
    goal_cost_mode="full",
    reverse_penalty_mode="squared",
    obstacle_centers=None,  # [K, N, 2] per-timestep tracks
    obstacle_radii=None,  # [K]
    inflation_radius=0.0,
    warm_states=None,
    warm_controls=None,
    gtol=1e-10,
    xtol=1e-12,
    maxiter=3000,
):
    N = horizon
    T = time_step
    W = np.asarray(goal_weights, dtype=float)
    g = np.asarray(goal_state, dtype=float)
    x0 = np.asarray(initial_state, dtype=float)

    t_idx = np.arange(N + 1)
    if goal_cost_mode == "exclude_terminal":
        goal_mask = ((t_idx >= 1) & (t_idx <= N - 1)).astype(float)
    else:
        goal_mask = (t_idx >= 1).astype(float)

    def objective(z):
        X, U = _unpack(z, N)
        err = X - g
        c = float(np.sum(goal_mask[:, None] * (err**2) * W))
        v, w = U[:, 0], U[:, 1]
        if reverse_penalty_mode == "squared":
            c += negative_velocity_weight * float(np.sum(np.minimum(v, 0.0) ** 2))
        else:
            c += negative_velocity_weight * float(np.sum(np.minimum(v, 0.0)))
        c += positive_velocity_weight * float(np.sum(np.maximum(v, 0.0) ** 2))
        c += angular_velocity_weight * float(np.sum(w**2))
        return c

    def objective_grad(z):
        X, U = _unpack(z, N)
        gX = 2.0 * goal_mask[:, None] * W * (X - g)
        v, w = U[:, 0], U[:, 1]
        if reverse_penalty_mode == "squared":
            dv = 2.0 * negative_velocity_weight * np.minimum(v, 0.0)
        else:
            dv = negative_velocity_weight * (v < 0.0).astype(float)
        dv = dv + 2.0 * positive_velocity_weight * np.maximum(v, 0.0)
        dw = 2.0 * angular_velocity_weight * w
        return np.concatenate([gX.ravel(), np.stack([dv, dw], axis=1).ravel()])

    # --- equality constraints: initial pin + dynamics defects --------------
    def eq_fun(z):
        X, U = _unpack(z, N)
        v, th = U[:, 0], X[:-1, 2]
        pred = np.stack(
            [
                X[:-1, 0] + v * np.cos(th) * T,
                X[:-1, 1] + v * np.sin(th) * T,
                X[:-1, 2] + U[:, 1] * T,
            ],
            axis=1,
        )
        defect = pred - X[1:]
        return np.concatenate([X[0] - x0, defect.ravel()])

    def eq_jac(z):
        X, U = _unpack(z, N)
        nz = z.size
        J = np.zeros((3 + 3 * N, nz))
        J[0:3, 0:3] = np.eye(3)
        v, th = U[:, 0], X[:-1, 2]
        for t in range(N):
            r = 3 + 3 * t
            xi = 3 * t
            ui = (N + 1) * 3 + 2 * t
            A = np.eye(3)
            A[0, 2] = -v[t] * np.sin(th[t]) * T
            A[1, 2] = v[t] * np.cos(th[t]) * T
            B = np.array([[np.cos(th[t]) * T, 0.0], [np.sin(th[t]) * T, 0.0], [0.0, T]])
            J[r : r + 3, xi : xi + 3] = A
            J[r : r + 3, xi + 3 : xi + 6] = -np.eye(3)
            J[r : r + 3, ui : ui + 2] = B
        return J

    def objective_hess(z):
        X, U = _unpack(z, N)
        nz = z.size
        H = np.zeros((nz, nz))
        diag_x = (2.0 * goal_mask[:, None] * np.broadcast_to(W, (N + 1, 3))).ravel()
        v = U[:, 0]
        if reverse_penalty_mode == "squared":
            hv = 2.0 * negative_velocity_weight * (v < 0.0).astype(float)
        else:
            hv = np.zeros_like(v)
        hv = hv + 2.0 * positive_velocity_weight * (v > 0.0).astype(float)
        hw = np.full_like(v, 2.0 * angular_velocity_weight)
        diag_u = np.stack([hv, hw], axis=1).ravel()
        np.fill_diagonal(H, np.concatenate([diag_x, diag_u]))
        return H

    def eq_hess(z, lam):
        # Lagrangian curvature of the dynamics constraints: the only nonlinear
        # terms are v*cos(theta) and v*sin(theta).
        X, U = _unpack(z, N)
        nz = z.size
        H = np.zeros((nz, nz))
        v, th = U[:, 0], X[:-1, 2]
        for t in range(N):
            lx = lam[3 + 3 * t + 0]
            ly = lam[3 + 3 * t + 1]
            i_th = 3 * t + 2
            i_v = (N + 1) * 3 + 2 * t
            d2_thth = lx * (-v[t] * np.cos(th[t]) * T) + ly * (
                -v[t] * np.sin(th[t]) * T
            )
            d2_thv = lx * (-np.sin(th[t]) * T) + ly * (np.cos(th[t]) * T)
            H[i_th, i_th] += d2_thth
            H[i_th, i_v] += d2_thv
            H[i_v, i_th] += d2_thv
        return H

    constraints = [NonlinearConstraint(eq_fun, 0.0, 0.0, jac=eq_jac, hess=eq_hess)]

    # --- obstacle constraints ---------------------------------------------
    if obstacle_centers is not None and len(obstacle_centers) > 0:
        C = np.asarray(obstacle_centers, dtype=float)  # [K, N, 2]
        R = np.asarray(obstacle_radii, dtype=float)  # [K]
        K = C.shape[0]

        def obs_fun(z):
            X, _ = _unpack(z, N)
            p = X[1:, :2]  # [N, 2]
            diff = p[:, None, :] - np.swapaxes(C, 0, 1)  # [N, K, 2]
            dist = np.sqrt(np.sum(diff**2, axis=-1))
            return (dist - R[None, :] - inflation_radius).ravel()

        def obs_jac(z):
            X, _ = _unpack(z, N)
            p = X[1:, :2]
            diff = p[:, None, :] - np.swapaxes(C, 0, 1)
            dist = np.maximum(np.sqrt(np.sum(diff**2, axis=-1)), 1e-12)
            n = diff / dist[..., None]  # [N, K, 2]
            J = np.zeros((N * K, z.size))
            for t in range(N):
                for k in range(K):
                    row = t * K + k
                    xi = 3 * (t + 1)
                    J[row, xi : xi + 2] = n[t, k]
            return J

        def obs_hess(z, lam):
            X, _ = _unpack(z, N)
            p = X[1:, :2]
            diff = p[:, None, :] - np.swapaxes(C, 0, 1)
            dist = np.maximum(np.sqrt(np.sum(diff**2, axis=-1)), 1e-12)
            n = diff / dist[..., None]
            H = np.zeros((z.size, z.size))
            eye2 = np.eye(2)
            for t in range(N):
                xi = 3 * (t + 1)
                for k in range(K):
                    w_lam = lam[t * K + k] / dist[t, k]
                    H[xi : xi + 2, xi : xi + 2] += w_lam * (
                        eye2 - np.outer(n[t, k], n[t, k])
                    )
            return H

        constraints.append(
            NonlinearConstraint(obs_fun, 0.0, np.inf, jac=obs_jac, hess=obs_hess)
        )

    # --- variable bounds ---------------------------------------------------
    sl = np.asarray(state_lower, dtype=float)
    su = np.asarray(state_upper, dtype=float)
    cl = np.asarray(control_lower, dtype=float)
    cu = np.asarray(control_upper, dtype=float)
    lb = np.concatenate([np.tile(sl, N + 1), np.tile(cl, N)])
    ub = np.concatenate([np.tile(su, N + 1), np.tile(cu, N)])
    bounds = Bounds(lb, ub)

    if warm_states is None:
        warm_states = np.tile(x0, (N + 1, 1))
    if warm_controls is None:
        warm_controls = np.zeros((N, 2))
    z0 = np.concatenate(
        [np.asarray(warm_states, float).ravel(), np.asarray(warm_controls, float).ravel()]
    )
    # trust-constr requires a strictly interior start for bounds.
    z0 = np.clip(z0, lb + 1e-9, ub - 1e-9)

    res = minimize(
        objective,
        z0,
        jac=objective_grad,
        hess=objective_hess,
        bounds=bounds,
        constraints=constraints,
        method="trust-constr",
        options={"gtol": gtol, "xtol": xtol, "maxiter": maxiter, "verbose": 0},
    )
    X, U = _unpack(res.x, N)
    return X, U, res
