"""Primal-dual interior-point SQP solver for the unicycle MPC NLP.

This module replaces the reference's CasADi + IPOPT pipeline
(`mpc/optimizer.py:319-400`): where the reference rebuilds a symbolic NLP and
instantiates `ca.nlpsol("solver", "ipopt", ...)` on *every tick*
(`mpc/optimizer.py:354`), this is a single jitted, fixed-shape,
fixed-iteration function — compile once, call for thousands of batched
scenarios.

Algorithm (same family as IPOPT, so the two converge to the same KKT points):

* slack reformulation of every inequality c(z) >= 0 as c(z) - s = 0, s > 0 —
  warm starts violating obstacle constraints are therefore safe;
* log-barrier on the slacks with a geometric mu schedule;
* one primal-dual Newton step per iteration: all inequality families are
  stage-local (control/state boxes, circular-obstacle distances), so their
  condensed contributions  J' diag(nu/s) J  and
  J' (mu/s - sigma (c - s))  fold into the *stage* Hessians/gradients, and the
  resulting equality-constrained QP (linearized dynamics with defects) is
  solved exactly by the block-tridiagonal Riccati sweep in `ops/lqr.py`;
* fraction-to-boundary rule on slacks and duals, then a parallel backtracking
  line search on an l1 merit function — all candidate step sizes are evaluated
  simultaneously (vmap), a TPU-friendly alternative to sequential backtracking;
* fixed iteration count, masked convergence reporting: no data-dependent
  control flow anywhere, so the whole solve is one XLA computation.

Constraint inventory (shapes; N = horizon, K = max obstacles):
  control lower/upper   [N, 2]    `mpc/optimizer.py:118-137`
  state lower/upper     [N+1, 3]  `mpc/optimizer.py:111-116` (+-inf rows masked)
  obstacle distance     [N, K]    `mpc/optimizer.py:198-258`, intended
                                  per-timestep semantics of
                                  `obstacle_handling/dynamic_obstacle.py:47-56`
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import functools

from ..config import MPCConfig
from ..models import costs, unicycle
from ..ops.lqr import LQRData, LQRSolution, solve_lqr
from .problem import Diagnostics, Problem, Solution


@functools.lru_cache(maxsize=None)
def _lqr_engine(reg: float, backend: str):
    """Newton-KKT engine with batched-dispatch to the Pallas kernel.

    Unbatched calls run the XLA Riccati scan; under `jax.vmap` the
    custom-vmap rule reroutes the whole batch to the scenario-major Pallas
    kernel (`ops/pallas/riccati.py`) when the backend allows it.
    """
    if backend == "xla":
        return lambda data: solve_lqr(data, reg)
    if backend == "auto":
        platform = jax.devices()[0].platform
        if platform == "cpu":
            return lambda data: solve_lqr(data, reg)

    from ..ops.pallas.riccati import solve_lqr_pallas

    @jax.custom_batching.custom_vmap
    def engine(data: LQRData) -> LQRSolution:
        return solve_lqr(data, reg)

    @engine.def_vmap
    def _rule(axis_size, in_batched, data):
        del axis_size, in_batched
        sol = solve_lqr_pallas(data, reg=reg)
        return sol, LQRSolution(dx=True, du=True, K=True, k=True)

    return engine

def _sigma_max(dtype) -> float:
    """Dual/slack ratio safeguard (IPOPT's kappa_Sigma analogue).

    Must sit far above the largest legitimate central-path sigma = nu^2 / mu
    (nu ~ 1e2, mu ~ 1e-9 gives ~1e13 in f64): clipping a *legitimate* sigma
    corrupts the Newton system at active constraints and stalls convergence.
    """
    return 1e18 if dtype == jnp.float64 else 1e12


class IPMState(NamedTuple):
    states: jax.Array  # [N+1, 3]
    controls: jax.Array  # [N, 2]
    # slacks / duals per inequality family (masked entries pinned to 1 / 0)
    s_cl: jax.Array  # [N, 2]
    s_cu: jax.Array
    s_xl: jax.Array  # [N+1, 3]
    s_xu: jax.Array
    s_ob: jax.Array  # [N, K]
    nu_cl: jax.Array
    nu_cu: jax.Array
    nu_xl: jax.Array
    nu_xu: jax.Array
    nu_ob: jax.Array
    # Elastic variables for obstacle constraints (c + e - s = 0, e >= 0,
    # linear penalty) — active only with SolverConfig.elastic_obstacles;
    # otherwise carried as ones and ignored.
    e_ob: jax.Array  # [N, K]
    # Adaptive Levenberg regularization (trust-region surrogate): grown when
    # the merit line search rejects the Newton step (linearization overshoot,
    # e.g. warm starts deep inside an obstacle), decayed on success so the
    # superlinear Newton tail is untouched.
    reg: jax.Array
    # Adaptive centering parameter (mu = sigma * mean complementarity).
    # Initialized at SolverConfig.mu_sigma; with mu_sigma_max > 0 it grows
    # toward that cap whenever the accepted step is throttled (the stall
    # signature: the barrier schedule outran the central path) and decays
    # back on healthy steps, so hard scenarios get the slow schedule the
    # staged-refinement data shows they need without slowing easy ones.
    sigma: jax.Array


class _Masks(NamedTuple):
    cl: jax.Array  # [N, 2]
    cu: jax.Array
    xl: jax.Array  # [N+1, 3]
    xu: jax.Array
    ob: jax.Array  # [N, K]


def _constraint_masks(cfg: MPCConfig, problem: Problem, dtype) -> _Masks:
    N, K = cfg.horizon, cfg.max_obstacles
    cl = jnp.broadcast_to(jnp.isfinite(problem.control_lower), (N, 2))
    cu = jnp.broadcast_to(jnp.isfinite(problem.control_upper), (N, 2))
    xl = jnp.broadcast_to(jnp.isfinite(problem.state_lower), (N + 1, 3))
    xu = jnp.broadcast_to(jnp.isfinite(problem.state_upper), (N + 1, 3))
    ob = jnp.broadcast_to(problem.obstacle_mask > 0.5, (N, K))
    to = lambda m: m.astype(dtype)
    return _Masks(to(cl), to(cu), to(xl), to(xu), to(ob))


def _finite(bound, fill):
    """Replace +-inf bound entries (masked anyway) by a harmless finite fill."""
    return jnp.where(jnp.isfinite(bound), bound, fill)


def _constraint_values(cfg: MPCConfig, problem: Problem, states, controls):
    """Values of every inequality family, c(z) (>= 0 when feasible).

    Masked entries are forced to 1.0 so logs/divisions stay well-defined.
    """
    m = _constraint_masks(cfg, problem, states.dtype)
    c_cl = controls - _finite(problem.control_lower, 0.0)
    c_cu = _finite(problem.control_upper, 0.0) - controls
    c_xl = states - _finite(problem.state_lower, 0.0)
    c_xu = _finite(problem.state_upper, 0.0) - states
    # Obstacles: constraint applies to states 1..N (`mpc/optimizer.py:211`),
    # against the obstacle's track position at the same timestep.
    p = states[1:, :2]  # [N, 2]
    diff = p[:, None, :] - jnp.swapaxes(problem.obstacle_centers, 0, 1)  # [N,K,2]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-16)  # [N, K]
    c_ob = dist - problem.obstacle_radii[None, :] - problem.inflation_radius
    one = jnp.ones((), states.dtype)
    vals = (
        jnp.where(m.cl > 0, c_cl, one),
        jnp.where(m.cu > 0, c_cu, one),
        jnp.where(m.xl > 0, c_xl, one),
        jnp.where(m.xu > 0, c_xu, one),
        jnp.where(m.ob > 0, c_ob, one),
    )
    # Jacobian direction of the distance constraint.  The floor on the
    # distance matters: a trajectory point sitting (near-)exactly on an
    # obstacle center has an ill-defined normal, and an unfloored 1/dist
    # there poisons the condensed Hessian with huge garbage-direction terms
    # that freeze the Newton step.  Within the floor the (sub-unit) normal
    # simply softens the constraint gradient.
    dist_safe = jnp.maximum(dist, 1e-2)
    normals = diff / dist_safe[..., None]  # [N, K, 2] robot->away-from-center
    return vals, normals, dist_safe, m


def _init_state(cfg: MPCConfig, problem: Problem) -> IPMState:
    states = problem.warm_states
    controls = problem.warm_controls
    (c_cl, c_cu, c_xl, c_xu, c_ob), _, _, m = _constraint_values(
        cfg, problem, states, controls
    )
    mu0 = jnp.asarray(cfg.solver.mu_init, states.dtype)
    s_floor = 1e-2

    def init_pair(c, mask):
        s = jnp.where(mask > 0, jnp.maximum(c, s_floor), 1.0)
        nu = jnp.where(mask > 0, mu0 / s, 0.0)
        return s, nu

    s_cl, nu_cl = init_pair(c_cl, m.cl)
    s_cu, nu_cu = init_pair(c_cu, m.cu)
    s_xl, nu_xl = init_pair(c_xl, m.xl)
    s_xu, nu_xu = init_pair(c_xu, m.xu)
    s_ob, nu_ob = init_pair(c_ob, m.ob)
    if cfg.solver.elastic_obstacles:
        # central-ish elastic init: e solves c + e = s when violated, else
        # sits at its barrier-central value mu/rho_e.
        e_ob = jnp.where(
            m.ob > 0,
            jnp.maximum(s_ob - c_ob, mu0 / cfg.solver.elastic_penalty),
            1.0,
        )
    else:
        e_ob = jnp.ones_like(s_ob)
    return IPMState(
        states, controls,
        s_cl, s_cu, s_xl, s_xu, s_ob,
        nu_cl, nu_cu, nu_xl, nu_xu, nu_ob,
        e_ob,
        reg=jnp.asarray(cfg.solver.reg, states.dtype),
        sigma=jnp.asarray(cfg.solver.mu_sigma, states.dtype),
    )


def _sigma(nu, s, mask):
    floor = 1e-14 if s.dtype == jnp.float64 else 1e-10
    return jnp.clip(
        mask * nu / jnp.maximum(s, floor), 0.0, _sigma_max(s.dtype)
    )


def _grad_coef(c, s, nu, mask, mu, corr=None):
    """Condensed gradient coefficient g_i = (mu - corr_i)/s - sigma*(c - s).

    The Newton step contribution along the constraint normal a_i is -a_i g_i
    on the right-hand side (see module docstring derivation).  ``corr`` is
    the Mehrotra second-order correction ds_aff * dnu_aff (zero / None for
    the plain and affine-predictor systems): the corrector solves the
    perturbed complementarity s nu + ds dnu_aff... = mu, i.e. the affine
    product replaces the dropped second-order term of s_+ nu_+ = mu.
    """
    floor = 1e-14 if s.dtype == jnp.float64 else 1e-10
    sig = _sigma(nu, s, mask)
    num = mu - corr if corr is not None else mu
    return mask * (num / jnp.maximum(s, floor) - sig * (c - s)), sig


def _elastic_coef(c, s, nu, e, mask, mu, rho_e, dtype64):
    """Condensed coefficients for an elastic inequality c + e - s = 0.

    Eliminating (ds, de, dnu) from the primal-dual Newton system gives a
    series-combined stiffness sigma_eff = (1/sigma_s + 1/sigma_e)^-1 with
    sigma_s = nu/s and sigma_e = mu/e^2, and the z-row gradient coefficient

        g = nu - sigma_eff*r_c + sigma_eff*(T/sigma_s + r_e/sigma_e)

    with T = mu/s - nu, r_c = c + e - s, r_e = rho_e - mu/e - nu.  As
    sigma_e -> inf (e pinned at 0) this reduces to the hard-constraint
    coefficient mu/s - sigma_s*(c - s).
    """
    floor = 1e-14 if dtype64 else 1e-10
    s_safe = jnp.maximum(s, floor)
    e_safe = jnp.maximum(e, floor)
    sig_s = _sigma(nu, s, mask)
    sig_e = jnp.clip(mu / (e_safe * e_safe), 0.0, _sigma_max(s.dtype))
    sig_eff = mask * sig_s * sig_e / jnp.maximum(sig_s + sig_e, floor)
    T = mu / s_safe - nu
    r_e = rho_e - mu / e_safe - nu
    r_c = c + e - s
    g = mask * (
        nu
        - sig_eff * r_c
        + sig_eff * (T / jnp.maximum(sig_s, floor) + r_e / sig_e)
    )
    return g, sig_eff, (T, r_e, r_c, sig_s, sig_e)


def _merit(cfg: MPCConfig, problem: Problem, states, controls, slacks, mu, rho):
    """l1 merit: barrier objective + rho * equality residuals.

    ``rho`` must dominate the multiplier norm for the Newton direction to be
    a descent direction of this merit (the classical l1 exact-penalty
    condition); the caller adapts it via inequality duals + dynamics
    adjoints each iteration.  ``slacks`` = (s_cl, s_cu, s_xl, s_xu, s_ob,
    e_ob); in elastic mode the obstacle consistency is |c + e - s| and the
    objective gains the elastic terms rho_e*e - mu*ln(e).
    """
    s_cl, s_cu, s_xl, s_xu, s_ob, e_ob = slacks
    elastic = cfg.solver.elastic_obstacles
    (c_cl, c_cu, c_xl, c_xu, c_ob), _, _, m = _constraint_values(
        cfg, problem, states, controls
    )
    obj = costs.total_cost(cfg.cost, states, controls, problem.goal_state)
    log_term = 0.0
    consist = 0.0
    for c, s, mask in (
        (c_cl, s_cl, m.cl),
        (c_cu, s_cu, m.cu),
        (c_xl, s_xl, m.xl),
        (c_xu, s_xu, m.xu),
    ):
        log_term = log_term + jnp.sum(
            mask * jnp.log(jnp.maximum(s, 1e-30))
        )
        consist = consist + jnp.sum(mask * jnp.abs(c - s))
    if s_ob.size:
        log_term = log_term + jnp.sum(
            m.ob * jnp.log(jnp.maximum(s_ob, 1e-30))
        )
        if elastic:
            log_term = log_term + jnp.sum(
                m.ob * jnp.log(jnp.maximum(e_ob, 1e-30))
            )
            obj = obj + cfg.solver.elastic_penalty * jnp.sum(m.ob * e_ob)
            consist = consist + jnp.sum(m.ob * jnp.abs(c_ob + e_ob - s_ob))
        else:
            consist = consist + jnp.sum(m.ob * jnp.abs(c_ob - s_ob))
    d = unicycle.defects(states, controls, cfg.time_step)
    pin = problem.initial_state - states[0]
    eq = jnp.sum(jnp.abs(d)) + jnp.sum(jnp.abs(pin))
    return obj - mu * log_term + rho * (eq + consist)


class _Corr(NamedTuple):
    """Mehrotra second-order corrections ds_aff * dnu_aff per family."""

    cl: jax.Array
    cu: jax.Array
    xl: jax.Array
    xu: jax.Array
    ob: jax.Array


def _build_lqr(cfg: MPCConfig, problem: Problem, it: IPMState, mu,
               corr: _Corr | None = None):
    """Assemble the condensed stage-wise quadratic model.

    ``corr`` carries the Mehrotra corrector terms (None = plain / affine
    system); the Hessian contributions are identical either way — only the
    condensed gradient coefficients change.
    """
    sc = cfg.solver
    N = cfg.horizon
    dtype = it.states.dtype
    (c_cl, c_cu, c_xl, c_xu, c_ob), normals, dist, m = _constraint_values(
        cfg, problem, it.states, it.controls
    )
    gx, gu = costs.stage_gradients(
        cfg.cost, it.states, it.controls, problem.goal_state
    )
    Hx, Hu = costs.stage_hessians(cfg.cost, it.states, it.controls)
    cr = lambda f: getattr(corr, f) if corr is not None else None

    # Control bounds (J = +-I on u).
    g_cl, sig_cl = _grad_coef(c_cl, it.s_cl, it.nu_cl, m.cl, mu, cr("cl"))
    g_cu, sig_cu = _grad_coef(c_cu, it.s_cu, it.nu_cu, m.cu, mu, cr("cu"))
    qu = gu - g_cl + g_cu
    Hu_diag = Hu + sig_cl + sig_cu

    # State bounds (J = +-I on x).
    g_xl, sig_xl = _grad_coef(c_xl, it.s_xl, it.nu_xl, m.xl, mu, cr("xl"))
    g_xu, sig_xu = _grad_coef(c_xu, it.s_xu, it.nu_xu, m.xu, mu, cr("xu"))
    qx = gx - g_xl + g_xu
    Hx_diag = Hx + sig_xl + sig_xu

    Qxx = jax.vmap(jnp.diag)(Hx_diag)  # [N+1, 3, 3]
    Quu = jax.vmap(jnp.diag)(Hu_diag)  # [N, 2, 2]

    # Obstacles: J row for constraint (t, k) is the unit normal n on the
    # (x, y) entries of state t+1.
    if cfg.max_obstacles > 0:
        if sc.elastic_obstacles:
            g_ob, sig_ob, _ = _elastic_coef(
                c_ob, it.s_ob, it.nu_ob, it.e_ob, m.ob, mu,
                sc.elastic_penalty, dtype == jnp.float64,
            )
        else:
            g_ob, sig_ob = _grad_coef(
                c_ob, it.s_ob, it.nu_ob, m.ob, mu, cr("ob")
            )
        n = normals  # [N, K, 2]
        # Gradient: rows 1..N of qx get -sum_k n_k * g_k on (x, y).
        qx = qx.at[1:, :2].add(-jnp.einsum("tkd,tk->td", n, g_ob))
        # Gauss-Newton term sum_k sigma_k n n'.
        H_ob = jnp.einsum("tk,tkd,tke->tde", sig_ob, n, n)  # [N, 2, 2]
        if sc.obstacle_curvature:
            # Exact curvature of c = |p - c| - r:  (I - n n') / dist, weighted
            # by -nu (Lagrangian sign).  Clipped so the 2x2 block stays PSD:
            # the combined block is sigma*nn' + w*(I - nn') with
            # w = -nu/dist; eigenvalues are sigma and w, so clip w >= 0 ...
            # a negative w is exactly the concave boundary direction; keep a
            # damped version for faster convergence without losing PD.
            w = -m.ob * it.nu_ob / jnp.maximum(dist, 1e-6)
            w = jnp.maximum(w, -0.9 * sig_ob)  # keep sigma + w ratio PD-ish
            eye = jnp.eye(2, dtype=dtype)
            H_curv = jnp.einsum(
                "tk,tde->tde", w, jnp.broadcast_to(eye, (N, 2, 2))
            ) - jnp.einsum("tk,tkd,tke->tde", w, n, n)
            H_ob = H_ob + H_curv
        Qxx = Qxx.at[1:, :2, :2].add(H_ob)

    # Levenberg shift: static floor + adaptive component.
    reg = sc.reg + it.reg
    Qxx = Qxx + reg * jnp.eye(3, dtype=dtype)
    Quu = Quu + reg * jnp.eye(2, dtype=dtype)

    A, B = unicycle.linearize(it.states, it.controls, cfg.time_step)
    d = unicycle.defects(it.states, it.controls, cfg.time_step)
    d0 = problem.initial_state - it.states[0]
    return LQRData(A=A, B=B, d=d, d0=d0, Qxx=Qxx, qx=qx, Quu=Quu, qu=qu)


def _iteration(cfg: MPCConfig, problem: Problem, it: IPMState, mu) -> IPMState:
    sc = cfg.solver
    floor = 1e-14 if it.states.dtype == jnp.float64 else 1e-10

    (c_cl, c_cu, c_xl, c_xu, c_ob), normals, _, m = _constraint_values(
        cfg, problem, it.states, it.controls
    )

    # Slack and dual steps: ds = J dz + (c - s);
    # dnu = (mu - corr)/s - nu - sigma ds.
    def steps(c, s, nu, mask, jdz, mu_t, corr=None):
        ds = mask * (jdz + c - s)
        sig = _sigma(nu, s, mask)
        num = mu_t - corr if corr is not None else mu_t
        dnu = mask * (num / jnp.maximum(s, floor) - nu - sig * ds)
        return ds, dnu

    def all_steps(dx, du, mu_t, corr: _Corr | None = None):
        cr = lambda f: getattr(corr, f) if corr is not None else None
        ds_cl, dnu_cl = steps(c_cl, it.s_cl, it.nu_cl, m.cl, du,
                              mu_t, cr("cl"))
        ds_cu, dnu_cu = steps(c_cu, it.s_cu, it.nu_cu, m.cu, -du,
                              mu_t, cr("cu"))
        ds_xl, dnu_xl = steps(c_xl, it.s_xl, it.nu_xl, m.xl, dx,
                              mu_t, cr("xl"))
        ds_xu, dnu_xu = steps(c_xu, it.s_xu, it.nu_xu, m.xu, -dx,
                              mu_t, cr("xu"))
        jdz_ob = jnp.einsum("tkd,td->tk", normals, dx[1:, :2])
        ds_ob, dnu_ob = steps(c_ob, it.s_ob, it.nu_ob, m.ob, jdz_ob,
                              mu_t, cr("ob"))
        return ((ds_cl, dnu_cl), (ds_cu, dnu_cu), (ds_xl, dnu_xl),
                (ds_xu, dnu_xu), (ds_ob, dnu_ob))

    def ftb_all(pairs, tau):
        alpha = jnp.ones((), it.states.dtype)
        for v, dv in pairs:
            if v.size:
                ratio = jnp.where(
                    dv < 0, -tau * v / jnp.minimum(dv, -1e-30), 1.0
                )
                alpha = jnp.minimum(alpha, jnp.minimum(jnp.min(ratio), 1.0))
        return alpha

    if sc.mehrotra == "pc":
        # --- Mehrotra predictor-corrector --------------------------------
        # Affine-scaling predictor (mu = 0, no corrector): probes how far
        # pure Newton can push complementarity.  Shares the condensed
        # Hessian with the corrector — only the RHS differs.
        zero = jnp.zeros((), it.states.dtype)
        data_aff = _build_lqr(cfg, problem, it, zero)
        sol_aff = _lqr_engine(sc.reg, sc.lqr_backend)(data_aff)
        aff = all_steps(sol_aff.dx, sol_aff.du, zero)
        tau_a = jnp.asarray(sc.tau, it.states.dtype)
        a_aff = jnp.minimum(
            ftb_all([(f, d[0]) for f, d in zip(
                (it.s_cl, it.s_cu, it.s_xl, it.s_xu, it.s_ob), aff)], tau_a),
            ftb_all([(f, d[1]) for f, d in zip(
                (it.nu_cl, it.nu_cu, it.nu_xl, it.nu_xu, it.nu_ob), aff)],
                tau_a),
        )
        # mu_aff = mean complementarity after the affine step.
        tot = jnp.zeros((), it.states.dtype)
        cnt = jnp.zeros((), it.states.dtype)
        for (s, nu, mask), (ds, dnu) in zip(
            ((it.s_cl, it.nu_cl, m.cl), (it.s_cu, it.nu_cu, m.cu),
             (it.s_xl, it.nu_xl, m.xl), (it.s_xu, it.nu_xu, m.xu),
             (it.s_ob, it.nu_ob, m.ob)), aff,
        ):
            if s.size:
                tot = tot + jnp.sum(
                    mask * (s + a_aff * ds) * (nu + a_aff * dnu)
                )
                cnt = cnt + jnp.sum(mask)
        mu_aff = tot / jnp.maximum(cnt, 1.0)
        # Centering: sigma = (mu_aff / mu)^3 (Mehrotra's heuristic) — near-
        # zero when the affine step is unblocked (superlinear tail), ~1 when
        # blocked (recenter).  mu here is the *unscaled* mean
        # complementarity (see solve()).
        sigma_m = jnp.clip((mu_aff / jnp.maximum(mu, floor)) ** 3, 0.0, 1.0)
        eps = jnp.finfo(it.states.dtype).eps
        mu_floor = jnp.maximum(jnp.asarray(sc.mu_min, it.states.dtype),
                               50.0 * eps)
        mu = jnp.clip(sigma_m * mu, mu_floor, sc.mu_init)
        corr = _Corr(*(ds * dnu for ds, dnu in aff))
        data = _build_lqr(cfg, problem, it, mu, corr)
    elif sc.mehrotra == "soc":
        # --- second-order corrector at the configured centering ----------
        # The centered solve plays predictor; its ds * dnu products feed
        # one corrected re-solve at the SAME mu.  The factorization (all
        # Hessian terms) is shared — only the RHS changes — so the fused
        # kernel implements this as one extra RHS-only Riccati sweep.
        data_c = _build_lqr(cfg, problem, it, mu)
        sol_c = _lqr_engine(sc.reg, sc.lqr_backend)(data_c)
        pre = all_steps(sol_c.dx, sol_c.du, mu)
        corr = _Corr(*(ds * dnu for ds, dnu in pre))
        data = _build_lqr(cfg, problem, it, mu, corr)
    else:
        corr = None
        data = _build_lqr(cfg, problem, it, mu)

    sol = _lqr_engine(sc.reg, sc.lqr_backend)(data)
    dx, du = sol.dx, sol.du
    ((ds_cl, dnu_cl), (ds_cu, dnu_cu), (ds_xl, dnu_xl), (ds_xu, dnu_xu),
     (ds_ob_plain, dnu_ob_plain)) = all_steps(dx, du, mu, corr)
    jdz_ob = jnp.einsum("tkd,td->tk", normals, dx[1:, :2])
    if sc.elastic_obstacles and c_ob.size:
        _, _, (T_ob, r_e_ob, r_c_ob, sig_s_ob, sig_e_ob) = _elastic_coef(
            c_ob, it.s_ob, it.nu_ob, it.e_ob, m.ob, mu,
            sc.elastic_penalty, it.states.dtype == jnp.float64,
        )
        beta = sig_e_ob / jnp.maximum(sig_s_ob + sig_e_ob, floor)
        ds_ob = m.ob * beta * (
            jdz_ob + r_c_ob + (T_ob - r_e_ob) / sig_e_ob
        )
        de_ob = m.ob * (T_ob - r_e_ob - sig_s_ob * ds_ob) / sig_e_ob
        dnu_ob = m.ob * (T_ob - sig_s_ob * ds_ob)
    else:
        ds_ob, dnu_ob = ds_ob_plain, dnu_ob_plain
        de_ob = jnp.zeros_like(ds_ob)

    # Fraction-to-boundary step limits.
    def ftb(v, dv):
        ratio = jnp.where(dv < 0, -sc.tau * v / jnp.minimum(dv, -1e-30), 1.0)
        return jnp.minimum(jnp.min(ratio), 1.0)

    slack_pairs = (
        (it.s_cl, ds_cl), (it.s_cu, ds_cu), (it.s_xl, ds_xl),
        (it.s_xu, ds_xu), (it.s_ob, ds_ob),
    )
    if sc.elastic_obstacles and it.e_ob.size:
        slack_pairs = slack_pairs + ((it.e_ob, de_ob),)
    dual_pairs = (
        (it.nu_cl, dnu_cl), (it.nu_cu, dnu_cu), (it.nu_xl, dnu_xl),
        (it.nu_xu, dnu_xu), (it.nu_ob, dnu_ob),
    )
    alpha_s = jnp.ones((), it.states.dtype)
    for v, dv in slack_pairs:
        alpha_s = jnp.minimum(alpha_s, ftb(v, dv)) if v.size else alpha_s
    alpha_nu = jnp.ones((), it.states.dtype)
    for v, dv in dual_pairs:
        alpha_nu = jnp.minimum(alpha_nu, ftb(v, dv)) if v.size else alpha_nu

    # Parallel backtracking line search on the l1 merit.
    alphas = alpha_s * (sc.ls_backtrack ** jnp.arange(sc.ls_iters, dtype=it.states.dtype))

    # l1 exact-penalty weight: must exceed the norm of *all* constraint
    # multipliers or the Newton direction (which trades objective against
    # feasibility at the duals' exchange rate) is not a descent direction of
    # the merit and the solver deadlocks at infeasible points.  That
    # includes the dynamics-equality multipliers lambda — for far goals
    # their magnitude (an adjoint sum of goal gradients over the horizon)
    # dwarfs the inequality duals; estimate them with one adjoint sweep of
    # the condensed gradients.
    nu_max = jnp.zeros((), it.states.dtype)
    for v, mask in (
        (it.nu_cl, m.cl), (it.nu_cu, m.cu), (it.nu_xl, m.xl),
        (it.nu_xu, m.xu), (it.nu_ob, m.ob),
    ):
        if v.size:
            nu_max = jnp.maximum(nu_max, jnp.max(mask * v))

    def adj(lam, inputs):
        A_t, qx_t = inputs
        lam_new = qx_t + A_t.T @ lam
        return lam_new, jnp.max(jnp.abs(lam_new))

    lam_N = data.qx[-1]
    _, lam_maxes = jax.lax.scan(
        adj, lam_N, (data.A, data.qx[:-1]), reverse=True
    )
    lam_max = jnp.maximum(jnp.max(lam_maxes), jnp.max(jnp.abs(lam_N)))
    rho = jnp.maximum(
        jnp.asarray(sc.merit_penalty, it.states.dtype),
        2.0 * jnp.maximum(nu_max, lam_max),
    )

    def merit_at(alpha):
        new_states = it.states + alpha * dx
        new_controls = it.controls + alpha * du
        new_slacks = (
            it.s_cl + alpha * ds_cl,
            it.s_cu + alpha * ds_cu,
            it.s_xl + alpha * ds_xl,
            it.s_xu + alpha * ds_xu,
            it.s_ob + alpha * ds_ob,
            it.e_ob + alpha * de_ob,
        )
        return _merit(cfg, problem, new_states, new_controls, new_slacks, mu, rho)

    merit0 = merit_at(jnp.zeros((), it.states.dtype))
    merits = jax.vmap(merit_at)(alphas)
    # Accept the largest alpha that does not increase the merit beyond noise.
    # Two noise sources force a tolerance instead of strict decrease, both of
    # which otherwise collapse alpha and stall the superlinear tail:
    #  (a) rounding: merit ~ 1e3 while a near-converged Newton step improves
    #      it by ~1e-9, far below the comparison's floating-point noise;
    #  (b) curvature: the l1 penalty on |c(z) - s| and the dynamics defects
    #      contracts linearly in alpha but regains O(penalty * |dz|^2) from
    #      constraint curvature — an *expected* increase for an exact Newton
    #      step, not a bad direction.
    # Genuinely bad steps overshoot this budget by orders of magnitude.
    # The curvature budget only applies in the small-step Newton regime: for
    # large steps the O(|dz|^2) term is genuine nonlinearity that the merit
    # must be allowed to reject (otherwise a distant warm start can walk
    # through arbitrarily bad iterates and blow up the duals).
    eps = jnp.finfo(it.states.dtype).eps
    step_inf = jnp.maximum(jnp.max(jnp.abs(dx)), jnp.max(jnp.abs(du)))
    # The noise regime is dtype-wide: in f32 a merit of ~1e3 has ~1e-4
    # absolute comparison noise, which dominates the merit change of steps up
    # to ~1e-2 near a solution — strict comparisons there reject the Newton
    # tail at random and cap the converged fraction.
    newton_regime = step_inf < (
        1e-4 if it.states.dtype == jnp.float64 else 1e-2
    )
    tol = 16.0 * eps * (1.0 + jnp.abs(merit0)) + jnp.where(
        newton_regime, 10.0 * rho * step_inf * step_inf, 0.0
    )
    ok = jnp.isfinite(merits) & (merits <= merit0 + tol)
    idx = jnp.argmax(ok)  # first True in decreasing-alpha order
    any_ok = jnp.any(ok)
    # All-rejected fallback: execute the deepest candidate — it keeps real
    # progress through merit deadlocks (measured: ls=2 converges 0.93 vs
    # 0.73 for ls=4 at K=8 precisely because this fallback step is 4x
    # larger) — but ONLY if its merit is finite: a non-finite trial means
    # the direction overflows and executing it detonates the iterate (NaN
    # states that no later iteration can repair).  Freeze instead (alpha=0).
    alpha = jnp.where(
        any_ok,
        alphas[idx],
        jnp.where(jnp.isfinite(merits[-1]), alphas[-1], 0.0),
    )

    # Couple the dual step to the accepted primal step.  IPOPT lets duals
    # advance at their own fraction-to-boundary rate, with the restoration
    # phase as a backstop; a fixed-iteration solver has no restoration, and
    # an uncoupled dual step integrates the full dual update every iteration
    # while a merit-limited primal crawls — the duals run away, the condensed
    # Hessian goes stiff, and the whole iteration deadlocks.
    alpha_nu = jnp.minimum(alpha_nu, alpha)

    # Dual safeguard (IPOPT's kappa_Sigma correction): keep each multiplier
    # within a large factor of its central value mu/s.  Without it, a stuck
    # primal (e.g. a degenerate warm start) lets the dual recursion run away
    # unboundedly while the iterate itself never moves.
    KAPPA = 1e10

    def clamp(nu_new, s_new, mask):
        center = mu / jnp.maximum(s_new, floor)
        return mask * jnp.clip(nu_new, center / KAPPA, center * KAPPA)

    s_cl_n = it.s_cl + alpha * ds_cl
    s_cu_n = it.s_cu + alpha * ds_cu
    s_xl_n = it.s_xl + alpha * ds_xl
    s_xu_n = it.s_xu + alpha * ds_xu
    s_ob_n = it.s_ob + alpha * ds_ob
    new = IPMState(
        states=it.states + alpha * dx,
        controls=it.controls + alpha * du,
        s_cl=s_cl_n,
        s_cu=s_cu_n,
        s_xl=s_xl_n,
        s_xu=s_xu_n,
        s_ob=s_ob_n,
        e_ob=it.e_ob + alpha * de_ob,
        nu_cl=clamp(it.nu_cl + alpha_nu * dnu_cl, s_cl_n, m.cl),
        nu_cu=clamp(it.nu_cu + alpha_nu * dnu_cu, s_cu_n, m.cu),
        nu_xl=clamp(it.nu_xl + alpha_nu * dnu_xl, s_xl_n, m.xl),
        nu_xu=clamp(it.nu_xu + alpha_nu * dnu_xu, s_xu_n, m.xu),
        nu_ob=clamp(it.nu_ob + alpha_nu * dnu_ob, s_ob_n, m.ob),
        # Grow on deep merit backtracking (the *merit* rejected the Newton
        # direction — linearization overshoot), not on a small alpha alone
        # (which is routinely fraction-to-boundary-limited and healthy).
        # Near convergence (the small-step Newton regime) merit comparisons
        # are dominated by floating-point noise, so deep-backtrack counts are
        # spurious there; growing reg on them damps the superlinear tail and
        # caps the converged fraction.  Only genuine large-step rejections
        # indicate linearization overshoot.
        reg=jnp.where(
            (~any_ok) | ((idx >= 4) & ~newton_regime),
            jnp.minimum(jnp.maximum(it.reg, sc.reg) * 8.0, 1e8),
            jnp.maximum(it.reg / 3.0, sc.reg),
        ),
        # Adaptive centering (enabled by mu_sigma_max > 0): a throttled
        # accepted step outside the converged Newton regime means the barrier
        # schedule outran the central path (fraction-to-boundary or merit is
        # braking) — slow the centering toward the cap; healthy steps decay
        # it back to the configured schedule.
        # The growth cap is max(mu_sigma_max, mu_sigma) — NOT mu_sigma_max
        # alone: a refine stage can set mu_sigma above the static cap, and
        # capping growth below the decay floor would make the clamp pair
        # oscillate.  Mirrors ops/pallas/ipm_fused.py (runtime sigma row);
        # here the stage's mu_sigma arrives via the config fold in
        # solver/api._dispatch, so sc.mu_sigma IS the runtime value.
        sigma=(
            jnp.where(
                (alpha < 0.25) & ~newton_regime,
                jnp.minimum(
                    it.sigma * 1.5, max(sc.mu_sigma_max, sc.mu_sigma)
                ),
                jnp.maximum(it.sigma * 0.9, sc.mu_sigma),
            )
            if sc.mu_sigma_max > 0.0
            else it.sigma
        ),
    )
    return new


def _diagnostics(cfg: MPCConfig, problem: Problem, it: IPMState, mu) -> Diagnostics:
    """Exact KKT residuals with adjoint-estimated dynamics multipliers."""
    (c_cl, c_cu, c_xl, c_xu, c_ob), normals, _, m = _constraint_values(
        cfg, problem, it.states, it.controls
    )
    gx, gu = costs.stage_gradients(
        cfg.cost, it.states, it.controls, problem.goal_state
    )
    # Lagrangian gradient contributions -J' nu per family.
    gx_L = gx - m.xl * it.nu_xl + m.xu * it.nu_xu
    gu_L = gu - m.cl * it.nu_cl + m.cu * it.nu_cu
    if cfg.max_obstacles > 0:
        gx_L = gx_L.at[1:, :2].add(
            -jnp.einsum("tkd,tk->td", normals, m.ob * it.nu_ob)
        )
    A, B = unicycle.linearize(it.states, it.controls, cfg.time_step)

    def adjoint(lam_next, inputs):
        A_t, gx_t, B_t, gu_t = inputs
        r_u = gu_t + B_t.T @ lam_next
        lam = gx_t + A_t.T @ lam_next
        return lam, r_u

    lam_N = gx_L[-1]
    lam_0, r_u = jax.lax.scan(
        adjoint, lam_N, (A, gx_L[:-1], B, gu_L), reverse=True
    )
    # IPOPT-style scaling of the dual residual (its s_d): divide by the
    # average multiplier magnitude when it exceeds s_max = 100.  Without
    # this, a large-cost problem in f32 can never report convergence — the
    # raw stationarity floor is eps * gradient-scale.
    nu_sum = jnp.zeros((), gu.dtype)
    nu_cnt = jnp.zeros((), gu.dtype)
    for v, mask in (
        (it.nu_cl, m.cl), (it.nu_cu, m.cu), (it.nu_xl, m.xl),
        (it.nu_xu, m.xu), (it.nu_ob, m.ob),
    ):
        if v.size:
            nu_sum = nu_sum + jnp.sum(mask * jnp.abs(v))
            nu_cnt = nu_cnt + jnp.sum(mask)
    s_max = 100.0
    s_d = jnp.maximum(s_max, nu_sum / jnp.maximum(nu_cnt, 1.0)) / s_max
    stationarity = jnp.max(jnp.abs(r_u)) / s_d

    d = unicycle.defects(it.states, it.controls, cfg.time_step)
    pin = problem.initial_state - it.states[0]
    viol = 0.0
    comp = 0.0
    for c, s, nu, mask in (
        (c_cl, it.s_cl, it.nu_cl, m.cl),
        (c_cu, it.s_cu, it.nu_cu, m.cu),
        (c_xl, it.s_xl, it.nu_xl, m.xl),
        (c_xu, it.s_xu, it.nu_xu, m.xu),
        (c_ob, it.s_ob, it.nu_ob, m.ob),
    ):
        if c.size:
            viol = jnp.maximum(viol, jnp.max(mask * jnp.maximum(-c, 0.0)))
            comp = jnp.maximum(comp, jnp.max(mask * jnp.abs(s * nu)))
    feasibility = jnp.maximum(
        jnp.max(jnp.abs(d)), jnp.max(jnp.abs(pin))
    )
    feasibility = jnp.maximum(feasibility, viol)
    # Effective tolerance is dtype-aware: f32 cannot reach 1e-6 stationarity
    # at realistic cost scales; 50*sqrt(eps) (~3.5e-3 in f32, ~7.5e-7 in f64)
    # is the practical floor.
    eps = jnp.finfo(it.states.dtype).eps
    tol = jnp.maximum(cfg.solver.kkt_tol, 50.0 * jnp.sqrt(eps))
    comp_scaled = comp / s_d
    converged = (
        (stationarity < tol)
        & (feasibility < tol)
        & (comp_scaled < jnp.maximum(10.0 * cfg.solver.mu_min, tol))
    )
    final_cost = costs.total_cost(
        cfg.cost, it.states, it.controls, problem.goal_state
    )
    return Diagnostics(
        converged=converged,
        kkt_stationarity=stationarity,
        kkt_feasibility=feasibility,
        kkt_complementarity=comp,
        final_cost=final_cost,
        final_mu=mu,
    )


def _mean_complementarity(it: IPMState, masks: _Masks, dtype):
    total = jnp.zeros((), dtype)
    count = jnp.zeros((), dtype)
    for s, nu, mask in (
        (it.s_cl, it.nu_cl, masks.cl),
        (it.s_cu, it.nu_cu, masks.cu),
        (it.s_xl, it.nu_xl, masks.xl),
        (it.s_xu, it.nu_xu, masks.xu),
        (it.s_ob, it.nu_ob, masks.ob),
    ):
        if s.size:
            total = total + jnp.sum(mask * s * nu)
            count = count + jnp.sum(mask)
    return total / jnp.maximum(count, 1.0)


def _adaptive_mu(cfg: MPCConfig, it: IPMState, masks: _Masks, dtype):
    sc = cfg.solver
    comp = _mean_complementarity(it, masks, dtype)
    # The barrier floor must respect the dtype: driving mu below ~50 eps
    # chases a central path f32 cannot represent, and the late iterations
    # *degrade* already-converged iterates (sigma = nu/s turns to rounding
    # noise).  f64 keeps the configured floor.
    eps = jnp.finfo(dtype).eps
    mu_floor = jnp.maximum(
        jnp.asarray(sc.mu_min, dtype), 50.0 * eps
    )
    return jnp.clip(it.sigma * comp, mu_floor, sc.mu_init)


def solve(cfg: MPCConfig, problem: Problem) -> Solution:
    """Solve one MPC scenario.  `jax.vmap` over a leading axis for batches;
    wrap in `jax.jit` with ``static_argnums=0`` (or use
    `kissmpc_tpu.solver.api.make_solver`).

    All matmuls/einsums are pinned to full f32 precision: the TPU default
    (bf16 MXU passes) corrupts the 3x3 Riccati algebra and the KKT adjoint
    sweep — the Newton directions degrade and convergence collapses (~0.40
    vs ~0.97 measured at N=50/B=8192/K=8).  These matrices are far too small
    for the MXU anyway; the VPU executes them at full precision for free.
    """
    with jax.default_matmul_precision("float32"):
        sc = cfg.solver
        if sc.mehrotra != "off" and sc.elastic_obstacles:
            raise ValueError(
                "mehrotra predictor-corrector does not support "
                "elastic_obstacles"
            )
        it0 = _init_state(cfg, problem)
        dtype = it0.states.dtype
        masks = _constraint_masks(cfg, problem, dtype)

        def body(i, it):
            if sc.mehrotra == "pc":
                # Predictor-corrector centers itself: pass the raw mean
                # complementarity; _iteration derives mu = sigma_m * comp
                # from the affine probe (sigma_m = (mu_aff/comp)^3).
                mu = _mean_complementarity(it, masks, dtype)
            else:
                mu = _adaptive_mu(cfg, it, masks, dtype)
            return _iteration(cfg, problem, it, mu)

        it = jax.lax.fori_loop(0, sc.iterations, body, it0)
        diag = _diagnostics(
            cfg, problem, it, _adaptive_mu(cfg, it, masks, dtype)
        )
        return Solution(
            states=it.states, controls=it.controls, diagnostics=diag
        )
