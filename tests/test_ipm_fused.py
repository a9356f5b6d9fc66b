"""Fused IPM megakernel vs the jnp solver path (interpret mode on CPU).

The kernel implements the identical algorithm; small f32 op-order drift is
expected, so controls are compared within the parity budget (1e-3) and
solutions are additionally checked against problem physics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kissmpc_tpu import MPCConfig, default_problem, problem_with_obstacles
from kissmpc_tpu.obstacles import static_set
from kissmpc_tpu.ops.pallas.ipm_fused import solve_batch_fused
from kissmpc_tpu.solver import ipm


def _batch_problems(cfg, pairs):
    ps = [
        default_problem(
            cfg, jnp.asarray(s, jnp.float32), jnp.asarray(g, jnp.float32),
            dtype=jnp.float32,
        )
        for s, g in pairs
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)


def test_fused_matches_jnp_no_obstacles():
    cfg = MPCConfig(horizon=12, time_step=0.1)
    pairs = [
        ((0.0, 0.0, 0.0), (1.0, 0.4, 0.0)),
        ((0.2, -0.3, 1.0), (0.8, 0.6, 0.5)),
        ((0.0, 0.0, -2.0), (-0.5, 0.5, 0.0)),
    ]
    problems = _batch_problems(cfg, pairs)
    ref = jax.vmap(functools.partial(ipm.solve, cfg))(problems)
    fused = solve_batch_fused(cfg, problems, interpret=True, bt=8)
    err = np.max(np.abs(np.asarray(fused.controls) - np.asarray(ref.controls)))
    assert err <= 1e-3, f"fused vs jnp max control diff {err:.2e}"
    # convergence agreement
    assert bool(jnp.all(fused.diagnostics.converged)), (
        np.asarray(fused.diagnostics.kkt_stationarity),
        np.asarray(fused.diagnostics.kkt_feasibility),
    )


def test_fused_matches_jnp_with_obstacles():
    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=2)
    obs = static_set(
        [[0.6, 0.05], [2.5, 2.5]], [0.2, 0.2], max_obstacles=2,
        dtype=jnp.float32,
    )
    ps = []
    for s, g in [((0.0, 0.0, 0.0), (1.2, 0.1, 0.0)),
                 ((0.0, -0.4, 0.5), (1.2, 0.3, 0.0))]:
        ps.append(
            problem_with_obstacles(
                cfg, jnp.asarray(s, jnp.float32), jnp.asarray(g, jnp.float32),
                obs, inflation_radius=0.25, dtype=jnp.float32,
            )
        )
    problems = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    ref = jax.vmap(functools.partial(ipm.solve, cfg))(problems)
    fused = solve_batch_fused(cfg, problems, interpret=True, bt=8)
    err = np.max(np.abs(np.asarray(fused.controls) - np.asarray(ref.controls)))
    assert err <= 2e-3, f"fused vs jnp max control diff {err:.2e}"
    # clearance holds on the fused path
    p = np.asarray(fused.states)[:, 1:, :2]
    d = np.linalg.norm(p - np.array([0.6, 0.05]), axis=-1) - 0.2
    assert np.min(d) >= 0.25 - 1e-3


def test_fused_bound_activity():
    cfg = MPCConfig(horizon=15, time_step=0.1)
    problems = _batch_problems(
        cfg, [((0.0, 0.0, 0.0), (30.0, 0.0, 0.0))]
    )
    fused = solve_batch_fused(cfg, problems, interpret=True, bt=8)
    v = np.asarray(fused.controls[0, :, 0])
    assert np.all(v <= 0.5 + 1e-5)
    assert np.max(v) > 0.5 - 1e-3


@pytest.mark.parametrize("sb", [2, 4])
def test_fused_sublane_packing_matches_flat(sb):
    # sb>1 reorders the scenario layout into (sb, lanes) sub-blocks; the
    # algorithm (and the interpret-mode arithmetic) must be unchanged, so
    # results match the flat sb=1 kernel to f32 op-order noise.
    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=2)
    obs = static_set(
        [[0.6, 0.05], [2.5, 2.5]], [0.2, 0.2], max_obstacles=2,
        dtype=jnp.float32,
    )
    ps = []
    for s, g in [((0.0, 0.0, 0.0), (1.2, 0.1, 0.0)),
                 ((0.0, -0.4, 0.5), (1.2, 0.3, 0.0)),
                 ((0.2, -0.3, 1.0), (0.8, 0.6, 0.5)),
                 ((0.0, 0.0, -2.0), (-0.5, 0.5, 0.0))]:
        ps.append(
            problem_with_obstacles(
                cfg, jnp.asarray(s, jnp.float32), jnp.asarray(g, jnp.float32),
                obs, inflation_radius=0.25, dtype=jnp.float32,
            )
        )
    problems = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    flat = solve_batch_fused(cfg, problems, interpret=True, bt=4, sb=1)
    packed = solve_batch_fused(cfg, problems, interpret=True, bt=4, sb=sb)
    err = np.max(
        np.abs(np.asarray(packed.controls) - np.asarray(flat.controls))
    )
    assert err <= 1e-5, f"sb={sb} vs flat max control diff {err:.2e}"
    np.testing.assert_array_equal(
        np.asarray(packed.diagnostics.converged),
        np.asarray(flat.diagnostics.converged),
    )


def test_fused_adaptive_sigma_matches_jnp():
    # mu_sigma_max > 0 turns on per-scenario adaptive centering; both paths
    # implement the same grow/decay rule so controls must still agree.
    import dataclasses

    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=2)
    cfg = cfg.replace(
        solver=dataclasses.replace(cfg.solver, mu_sigma_max=0.7)
    )
    obs = static_set(
        [[0.6, 0.05], [2.5, 2.5]], [0.2, 0.2], max_obstacles=2,
        dtype=jnp.float32,
    )
    ps = []
    for s, g in [((0.0, 0.0, 0.0), (1.2, 0.1, 0.0)),
                 ((0.0, -0.4, 0.5), (1.2, 0.3, 0.0))]:
        ps.append(
            problem_with_obstacles(
                cfg, jnp.asarray(s, jnp.float32), jnp.asarray(g, jnp.float32),
                obs, inflation_radius=0.25, dtype=jnp.float32,
            )
        )
    problems = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    ref = jax.vmap(functools.partial(ipm.solve, cfg))(problems)
    fused = solve_batch_fused(cfg, problems, interpret=True, bt=8)
    err = np.max(np.abs(np.asarray(fused.controls) - np.asarray(ref.controls)))
    assert err <= 2e-3, f"fused vs jnp max control diff {err:.2e}"
    assert bool(jnp.all(fused.diagnostics.converged))


def test_fused_adaptive_sigma_above_cap_matches_jnp():
    # A refine stage may set mu_sigma ABOVE mu_sigma_max (late stages run
    # 0.7-0.9 against a 0.7 cap).  Both backends must then cap adaptive
    # growth at max(mu_sigma_max, runtime sigma) — the fused kernel via its
    # sigma row, the jnp path via the config fold — or their centering
    # schedules diverge in exactly this corner (ADVICE r3, medium).
    import dataclasses

    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=2)
    cfg = cfg.replace(
        solver=dataclasses.replace(cfg.solver, mu_sigma_max=0.7)
    )
    obs = static_set(
        [[0.6, 0.05], [2.5, 2.5]], [0.2, 0.2], max_obstacles=2,
        dtype=jnp.float32,
    )
    ps = []
    for s, g in [((0.0, 0.0, 0.0), (1.2, 0.1, 0.0)),
                 ((0.0, -0.4, 0.5), (1.2, 0.3, 0.0))]:
        ps.append(
            problem_with_obstacles(
                cfg, jnp.asarray(s, jnp.float32), jnp.asarray(g, jnp.float32),
                obs, inflation_radius=0.25, dtype=jnp.float32,
            )
        )
    problems = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    # jnp path: stage sigma folded into the static config (must construct
    # despite exceeding the cap).
    cfg_fold = cfg.replace(
        solver=dataclasses.replace(cfg.solver, mu_sigma=0.9)
    )
    ref = jax.vmap(functools.partial(ipm.solve, cfg_fold))(problems)
    # fused path: stage sigma as the runtime row.
    fused = solve_batch_fused(
        cfg, problems, interpret=True, bt=8, mu_sigma=0.9
    )
    err = np.max(np.abs(np.asarray(fused.controls) - np.asarray(ref.controls)))
    assert err <= 2e-3, f"fused vs jnp max control diff {err:.2e}"
    np.testing.assert_array_equal(
        np.asarray(fused.diagnostics.converged),
        np.asarray(ref.diagnostics.converged),
    )


def test_fused_runtime_stage_params_match_static():
    # iterations / mu_sigma as runtime kernel inputs (the one-binary refine
    # plan) must reproduce the statically-configured solve bit-for-bit:
    # same trip count, same sigma row, same arithmetic.
    import dataclasses

    base = MPCConfig(horizon=12, time_step=0.1)
    cfg_static = base.replace(
        solver=dataclasses.replace(
            base.solver, iterations=14, mu_sigma=0.35, mu_sigma_max=0.7
        )
    )
    # deliberately different static schedule; overridden at call time
    cfg_rt = base.replace(
        solver=dataclasses.replace(
            base.solver, iterations=5, mu_sigma=0.1, mu_sigma_max=0.7
        )
    )
    pairs = [
        ((0.0, 0.0, 0.0), (1.0, 0.4, 0.0)),
        ((0.2, -0.3, 1.0), (0.8, 0.6, 0.5)),
    ]
    problems = _batch_problems(cfg_static, pairs)
    ref = solve_batch_fused(cfg_static, problems, interpret=True, bt=8)
    rt = solve_batch_fused(
        cfg_rt, problems, interpret=True, bt=8, iterations=14, mu_sigma=0.35
    )
    np.testing.assert_array_equal(
        np.asarray(ref.controls), np.asarray(rt.controls)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.diagnostics.converged),
        np.asarray(rt.diagnostics.converged),
    )
    # per-scenario sigma rows: a [B] array is accepted and scenario-local
    rt2 = solve_batch_fused(
        cfg_rt, problems, interpret=True, bt=8, iterations=14,
        mu_sigma=jnp.full((2,), 0.35, jnp.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(ref.controls), np.asarray(rt2.controls)
    )


def test_fused_affine_tracks_matches_full_tracks():
    # fused_affine_tracks ships (c0, per-step delta) instead of K*N track
    # planes; for constant-velocity tracks (the reference's prediction
    # model) the in-kernel reconstruction c0 + t*d must reproduce the
    # full-track kernel to f32 noise.
    import dataclasses

    from kissmpc_tpu.obstacles import ObstacleSet

    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=2)
    obs = ObstacleSet(
        position=jnp.array([[0.7, -0.3], [0.4, 0.6]], jnp.float32),
        radius=jnp.array([0.15, 0.2], jnp.float32),
        orientation=jnp.array([2.2, -0.8], jnp.float32),
        linear_velocity=jnp.array([0.6, 0.4], jnp.float32),
        angular_velocity=jnp.zeros((2,), jnp.float32),
        active=jnp.ones((2,), jnp.float32),
    )
    ps = []
    for s, g in [((0.0, 0.0, 0.0), (1.2, 0.1, 0.0)),
                 ((0.0, -0.4, 0.5), (1.2, 0.3, 0.0))]:
        ps.append(
            problem_with_obstacles(
                cfg, jnp.asarray(s, jnp.float32), jnp.asarray(g, jnp.float32),
                obs, inflation_radius=0.25,
                prediction_dt=cfg.time_step, dtype=jnp.float32,
            )
        )
    problems = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    full = solve_batch_fused(cfg, problems, interpret=True, bt=8)
    cfg_aff = cfg.replace(
        solver=dataclasses.replace(cfg.solver, fused_affine_tracks=True)
    )
    aff = solve_batch_fused(cfg_aff, problems, interpret=True, bt=8)
    err = np.max(np.abs(np.asarray(aff.controls) - np.asarray(full.controls)))
    assert err <= 1e-4, f"affine vs full tracks max control diff {err:.2e}"
    np.testing.assert_array_equal(
        np.asarray(aff.diagnostics.converged),
        np.asarray(full.diagnostics.converged),
    )


def test_fused_sublane_packing_no_obstacles():
    cfg = MPCConfig(horizon=12, time_step=0.1)
    problems = _batch_problems(
        cfg,
        [((0.0, 0.0, 0.0), (1.0, 0.4, 0.0)),
         ((0.2, -0.3, 1.0), (0.8, 0.6, 0.5))],
    )
    flat = solve_batch_fused(cfg, problems, interpret=True, bt=2, sb=1)
    packed = solve_batch_fused(cfg, problems, interpret=True, bt=2, sb=2)
    err = np.max(
        np.abs(np.asarray(packed.controls) - np.asarray(flat.controls))
    )
    assert err <= 1e-5, f"sb=2 vs flat max control diff {err:.2e}"


def test_fused_affine_guard_flags_curved_tracks():
    # ADVICE r2: enabling fused_affine_tracks on *curved* tracks linearizes
    # the constraints through their first segment; the wrapper must withdraw
    # the convergence certificate and trip the fallback gate rather than
    # report convergence against the wrong problem.
    import dataclasses

    from kissmpc_tpu.obstacles import ObstacleSet

    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=1)
    cfg_aff = cfg.replace(
        solver=dataclasses.replace(cfg.solver, fused_affine_tracks=True)
    )
    curved = ObstacleSet(
        position=jnp.array([[0.7, -0.3]], jnp.float32),
        radius=jnp.array([0.15], jnp.float32),
        orientation=jnp.array([2.2], jnp.float32),
        linear_velocity=jnp.array([0.6], jnp.float32),
        angular_velocity=jnp.array([0.8], jnp.float32),  # curves the track
        active=jnp.ones((1,), jnp.float32),
    )
    p = problem_with_obstacles(
        cfg, jnp.zeros(3, jnp.float32),
        jnp.asarray([1.2, 0.1, 0.0], jnp.float32), curved,
        inflation_radius=0.25, prediction_dt=cfg.time_step,
        dtype=jnp.float32,
    )
    problems = jax.tree.map(lambda x: x[None], p)
    sol = solve_batch_fused(cfg_aff, problems, interpret=True, bt=8)
    assert not bool(jnp.any(sol.diagnostics.converged))
    assert float(jnp.min(sol.diagnostics.kkt_feasibility)) > 1e-2

    # Straight tracks (zero angular velocity) pass the guard untouched.
    straight = curved._replace(angular_velocity=jnp.zeros((1,), jnp.float32))
    p2 = problem_with_obstacles(
        cfg, jnp.zeros(3, jnp.float32),
        jnp.asarray([1.2, 0.1, 0.0], jnp.float32), straight,
        inflation_radius=0.25, prediction_dt=cfg.time_step,
        dtype=jnp.float32,
    )
    problems2 = jax.tree.map(lambda x: x[None], p2)
    sol2 = solve_batch_fused(cfg_aff, problems2, interpret=True, bt=8)
    ref2 = solve_batch_fused(cfg, problems2, interpret=True, bt=8)
    np.testing.assert_array_equal(
        np.asarray(sol2.diagnostics.converged),
        np.asarray(ref2.diagnostics.converged),
    )


def test_fused_diagnostics_match_jnp_on_same_iterate():
    # ADVICE r2: the in-kernel KKT diagnostics duplicate
    # solver/ipm.py::_diagnostics by hand.  With iterations=0 both backends
    # evaluate diagnostics at the *identical* point (warm start + identical
    # slack/dual init), so every Diagnostics field must agree to f32
    # rounding — a drift in tolerances, s_d scaling, or the adjoint sweep
    # fails loudly here.
    import dataclasses

    cfg0 = MPCConfig(horizon=12, time_step=0.1, max_obstacles=2)
    cfg0 = cfg0.replace(
        solver=dataclasses.replace(cfg0.solver, iterations=0)
    )
    obs = static_set(
        [[0.6, 0.05], [1.8, 1.5]], [0.2, 0.25], max_obstacles=2,
        dtype=jnp.float32,
    )
    ps = []
    for s, g in [((0.0, 0.0, 0.0), (1.2, 0.1, 0.0)),
                 ((0.0, -0.4, 0.5), (1.5, 0.9, 0.0)),
                 ((0.3, 0.2, -1.0), (-0.5, 0.4, 1.0))]:
        ps.append(
            problem_with_obstacles(
                cfg0, jnp.asarray(s, jnp.float32),
                jnp.asarray(g, jnp.float32), obs,
                inflation_radius=0.25, dtype=jnp.float32,
            )
        )
    problems = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    fused = solve_batch_fused(cfg0, problems, interpret=True, bt=8)
    ref = jax.vmap(functools.partial(ipm.solve, cfg0))(problems)
    fd, rd = fused.diagnostics, ref.diagnostics
    np.testing.assert_array_equal(
        np.asarray(fd.converged), np.asarray(rd.converged)
    )
    for name in ("kkt_stationarity", "kkt_feasibility",
                 "kkt_complementarity", "final_cost", "final_mu"):
        np.testing.assert_allclose(
            np.asarray(getattr(fd, name)), np.asarray(getattr(rd, name)),
            rtol=2e-5, atol=1e-6, err_msg=name,
        )


def test_nonfinite_direction_freezes_not_detonates():
    # A goal at 1e19 overflows the f32 cost/merit: every line-search
    # candidate is non-finite.  The all-rejected fallback must then execute
    # alpha = 0 (freeze) rather than the deepest candidate — executing a
    # non-finite direction produces NaN states no later iteration can
    # repair (observed in the closed-loop fleet before the fix).  Both
    # backends must stay finite and report non-convergence honestly.
    cfg = MPCConfig(horizon=8, time_step=0.1)
    p = default_problem(
        cfg, [0.0, 0.0, 0.0], [1e19, 0.0, 0.0], dtype=jnp.float32
    )
    sol = ipm.solve(cfg, p)
    assert bool(jnp.all(jnp.isfinite(sol.states)))
    assert not bool(sol.diagnostics.converged)
    pb = jax.tree.map(lambda x: x[None], p)
    f = solve_batch_fused(cfg, pb, interpret=True, bt=8)
    assert bool(jnp.all(jnp.isfinite(f.states)))
    assert not bool(f.diagnostics.converged[0])


def test_fallback_gate_trips_on_nan_feasibility():
    # agent.apply_solution must route NaN diagnostics to the shifted-plan
    # fallback (`NaN > thresh` is False — the gate is written NaN-safe).
    from kissmpc_tpu import agent as agent_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.solver.problem import Diagnostics, Solution

    cfg = MPCConfig(horizon=5, time_step=0.1)
    params = AgentParams()
    a = agent_mod.init_agent(cfg, jnp.array([1.0, 2.0, 0.0]))
    bad_sol = Solution(
        states=jnp.full((6, 3), jnp.nan),
        controls=jnp.full((5, 2), jnp.nan),
        diagnostics=Diagnostics(
            converged=jnp.asarray(False),
            kkt_stationarity=jnp.asarray(jnp.nan),
            kkt_feasibility=jnp.asarray(jnp.nan),
            kkt_complementarity=jnp.asarray(jnp.nan),
            final_cost=jnp.asarray(jnp.nan),
            final_mu=jnp.asarray(jnp.nan),
        ),
    )
    new, _ = agent_mod.apply_solution(params, a, bad_sol)
    assert bool(jnp.all(jnp.isfinite(new.states_matrix)))
    assert bool(jnp.all(jnp.isfinite(new.controls_matrix)))
