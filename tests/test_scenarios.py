"""Scenario generation + second-chance refinement.

The obstacle scenario generator must produce *feasible* NLPs (pinned start
clear of every obstacle track — an infeasible start benchmarks the generator,
not the solver), and `solve_batch` with ``refine_fraction`` must strictly
improve convergence while leaving untouched scenarios bit-identical.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig
from kissmpc_tpu.scenarios import free_problems, obstacle_problems
from kissmpc_tpu.solver.api import make_batch_solver


def _cfg(**kw):
    base = MPCConfig(horizon=16, time_step=0.1, max_obstacles=4)
    if kw:
        base = base.replace(solver=dataclasses.replace(base.solver, **kw))
    return base


def test_obstacle_scenarios_start_feasible():
    cfg = _cfg()
    B = 64
    problems = obstacle_problems(cfg, B, seed=3, n_dynamic=2)
    # stay-at-start clearance: min over (t, k) of |start - track| - r - infl
    p0 = np.asarray(problems.initial_state)[:, None, None, :2]
    tr = np.swapaxes(np.asarray(problems.obstacle_centers), 1, 2)  # [B,N,K,2]
    sd = (
        np.linalg.norm(tr - p0, axis=-1)
        - np.asarray(problems.obstacle_radii)[:, None, :]
        - np.asarray(problems.inflation_radius)[:, None, None]
    )
    mask = np.asarray(problems.obstacle_mask)[:, None, :] > 0.5
    sd = np.where(mask, sd, np.inf)
    assert sd.min() > 0.1, f"start swept by an obstacle track: {sd.min()}"


def test_obstacle_scenarios_warm_start_feasible():
    cfg = _cfg()
    problems = obstacle_problems(cfg, 32, seed=1, n_dynamic=2)
    # the completed warm start must have zero defects and clearance >= 0
    from kissmpc_tpu.models import unicycle

    d = jax.vmap(
        lambda s, c: unicycle.defects(s, c, cfg.time_step)
    )(problems.warm_states, problems.warm_controls)
    assert float(jnp.max(jnp.abs(d))) < 1e-5
    p = np.asarray(problems.warm_states)[:, 1:, :2]
    tr = np.swapaxes(np.asarray(problems.obstacle_centers), 1, 2)
    sd = (
        np.linalg.norm(p[:, :, None, :] - tr, axis=-1)
        - np.asarray(problems.obstacle_radii)[:, None, :]
        - np.asarray(problems.inflation_radius)[:, None, None]
    )
    mask = np.asarray(problems.obstacle_mask)[:, None, :] > 0.5
    sd = np.where(mask, sd, np.inf)
    assert sd.min() > -1e-4, f"warm start violates clearance: {sd.min()}"


def test_refine_improves_convergence_and_preserves_rest():
    B = 32
    base = _cfg(iterations=8)
    problems = obstacle_problems(base, B, seed=0, n_dynamic=1)
    sol0 = make_batch_solver(base)(problems)
    c0 = np.asarray(sol0.diagnostics.converged)
    assert not c0.all(), "need a non-trivial tail for this test"

    cfg_r = _cfg(iterations=8, refine_fraction=0.5, refine_iterations=24)
    sol_r = make_batch_solver(cfg_r)(problems)
    c_r = np.asarray(sol_r.diagnostics.converged)
    assert c_r.sum() > c0.sum(), (c0.sum(), c_r.sum())
    # every scenario converged in pass 1 stays bit-identical
    same = np.all(
        np.asarray(sol_r.controls) == np.asarray(sol0.controls), axis=(1, 2)
    )
    assert same[c0].all()
    # refinement never un-converges anything
    assert (c_r | ~c0).all()


def test_refine_noop_when_all_converged():
    cfg = MPCConfig(horizon=12, time_step=0.1)
    cfg_r = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver, refine_fraction=0.25, refine_iterations=8
        )
    )
    problems = free_problems(cfg, 16, seed=0)
    sol0 = make_batch_solver(cfg)(problems)
    assert bool(jnp.all(sol0.diagnostics.converged))
    sol_r = make_batch_solver(cfg_r)(problems)
    np.testing.assert_array_equal(
        np.asarray(sol_r.controls), np.asarray(sol0.controls)
    )


def test_refine_stages_chain():
    # staged refinement strictly improves on the single stage and preserves
    # already-converged scenarios bit-identically
    B = 32
    base = _cfg(iterations=8)
    problems = obstacle_problems(base, B, seed=0, n_dynamic=1)
    sol0 = make_batch_solver(base)(problems)
    c0 = np.asarray(sol0.diagnostics.converged)

    cfg_s = _cfg(
        iterations=8,
        refine_stages=((0.5, 16, 0.2), (0.25, 24, 0.7)),
    )
    sol_s = make_batch_solver(cfg_s)(problems)
    c_s = np.asarray(sol_s.diagnostics.converged)
    assert c_s.sum() > c0.sum()
    # the 1-stage prefix of the chain is bounded by the 2-stage chain
    cfg_1 = _cfg(iterations=8, refine_stages=((0.5, 16, 0.2),))
    c_1 = np.asarray(
        make_batch_solver(cfg_1)(problems).diagnostics.converged
    )
    assert c_s.sum() >= c_1.sum()
    # stage list supersedes the legacy pair
    same = np.all(
        np.asarray(sol_s.controls) == np.asarray(sol0.controls), axis=(1, 2)
    )
    assert same[c0].all()
    assert (c_s | ~c0).all()


def test_route_waypoints_detours_blocked_legs():
    import numpy as np

    from kissmpc_tpu.scenarios import route_waypoints

    starts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
    waypoints = np.tile(
        np.array([[[2.0, 0.0, 0.0]]], np.float32), (2, 1, 1)
    )  # one leg straight +x
    # Episode 0: circle dead on the leg; episode 1: circle far away.
    centers = np.array([[[1.0, 0.05]], [[1.0, 5.0]]], np.float32)
    radii = np.full((2, 1), 0.3, np.float32)
    mask = np.ones((2, 1), bool)
    out = route_waypoints(starts, waypoints, centers, radii, mask, 0.4)
    assert out.shape == (2, 2, 3)
    # Blocked leg: detour clears the inflated disk with margin.
    d0 = np.linalg.norm(out[0, 0, :2] - centers[0, 0])
    assert d0 >= 0.3 + 0.4 + 0.25 - 1e-5
    # Detour keeps to the side the center leans away from (y > 0 center
    # leans +y at the foot... away = foot - center points -y):
    assert out[0, 0, 1] < 0.0
    # Unblocked leg: midpoint.
    np.testing.assert_allclose(out[1, 0, :2], [1.0, 0.0], atol=1e-6)
    # Hops preserved in the interleave.
    np.testing.assert_allclose(out[:, 1], waypoints[:, 0], atol=0)


def test_episode_worlds_route_flag():
    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.scenarios import episode_worlds

    cfg = MPCConfig(horizon=10, time_step=0.1, max_obstacles=4)
    env, obs = episode_worlds(
        cfg, 8, n_waypoints=2, seed=1, n_dynamic=1,
        route_around_obstacles=True,
    )
    assert env.waypoints.shape == (8, 4, 3)  # detour-before-hop interleave
    assert bool(jnp.all(jnp.isfinite(env.waypoints)))


def test_production_schedule_stall_rate_bound():
    # Regression bound for the adversarial stall rate (VERDICT r4 weak #5):
    # the production obstacle schedule (32 iters + staged refine + adaptive
    # sigma, bench.py STAGES_OBST) converges every scenario of a B=384
    # random K=8 field batch on the jnp path at f32 (calibrated r5: 1.000
    # across seeds 0-2 at B=256).  A solver change that doubles the ~1%
    # B=8192 tail stall rate shows up here as conv < 0.99 and fails.
    import dataclasses

    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.scenarios import obstacle_problems
    from kissmpc_tpu.solver.api import make_batch_solver

    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, iterations=32, mu_sigma_max=0.7,
        refine_stages=(
            (0.125, 64, 0.2), (0.04, 96, 0.7), (0.02, 128, 0.5)
        ),
    ))
    probs = obstacle_problems(cfg, 384, seed=0, n_dynamic=2)
    sol = make_batch_solver(cfg)(probs)
    conv = float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32)))
    assert conv >= 0.99, f"stall-rate regression: converged {conv:.4f}"


def test_lab_worlds_generator():
    # scenarios.lab_worlds: the reference's own lab map at fleet scale
    # (config 3).  Feasible starts/goals, planner-routed chains, per-episode
    # nearest circles, and a few episode ticks that keep solving.
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.scenarios import lab_worlds

    map_path = "/root/reference/obstacle_handling/rrc_lab.pgm"
    if not os.path.exists(map_path):
        import pytest

        pytest.skip("reference lab map not available")
    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=4)
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, iterations=16))
    env, obstacles, winfo = lab_worlds(
        cfg, 6, circles_per_episode=12, max_circles=200, seed=0,
    )
    assert obstacles.position.shape == (6, 12, 2)
    assert winfo["leg_reachable"].all()
    # every start clears its own circle set by the inflated margin
    start = np.asarray(env.agent.states_matrix[:, 0, :2])
    d = np.linalg.norm(
        start[:, None, :] - np.asarray(obstacles.position), axis=-1
    ) - np.asarray(obstacles.radius)
    assert d.min() > 0.4, d.min()
    params = AgentParams(
        complete_warm_starts=False,
        state_bounds=(-10.0, float(winfo["extent"].max()) + 10.0),
    )
    step = jax.jit(lambda e: env_mod.fleet_step(cfg, params, e, obstacles))
    for _ in range(3):
        env, info = step(env)
    assert float(jnp.mean(
        info.diagnostics.converged.astype(jnp.float32))) > 0.8


def test_lab_worlds_with_dynamic_humans():
    # config 4 at lab scale: lab circles + walking humans near the route;
    # humans never cover the pinned start, and episodes keep solving while
    # the world advances.
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.obstacles.obstacles import advance
    from kissmpc_tpu.scenarios import lab_worlds

    map_path = "/root/reference/obstacle_handling/rrc_lab.pgm"
    if not os.path.exists(map_path):
        import pytest

        pytest.skip("reference lab map not available")
    cfg = MPCConfig(horizon=12, time_step=0.1, max_obstacles=4)
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, iterations=16))
    env, obstacles, winfo = lab_worlds(
        cfg, 6, circles_per_episode=10, max_circles=200, seed=1,
        n_dynamic=2,
    )
    assert obstacles.position.shape == (6, 12, 2)
    assert bool(jnp.all(obstacles.linear_velocity[:, -2:] > 0.0))
    assert bool(jnp.all(obstacles.radius[:, -2:] == 0.3))
    # humans clear the pinned start by the inflated margin
    start = np.asarray(env.agent.states_matrix[:, 0, :2])
    h = np.asarray(obstacles.position[:, -2:])
    d = np.linalg.norm(h - start[:, None, :], axis=-1)
    assert d.min() > 0.3 + 0.4, d.min()
    params = AgentParams(
        complete_warm_starts=False, prediction_dt=cfg.time_step,
        state_bounds=(-10.0, float(winfo["extent"].max()) + 10.0),
    )

    def tick(e, o):
        e2, info = env_mod.fleet_step(cfg, params, e, o)
        return e2, jax.vmap(lambda x: advance(x, cfg.time_step))(o), info

    step = jax.jit(tick)
    for _ in range(3):
        env, obstacles, info = step(env, obstacles)
    assert float(jnp.mean(
        info.diagnostics.converged.astype(jnp.float32))) > 0.8
