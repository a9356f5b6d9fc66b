"""Experiment: slack/dual warm-starting across receding-horizon ticks.

The r4 early-exit probe proved the binding cost of a warm re-solve is NOT
the primal warm start: every solve re-initializes slacks at max(c, 1e-2)
and duals at mu_init/s, so the barrier walks the central path from mu=1
regardless of how good the plan is.  This experiment measures the
headroom of carrying (s, nu) across ticks on the jnp path (CPU, B small):

  tick 1: solve 32 iterations cold -> final iterate (s1, nu1)
  tick 2: advance obstacles one dt, shift the plan one step (the agent's
          carry), rebuild the problem, then solve k iterations with
   A  fresh re-init                    (today's behavior)
   B  time-shifted duals raw, s = max(c, floor)
   B2 time-shifted duals projected toward the central path of the fresh
      slacks (clip to [center/100, center*100], center = mu_w / s_fresh,
      mu_w from the shifted iterate's own mean complementarity) — the
      textbook "clamp warm duals central" mitigation, given its best shot
   C  time-shifted slacks AND duals

for k in {4, 8, 12, 16, 24, 32}, reporting converged fraction per k.  If
B/C reach A@32's convergence at k ~ 8-12, dual warm-starting is worth the
API surgery (Problem fields + kernel inputs + agent carry) in round 5.

Run (CPU):  python scripts/exp_dual_warmstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import functools
import json

import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig
from kissmpc_tpu.obstacles.obstacles import ObstacleSet, advance
from kissmpc_tpu.scenarios import sample_endpoints, sample_obstacle_field
from kissmpc_tpu.solver import ipm
from kissmpc_tpu.solver.problem import problem_with_obstacles

B = 64


def build_problems(cfg, starts, goals, obs, warm=None):
    def one(s, g, o, ws, wc):
        kw = {}
        if ws is not None:
            kw = dict(warm_states=ws, warm_controls=wc)
        return problem_with_obstacles(
            cfg, s, g, o, sensor_radius=5.0, prediction_dt=cfg.time_step,
            inflation_radius=0.4, dtype=jnp.float32,
            complete_warm_start_states=False, **kw,
        )

    if warm is None:
        return jax.jit(jax.vmap(lambda s, g, o: one(s, g, o, None, None)))(
            starts, goals, obs
        )
    return jax.jit(jax.vmap(one))(starts, goals, obs, warm[0], warm[1])


def solve_k(cfg, problem, k, init_override=None):
    """ipm.solve with a custom iteration count and optional custom init."""

    def one(problem, init):
        with jax.default_matmul_precision("float32"):
            it0 = ipm._init_state(cfg, problem)
            if init is not None:
                it0 = it0._replace(**init)
            dtype = it0.states.dtype
            masks = ipm._constraint_masks(cfg, problem, dtype)

            def body(i, it):
                mu = ipm._adaptive_mu(cfg, it, masks, dtype)
                return ipm._iteration(cfg, problem, it, mu)

            it = jax.lax.fori_loop(0, k, body, it0)
            diag = ipm._diagnostics(
                cfg, problem, it, ipm._adaptive_mu(cfg, it, masks, dtype)
            )
            return it, diag

    if init_override is None:
        return jax.jit(jax.vmap(lambda p: one(p, None)))(problem)
    return jax.jit(jax.vmap(one))(problem, init_override)


def shift(x):
    """Receding-horizon one-step shift along the time axis (repeat last)."""
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def main():
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver, iterations=32, mu_sigma_max=0.7
        )
    )
    rng = np.random.default_rng(0)
    starts, goals = sample_endpoints(cfg, B, rng)
    centers, radii, orient, v = sample_obstacle_field(
        starts, goals, 8, rng, n_dynamic=2, inflation=0.4
    )
    obs = ObstacleSet(
        position=jnp.asarray(centers), radius=jnp.asarray(radii),
        orientation=jnp.asarray(orient), linear_velocity=jnp.asarray(v),
        angular_velocity=jnp.zeros((B, 8), jnp.float32),
        active=jnp.ones((B, 8), jnp.float32),
    )
    starts = jnp.asarray(starts)
    goals = jnp.asarray(goals)

    # --- tick 1: cold solve, keep the final internal iterate -------------
    p1 = build_problems(cfg, starts, goals, obs)
    it1, d1 = solve_k(cfg, p1, 32)
    print(
        f"tick1 cold conv@32: "
        f"{float(jnp.mean(d1.converged.astype(jnp.float32))):.4f}",
        flush=True,
    )

    # --- tick 2 world: agent advances one plan step, obstacles move ------
    obs2 = jax.vmap(lambda o: advance(o, cfg.time_step))(obs)
    new_states = shift(it1.states)
    new_controls = shift(it1.controls)
    starts2 = it1.states[:, 1, :]  # executed state = column 1
    p2 = build_problems(
        cfg, starts2, goals, obs2, warm=(new_states, new_controls)
    )

    # Fresh init state (gives the consistent slacks B/B2 start from) and
    # masks for the new problems.
    it0_fresh = jax.jit(jax.vmap(lambda p: ipm._init_state(cfg, p)))(p2)
    masks2 = jax.vmap(
        lambda p: ipm._constraint_masks(cfg, p, jnp.float32)
    )(p2)

    # Warm mu from the SHIFTED iterate's own mean complementarity (what an
    # adaptive-mu solver would see if it trusted the carried point).
    def fam_comp(s_, nu_, m_):
        return jnp.sum(m_ * s_ * nu_, axis=(1, 2)), jnp.sum(m_, axis=(1, 2))

    tot = jnp.zeros((B,), jnp.float32)
    cnt = jnp.zeros((B,), jnp.float32)
    for s_, nu_, m_ in (
        (shift(it1.s_cl), shift(it1.nu_cl), masks2.cl),
        (shift(it1.s_cu), shift(it1.nu_cu), masks2.cu),
        (shift(it1.s_xl), shift(it1.nu_xl), masks2.xl),
        (shift(it1.s_xu), shift(it1.nu_xu), masks2.xu),
        (shift(it1.s_ob), shift(it1.nu_ob), masks2.ob),
    ):
        t_, c_ = fam_comp(s_, nu_, m_)
        tot, cnt = tot + t_, cnt + c_
    mu_w = jnp.clip(0.2 * tot / jnp.maximum(cnt, 1.0), 1e-7, 1.0)  # [B]

    def central_project(nu, s_fresh, mask, kappa=100.0):
        center = mu_w[:, None, None] / jnp.maximum(s_fresh, 1e-10)
        return mask * jnp.clip(nu, center / kappa, center * kappa)

    rows = []
    for k in (4, 8, 12, 16, 24, 32):
        _, dA = solve_k(cfg, p2, k)

        # B: duals shifted raw, slacks consistent with the new constraints
        nu_warm = {
            "nu_cl": shift(it1.nu_cl), "nu_cu": shift(it1.nu_cu),
            "nu_xl": shift(it1.nu_xl), "nu_xu": shift(it1.nu_xu),
            "nu_ob": shift(it1.nu_ob),
        }
        _, dB = solve_k(cfg, p2, k, init_override=nu_warm)

        # B2: shifted duals projected toward the fresh slacks' central path
        nu_proj = {
            "nu_cl": central_project(
                shift(it1.nu_cl), it0_fresh.s_cl, masks2.cl
            ),
            "nu_cu": central_project(
                shift(it1.nu_cu), it0_fresh.s_cu, masks2.cu
            ),
            "nu_xl": central_project(
                shift(it1.nu_xl), it0_fresh.s_xl, masks2.xl
            ),
            "nu_xu": central_project(
                shift(it1.nu_xu), it0_fresh.s_xu, masks2.xu
            ),
            "nu_ob": central_project(
                shift(it1.nu_ob), it0_fresh.s_ob, masks2.ob
            ),
        }
        _, dB2 = solve_k(cfg, p2, k, init_override=nu_proj)

        # C: slacks AND duals shifted (slacks may disagree with c; the
        # consistency term of the merit pulls them together)
        sc_warm = dict(
            nu_warm,
            s_cl=jnp.maximum(shift(it1.s_cl), 1e-8),
            s_cu=jnp.maximum(shift(it1.s_cu), 1e-8),
            s_xl=jnp.maximum(shift(it1.s_xl), 1e-8),
            s_xu=jnp.maximum(shift(it1.s_xu), 1e-8),
            s_ob=jnp.maximum(shift(it1.s_ob), 1e-8),
        )
        _, dC = solve_k(cfg, p2, k, init_override=sc_warm)

        row = {
            "k": k,
            "A_fresh": round(
                float(jnp.mean(dA.converged.astype(jnp.float32))), 4
            ),
            "B_dual_warm": round(
                float(jnp.mean(dB.converged.astype(jnp.float32))), 4
            ),
            "B2_dual_projected": round(
                float(jnp.mean(dB2.converged.astype(jnp.float32))), 4
            ),
            "C_full_warm": round(
                float(jnp.mean(dC.converged.astype(jnp.float32))), 4
            ),
        }
        rows.append(row)
        print("RESULT " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
