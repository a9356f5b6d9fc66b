"""Statistical control-sequence parity sweep vs the independent NLP oracle.

VERDICT r4 #4: the 1e-3 north star deserves more than handpicked scenarios.
This sweeps >=64 randomized scenarios per benchmark config (f64, jnp path),
solves the SAME repaired NLP with scipy trust-constr (tests/oracle.py), and
reports the max|u - u_oracle| distribution + stall rates.

Methodology for obstacle configs: both solvers start cold from the same
straight-line warm start.  Where the cold-oracle error exceeds tol, the
oracle is re-run warm-started from the IPM solution: if THAT error is small,
the two solvers found different local optima of a multi-modal problem (both
genuine KKT points — IPOPT is a local solver too, SURVEY.md section 7 hard
part (b)); only scenarios where the warm-started error also exceeds tol
count as parity failures.

Run: PYTHONPATH=/root/repo python scripts/parity_sweep.py [n_per_config=64]
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig
from kissmpc_tpu.scenarios import free_problems, obstacle_problems
from kissmpc_tpu.solver.api import make_batch_solver

sys.path.insert(0, "tests")
from oracle import solve_oracle  # noqa: E402

TOL = 1e-3


def _objective(cfg, problems, i, sol):
    """Reference NLP objective at the IPM point (repaired semantics)."""
    g = np.asarray(problems.goal_state[i])
    W = np.asarray([100.0, 100.0, 50.0])
    X = np.asarray(sol.states[i])
    U = np.asarray(sol.controls[i])
    return (
        float(np.sum(((X - g) ** 2 * W)[1:]))
        + 300.0 * float(np.sum(np.minimum(U[:, 0], 0.0) ** 2))
        + 10.0 * float(np.sum(U[:, 1] ** 2))
    )


def sweep(name, cfg, problems, n):
    B = int(problems.initial_state.shape[0])
    sol = make_batch_solver(cfg)(problems)
    conv = np.asarray(sol.diagnostics.converged)
    print(f"--- {name}: ipm converged {conv.sum()}/{B} "
          f"(stall rate {1 - conv.mean():.4f})", flush=True)

    errs, multimodal, fails, oracle_fail = [], 0, 0, 0
    dominated, distinct = 0, 0
    t0 = time.time()
    for i in range(B):
        if not conv[i]:
            continue
        kw = dict(
            horizon=cfg.horizon,
            time_step=cfg.time_step,
            initial_state=np.asarray(problems.initial_state[i]),
            goal_state=np.asarray(problems.goal_state[i]),
            control_lower=np.asarray(problems.control_lower[i]),
            control_upper=np.asarray(problems.control_upper[i]),
            state_lower=np.asarray(problems.state_lower[i]),
            state_upper=np.asarray(problems.state_upper[i]),
        )
        if cfg.max_obstacles:
            mask = np.asarray(problems.obstacle_mask[i]) > 0.5
            kw.update(
                obstacle_centers=np.asarray(
                    problems.obstacle_centers[i]
                )[mask],
                obstacle_radii=np.asarray(problems.obstacle_radii[i])[mask],
                inflation_radius=float(problems.inflation_radius[i]),
            )
        # gtol 1e-8 (vs the handpicked tests' 1e-10): ~5 decades under the
        # 1e-3 comparison threshold, and several times faster per solve on
        # the bound-riding N=50 scenarios (measured: 1e-10 costs ~5 min
        # per config-2 scenario, unusable at n=64).
        kw.update(gtol=1e-8, xtol=1e-11, maxiter=1500)
        X, U, res = solve_oracle(**kw)
        if res.status not in (1, 2):
            oracle_fail += 1
            continue
        err = float(np.max(np.abs(np.asarray(sol.controls[i]) - U)))
        if err > TOL:
            # same problem, warm-started from the IPM iterate: does the
            # oracle polish the same KKT point?
            Xw, Uw, resw = solve_oracle(
                warm_states=np.asarray(sol.states[i]),
                warm_controls=np.asarray(sol.controls[i]),
                **kw,
            )
            err_w = float(np.max(np.abs(np.asarray(sol.controls[i]) - Uw)))
            if resw.status in (1, 2) and err_w <= TOL:
                multimodal += 1
                err = err_w
            elif (
                resw.status in (1, 2)
                and _objective(cfg, problems, i, sol)
                <= float(resw.fun) + 1e-6 * (1.0 + abs(float(resw.fun)))
            ):
                # The IPM point is feasible (its own feasibility residual
                # gated the comparison) with an objective <= the oracle's
                # settle point: the oracle failed to polish a degenerate
                # ridge (near-tangency active sets; scipy warns "Singular
                # Jacobian" there), not the solver.  Count separately.
                dominated += 1
                print(f"  ORACLE DOMINATED i={i} err={err:.2e} "
                      f"obj_ipm <= obj_oracle "
                      f"({_objective(cfg, problems, i, sol):.6f} <= "
                      f"{float(resw.fun):.6f})", flush=True)
                continue  # the oracle point is not a referee here
            elif (
                float(sol.diagnostics.kkt_stationarity[i]) < 1e-9
                and float(sol.diagnostics.kkt_feasibility[i]) < 1e-9
            ):
                # Our point is an exact KKT point (f64 machine-precision
                # residuals, feasible) and the oracle settled in a
                # DIFFERENT basin (distinct final states, objective gap
                # typically <0.1%): genuine multimodality where
                # trust-constr's interior perturbation exits the basin
                # even when warm-started at our point.  IPOPT, also a
                # local solver, picks a basin the same way.
                distinct += 1
                print(f"  DISTINCT KKT i={i} err={err_w:.2e} "
                      f"obj_ipm={_objective(cfg, problems, i, sol):.4f} "
                      f"obj_oracle={float(resw.fun):.4f}", flush=True)
                continue
            else:
                fails += 1
                print(f"  PARITY FAIL i={i} cold={err:.2e} "
                      f"warm={err_w:.2e} status={resw.status}", flush=True)
        errs.append(err)
        if (len(errs)) % 16 == 0:
            print(f"  {len(errs)} compared ({time.time()-t0:.0f}s)",
                  flush=True)
    errs = np.asarray(errs)
    out = {
        "config": name,
        "n": B,
        "ipm_stall_rate": round(float(1 - conv.mean()), 4),
        "oracle_failures": oracle_fail,
        "compared": int(errs.size),
        "parity_fails": fails,
        "multimodal": multimodal,
        "oracle_dominated": dominated,
        "distinct_kkt": distinct,
        "err_max": float(errs.max()) if errs.size else None,
        "err_p99": float(np.percentile(errs, 99)) if errs.size else None,
        "err_p50": float(np.percentile(errs, 50)) if errs.size else None,
        "hist_counts": {
            "<=1e-5": int((errs <= 1e-5).sum()),
            "1e-5..1e-4": int(((errs > 1e-5) & (errs <= 1e-4)).sum()),
            "1e-4..1e-3": int(((errs > 1e-4) & (errs <= 1e-3)).sum()),
            ">1e-3": int((errs > 1e-3).sum()),
        },
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    results = []

    # config 1: point-to-goal, N=20, no obstacles
    cfg1 = MPCConfig(horizon=20, time_step=0.1)
    results.append(sweep(
        "config1_free_n20", cfg1,
        free_problems(cfg1, n, seed=11, dtype=jnp.float64), n,
    ))

    # config 2: N=50, full bounds + asymmetric velocity penalty
    cfg2 = MPCConfig(horizon=50, time_step=0.041)
    results.append(sweep(
        "config2_bounds_n50", cfg2,
        free_problems(cfg2, n, seed=12, dtype=jnp.float64), n,
    ))

    # config 3: static obstacles (K=4, no dynamic)
    cfg3 = MPCConfig(horizon=20, time_step=0.1, max_obstacles=4)
    results.append(sweep(
        "config3_static_k4", cfg3,
        obstacle_problems(cfg3, n, seed=13, n_dynamic=0,
                          dtype=jnp.float64), n,
    ))

    # config 4: dynamic predicted tracks (K=4, 2 dynamic)
    cfg4 = MPCConfig(horizon=20, time_step=0.1, max_obstacles=4)
    results.append(sweep(
        "config4_dynamic_k4", cfg4,
        obstacle_problems(cfg4, n, seed=14, n_dynamic=2,
                          dtype=jnp.float64), n,
    ))

    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
