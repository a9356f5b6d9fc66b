"""CPU experiment: mu_init / mu_sigma grid vs iteration budget (baseline mode).

Probes whether the fixed barrier-walk from mu_init=1.0 is what burns the
early iterations (r5; see SCALING.md).

Run: PYTHONPATH=/root/repo python scripts/exp_schedule_init.py
"""

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from kissmpc_tpu import MPCConfig
from kissmpc_tpu.scenarios import free_problems, obstacle_problems
from kissmpc_tpu.solver.api import make_batch_solver

B = 512


def run(cfg, probs, iters, mu_init, mu_sigma, msm):
    c = cfg.replace(solver=dataclasses.replace(
        cfg.solver, iterations=iters, mu_init=mu_init, mu_sigma=mu_sigma,
        refine_stages=(), mu_sigma_max=msm,
    ))
    sol = make_batch_solver(c)(probs)
    return (float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32))),
            float(jnp.max(sol.diagnostics.kkt_feasibility)))


def sweep(name, cfg, probs, msm):
    print(f"--- {name} (mu_sigma_max={msm}) ---", flush=True)
    print("mu_init mu_sig  it12    it16    it20    it24    it32")
    for mu_init in (1.0, 0.3, 0.1, 0.03, 0.01):
        for mu_sigma in (0.2, 0.1, 0.05):
            row = []
            for iters in (12, 16, 20, 24, 32):
                conv, _ = run(cfg, probs, iters, mu_init, mu_sigma, msm)
                row.append(f"{conv:7.4f}")
            print(f"{mu_init:7.2f} {mu_sigma:6.2f} " + " ".join(row),
                  flush=True)


def main():
    cfg0 = MPCConfig(horizon=50, time_step=0.041)
    pool0 = free_problems(cfg0, B, seed=0)
    sweep("free N=50", cfg0, pool0, 0.0)

    cfgK = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    poolK = obstacle_problems(cfgK, B, seed=0, n_dynamic=2)
    sweep("obstacles K=8 dyn2", cfgK, poolK, 0.7)


if __name__ == "__main__":
    main()
