"""CPU experiment: Mehrotra predictor-corrector vs baseline schedule.

Measures converged fraction vs iteration budget for the free and K=8
configs on the jnp path (f32, CPU), counting *Riccati solves* as the cost
unit (one PC iteration = 2 solves), so the comparison is cost-honest.

Run: PYTHONPATH=/root/repo python scripts/exp_mehrotra.py
"""

import dataclasses
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig
from kissmpc_tpu.scenarios import free_problems, obstacle_problems
from kissmpc_tpu.solver.api import make_batch_solver

B = 512


def run(cfg, probs, iters, mode):
    c = cfg.replace(solver=dataclasses.replace(
        cfg.solver, iterations=iters, mehrotra=mode,
        refine_stages=(), mu_sigma_max=0.0,
    ))
    sol = make_batch_solver(c)(probs)
    conv = float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32)))
    feas = float(jnp.max(sol.diagnostics.kkt_feasibility))
    return conv, feas


def sweep(name, cfg, probs):
    print(f"--- {name} ---", flush=True)
    print("mode  iters  solves  conv    maxfeas")
    for mode in ("off", "pc", "soc"):
        for iters in (8, 12, 16, 24, 32, 48):
            t0 = time.time()
            conv, feas = run(cfg, probs, iters, mode)
            solves = iters * (2 if mode != "off" else 1)
            print(f"{mode:5s} {iters:5d} {solves:7d} {conv:7.4f} "
                  f"{feas:9.2e}  ({time.time()-t0:.0f}s)", flush=True)


def main():
    cfg0 = MPCConfig(horizon=50, time_step=0.041)
    pool0 = free_problems(cfg0, B, seed=0)
    sweep("free N=50", cfg0, pool0)

    cfgK = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfgK = cfgK.replace(solver=dataclasses.replace(
        cfgK.solver, mu_sigma_max=0.7))
    poolK = obstacle_problems(cfgK, B, seed=0, n_dynamic=2)
    sweep("obstacles K=8 dyn2", cfgK, poolK)


if __name__ == "__main__":
    main()
