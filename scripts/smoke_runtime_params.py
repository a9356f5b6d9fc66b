"""Smoke test: runtime (iterations, mu_sigma) fused-kernel inputs on TPU.

Small config (fast Mosaic compile) to validate the SMEM trip count +
sigma row before paying the full-size ~800 s compile.  Checks:
  1. compiled kernel matches interpret mode,
  2. a staged-refine solve_batch works end to end,
  3. changing the runtime schedule does NOT trigger a recompile
     (second distinct schedule returns in milliseconds).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig, default_problem
from kissmpc_tpu.ops.pallas.ipm_fused import solve_batch_fused
from kissmpc_tpu.solver.api import make_batch_solver


def main():
    cfg = MPCConfig(horizon=12, time_step=0.1)
    cfg = cfg.replace(
        solver=dataclasses.replace(
            cfg.solver,
            iterations=16,
            mu_sigma_max=0.7,
            refine_stages=((0.5, 24, 0.2), (0.25, 32, 0.7)),
        )
    )
    rng = np.random.default_rng(0)
    B = 256
    ps = [
        default_problem(
            cfg,
            jnp.asarray(rng.uniform(-0.5, 0.5, 3), jnp.float32),
            jnp.asarray(rng.uniform(-1.5, 1.5, 3), jnp.float32),
            dtype=jnp.float32,
        )
        for _ in range(B)
    ]
    problems = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    t0 = time.time()
    sol = solve_batch_fused(cfg, problems, iterations=16, mu_sigma=0.2)
    conv = float(jnp.mean(sol.diagnostics.converged.astype(jnp.float32)))
    print(f"direct fused: compile+run {time.time() - t0:.1f}s conv={conv:.3f}")

    t0 = time.time()
    sol2 = solve_batch_fused(cfg, problems, iterations=24, mu_sigma=0.7)
    conv2 = float(jnp.mean(sol2.diagnostics.converged.astype(jnp.float32)))
    dt = time.time() - t0
    print(f"new schedule, same binary: {dt:.2f}s conv={conv2:.3f} "
          f"({'NO RECOMPILE' if dt < 5 else 'RECOMPILED?'})")

    solver = make_batch_solver(cfg)
    t0 = time.time()
    s3 = solver(problems)
    conv3 = float(jnp.mean(s3.diagnostics.converged.astype(jnp.float32)))
    print(f"staged solve_batch: {time.time() - t0:.1f}s conv={conv3:.3f}")

    ref = solve_batch_fused(cfg, problems, interpret=True)
    du = float(
        jnp.max(jnp.abs(sol.controls - jnp.asarray(np.asarray(ref.controls))))
    )
    print(f"compiled-vs-interpret max|du| {du:.2e}")
    # base conv at 16 iterations is legitimately partial; the staged solve
    # is the convergence criterion, plus bit-parity and binary reuse.
    ok = conv3 > 0.95 and conv3 >= conv and du < 2e-3 and dt < 5
    print("SMOKE", "OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
