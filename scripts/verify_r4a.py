"""Verify drive (r4 phase A): public API on the real TPU chip.

Exercises the paths touched by the ADVICE fixes: a refine stage whose
mu_sigma exceeds mu_sigma_max (runtime sigma row on the fused kernel, config
fold on the jnp path), sigma-row padding at a non-tile-aligned batch, and
the _dispatch array guard.
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()
import jax
import jax.numpy as jnp

from kissmpc_tpu import MPCConfig, default_problem, make_solver, make_batch_solver
from kissmpc_tpu import scenarios

print(f"devices: {jax.devices()} ({time.time()-t0:.1f}s)", flush=True)

cfg = MPCConfig(horizon=50, time_step=0.041)
sol = make_solver(cfg)(default_problem(cfg, [0, 0, 0], [2, 1, 0]))
d = sol.diagnostics
print(
    f"single: conv={bool(d.converged)} stat={float(d.kkt_stationarity):.2e} "
    f"feas={float(d.kkt_feasibility):.2e}", flush=True,
)

# Batched K=8 with a refine stage ABOVE the adaptive cap (the fixed corner)
# at a batch size that does NOT divide the tile (exercises sigma-row pad).
cfgK = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
cfgK = cfgK.replace(
    solver=dataclasses.replace(
        cfgK.solver,
        mu_sigma_max=0.7,
        refine_stages=((0.125, 64, 0.2), (0.02, 96, 0.9)),
    )
)
problems = scenarios.obstacle_problems(cfgK, 1000, seed=7, n_dynamic=2)
solver = make_batch_solver(cfgK)
out = solver(problems)
conv = float(jnp.mean(out.diagnostics.converged.astype(jnp.float32)))
v = np.asarray(out.controls[..., 0])
print(
    f"batch K=8 B=1000 (stage sigma 0.9 > cap 0.7): conv={conv:.4f} "
    f"v_max={v.max():.3f} (bound 0.5)", flush=True,
)
assert conv > 0.97, conv
assert v.max() <= 0.5 + 1e-4

# _dispatch guard: array mu_sigma on the jnp path must refuse loudly.
from kissmpc_tpu.solver.api import _dispatch

cfg_split = cfgK.replace(
    solver=dataclasses.replace(cfgK.solver, solve_backend="split",
                               refine_stages=())
)
small = jax.tree.map(lambda x: x[:4], problems)
try:
    _dispatch(cfg_split, small, mu_sigma=jnp.full((4,), 0.5, jnp.float32))
    print("GUARD FAILED: array mu_sigma accepted on jnp path", flush=True)
    raise SystemExit(1)
except ValueError as e:
    print(f"guard ok: {e}", flush=True)

print(f"VERIFY OK ({time.time()-t0:.1f}s)", flush=True)
