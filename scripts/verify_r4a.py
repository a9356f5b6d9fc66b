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

# --- r4 final drive additions (run when invoked with "full") -------------
def fleet_drive():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu import environment as env_mod
    from kissmpc_tpu.agent import AgentParams
    from kissmpc_tpu.obstacles.obstacles import advance
    from kissmpc_tpu.scenarios import episode_worlds

    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    import dataclasses as dc

    cfg = cfg.replace(solver=dc.replace(
        cfg.solver, iterations=32,
        refine_stages=((0.125, 64, 0.2), (0.02, 96, 0.7)),
        mu_sigma_max=0.7, fused_affine_tracks=True,
    ))
    params = AgentParams(
        complete_warm_starts=False, prediction_dt=cfg.time_step,
        stall_skip_ticks=50,
    )
    env, obstacles, info = episode_worlds(
        cfg, 512, n_waypoints=3, seed=3, n_dynamic=2,
        route_around_obstacles=True, router="grid", return_info=True,
    )
    print(f"fleet worlds: W={env.waypoints.shape[1]} "
          f"leg_reachable={np.asarray(info['leg_reachable']).mean():.3f}",
          flush=True)
    step = jax.jit(lambda e, o: env_mod.fleet_step(cfg, params, e, o))
    adv = jax.jit(jax.vmap(lambda o: advance(o, cfg.time_step)))
    for t in range(5):
        env, si = step(env, obstacles)
        obstacles = adv(obstacles)
    conv = float(jnp.mean(si.diagnostics.converged.astype(jnp.float32)))
    print(f"fleet 5 ticks: conv={conv:.4f} "
          f"done={float(jnp.mean(si.final_goal_reached.astype(jnp.float32))):.3f}",
          flush=True)
    assert conv > 0.97, conv
    print("FLEET DRIVE OK", flush=True)


if __name__ == "__main__" and "full" in sys.argv:
    fleet_drive()
