"""Verification drive of the public kissmpc_tpu API (verify skill).

CPU mode (default): forces the 8-device CPU mesh and drives single/batched/
sharded solves, the episode loop, scenario generation (incl. the K=0
return_info path), and the driver entry points.

TPU mode (--tpu): drives the fused production batched solve + an episode
tick on the real chip.
"""

import dataclasses
import sys

TPU = "--tpu" in sys.argv

import jax

if not TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig, default_problem, make_solver
from kissmpc_tpu.config import SolverConfig
from kissmpc_tpu.solver.api import make_batch_solver

print(f"platform: {jax.devices()[0].platform} x{len(jax.devices())}",
      flush=True)

# --- single solve -----------------------------------------------------------
cfg = MPCConfig(horizon=50, time_step=0.041,
                solver=SolverConfig(mu_min=1e-7, kkt_tol=1e-3))
sol = make_solver(cfg)(default_problem(cfg, [0., 0., 0.], [2., 1., 0.]))
d = sol.diagnostics
print(f"single: converged={bool(d.converged)} stat={float(d.kkt_stationarity):.2e} "
      f"feas={float(d.kkt_feasibility):.2e}", flush=True)
assert bool(d.converged), "single solve did not converge"

# --- batched solve (fused on TPU) ------------------------------------------
from kissmpc_tpu.scenarios import free_problems

B = 512 if TPU else 64
# production-style staged refinement (bench.py STAGES_FREE analogue)
cfgb = cfg.replace(solver=dataclasses.replace(
    cfg.solver, refine_stages=((0.1, 64, 0.5),)))
probs = free_problems(cfgb, B, seed=3)
bsol = make_batch_solver(cfgb)(probs)
frac = float(jnp.mean(bsol.diagnostics.converged))
v = bsol.controls[..., 0]
vlb = probs.control_lower[..., 0:1]
vub = probs.control_upper[..., 0:1]
bound_ok = bool(jnp.all((v >= vlb - 1e-3) & (v <= vub + 1e-3)))
print(f"batch B={B}: converged={frac:.3f} bounds_ok={bound_ok}", flush=True)
assert frac > 0.95 and bound_ok

# --- episode loop + scenario generation -------------------------------------
from kissmpc_tpu.scenarios import episode_worlds
from kissmpc_tpu import environment as env_mod
from kissmpc_tpu.agent import AgentParams

cfgo = MPCConfig(horizon=20, time_step=0.1, max_obstacles=4,
                 solver=SolverConfig(mu_min=1e-7, kkt_tol=1e-3))
env, obs, info = episode_worlds(
    cfgo, 8, n_waypoints=2, seed=0, n_dynamic=1,
    route_around_obstacles=True, router="grid", return_info=True,
)
reach = np.asarray(info["leg_reachable"])
assert reach.dtype == bool and reach.shape[0] == 8
# K = 0 path of the same API (ADVICE r4 regression)
cfg0 = MPCConfig(horizon=10, time_step=0.1, max_obstacles=0)
_, _, info0 = episode_worlds(cfg0, 4, n_waypoints=3, seed=0,
                             return_info=True)
assert np.asarray(info0["leg_reachable"]).dtype == bool

params = AgentParams()
step = jax.jit(lambda e, o: env_mod.fleet_step(cfgo, params, e, o))
done = 0.0
for t in range(30):
    env, sinfo = step(env, obs)
    done = float(jnp.mean(sinfo.final_goal_reached.astype(jnp.float32)))
print(f"episode: done_frac@30={done:.2f} "
      f"at_goal_any={bool(jnp.any(sinfo.final_goal_reached))}", flush=True)
assert done > 0.0, "no episode reached its final goal in 30 ticks"

if not TPU:
    # --- sharded fleet solve on the 8-device mesh ---------------------------
    from kissmpc_tpu.parallel.fleet import make_fleet_solver, make_mesh

    mesh = make_mesh()
    # refine stages pick their top-k tail per shard, and f32 lets marginal
    # scenarios diverge between fusion layouts — the exact-equivalence
    # contract (test_fleet.py) is refinement-off + f64.
    jax.config.update("jax_enable_x64", True)
    probs64 = free_problems(cfg, B, seed=3, dtype=jnp.float64)
    fsol, fmetrics = make_fleet_solver(cfg, mesh)(probs64)
    print(f"fleet metrics: conv={float(fmetrics.converged_fraction):.3f}",
          flush=True)
    ref = make_batch_solver(cfg)(probs64)
    np.testing.assert_allclose(
        np.asarray(fsol.controls), np.asarray(ref.controls),
        rtol=0, atol=1e-10,
    )
    print("sharded == unsharded f64 (atol 1e-10): ok", flush=True)

    # --- driver entry points ------------------------------------------------
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    print(f"entry(): ok ({jax.tree.map(lambda x: x.shape, out)})", flush=True)
    ge.dryrun_multichip(8)
    print("dryrun_multichip(8): ok", flush=True)

print("VERIFY DRIVE PASSED", flush=True)
