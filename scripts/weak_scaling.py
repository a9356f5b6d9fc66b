"""Virtual-mesh weak scaling of the fleet episode tick (VERDICT r4 #5).

Fixed per-device batch over 1/2/4/8 CPU devices: if the fleet tick has no
hidden cross-device serialization, tick wall time stays ~flat while total
throughput scales with the mesh.  Also counts the collective ops in the
compiled HLO: the solve itself must be collective-free (metrics are the
only reduction — one pmean/pmax set per tick).

CPU-device weak scaling is a *correctness-of-structure* probe, not a
hardware number: 2-core host, so 8 virtual devices oversubscribe the
machine and wall time grows with total work.  The HLO collective census is
the load-bearing assertion; the table documents the trend.

Run: PYTHONPATH=/root/repo python scripts/weak_scaling.py
"""

import dataclasses
import re
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from kissmpc_tpu import MPCConfig
from kissmpc_tpu.agent import AgentParams
from kissmpc_tpu.parallel.fleet import make_fleet_env_stepper, make_mesh
from kissmpc_tpu.scenarios import episode_worlds

PER_DEVICE = 64
COLLECTIVE_RE = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
)


def main():
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(solver=dataclasses.replace(
        cfg.solver, iterations=32, mu_sigma_max=0.7))
    params = AgentParams(prediction_dt=cfg.time_step,
                         complete_warm_starts=False)

    print("devices  batch  collectives  tick_ms(med of 5)  ticks/s  conv")
    rows = []
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:nd])
        B = PER_DEVICE * nd
        env, obs = episode_worlds(cfg, B, n_waypoints=2, seed=0,
                                  n_dynamic=2)
        stepper = make_fleet_env_stepper(cfg, params, mesh)
        lowered = stepper.lower(env, obs)
        hlo = lowered.compile().as_text()
        colls = COLLECTIVE_RE.findall(hlo)
        n_coll = len(colls)
        env2, info, metrics = stepper(env, obs)
        jax.block_until_ready(env2)
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            env2, info, metrics = stepper(env2, obs)
            jax.block_until_ready(env2)
            lat.append(time.perf_counter() - t0)
        med = float(np.median(lat))
        conv = float(metrics.converged_fraction)
        rows.append((nd, B, n_coll, med))
        print(f"{nd:7d} {B:6d} {n_coll:12d} {med*1e3:17.1f} "
              f"{B/med:8.0f} {conv:.3f}", flush=True)

    # Structure assertions (mirrored in tests/test_fleet.py): the tick's
    # collective census must be CONSTANT in mesh size (the fixed metric
    # reduction set — pmean/pmax lower to all-reduce even on 1 device) and
    # small; any growth means cross-device traffic leaked into the solve.
    counts = [r[2] for r in rows]
    assert len(set(counts)) == 1, (
        f"collective count varies with mesh size ({counts}): "
        "cross-device traffic leaked into the solve"
    )
    assert counts[0] <= 16, counts
    print("WEAK SCALING STRUCTURE OK")


if __name__ == "__main__":
    main()
