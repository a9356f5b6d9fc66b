"""Worker process for the multi-process distributed test.

Launched by tests/test_multihost.py as:
  python tests/_multihost_worker.py PROCESS_ID NUM_PROCESSES PORT

Each worker owns 4 virtual CPU devices; together they form the 2-host,
8-device pod that `parallel.multihost` manages.  Prints one JSON line of
replicated metrics for the parent to compare against a single-process solve.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.parallel.fleet import make_fleet_solver
    from kissmpc_tpu.parallel.multihost import (
        distribute_local_batch,
        health_check,
        initialize_distributed,
        make_pod_mesh,
    )
    from kissmpc_tpu.scenarios import free_problems

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 4 * num_processes, len(jax.devices())
    assert len(jax.local_devices()) == 4

    mesh = make_pod_mesh()
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.shape == (num_processes, 4)

    cfg = MPCConfig(horizon=10, time_step=0.1)
    # Each host feeds only its own scenarios (per-host seed).
    local = free_problems(cfg, 8, seed=process_id)
    problems = distribute_local_batch(mesh, local)
    assert problems.initial_state.shape[0] == 8 * num_processes

    solver = make_fleet_solver(cfg, mesh, axis_name=("host", "chip"))
    sol, metrics = solver(problems)
    jax.block_until_ready(metrics)

    ok = health_check(mesh)
    out = {
        "process_id": process_id,
        "converged_fraction": float(metrics.converged_fraction),
        "mean_cost": float(metrics.mean_cost),
        "max_kkt_feasibility": float(metrics.max_kkt_feasibility),
        "health": bool(ok),
    }
    print("WORKER " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
