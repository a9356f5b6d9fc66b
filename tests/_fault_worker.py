"""Worker for the failure-injection drill (tests/test_multihost.py).

Launched as: python tests/_fault_worker.py PROCESS_ID NUM_PROCESSES PORT DIR

Two processes form a 2-host virtual pod.  Both solve a sharded batch and
checkpoint their local fleet shard (a FleetCheckpoint pytree, npz-serialized
per process — each host persists only what it can address).  Then process 1
dies hard (os._exit), simulating a host crash; process 0 must *detect* the
dead peer via `health_check`'s timeout (the collective hangs; without the
timeout this test would never return) and *recover* by resuming its own
shard from the checkpoint on local devices only — no collectives, so the
surviving host makes progress with the peer gone.
"""

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _save_local(path, tree):
    flat, treedef = __import__("jax").tree.flatten(tree)
    import numpy as np

    with open(path + ".npz", "wb") as f:
        np.savez(f, *[np.asarray(x) for x in flat])
    with open(path + ".tree", "wb") as f:
        pickle.dump(treedef, f)


def _load_local(path):
    import jax
    import numpy as np

    with open(path + ".tree", "rb") as f:
        treedef = pickle.load(f)
    data = np.load(path + ".npz")
    return jax.tree.unflatten(treedef, [data[k] for k in data.files])


def main(process_id: int, num_processes: int, port: int, workdir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    import jax.numpy as jnp

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.parallel.fleet import make_fleet_solver
    from kissmpc_tpu.parallel.multihost import (
        distribute_local_batch,
        health_check,
        initialize_distributed,
        make_pod_mesh,
    )
    from kissmpc_tpu.scenarios import free_problems
    from kissmpc_tpu.solver.api import make_batch_solver
    from kissmpc_tpu.utils.checkpoint import FleetCheckpoint

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    mesh = make_pod_mesh()
    cfg = MPCConfig(horizon=8, time_step=0.1)
    local = free_problems(cfg, 8, seed=process_id)
    problems = distribute_local_batch(mesh, local)
    solver = make_fleet_solver(cfg, mesh, axis_name=("host", "chip"))
    sol, metrics = solver(problems)
    jax.block_until_ready(metrics)
    healthy_before = health_check(mesh, timeout_s=30.0)

    # Checkpoint the local fleet shard: warm-start the local problems from
    # the locally addressable slice of the (sharded) solution — each host
    # persists only rows it can address, no cross-host gathers.
    import numpy as np

    def local_rows(x):
        shards = sorted(
            x.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    resumable = local._replace(
        warm_states=jnp.asarray(local_rows(sol.states)),
        warm_controls=jnp.asarray(local_rows(sol.controls)),
    )
    ckpt = FleetCheckpoint(
        env_state=resumable,
        rng_key=jax.random.PRNGKey(process_id),
        scenario_cursor=jnp.asarray(8, jnp.int32),
        tick=jnp.asarray(1, jnp.int32),
    )
    _save_local(os.path.join(workdir, f"shard_{process_id}"), ckpt)
    with open(os.path.join(workdir, f"metrics_{process_id}.json"), "w") as f:
        json.dump(
            {"converged_fraction": float(metrics.converged_fraction)}, f
        )

    if process_id == 1:
        # Simulated host crash: no cleanup, no goodbye.
        sys.stdout.write(
            "WORKER " + json.dumps({"process_id": 1, "dying": True}) + "\n"
        )
        sys.stdout.flush()
        os._exit(13)

    # --- survivor path (process 0) ---------------------------------------
    # Wait until the peer is actually gone (its shard file outlives it).
    deadline = time.time() + 60.0
    while time.time() < deadline and not os.path.exists(
        os.path.join(workdir, "metrics_1.json")
    ):
        time.sleep(0.1)
    time.sleep(1.5)  # let process 1's os._exit land

    detected = not health_check(mesh, timeout_s=6.0)

    # Defined recovery: resume the surviving shard from its checkpoint on
    # *local* devices only (no collectives -> no dependence on the dead peer).
    restored = _load_local(os.path.join(workdir, "shard_0"))
    local_solver = make_batch_solver(cfg)
    sol2 = local_solver(restored.env_state)
    conv2 = float(jnp.mean(sol2.diagnostics.converged.astype(jnp.float32)))
    cost2 = float(jnp.mean(sol2.diagnostics.final_cost))
    out = {
        "process_id": 0,
        "healthy_before": bool(healthy_before),
        "detected_failure": bool(detected),
        "resumed_tick": int(restored.tick),
        "recovered_converged_fraction": conv2,
        "recovered_cost_finite": bool(jnp.isfinite(cost2)),
    }
    print("WORKER " + json.dumps(out), flush=True)
    # Skip interpreter teardown: jax.distributed's atexit shutdown barrier
    # can never complete with a dead peer — the coordination client
    # force-terminates the process with a fatal error.  A real survivor
    # re-initializes a fresh runtime after recovery; the drill is done.
    os._exit(0)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
