"""Multi-host pod-slice support: process init, 2-D meshes, DCN-aware layout.

The reference's distribution substrate is ROS 2 / DDS between OS processes
(SURVEY.md section 5.8).  TPU-native, the compute plane is
`jax.distributed.initialize` + one global mesh over the pod slice:

 * mesh axes ("host", "chip"): the scenario batch shards over *both* axes
   (pure data parallelism — MPC scenarios are independent), laid out so that
   the per-step convergence/metric reductions ride ICI within a host and
   cross the slower DCN only once per call (`psum` over the combined axes
   lowers to hierarchical reductions);
 * scenario dispatch: each host feeds only its local shard
   (`jax.make_array_from_process_local_data`), so scenario IO never crosses
   hosts;
 * failure detection (SURVEY.md 5.3): a per-step all-reduce health check —
   every host contributes a heartbeat scalar; a missing/NaN contribution is
   visible to all hosts within one step.

Single-host (or CPU-mesh CI) degenerates cleanly: the same code runs with
host axis of size 1, or an 8-virtual-device CPU mesh reshaped to (2, 4) to
exercise the 2-D logic without a pod (tests/test_fleet.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper (no-op when single-process).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly only for manual launches.
    """
    if num_processes is not None and num_processes > 1 or (
        coordinator_address is not None
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_pod_mesh(devices=None) -> Mesh:
    """2-D ("host", "chip") mesh over the slice.

    Device order groups each process's local devices on the "chip" axis so
    intra-host collectives stay on ICI.
    """
    if devices is None:
        devices = jax.devices()
    num_hosts = max(1, jax.process_count())
    per_host = len(devices) // num_hosts
    grid = np.asarray(devices).reshape(num_hosts, per_host)
    return Mesh(grid, ("host", "chip"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scenario batch sharded over every mesh axis (leading array axis)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def distribute_local_batch(mesh: Mesh, local_problems):
    """Assemble a global sharded Problem from per-host local shards.

    Each host passes its own scenarios (numpy/jax arrays with the local
    batch leading); the result is one global array batch of size
    local_batch * num_hosts... (exact global shape per
    `make_array_from_process_local_data` semantics).
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_problems,
    )


def health_check(mesh: Mesh, timeout_s: float = 10.0) -> bool:
    """One all-reduce heartbeat over the full mesh; True iff every device
    contributed a finite value within ``timeout_s`` (SURVEY.md 5.3).

    The failure this exists to detect — a crashed or hung peer — makes the
    collective *block*, not error, so the reduction runs on a daemon thread
    and the caller waits at most ``timeout_s``: timeout, exception, or a
    wrong/non-finite total all report unhealthy.  (The orphaned thread stays
    parked on the dead collective; callers should treat False as fatal for
    this runtime and recover by restarting from a checkpoint — see
    tests/test_multihost.py's failure-injection drill.  Because each failed
    check leaks one parked daemon thread, do NOT poll this in a supervisor
    retry loop: bound retries to a handful, then escalate to a process-level
    restart — the orphaned threads die with the process.)
    """
    import threading

    import jax.numpy as jnp

    result = {}

    def _beat():
        try:
            ones = jax.device_put(
                jnp.ones((mesh.devices.size,), jnp.float32),
                NamedSharding(mesh, P(mesh.axis_names)),
            )
            result["total"] = float(jax.jit(jnp.sum)(ones))
        except Exception as e:  # dead peer often surfaces as a runtime error
            result["error"] = e

    t = threading.Thread(target=_beat, daemon=True, name="health_check")
    t.start()
    t.join(timeout_s)
    if t.is_alive() or "error" in result or "total" not in result:
        return False
    total = result["total"]
    return bool(np.isfinite(total)) and total == mesh.devices.size
