"""Device profiling helpers — `jax.profiler` integration.

The reference has no profiler integration (SURVEY.md section 5.1; its only
instrumentation is a broken `time.perf_counter` span).  Here: trace capture
around solver calls for inspection in XProf/TensorBoard, named device-side
annotations for phase attribution inside jitted code, and a micro-benchmark
utility that separates compile time from steady-state latency.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/mpc-trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in device traces (usable inside jitted fns)."""
    return jax.profiler.TraceAnnotation(name)


def measure(
    fn: Callable,
    *args,
    warmup: int = 1,
    reps: int = 5,
) -> Dict[str, float]:
    """Compile + steady-state timing of a device function.

    Returns dict with ``compile_s`` (first call, includes tracing+compile)
    and ``best_s`` / ``mean_s`` over ``reps`` post-warmup calls.
    """
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(max(0, warmup - 1)):
        jax.block_until_ready(fn(*args))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "compile_s": compile_s,
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
    }
