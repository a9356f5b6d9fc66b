"""Minimal-repro sweep for the K=8 / bt>=256 Mosaic compile failure.

Round 2 parked an opaque HTTP-500 from the remote compile helper whenever
the fused kernel was compiled at K=8 with bt>=256 (any sb), and at K=0 with
bt=512/sb=4 (SCALING.md r2b).  This script isolates the boundary: it
lower()+compile()s the fused solve (grid=1 tile, batch=bt) across a grid of
(K, N, bt, sb) configs, records pass/fail + wall time + the total VMEM row
footprint of the kernel's refs, and prints a table.  Failures return in
seconds; successes cost a real Mosaic compile (minutes cold), so the sweep
probes failures densely and successes only at the boundary.

Run (background, generous timeout):
  cd /root/repo && python scripts/mosaic_repro.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vmem_rows(N, K, bt, sb):
    """Total f32 VMEM rows (x lanes) of inputs+outputs+scratch per program."""
    T1 = N + 1
    kn = K * N if K else 1
    kn_in = 2 * K if K else 1  # affine tracks
    ins = 26 + (3 * T1 + 2 * N) + 2 * kn_in + (2 * K + 1 if K else 1)
    outs = 3 * T1 + 2 * N + 6
    scratch = (
        8 * N + 3 * T1 + 2 * N + 18 * T1 + 4 * N + 4 * N + 6 * T1 + 6 * T1
        + 2 * kn
    )
    return (ins + 2 * outs + scratch) * sb  # outs double-buffered


def try_compile(cfg, bt, sb, affine=True):
    import jax
    import jax.numpy as jnp

    from kissmpc_tpu.ops.pallas.ipm_fused import solve_batch_fused
    from kissmpc_tpu.scenarios import obstacle_problems, free_problems

    if cfg.max_obstacles:
        problems = obstacle_problems(cfg, bt, seed=0, n_dynamic=2)
    else:
        problems = free_problems(cfg, bt, seed=0)
    fn = jax.jit(lambda p: solve_batch_fused(cfg, p, bt=bt, sb=sb))
    t0 = time.time()
    try:
        fn.lower(problems).compile()
        return True, time.time() - t0, ""
    except Exception as e:
        msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        return False, time.time() - t0, msg


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kissmpc_tpu import MPCConfig

    print(f"device: {jax.devices()[0]}", flush=True)

    def cfg_for(N, K, affine=True):
        c = MPCConfig(horizon=N, time_step=0.041, max_obstacles=K)
        return c.replace(
            solver=dataclasses.replace(
                c.solver, iterations=32,
                fused_affine_tracks=affine and K > 0,
            )
        )

    # Probe order: known-good anchor, then the failure frontier.
    # r5 (flattened-K kernel): N bisect at K=8/bt=256 — r3's edge was
    # between N=37 (ok) and N=50 (fail); if the ~8x static-instruction
    # reduction moved the edge, instruction count is a partial trigger.
    probes = [
        (37, 8, 256, 1),   # r3: ok (anchor)
        (50, 8, 256, 1),   # r3: fail
        (40, 8, 256, 1),
        (44, 8, 256, 1),
        (47, 8, 256, 1),
    ]
    rows = []
    for (N, K, bt, sb) in probes:
        if bt % 128:
            # lanes must stay 128-aligned: bt = sb * lanes, lanes % 128 == 0
            if (bt // sb) % 128:
                print(f"skip N={N} K={K} bt={bt} sb={sb} (lane alignment)",
                      flush=True)
                continue
        cfg = cfg_for(N, K)
        ok, dt, msg = try_compile(cfg, bt, sb)
        r = {
            "N": N, "K": K, "bt": bt, "sb": sb,
            "vmem_rows": vmem_rows(N, K, bt, sb),
            "ok": ok, "compile_s": round(dt, 1), "err": msg,
        }
        rows.append(r)
        print(json.dumps(r), flush=True)
    print("RESULT " + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
