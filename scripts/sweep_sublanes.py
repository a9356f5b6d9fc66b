"""TPU sweep of the fused kernel's sublane packing (sb) x tile size (bt).

VERDICT r1 item 6: the sequential Riccati sweep's (1, lane) rows under-use
sublanes; sb>1 packs sb scenario sub-blocks per sublane group.  Measures
solves/s and fused-vs-flat parity at N=50/B=8192 for the obstacle-free and
K=8 configs.

Run: python scripts/sweep_sublanes.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.ops.pallas.ipm_fused import solve_batch_fused
    from kissmpc_tpu.scenarios import free_problems, obstacle_problems

    print(f"device: {jax.devices()[0]}", flush=True)
    B = 8192
    results = []

    for tag, k in (("free", 0), ("k8", 8)):
        cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=k)
        cfg = cfg.replace(
            solver=dataclasses.replace(cfg.solver, iterations=32)
        )
        if k:
            probs = obstacle_problems(cfg, B, seed=0, n_dynamic=2)
        else:
            probs = free_problems(cfg, B, seed=0)
        jax.block_until_ready(probs)
        ref_controls = None
        variants = [(128, 1, False), (256, 2, False), (512, 4, False),
                    (256, 1, False),
                    # r5: bt=384/sb=3 compiles (r3 mosaic_repro) but was
                    # never timed; 640/5 probes past it.
                    (384, 3, False), (640, 5, False)]
        if k:
            variants += [(128, 1, True), (256, 2, True)]
        for bt, sb, affine in variants:
            cfgv = cfg.replace(
                solver=dataclasses.replace(
                    cfg.solver, fused_affine_tracks=affine
                )
            )
            try:
                fn = jax.jit(
                    lambda p, cfgv=cfgv, bt=bt, sb=sb: solve_batch_fused(
                        cfgv, p, bt=bt, sb=sb
                    )
                )
                t0 = time.time()
                sol = fn(probs)
                float(jnp.sum(sol.controls))
                compile_s = time.time() - t0
                times = []
                for _ in range(5):
                    t0 = time.time()
                    sol = fn(probs)
                    float(jnp.sum(sol.controls))
                    times.append(time.time() - t0)
                dt = min(times)
                conv = float(
                    jnp.mean(sol.diagnostics.converged.astype(jnp.float32))
                )
                du = None
                if ref_controls is None:
                    ref_controls = np.asarray(sol.controls)
                else:
                    du = float(
                        np.max(np.abs(np.asarray(sol.controls) - ref_controls))
                    )
                r = {
                    "config": tag, "bt": bt, "sb": sb, "affine": affine,
                    "solves_per_s": round(B / dt, 1),
                    "latency_ms": round(dt * 1e3, 2),
                    "converged": round(conv, 4),
                    "compile_s": round(compile_s, 1),
                    "max_du_vs_first": du,
                }
            except Exception as e:  # noqa: BLE001 — record OOM/compile fails
                r = {"config": tag, "bt": bt, "sb": sb, "affine": affine,
                     "error": f"{type(e).__name__}: {str(e)[:200]}"}
            print("RESULT " + json.dumps(r), flush=True)
            results.append(r)


if __name__ == "__main__":
    main()
