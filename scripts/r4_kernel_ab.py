"""Round-4 same-process kernel A/B: VERDICT-r3 #1 cells + grouped sweep.

One process, one problem pool, every variant timed back-to-back (the only
measurement the tunnel-variance rule trusts for kernel deltas):

  * K=8 bt=128 sb in {1, 2, 4} -- the untried cells of the sublane matrix
    (lanes 64/32; sub-128 lanes pad every vector to 128 lanes, so the
    prediction is a loss -- measured either way, route (a)).
  * (as-measured r4) grouped-plane Riccati sweep and low_liveness
    variants -- both falsified and removed; numbers in SCALING.md r4.

Run (TPU, background, generous timeout):
  cd /root/repo && python scripts/r4_kernel_ab.py [quick]
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

    t00 = time.time()
    print(f"device: {jax.devices()[0]} ({time.time()-t00:.0f}s)", flush=True)
    B = 8192

    cfgK = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfgK = cfgK.replace(
        solver=dataclasses.replace(
            cfgK.solver, iterations=32, fused_affine_tracks=True,
            mu_sigma_max=0.7,
        )
    )
    probsK = obstacle_problems(cfgK, B, seed=0, n_dynamic=2)
    jax.block_until_ready(probsK)
    print(f"K=8 pool built ({time.time()-t00:.0f}s)", flush=True)
    cfgF = MPCConfig(horizon=50, time_step=0.041)
    cfgF = cfgF.replace(
        solver=dataclasses.replace(cfgF.solver, iterations=32)
    )
    probsF = free_problems(cfgF, B, seed=0)
    jax.block_until_ready(probsF)
    print(f"free pool built ({time.time()-t00:.0f}s)", flush=True)

    # NOTE: the r4 falsification run also measured `fused_grouped_sweep`
    # and `fused_low_liveness` variants; both flags were measured-and-
    # REMOVED afterwards (SCALING.md r4 table; implementations in git
    # 25e323c), so this script now carries only the surviving configs as
    # a reusable same-process baseline harness.
    variants = [
        ("k8-scalar", cfgK, probsK, dict(bt=128, sb=1)),
        ("free-scalar", cfgF, probsF, dict(bt=256, sb=2)),
    ]
    for tag, cfg, probs, kw in variants:
        print(f"--- {tag} {kw} ({time.time()-t00:.0f}s)", flush=True)
        try:
            fn = jax.jit(
                lambda p, cfg=cfg, kw=kw: solve_batch_fused(cfg, p, **kw)
            )
            t0 = time.time()
            sol = fn(probs)
            float(jnp.sum(sol.controls))
            compile_s = time.time() - t0
            times = []
            for _ in range(7):
                t0 = time.perf_counter()
                sol = fn(probs)
                float(jnp.sum(sol.controls))
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            conv = float(
                jnp.mean(sol.diagnostics.converged.astype(jnp.float32))
            )
            r = {"config": tag, **kw,
                 "solves_per_s": round(B / dt, 1),
                 "latency_ms": round(dt * 1e3, 2),
                 "lat_min_ms": round(min(times) * 1e3, 2),
                 "converged": round(conv, 4),
                 "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 — record compile failures
            r = {"config": tag, **kw,
                 "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print("RESULT " + json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
