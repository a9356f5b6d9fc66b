"""A/B-time the working-tree fused kernel against a git revision's, in ONE
process (tunnel latency drifts run-to-run; only same-process comparisons
resolve <15% kernel deltas — CLAUDE.md).

Materializes `git show REV:kissmpc_tpu/ops/pallas/ipm_fused.py` as a sibling
module, then times old vs new on identical problem batches for the
obstacle-free (bt=256/sb=2) and K=8 (bt=128) production configs.

Run: python scripts/ab_kernel.py [REV=HEAD] [batch=8192] [reps=5]
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OLD_PATH = os.path.join(ROOT, "kissmpc_tpu", "ops", "pallas", "_ipm_fused_ab_old.py")


def main():
    rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    src = subprocess.check_output(
        ["git", "-C", ROOT, "show", f"{rev}:kissmpc_tpu/ops/pallas/ipm_fused.py"],
        text=True,
    )
    with open(OLD_PATH, "w") as f:
        f.write(src)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        import jax.numpy as jnp
        import numpy as np

        from kissmpc_tpu import MPCConfig
        from kissmpc_tpu.ops.pallas import _ipm_fused_ab_old as old
        from kissmpc_tpu.ops.pallas import ipm_fused as new
        from kissmpc_tpu.scenarios import free_problems, obstacle_problems

        print(f"device: {jax.devices()[0]}  rev={rev}", flush=True)

        def timeit(name, fn, problems):
            jitted = jax.jit(fn)
            t0 = time.time()
            sol = jitted(problems)
            _ = float(jnp.sum(sol.controls))
            compile_s = time.time() - t0
            lat = []
            conv = None
            for _ in range(reps):
                t0 = time.perf_counter()
                sol = jitted(problems)
                _ = float(jnp.sum(sol.controls))
                lat.append(time.perf_counter() - t0)
            conv = float(
                jnp.mean(sol.diagnostics.converged.astype(jnp.float32))
            )
            best = min(lat) * 1e3
            print(
                f"{name:24s} {best:7.2f} ms  {batch/ (best/1e3):10,.0f}/s  "
                f"conv {conv:.4f}  (compile {compile_s:.0f}s)",
                flush=True,
            )
            return best, conv

        results = {}
        # K=8 production config, bt=128 flat
        cfgK = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
        cfgK = cfgK.replace(
            solver=dataclasses.replace(
                cfgK.solver, iterations=32, fused_affine_tracks=True
            )
        )

        def compat(cfg_):
            # r3-era kernels read flags that r4 removed from SolverConfig;
            # graft inert instance attributes so `git show`n modules run
            # (bypasses the frozen dataclass; hash/eq are field-based so
            # jit staticness is unaffected).
            for name, val in (
                ("fused_low_liveness", False),
                ("fused_grouped_sweep", False),
                ("fused_early_exit_tol", 0.0),
                ("sort_by_difficulty", False),
            ):
                if not hasattr(cfg_.solver, name):
                    object.__setattr__(cfg_.solver, name, val)
            return cfg_
        cfgK = compat(cfgK)
        pK = obstacle_problems(cfgK, batch, seed=0, n_dynamic=2)
        jax.block_until_ready(pK)
        for label, mod in (("old", old), ("new", new)):
            b, c = timeit(
                f"K=8 bt=128 {label}",
                lambda p, m=mod: m.solve_batch_fused(cfgK, p, bt=128, sb=1),
                pK,
            )
            results[f"k8_{label}"] = {"ms": round(b, 2), "conv": c}

        # obstacle-free headline config, bt=256 sb=2
        cfg0 = MPCConfig(horizon=50, time_step=0.041)
        cfg0 = cfg0.replace(
            solver=dataclasses.replace(cfg0.solver, iterations=32)
        )
        cfg0 = compat(cfg0)
        p0 = free_problems(cfg0, batch, seed=0)
        jax.block_until_ready(p0)
        for label, mod in (("old", old), ("new", new)):
            b, c = timeit(
                f"free bt=256 sb=2 {label}",
                lambda p, m=mod: m.solve_batch_fused(cfg0, p, bt=256, sb=2),
                p0,
            )
            results[f"free_{label}"] = {"ms": round(b, 2), "conv": c}

        for k in ("k8", "free"):
            o, n = results[f"{k}_old"]["ms"], results[f"{k}_new"]["ms"]
            results[f"{k}_speedup"] = round(o / n, 4)

        # r5: configs the pre-flattening kernel could not compile (Mosaic
        # HTTP-500 frontier) — new kernel only, skipped on compile failure.
        for bt, sb in ((256, 1), (256, 2), (512, 2), (512, 4)):
            try:
                b, c = timeit(
                    f"K=8 bt={bt} sb={sb} new",
                    lambda p: new.solve_batch_fused(cfgK, p, bt=bt, sb=sb),
                    pK,
                )
                results[f"k8_bt{bt}sb{sb}_new"] = {
                    "ms": round(b, 2), "conv": c
                }
            except Exception as e:
                msg = (str(e).splitlines() or [type(e).__name__])[0][:160]
                print(f"K=8 bt={bt} sb={sb} new: FAIL {msg}", flush=True)
                results[f"k8_bt{bt}sb{sb}_new"] = {"fail": msg}
        print("RESULT " + json.dumps(results), flush=True)
    finally:
        os.unlink(OLD_PATH)


if __name__ == "__main__":
    main()
