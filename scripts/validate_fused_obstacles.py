"""On-TPU validation of the fused IPM kernel's K>0 (obstacle) path.

VERDICT r1 item 1: the fused kernel's obstacle path had only ever run in
interpret mode at N=12/BT=8.  This script compiles it with Mosaic at the
production config (N=50, f32, K=8, B=8192), parity-checks fused vs split on
device, and times both.

Run (background, generous timeout — remote compile takes minutes):
  cd /root/repo && python scripts/validate_fused_obstacles.py [bt]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    bt = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kissmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from kissmpc_tpu import MPCConfig
    from kissmpc_tpu.ops.pallas.ipm_fused import solve_batch_fused
    from kissmpc_tpu.scenarios import obstacle_problems
    from kissmpc_tpu.solver.api import make_batch_solver

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = MPCConfig(horizon=50, time_step=0.041, max_obstacles=8)
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, iterations=32))
    B = 8192

    t0 = time.time()
    problems = obstacle_problems(cfg, B, seed=0, n_dynamic=2)
    jax.block_until_ready(problems)
    print(f"problems built in {time.time() - t0:.1f}s", flush=True)

    # --- fused ---
    t0 = time.time()
    fused_fn = jax.jit(lambda p: solve_batch_fused(cfg, p, bt=bt))
    sol_f = fused_fn(problems)
    _ = float(jnp.sum(sol_f.controls))  # value-sync fence
    print(f"fused (bt={bt}) compile+run {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.time()
        sol_f = fused_fn(problems)
        _ = float(jnp.sum(sol_f.controls))
        times.append(time.time() - t0)
    dt_f = min(times)
    conv_f = float(jnp.mean(sol_f.diagnostics.converged.astype(jnp.float32)))
    print(
        f"fused: {B / dt_f:,.0f} solves/s  latency {dt_f * 1e3:.1f} ms  "
        f"converged {conv_f:.4f}",
        flush=True,
    )

    # --- split ---
    cfg_s = cfg.replace(
        solver=dataclasses.replace(cfg.solver, solve_backend="split")
    )
    t0 = time.time()
    split_fn = make_batch_solver(cfg_s)
    sol_s = split_fn(problems)
    _ = float(jnp.sum(sol_s.controls))
    print(f"split compile+run {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        sol_s = split_fn(problems)
        _ = float(jnp.sum(sol_s.controls))
        times.append(time.time() - t0)
    dt_s = min(times)
    conv_s = float(jnp.mean(sol_s.diagnostics.converged.astype(jnp.float32)))
    print(
        f"split: {B / dt_s:,.0f} solves/s  latency {dt_s * 1e3:.1f} ms  "
        f"converged {conv_s:.4f}",
        flush=True,
    )

    # --- parity ---
    du = np.abs(np.asarray(sol_f.controls) - np.asarray(sol_s.controls))
    per_scen = du.reshape(B, -1).max(axis=1)
    both_conv = np.asarray(
        sol_f.diagnostics.converged & sol_s.diagnostics.converged
    )
    parity = {
        "max_du": float(per_scen.max()),
        "max_du_both_converged": float(per_scen[both_conv].max())
        if both_conv.any()
        else None,
        "p99_du": float(np.percentile(per_scen, 99)),
        "frac_within_1e-3": float(np.mean(per_scen <= 1e-3)),
        "frac_within_1e-3_both_conv": float(
            np.mean(per_scen[both_conv] <= 1e-3)
        )
        if both_conv.any()
        else None,
    }

    # --- disagreement-tail classification (VERDICT r2 item 4) ------------
    # For every scenario where BOTH backends certify convergence yet the
    # controls differ beyond the 1e-3 parity budget, prove the disagreement
    # is multimodality (two valid KKT points in different basins), not a
    # hidden kernel bug: (a) compare objectives, (b) compare the turn
    # signature (go-left/go-right), (c) independently certify each
    # backend's iterate by polishing it with the *split* solver warm-started
    # exactly there — a genuine local optimum is a fixed point (the polish
    # returns to it), a corrupted iterate is not.
    dis = both_conv & (per_scen > 1e-3)
    idx = np.nonzero(dis)[0]
    tail = {"count": int(idx.size)}
    if idx.size:
        jidx = jnp.asarray(idx)
        sub = jax.tree.map(lambda x: x[jidx], problems)
        cost_f = np.asarray(sol_f.diagnostics.final_cost)[idx]
        cost_s = np.asarray(sol_s.diagnostics.final_cost)[idx]
        # Turn signature: sign of the early-horizon mean angular velocity.
        wf = np.asarray(sol_f.controls)[idx, :10, 1].mean(axis=1)
        ws = np.asarray(sol_s.controls)[idx, :10, 1].mean(axis=1)
        opposite = (np.sign(wf) != np.sign(ws)) & (np.abs(wf - ws) > 1e-2)
        cfg_p = cfg.replace(
            solver=dataclasses.replace(
                cfg.solver, iterations=24, solve_backend="split"
            )
        )
        polish = make_batch_solver(cfg_p)

        def polish_move(sol):
            warm = sub._replace(
                warm_states=jnp.asarray(np.asarray(sol.states)[idx]),
                warm_controls=jnp.asarray(np.asarray(sol.controls)[idx]),
            )
            out = polish(warm)
            return (
                np.abs(
                    np.asarray(out.controls) - np.asarray(sol.controls)[idx]
                ).reshape(idx.size, -1).max(axis=1),
                np.asarray(out.diagnostics.converged),
            )

        move_f, pconv_f = polish_move(sol_f)
        move_s, pconv_s = polish_move(sol_s)
        rel_cost = np.abs(cost_f - cost_s) / np.maximum(
            1.0, np.minimum(cost_f, cost_s)
        )
        stable = 5e-3  # polish movement below this = fixed point (f32)
        tail.update(
            {
                # The VERDICT r2#4 criterion: every disagreement must be
                # both-converged-with-comparable-cost (else kernel bug).
                "frac_comparable_cost": float(np.mean(rel_cost < 1e-3)),
                "frac_opposite_turn": float(np.mean(opposite)),
                "rel_cost_diff_max": float(rel_cost.max()),
                "rel_cost_diff_p50": float(np.percentile(rel_cost, 50)),
                "polish_move_fused_max": float(move_f.max()),
                "polish_move_split_max": float(move_s.max()),
                "frac_fused_fixed_point": float(np.mean(move_f < stable)),
                "frac_split_fixed_point": float(np.mean(move_s < stable)),
                "frac_both_kkt_comparable_cost": float(
                    np.mean((move_f < stable) & (move_s < stable))
                ),
            }
        )

    # --- clearance on the fused solution ---
    p = np.asarray(sol_f.states)[:, 1:, :2]  # [B, N, 2]
    c = np.swapaxes(np.asarray(problems.obstacle_centers), 1, 2)  # [B,N,K,2]
    dist = np.linalg.norm(p[:, :, None, :] - c, axis=-1)  # [B, N, K]
    sd = (
        dist
        - np.asarray(problems.obstacle_radii)[:, None, :]
        - np.asarray(problems.inflation_radius)[:, None, None]
    )
    mask = np.asarray(problems.obstacle_mask)[:, None, :] > 0.5
    sd = np.where(mask, sd, np.inf)
    worst = sd.reshape(B, -1).min(axis=1)
    conv_mask = np.asarray(sol_f.diagnostics.converged)
    clearance = {
        "min_clearance_converged": float(worst[conv_mask].min())
        if conv_mask.any()
        else None,
        "min_clearance_all": float(worst.min()),
        "frac_violating_1e-3_converged": float(
            np.mean(worst[conv_mask] < -1e-3)
        )
        if conv_mask.any()
        else None,
    }

    out = {
        "bt": bt,
        "batch": B,
        "fused_solves_per_s": round(B / dt_f, 1),
        "fused_latency_ms": round(dt_f * 1e3, 2),
        "fused_converged": round(conv_f, 4),
        "split_solves_per_s": round(B / dt_s, 1),
        "split_converged": round(conv_s, 4),
        "parity": parity,
        "disagreement_tail": tail,
        "clearance": clearance,
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
