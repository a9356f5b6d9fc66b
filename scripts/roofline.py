"""Analytic FLOP/roofline accounting for the fused IPM kernel (VERDICT r2#5).

The kernel is hand-written (ops/pallas/ipm_fused.py), so its per-iteration
work is countable term by term.  This script walks the kernel's sections and
counts, per scenario per IPM iteration:

 * vector FLOPs (adds/mults/FMAs on [rows, lanes] planes, counted as 1 each,
   FMA = 2),
 * transcendental/special ops (sqrt, log, cos/sin, divide) separately —
   on the VPU these retire far below 1/lane/cycle and are the real
   bottleneck candidates.

It then converts measured kernel latencies (pass them in, or use the
defaults recorded in SCALING.md) into achieved FLOP/s and fraction of VPU
peak, and prints the section breakdown so the next bottleneck is named with
a number.

Counting conventions: a logical row of horizon length costs N (=50) lane
elements per scenario; T1 = N+1.  Constraint-family row inventory (K = 8):
control boxes 4N, state boxes 6*T1, obstacles K*N.  All counts follow the
code paths actually executed at sb=1 with obstacle_curvature=True and
values_only line-search trials (post r2b liveness cuts).

Run: python scripts/roofline.py [N] [K] [ls_iters] [latency_ms] [batch] [iters]
"""

import sys

# v5e TensorCore VPU: 8x128 lanes, 4 ALU slots/lane-cycle capable of FMA,
# ~1.5 GHz wall (197 bf16 MXU TFLOP/s / (4 MXUs * 128*128*2) = 1.5e9).
# f32 VPU peak = 1024 lanes * 4 slots * 2 (FMA) * 1.5e9 = 12.3 TFLOP/s upper
# bound; a conservative 1-FMA/lane/cycle floor is 3.07 TFLOP/s.  We report
# against both, clearly labeled — the truth for mixed add/mul code with
# dependencies sits between.
VPU_PEAK_HI = 1024 * 4 * 2 * 1.5e9
VPU_PEAK_LO = 1024 * 2 * 1.5e9


def count(N=50, K=8, ls=4, curvature=True):
    T1 = N + 1
    box_rows = 4 * N + 6 * T1  # control + state box families
    fam_rows = box_rows + K * N
    sec = {}
    trans = {}

    # --- families(): constraint values + normals (full eval, 1x/iter) ----
    f = 4 * N + 6 * T1  # box values: one sub each
    f += K * (2 * N + 3 * N + 2 * N + N)  # dx,dy; dist fma+add; c; ds_safe
    sec["families_full"] = f
    trans["families_full"] = {"sqrt": K * N, "div": 2 * K * N}

    # --- adaptive mu: s*nu sums + mask counts over all families ----------
    sec["adaptive_mu"] = 3 * fam_rows + 8
    trans["adaptive_mu"] = {}

    # --- cost grads/Hessians + condensation -------------------------------
    c = 9 * T1 + 3 * T1  # gxc/gyc/gthc (3 FMA-ish each) + H planes
    c += 12 * N  # gv, Hv, gw, Hw, masks
    # _grad_coef per family: sigma = clip(mask*nu/max(s,eps)) ~4, g ~5
    c += 9 * fam_rows
    trans_cond = {"div": fam_rows}
    c += 8 * N + 14 * T1  # qv/qw/Qv/Qw combine + qx/Qd combine
    if K:
        per_k = 10  # addx/addy (2 FMA), h00/h01/h11 (3 mult + 3 acc)
        if curvature:
            per_k += 9  # dsafe, wc, (1-n^2) corrections
            trans_cond["div"] = trans_cond.get("div", 0) + K * N
        c += per_k * K * N + 5 * N  # + row-0 concats
    sec["condensation"] = c
    trans["condensation"] = trans_cond

    # --- dynamics + staging ----------------------------------------------
    sec["dynamics"] = 16 * N + 3  # A/B entries, defects, pins
    trans["dynamics"] = {"cos": N, "sin": N}

    # --- backward Riccati sweep (per t: counted off the bwd body) --------
    # Pa 15, Pd 18, PB 12, e/Quu 9, Qux 12, qu 8, det+inv 5, K gains 24,
    # k 8, aPa 5, S 45, nP 22, np 16, adjoint lam 10, lmax 4  ~= 213
    sec["riccati_bwd"] = 213 * N
    trans["riccati_bwd"] = {"div": N}

    # --- forward rollout ---------------------------------------------------
    sec["riccati_fwd"] = 30 * N
    trans["riccati_fwd"] = {}

    # --- slack/dual steps + fraction-to-boundary ---------------------------
    s = 3 * fam_rows  # ds = mask*(jdz + c - s)
    s += 2 * K * N  # obstacle jdz = nx*ddx + ny*ddy
    s += 7 * fam_rows  # dnu recompute (sigma reuse not held): mu/s - nu - sig*ds
    s += 2 * 5 * fam_rows  # ftb ratio (where, mult, div~) for s and nu
    sec["steps_ftb"] = s
    trans["steps_ftb"] = {"div": 3 * fam_rows}

    # --- rho (adjoint lam_max folded into bwd) + step_inf ------------------
    sec["rho_stepinf"] = 2 * (3 * T1 + 2 * N) + 8
    trans["rho_stepinf"] = {}

    # --- merit line search: ls evaluations (merit0 recomposed from carried
    # components since r3; box trial values + consistency replaced by the
    # exact (1-alpha)*consist0 closed form — obstacle families only) -------
    evals = ls
    m = 2 * (3 * T1 + 2 * N)  # trial point
    m += 12 * T1 + 6 * N  # objective terms
    m += 12 * N + 6  # defects + pins + abs
    m += K * 8 * N  # obstacle trial values only
    m += 5 * fam_rows  # ts + log acc (all families)
    m += 3 * K * N + 4  # obstacle consist + box closed form
    sec["merit_ls"] = m * evals + 3 * box_rows  # + consist0_box precompute
    trans["merit_ls"] = {
        "log": fam_rows * evals,
        "sqrt": K * N * evals,
        "cos": N * evals,
        "sin": N * evals,
    }

    # --- updates + clamp ----------------------------------------------------
    u = 2 * (3 * T1 + 2 * N)  # iterate update
    u += 9 * fam_rows  # s_new, dnu apply, clamp (center, clip)
    sec["updates"] = u
    trans["updates"] = {"div": fam_rows}

    # --- reg/sigma bookkeeping ---------------------------------------------
    sec["reg_sigma"] = 16
    trans["reg_sigma"] = {}

    return sec, trans


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ls = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    lat_ms = float(sys.argv[4]) if len(sys.argv) > 4 else (
        50.0 if K else 38.9
    )  # SCALING.md r2b base-kernel p50 at B=8192, 32 iters
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 8192
    iters = int(sys.argv[6]) if len(sys.argv) > 6 else 32

    sec, trans = count(N, K, ls)
    total = sum(sec.values())
    t_tot = {}
    for d in trans.values():
        for k, v in d.items():
            t_tot[k] = t_tot.get(k, 0) + v
    print(f"N={N} K={K} ls={ls}: FLOPs/scenario-iteration = {total:,}")
    for name in sorted(sec, key=lambda n: -sec[n]):
        extra = ", ".join(f"{k}:{v}" for k, v in trans[name].items())
        print(f"  {name:16s} {sec[name]:8,}  ({100*sec[name]/total:4.1f}%)"
              + (f"  [{extra}]" if extra else ""))
    print("special ops/scenario-iteration: "
          + ", ".join(f"{k}={v:,}" for k, v in sorted(t_tot.items())))

    per_si = lat_ms * 1e-3 / (batch * iters)
    fl = total / per_si
    print(f"\nmeasured: {lat_ms} ms for B={batch} x {iters} iters "
          f"-> {per_si*1e9:.1f} ns/scenario-iteration")
    print(f"achieved vector-FLOP rate: {fl/1e9:.0f} GFLOP/s "
          f"= {100*fl/VPU_PEAK_LO:.1f}% of conservative VPU peak "
          f"({VPU_PEAK_LO/1e12:.2f} TF), "
          f"{100*fl/VPU_PEAK_HI:.1f}% of 4-slot FMA peak "
          f"({VPU_PEAK_HI/1e12:.1f} TF)")
    # --- instruction-issue model (the kernel is issue-bound, not FLOP-bound)
    # Per BT=128 tile and iteration: the sequential sweeps' per-time rows are
    # (1, 128) values at sb=1 — ONE vreg op per row op using 1 of 8 sublanes;
    # whole-array plane ops pack 1024 lanes per vreg op.
    T1 = N + 1
    sweep_ops = (213 + 30) * N  # bwd + fwd body vreg ops, one per t
    whole_flops = total - sec["riccati_bwd"] - sec["riccati_fwd"]
    whole_vops = whole_flops * 128 / 1024
    sp = sum(t_tot.values())
    sp_vops = sp * 128 / 1024
    cyc = per_si * 128 * 1.5e9  # measured cycles per tile-iteration
    print(
        f"\nissue model per 128-scenario tile-iteration:\n"
        f"  sweep (sb=1, 1/8 sublanes): {sweep_ops:6,} vreg ops\n"
        f"  whole-array planes:         {whole_vops:6,.0f} vreg ops\n"
        f"  special (multi-cycle):      {sp_vops:6,.0f} vreg ops "
        f"(x3-8 cycles each)\n"
        f"  measured:                   {cyc:6,.0f} cycles "
        f"-> issue efficiency ~{100*(sweep_ops+whole_vops)/cyc:.0f}% "
        f"before transcendental stalls"
    )
    print(
        f"speed-of-light at this algorithm: sweep/8 + planes = "
        f"{sweep_ops/8 + whole_vops:,.0f} cycles "
        f"-> {(cyc/(sweep_ops/8 + whole_vops)):.2f}x headroom if the "
        f"sweep packed all 8 sublanes and specials were free"
    )


if __name__ == "__main__":
    main()
