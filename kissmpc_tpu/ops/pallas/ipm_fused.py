"""Fused interior-point MPC solver — the whole solve as ONE Pallas kernel.

The split path (`solver/ipm.py` + `ops/pallas/riccati.py`) runs the Riccati
sweep in Pallas but leaves condensation, line search and updates to XLA, and
pays two layout transposes per iteration.  Here the *entire* fixed-iteration
primal-dual IPM loop lives in a single kernel: all iterate state (trajectory,
slacks, duals) stays VMEM-resident in scenario-major layout across all
iterations — zero HBM traffic inside the solve.

Specializations relative to the generic path:
 * component-of-arrays layout: x/y/theta/v/omega are separate [T, BT]
   planes (contiguous whole-array ops for dynamics, costs and constraints);
 * the unicycle structure is exploited analytically: A = I + dt*[[0,0,-v s],
   [0,0,v c],[0,0,0]] and B = [[c dt,0],[s dt,0],[0,dt]] have 2 and 3
   nontrivial entries, the value Hessian P is symmetric (6 planes), and the
   stage Hessian blocks are diag + one (x,y) off-diagonal — the backward
   sweep is ~60 fused multiply-adds per step instead of generic 3x3 algebra;
 * the merit line search walks its ``ls_iters`` backtracking candidates
   (default 4, `config.py`) with whole-array trial evaluations inside the
   kernel.

Sublane packing (``sb``): with ``sb == 1`` every per-scenario quantity is a
``[rows, BT]`` plane whose sequential-sweep rows are (1, BT) values — at
BT=128 each sweep op uses 1 of the VPU's 8 sublanes.  ``sb > 1`` packs ``sb``
scenario sub-blocks into the sublane dimension: a program covers
``bt = sb * lanes`` scenarios laid out so logical row r of sub-block s lives
at physical row ``r*sb + s``; every sweep row becomes an (sb, lanes) value
and the sequential Riccati sweep's vreg-op count drops ~sb-fold.  Scalar-
per-scenario rows become (sb, lanes) and are tiled (period-sb, a real copy —
not Mosaic's free native replication) onto family blocks where broadcasting
would have been free at sb=1; loop-invariant tiles are hoisted out of the
iteration body.

Algorithmic content is identical to `solver/ipm.py` (same merit, fraction-
to-boundary, adaptive mu/rho/regularization, dual clamp); that jnp path is
the oracle for this kernel's tests.  Same-named quantities follow SURVEY.md
citations given there.

Batch: grid over scenario tiles of BT scenarios; everything [rows*sb, lanes].
f32 only (the TPU production dtype).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import MPCConfig
from ...solver.problem import Problem

BT = 128  # scenarios per program; measured fastest (256: -9%; 512: VMEM OOM)
SB = 1  # sublane sub-blocks per program (scenarios = lanes * SB)

_F32_FLOOR = 1e-10
_SIGMA_MAX = 1e12
_KAPPA = 1e10


def _tree_reduce(x, op, sb):
    """Reduce over logical rows of an interleaved [R*sb, L] block -> [sb, L].

    SB-aligned halving (contiguous slices only — Mosaic has no strided value
    slices); odd leftovers fold into a side carry.  For sb == 1 the plain
    axis-0 reduction is used (bit-identical to the pre-packing kernel).
    """
    if sb == 1:
        if op is jnp.add:
            return jnp.sum(x, axis=0, keepdims=True)
        if op is jnp.minimum:
            return jnp.min(x, axis=0, keepdims=True)
        return jnp.max(x, axis=0, keepdims=True)
    R = x.shape[0] // sb
    carry = None
    while R > 1:
        half = R // 2
        y = op(x[: half * sb], x[half * sb : 2 * half * sb])
        if R % 2:
            last = x[2 * half * sb : R * sb]
            carry = last if carry is None else op(carry, last)
        x = y
        R = half
    return x if carry is None else op(x, carry)


class _Fam(NamedTuple):
    """One inequality family's per-iteration tensors ([rows*sb, L] each).

    ``mask`` is pre-tiled to the family's full row count (loop-invariant).
    """

    c: jax.Array
    s: jax.Array
    nu: jax.Array
    mask: jax.Array


def _sigma(f: _Fam):
    return jnp.clip(
        f.mask * f.nu / jnp.maximum(f.s, _F32_FLOOR), 0.0, _SIGMA_MAX
    )


def ipm_fused_kernel(
    cfg: MPCConfig,
    sb: int,
    # scalar inputs (SMEM):
    it_ref,  # [1] int32: runtime IPM iteration count (dynamic trip count,
    #          so every refine stage shares this one compiled binary)
    # inputs ([rows*sb, L]):
    scal_ref,  # [27*sb, L]: x0(3), goal(3), cb(4), m_cb(4), sb(6), m_xl(3),
    #            m_xu(3), mu_sigma(1)
    warm_ref,  # [(3T1+2N)*sb, L]: packed warm x,y,th (N+1 each), v,w (N each)
    tx_ref,  # [K*N*sb, L] obstacle track x (or [sb, L] dummy when K=0)
    ty_ref,
    obinfo_ref,  # [(2K+1)*sb, L]: radius rows, mask rows, inflation
    # outputs:
    x_ref, y_ref, th_ref,  # [(N+1)*sb, L]
    v_ref, w_ref,  # [N*sb, L]
    diag_ref,  # [6*sb, L]: converged, stationarity, feasibility, comp,
    #            cost, mu — the exact KKT diagnostics, computed in-kernel
    #            (mirrors solver/ipm.py::_diagnostics)
    # scratch (iterate state lives here):
    kk_ref,  # [8N*sb, L]: K00,K01,K02,K10,K11,K12,k0,k1 blocks
    dxs_ref,  # [3(N+1)*sb, L]: dx, dy, dth blocks
    dus_ref,  # [2N*sb, L]: dv, dw blocks
    stage_ref,  # [18(N+1)*sb, L]: per-time condensed quantities (see _ST)
    s_c_ref, nu_c_ref,  # [4N*sb, L]  (vl, vu, wl, wu blocks)
    s_x_ref, nu_x_ref,  # [6(N+1)*sb, L]  (xl0..2, xu0..2 blocks)
    s_ob_ref, nu_ob_ref,  # [K*N*sb, L] (or [sb, L] dummy)
    e_ob_ref,  # [K*N*sb, L] elastic variables (or [sb, L] dummy when the
    #          elastic_obstacles flag is off — mirrors solver/ipm.py's
    #          c + e - s = 0, e >= 0, rho_e * e condensation)
    pad_ref,  # [5*sb, L] VMEM, deliberately UNUSED (placement shim, see
    #          solve_batch_fused scratch_shapes)
):
    N = cfg.horizon
    K = cfg.max_obstacles
    dt = jnp.float32(cfg.time_step)
    sc = cfg.solver
    cc = cfg.cost
    T1 = N + 1
    S = sb
    ELASTIC = K > 0 and sc.elastic_obstacles
    rho_e = jnp.float32(sc.elastic_penalty)

    def up(a, n):
        """Tile an [sb, L] scalar row onto n logical rows ([n*sb, L]).

        At sb == 1 this is a no-op: (1, L) broadcasts natively (Mosaic's
        free replicated layout).  At sb > 1 the period-sb pattern is a real
        sublane copy, so callers hoist loop-invariant tiles.
        """
        if S == 1 or n == 1:
            return a
        return pltpu.repeat(a, n, 0)

    def _reduce_min(x):
        return _tree_reduce(x, jnp.minimum, S)

    def _reduce_max(x):
        return _tree_reduce(x, jnp.maximum, S)

    def _reduce_sum(x):
        return _tree_reduce(x, jnp.add, S)

    def _ftb(v, dv, tau):
        ratio = jnp.where(dv < 0, -tau * v / jnp.minimum(dv, -1e-30), 1.0)
        return _reduce_min(ratio)

    def _grad_coef(f: _Fam, mu_t):
        """mu_t must already be tiled to the family's rows."""
        sig = _sigma(f)
        g = f.mask * (mu_t / jnp.maximum(f.s, _F32_FLOOR) - sig * (f.c - f.s))
        return g, sig

    # --- static cost constants ------------------------------------------
    w0, w1, w2 = (jnp.float32(w) for w in cc.goal_weights)
    w_neg = jnp.float32(cc.negative_velocity_weight)
    w_pos = jnp.float32(cc.positive_velocity_weight)
    w_ang = jnp.float32(cc.angular_velocity_weight)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T1 * S, 1), 0) // S
    gm = (rows >= 1).astype(jnp.float32)  # goal-cost row mask [T1*sb, 1]
    if cc.goal_cost_mode == "exclude_terminal":
        gm = gm * (rows <= N - 1).astype(jnp.float32)

    # --- unpack scalar problem rows -------------------------------------
    # All scalar-per-scenario rows stay rank-2 [sb, L]: Mosaic's vector
    # layouts require >= 2-D operands (rank-1 values crash its layout pass).
    scal = scal_ref[:]
    row = lambda i: scal[i * S : (i + 1) * S]
    x0p, y0p, th0p = row(0), row(1), row(2)
    gx_, gy_, gth_ = row(3), row(4), row(5)
    v_lb, v_ub, w_lb, w_ub = row(6), row(7), row(8), row(9)
    m_vl, m_vu, m_wl, m_wu = row(10), row(11), row(12), row(13)
    xlb = [row(14 + i) for i in range(3)]
    xub = [row(17 + i) for i in range(3)]
    m_xl = [row(20 + i) for i in range(3)]
    m_xu = [row(23 + i) for i in range(3)]
    # Runtime centering parameter (per-scenario row): both the initial
    # sigma and the adaptive-decay floor — exactly the role SolverConfig
    # .mu_sigma plays in solver/ipm.py, but as data so refine stages can
    # change it without recompiling the kernel.
    sig_row = row(26)
    infl = (
        obinfo_ref[2 * K * S : (2 * K + 1) * S]
        if K > 0
        else jnp.zeros_like(x0p)
    )

    # Loop-invariant tiles of scalar rows onto family row counts.
    gx_T, gy_T, gth_T = up(gx_, T1), up(gy_, T1), up(gth_, T1)
    v_lb_N, v_ub_N = up(v_lb, N), up(v_ub, N)
    w_lb_N, w_ub_N = up(w_lb, N), up(w_ub, N)
    m_vl_N, m_vu_N = up(m_vl, N), up(m_vu, N)
    m_wl_N, m_wu_N = up(m_wl, N), up(m_wu, N)
    xlb_T = [up(b, T1) for b in xlb]
    xub_T = [up(b, T1) for b in xub]
    m_xl_T = [up(m, T1) for m in m_xl]
    m_xu_T = [up(m, T1) for m in m_xu]

    # --- init state from warm start -------------------------------------
    warm = warm_ref[:]
    x_ref[:] = warm[0 : T1 * S]
    y_ref[:] = warm[T1 * S : 2 * T1 * S]
    th_ref[:] = warm[2 * T1 * S : 3 * T1 * S]
    v_ref[:] = warm[3 * T1 * S : (3 * T1 + N) * S]
    w_ref[:] = warm[(3 * T1 + N) * S : (3 * T1 + 2 * N) * S]

    if K > 0:
        # Flattened obstacle layout (r5): every per-(k, t) quantity is ONE
        # [K*N*sb, L] plane (k-major, matching the sm() input layout and
        # the s_ob/nu_ob scratch), processed by whole-plane ops.  The r1-r4
        # kernels unrolled a Python loop over k — K times the *static*
        # instruction count for identical vector work, which is exactly
        # the axis the Mosaic compile-failure frontier grows along
        # (SCALING.md r3: K=8/bt>=256 dies while K<=6 passes at equal
        # VMEM).  Per-k structure survives only in loop-invariant plane
        # construction here (init-time) and the k-block reductions of the
        # condensation (_kreduce).
        radinfl_KN = jnp.concatenate(
            [
                pltpu.repeat(obinfo_ref[k * S : (k + 1) * S] + infl, N, 0)
                for k in range(K)
            ],
            axis=0,
        )  # [K*N*sb, L]: radius_k + inflation, tiled over t
        obm_KN = jnp.concatenate(
            [
                pltpu.repeat(
                    obinfo_ref[(K + k) * S : (K + k + 1) * S], N, 0
                )
                for k in range(K)
            ],
            axis=0,
        )
        affine = sc.fused_affine_tracks
        tx_in = tx_ref[:]
        ty_in = ty_ref[:]
        if affine:
            # t index per logical row (track column t covers state t+1).
            trow_N = (
                jax.lax.broadcasted_iota(jnp.int32, (N * S, 1), 0) // S
            ).astype(jnp.float32)

            def _recon(src):
                return jnp.concatenate(
                    [
                        up(src[k * S : (k + 1) * S], N)
                        + trow_N
                        * up(src[(K + k) * S : (K + k + 1) * S], N)
                        for k in range(K)
                    ],
                    axis=0,
                )

            tx_full = _recon(tx_in)
            ty_full = _recon(ty_in)
        else:
            tx_full, ty_full = tx_in, ty_in

        def _kreduce(x, op):
            """[K*N*sb, L] -> [N*sb, L]: contiguous k-block halving."""
            blk = N * S
            k = x.shape[0] // blk
            carry = None
            while k > 1:
                half = k // 2
                y = op(x[: half * blk], x[half * blk : 2 * half * blk])
                if k % 2:
                    last = x[2 * half * blk : k * blk]
                    carry = last if carry is None else op(carry, last)
                x = y
                k = half
            return x if carry is None else op(x, carry)

        def _rep_k(x):
            """Tile an [N*sb, L] state plane K times (k-major)."""
            return pltpu.repeat(x, K, 0)

    def families(xv, yv, thv, vv, wv, values_only=False,
                 obstacles_only=False, xyrep=None):
        """Constraint values (+ normals) at a trial point (whole-array).

        ``values_only`` skips the obstacle normals — line-search trial
        evaluations need only constraint values, and the normal planes
        (2 x [K*N*sb, L]) are the kernel's largest transient VMEM cost.
        The safe distance is recoverable as c + r + infl (see condensation),
        so it is not carried either.  ``obstacles_only`` additionally skips
        the box families: their trial values are affine in alpha, so the
        line search recovers their merit contribution in closed form
        ((1 - alpha) * consist0 — see merit_at) and never needs them.
        ``xyrep`` optionally passes precomputed K-tiled (x, y) planes
        (merit trials build them incrementally from the current iterate's
        tiles instead of re-tiling the trial point).
        """
        if obstacles_only:
            c_vl = c_vu = c_wl = c_wu = None
            c_xl = c_xu = [None, None, None]
        else:
            c_vl = vv - v_lb_N
            c_vu = v_ub_N - vv
            c_wl = wv - w_lb_N
            c_wu = w_ub_N - wv
            comps = (xv, yv, thv)
            c_xl = [comps[i] - xlb_T[i] for i in range(3)]
            c_xu = [xub_T[i] - comps[i] for i in range(3)]
        if K > 0:
            if xyrep is None:
                xrep, yrep = _rep_k(xv[S:]), _rep_k(yv[S:])
            else:
                xrep, yrep = xyrep
            dxk = xrep - tx_full
            dyk = yrep - ty_full
            dist = jnp.sqrt(dxk * dxk + dyk * dyk + 1e-16)
            c_ob = dist - radinfl_KN
            if values_only:
                obs = (c_ob, None, None)
            else:
                ds_safe = jnp.maximum(dist, 1e-2)
                obs = (c_ob, dxk / ds_safe, dyk / ds_safe)
        else:
            obs = None
        return (c_vl, c_vu, c_wl, c_wu), c_xl, c_xu, obs

    # --- init slacks / duals --------------------------------------------
    mu0 = jnp.float32(sc.mu_init)
    (c_vl, c_vu, c_wl, c_wu), c_xl, c_xu, obs = families(
        x_ref[:], y_ref[:], th_ref[:], v_ref[:], w_ref[:]
    )

    def init_pair(c, mask):
        s = jnp.where(mask > 0, jnp.maximum(c, 1e-2), 1.0)
        nu = jnp.where(mask > 0, mu0 / s, 0.0)
        return s, nu

    for blk, (c, m) in enumerate(
        ((c_vl, m_vl_N), (c_vu, m_vu_N), (c_wl, m_wl_N), (c_wu, m_wu_N))
    ):
        s, nu = init_pair(c, m)
        s_c_ref[blk * N * S : (blk + 1) * N * S] = s
        nu_c_ref[blk * N * S : (blk + 1) * N * S] = nu
    for i in range(3):
        s, nu = init_pair(c_xl[i], m_xl_T[i])
        s_x_ref[i * T1 * S : (i + 1) * T1 * S] = s
        nu_x_ref[i * T1 * S : (i + 1) * T1 * S] = nu
        s, nu = init_pair(c_xu[i], m_xu_T[i])
        s_x_ref[(3 + i) * T1 * S : (4 + i) * T1 * S] = s
        nu_x_ref[(3 + i) * T1 * S : (4 + i) * T1 * S] = nu
    if K > 0:
        s, nu = init_pair(obs[0], obm_KN)
        s_ob_ref[:] = s
        nu_ob_ref[:] = nu
        if ELASTIC:
            # central-ish elastic init (solver/ipm.py::_init_state): e
            # solves c + e = s when violated, else sits at mu/rho_e.
            e_ob_ref[:] = jnp.where(
                obm_KN > 0,
                jnp.maximum(s - obs[0], mu0 / rho_e),
                1.0,
            )

    def _log_consist(c, mask, s):
        lg = _reduce_sum(mask * jnp.log(jnp.maximum(s, 1e-30)))
        cs = _reduce_sum(mask * jnp.abs(c - s))
        return lg, cs

    # --- helper: load family tuples from refs ----------------------------
    def load_fams(cv, cxl, cxu, obsv):
        c_blocks = cv
        fams = {}
        names = ("vl", "vu", "wl", "wu")
        masks = (m_vl_N, m_vu_N, m_wl_N, m_wu_N)
        s_c = s_c_ref[:]
        nu_c = nu_c_ref[:]
        for blk, nm in enumerate(names):
            fams[nm] = _Fam(
                c_blocks[blk],
                s_c[blk * N * S : (blk + 1) * N * S],
                nu_c[blk * N * S : (blk + 1) * N * S],
                masks[blk],
            )
        s_x = s_x_ref[:]
        nu_x = nu_x_ref[:]
        for i in range(3):
            fams[f"xl{i}"] = _Fam(
                cxl[i], s_x[i * T1 * S : (i + 1) * T1 * S],
                nu_x[i * T1 * S : (i + 1) * T1 * S], m_xl_T[i],
            )
            fams[f"xu{i}"] = _Fam(
                cxu[i], s_x[(3 + i) * T1 * S : (4 + i) * T1 * S],
                nu_x[(3 + i) * T1 * S : (4 + i) * T1 * S], m_xu_T[i],
            )
        if K > 0:
            fams["ob"] = _Fam(
                obsv[0], s_ob_ref[:], nu_ob_ref[:], obm_KN
            )
        return fams

    def merit_terms(xv, yv, thv, vv, wv):
        """(objective, defect/pin l1, trig) at a trial point."""
        ct = jnp.cos(thv[:-S])
        st = jnp.sin(thv[:-S])
        ex, ey, eth = xv - gx_T, yv - gy_T, thv - gth_T
        obj = _reduce_sum(gm * (w0 * ex * ex + w1 * ey * ey + w2 * eth * eth))
        neg = jnp.minimum(vv, 0.0)
        if cc.reverse_penalty_mode == "squared":
            obj = obj + w_neg * _reduce_sum(neg * neg)
        else:
            obj = obj + w_neg * _reduce_sum(neg)
        pos = jnp.maximum(vv, 0.0)
        obj = obj + w_pos * _reduce_sum(pos * pos)
        obj = obj + w_ang * _reduce_sum(wv * wv)
        d0r = xv[:-S] + vv * ct * dt - xv[S:]
        d1r = yv[:-S] + vv * st * dt - yv[S:]
        d2r = thv[:-S] + wv * dt - thv[S:]
        eq = (
            _reduce_sum(jnp.abs(d0r))
            + _reduce_sum(jnp.abs(d1r))
            + _reduce_sum(jnp.abs(d2r))
            + jnp.abs(x0p - xv[0:S])
            + jnp.abs(y0p - yv[0:S])
            + jnp.abs(th0p - thv[0:S])
        )
        return obj, eq, (ct, st, d0r, d1r, d2r)

    # Initial merit components at the warm-start iterate.  (obj, log, eq +
    # consist) are carried across iterations: each iteration *recomposes*
    # merit0 = obj - mu*log + rho*eqc with its fresh mu/rho instead of
    # re-evaluating the merit at alpha=0 — exactly one of the ls_iters + 1
    # full merit evaluations per iteration, for three extra carry rows.
    fams0 = load_fams((c_vl, c_vu, c_wl, c_wu), c_xl, c_xu, obs)
    m_obj0, m_eq0, _ = merit_terms(
        x_ref[:], y_ref[:], th_ref[:], v_ref[:], w_ref[:]
    )
    m_log0 = jnp.zeros_like(x0p)
    m_cons0 = jnp.zeros_like(x0p)
    for nm, f in fams0.items():
        if ELASTIC and nm == "ob":
            # elastic merit terms (solver/ipm.py::_merit): log(e) joins the
            # barrier, rho_e*e joins the objective, consistency is
            # |c + e - s|.
            e0v = e_ob_ref[:]
            m_log0 = m_log0 + _reduce_sum(
                f.mask * jnp.log(jnp.maximum(f.s, 1e-30))
            ) + _reduce_sum(f.mask * jnp.log(jnp.maximum(e0v, 1e-30)))
            m_obj0 = m_obj0 + rho_e * _reduce_sum(f.mask * e0v)
            m_cons0 = m_cons0 + _reduce_sum(
                f.mask * jnp.abs(f.c + e0v - f.s)
            )
            continue
        lg, cs = _log_consist(f.c, f.mask, f.s)
        m_log0 = m_log0 + lg
        m_cons0 = m_cons0 + cs
    m_eqc0 = m_eq0 + m_cons0

    adaptive_sigma = sc.mu_sigma_max > 0.0

    # --- iteration body ---------------------------------------------------
    # Dynamic-bound fori with genuine value carries — the compile-fast
    # shape (both lax.while_loop and scratch-resident carries measured
    # ~10-20x slower to compile, and while_loop additionally crawls in
    # interpret mode).  A tile-level early-exit variant (scratch-resident
    # carries under pl.when, stop once the tile's max Newton direction
    # settles) was built and measured in r4 and REMOVED: even re-solving
    # from exact solutions it saved <= 4.5% at an aggressive tolerance,
    # because each solve re-initializes slacks/duals and must re-walk the
    # central path regardless of warm-start quality (SCALING.md r4;
    # implementation in git history).

    def _iteration(reg, sigma_c, m_obj, m_log, m_eqc):
        # [sb, L] each; m_* are the merit components of the current iterate
        # (= last iteration's accepted line-search candidate).
        reg_N = up(reg, N)
        reg_T = up(reg, T1)
        xv, yv, thv = x_ref[:], y_ref[:], th_ref[:]
        vv, wv = v_ref[:], w_ref[:]
        if K > 0:
            # K-tiled current-iterate planes, shared by the condensation
            # and (incrementally updated) by every merit trial.
            xyrep = (_rep_k(xv[S:]), _rep_k(yv[S:]))
        else:
            xyrep = None
        cv, cxl, cxu, obsv = families(xv, yv, thv, vv, wv, xyrep=xyrep)
        fams = load_fams(cv, cxl, cxu, obsv)

        # adaptive mu from mean complementarity
        tot = jnp.zeros_like(x0p)
        cnt = jnp.zeros_like(x0p)
        for f in fams.values():
            tot = tot + _reduce_sum(f.mask * f.s * f.nu)
            cnt = cnt + _reduce_sum(f.mask * jnp.ones_like(f.s))
        # dtype-aware barrier floor (see solver/ipm.py::_adaptive_mu):
        # below ~50 eps the f32 central path is unrepresentable and late
        # iterations corrupt converged iterates.
        mu = jnp.clip(
            sigma_c * tot / jnp.maximum(cnt, 1.0),
            jnp.float32(max(sc.mu_min, 50.0 * 1.1920929e-07)),
            jnp.float32(sc.mu_init),
        )
        mu_N = up(mu, N)
        mu_T = up(mu, T1)
        mu_KN = up(mu, K * N) if K > 0 else None

        # --- cost derivatives + condensation -----------------------------
        ct = jnp.cos(thv[:-S])
        st = jnp.sin(thv[:-S])
        gxc = 2.0 * gm * w0 * (xv - gx_T)
        gyc = 2.0 * gm * w1 * (yv - gy_T)
        gthc = 2.0 * gm * w2 * (thv - gth_T)
        Hx0 = 2.0 * gm * w0 * jnp.ones_like(xv)
        Hx1 = 2.0 * gm * w1 * jnp.ones_like(xv)
        Hx2 = 2.0 * gm * w2 * jnp.ones_like(xv)
        negm = (vv < 0.0).astype(xv.dtype)
        posm = (vv > 0.0).astype(xv.dtype)
        if cc.reverse_penalty_mode == "squared":
            gv = 2.0 * w_neg * jnp.minimum(vv, 0.0)
            Hv = 2.0 * w_neg * negm
        else:
            gv = w_neg * negm
            Hv = jnp.zeros_like(vv)
        gv = gv + 2.0 * w_pos * jnp.maximum(vv, 0.0)
        Hv = Hv + 2.0 * w_pos * posm
        gw = 2.0 * w_ang * wv
        Hw = 2.0 * w_ang * jnp.ones_like(wv)

        g_vl, sig_vl = _grad_coef(fams["vl"], mu_N)
        g_vu, sig_vu = _grad_coef(fams["vu"], mu_N)
        g_wl, sig_wl = _grad_coef(fams["wl"], mu_N)
        g_wu, sig_wu = _grad_coef(fams["wu"], mu_N)
        qv = gv - g_vl + g_vu
        qw = gw - g_wl + g_wu
        Qv = Hv + sig_vl + sig_vu + reg_N
        Qw = Hw + sig_wl + sig_wu + reg_N

        qx = [gxc, gyc, gthc]
        Qd = [Hx0, Hx1, Hx2]
        for i in range(3):
            g_l, s_l = _grad_coef(fams[f"xl{i}"], mu_T)
            g_u, s_u = _grad_coef(fams[f"xu{i}"], mu_T)
            qx[i] = qx[i] - g_l + g_u
            Qd[i] = Qd[i] + s_l + s_u
        Qxy = jnp.zeros_like(vv)  # (x, y) off-diagonal, rows 1..N only
        if ELASTIC:
            def elastic_terms(fk, ev):
                """Mirrors solver/ipm.py::_elastic_coef (f32 floors)."""
                s_safe = jnp.maximum(fk.s, _F32_FLOOR)
                e_safe = jnp.maximum(ev, _F32_FLOOR)
                sig_s = _sigma(fk)
                sig_e = jnp.clip(
                    mu_KN / (e_safe * e_safe), 0.0, _SIGMA_MAX
                )
                sig_eff = fk.mask * sig_s * sig_e / jnp.maximum(
                    sig_s + sig_e, _F32_FLOOR
                )
                T_ = mu_KN / s_safe - fk.nu
                r_e = rho_e - mu_KN / e_safe - fk.nu
                r_c = fk.c + ev - fk.s
                return T_, r_e, r_c, sig_s, sig_e, sig_eff
        if K > 0:
            fk = fams["ob"]
            if ELASTIC:
                e_cur = e_ob_ref[:]
                T_ob, r_e_ob, r_c_ob, sig_s_ob, sig_e_ob, sig_o = (
                    elastic_terms(fk, e_cur)
                )
                g_o = fk.mask * (
                    fk.nu
                    - sig_o * r_c_ob
                    + sig_o * (
                        T_ob / jnp.maximum(sig_s_ob, _F32_FLOOR)
                        + r_e_ob / sig_e_ob
                    )
                )
            else:
                g_o, sig_o = _grad_coef(fk, mu_KN)
            c_ob, nxk, nyk = obsv
            h00 = sig_o * nxk * nxk
            h01 = sig_o * nxk * nyk
            h11 = sig_o * nyk * nyk
            if sc.obstacle_curvature:
                # dist = c + r + infl (up to f32 rounding); the floor
                # matches families()'s ds_safe.
                dsafe = jnp.maximum(c_ob + radinfl_KN, 1e-2)
                wc = jnp.maximum(
                    -fk.mask * fk.nu / dsafe, -0.9 * sig_o
                )
                h00 = h00 + wc * (1.0 - nxk * nxk)
                h01 = h01 - wc * nxk * nyk
                h11 = h11 + wc * (1.0 - nyk * nyk)
            addx = _kreduce(-nxk * g_o, jnp.add)
            addy = _kreduce(-nyk * g_o, jnp.add)
            a00 = _kreduce(h00, jnp.add)
            a01 = _kreduce(h01, jnp.add)
            a11 = _kreduce(h11, jnp.add)
            # no scatter-add in Mosaic: concatenate the untouched row 0
            cat = lambda base, add: jnp.concatenate(
                [base[:S], base[S:] + add], axis=0
            )
            qx[0] = cat(qx[0], addx)
            qx[1] = cat(qx[1], addy)
            Qd[0] = cat(Qd[0], a00)
            Qd[1] = cat(Qd[1], a11)
            Qxy = a01
        Qd = [q + reg_T for q in Qd]

        # --- dynamics ------------------------------------------------------
        a02 = -vv * st * dt
        a12 = vv * ct * dt
        b00 = ct * dt
        b10 = st * dt
        d0r = xv[:-S] + vv * ct * dt - xv[S:]
        d1r = yv[:-S] + vv * st * dt - yv[S:]
        d2r = thv[:-S] + wv * dt - thv[S:]
        pin0 = x0p - xv[0:S]
        pin1 = y0p - yv[0:S]
        pin2 = th0p - thv[0:S]

        # Stage per-time quantities into VMEM so the sequential sweeps can
        # index rows dynamically (Mosaic has no dynamic_slice on *values*).
        # Layout: slot s occupies rows [s*T1*sb, s*T1*sb + len*sb).
        _ST = {
            "a02": (0, a02), "a12": (1, a12), "b00": (2, b00),
            "b10": (3, b10), "d0": (4, d0r), "d1": (5, d1r),
            "d2": (6, d2r), "Qv": (7, Qv), "Qw": (8, Qw), "qv": (9, qv),
            "qw": (10, qw), "Q0": (11, Qd[0]), "Q1": (12, Qd[1]),
            "Q2": (13, Qd[2]), "qx0": (14, qx[0]), "qx1": (15, qx[1]),
            "qx2": (16, qx[2]),
        }
        for slot, arr in _ST.values():
            stage_ref[slot * T1 * S : slot * T1 * S + arr.shape[0]] = arr
        if K > 0:
            # Qxy shifted so that row t holds the off-diagonal of *state* t
            # (zero at t=0): rows 1..N <- Qxy[0..N-1].
            stage_ref[17 * T1 * S : 17 * T1 * S + S] = jnp.zeros_like(
                Qxy[:S]
            )
            stage_ref[17 * T1 * S + S : 17 * T1 * S + S + N * S] = Qxy

        def _row(slot, t):
            return stage_ref[pl.ds((slot * T1 + t) * S, S)]  # [sb, L]

        # --- backward Riccati (specialized, sequential in t) ---------------
        def bwd(tr, carry):
            t = N - 1 - tr
            (P00, P01, P02, P11, P12, P22, p0, p1, p2,
             l0, l1, l2, lmax) = carry
            a02t = _row(0, t)
            a12t = _row(1, t)
            b00t = _row(2, t)
            b10t = _row(3, t)
            d0t = _row(4, t)
            d1t = _row(5, t)
            d2t = _row(6, t)
            Qvt = _row(7, t)
            Qwt = _row(8, t)
            qvt = _row(9, t)
            qwt = _row(10, t)
            Q0t = _row(11, t)
            Q1t = _row(12, t)
            Q2t = _row(13, t)
            qx0t = _row(14, t)
            qx1t = _row(15, t)
            qx2t = _row(16, t)
            Qxyt = _row(17, t) if K > 0 else 0.0

            # Pa = P @ a, a = (a02, a12, 1)
            Pa0 = P00 * a02t + P01 * a12t + P02
            Pa1 = P01 * a02t + P11 * a12t + P12
            Pa2 = P02 * a02t + P12 * a12t + P22
            # Pd_p = P @ d + p
            Pd0 = P00 * d0t + P01 * d1t + P02 * d2t + p0
            Pd1 = P01 * d0t + P11 * d1t + P12 * d2t + p1
            Pd2 = P02 * d0t + P12 * d1t + P22 * d2t + p2
            # B' P B (2x2 sym)
            PB00 = b00t * P00 + b10t * P01  # (P B)[0,0]
            PB01 = b00t * P01 + b10t * P11
            PB02 = b00t * P02 + b10t * P12
            e00 = b00t * PB00 + b10t * PB01
            e01 = dt * PB02
            e11 = dt * dt * P22
            Quu00 = Qvt + e00
            Quu01 = e01
            Quu11 = Qwt + e11
            # Qux = B' P A  (2x3): row0 = b.col0' PA cols; row1 = dt * P row2
            Qux00 = PB00
            Qux01 = PB01
            Qux02 = b00t * Pa0 + b10t * Pa1
            Qux10 = dt * P02
            Qux11 = dt * P12
            Qux12 = dt * Pa2
            qu0 = qvt + b00t * Pd0 + b10t * Pd1
            qu1 = qwt + dt * Pd2
            det = Quu00 * Quu11 - Quu01 * Quu01
            inv = 1.0 / det
            i00 = Quu11 * inv
            i01 = -Quu01 * inv
            i11 = Quu00 * inv
            K00 = -(i00 * Qux00 + i01 * Qux10)
            K01 = -(i00 * Qux01 + i01 * Qux11)
            K02 = -(i00 * Qux02 + i01 * Qux12)
            K10 = -(i01 * Qux00 + i11 * Qux10)
            K11 = -(i01 * Qux01 + i11 * Qux11)
            K12 = -(i01 * Qux02 + i11 * Qux12)
            k0 = -(i00 * qu0 + i01 * qu1)
            k1 = -(i01 * qu0 + i11 * qu1)
            # store gains (slot-major: gain g's rows at (g*N + t) — the
            # r4 per-t interleaved layout measured -7.8% on the free
            # bt=256/sb=2 config same-process, +2% at K=8/sb=1; slot-major
            # wins net, scripts/ab_kernel.py vs 8e3f3e0)
            kk_ref[pl.ds((0 * N + t) * S, S)] = K00
            kk_ref[pl.ds((1 * N + t) * S, S)] = K01
            kk_ref[pl.ds((2 * N + t) * S, S)] = K02
            kk_ref[pl.ds((3 * N + t) * S, S)] = K10
            kk_ref[pl.ds((4 * N + t) * S, S)] = K11
            kk_ref[pl.ds((5 * N + t) * S, S)] = K12
            kk_ref[pl.ds((6 * N + t) * S, S)] = k0
            kk_ref[pl.ds((7 * N + t) * S, S)] = k1
            # A' P A: [[P00, P01, Pa0], [P01, P11, Pa1], [Pa0, Pa1, a'Pa]]
            aPa = a02t * Pa0 + a12t * Pa1 + Pa2
            # S = Qux' K  (3x3)
            S00 = Qux00 * K00 + Qux10 * K10
            S01 = Qux00 * K01 + Qux10 * K11
            S02 = Qux00 * K02 + Qux10 * K12
            S10 = Qux01 * K00 + Qux11 * K10
            S11 = Qux01 * K01 + Qux11 * K11
            S12 = Qux01 * K02 + Qux11 * K12
            S20 = Qux02 * K00 + Qux12 * K10
            S21 = Qux02 * K01 + Qux12 * K11
            S22 = Qux02 * K02 + Qux12 * K12
            nP00 = Q0t + P00 + S00
            nP01 = Qxyt + P01 + 0.5 * (S01 + S10)
            nP02 = Pa0 + 0.5 * (S02 + S20)
            nP11 = Q1t + P11 + S11
            nP12 = Pa1 + 0.5 * (S12 + S21)
            nP22 = Q2t + aPa + S22
            # p' = qx + A'(Pd + p) + Qux' k
            np0 = qx0t + Pd0 + Qux00 * k0 + Qux10 * k1
            np1 = qx1t + Pd1 + Qux01 * k0 + Qux11 * k1
            np2 = (
                qx2t
                + a02t * Pd0
                + a12t * Pd1
                + Pd2
                + Qux02 * k0
                + Qux12 * k1
            )
            # adjoint multiplier estimate: lam_t = qx_t + A_t' lam_{t+1}
            # (A' v = [v0, v1, a.v] with a = (a02, a12, 1)); its running max
            # feeds the l1 penalty weight rho (must dominate the dynamics
            # multipliers or the merit rejects the Newton direction for
            # far-goal problems).
            nl0 = qx0t + l0
            nl1 = qx1t + l1
            nl2 = qx2t + a02t * l0 + a12t * l1 + l2
            nlmax = jnp.maximum(
                lmax,
                jnp.maximum(
                    jnp.abs(nl0), jnp.maximum(jnp.abs(nl1), jnp.abs(nl2))
                ),
            )
            return (nP00, nP01, nP02, nP11, nP12, nP22, np0, np1, np2,
                    nl0, nl1, nl2, nlmax)

        # terminal value: stage-N Hessian (diag + xy off-diag) and gradient
        QxyN = Qxy[(N - 1) * S : N * S] if K > 0 else jnp.zeros_like(x0p)
        NL = N * S
        NH = (N + 1) * S
        lamN_abs = jnp.maximum(
            jnp.abs(qx[0][NL:NH]),
            jnp.maximum(jnp.abs(qx[1][NL:NH]), jnp.abs(qx[2][NL:NH])),
        )
        carry0 = (
            Qd[0][NL:NH], QxyN, jnp.zeros_like(x0p),
            Qd[1][NL:NH], jnp.zeros_like(x0p), Qd[2][NL:NH],
            qx[0][NL:NH], qx[1][NL:NH], qx[2][NL:NH],
            qx[0][NL:NH], qx[1][NL:NH], qx[2][NL:NH],
            lamN_abs,
        )
        bwd_out = jax.lax.fori_loop(0, N, bwd, carry0)
        lam_max = bwd_out[-1]

        # --- forward rollout ------------------------------------------------
        def fwd(t, dxc):
            dx0, dx1, dx2 = dxc
            K00 = kk_ref[pl.ds((0 * N + t) * S, S)]
            K01 = kk_ref[pl.ds((1 * N + t) * S, S)]
            K02 = kk_ref[pl.ds((2 * N + t) * S, S)]
            K10 = kk_ref[pl.ds((3 * N + t) * S, S)]
            K11 = kk_ref[pl.ds((4 * N + t) * S, S)]
            K12 = kk_ref[pl.ds((5 * N + t) * S, S)]
            k0 = kk_ref[pl.ds((6 * N + t) * S, S)]
            k1 = kk_ref[pl.ds((7 * N + t) * S, S)]
            du0 = K00 * dx0 + K01 * dx1 + K02 * dx2 + k0
            du1 = K10 * dx0 + K11 * dx1 + K12 * dx2 + k1
            dus_ref[pl.ds(t * S, S)] = du0
            dus_ref[pl.ds((N + t) * S, S)] = du1
            a02t = _row(0, t)
            a12t = _row(1, t)
            b00t = _row(2, t)
            b10t = _row(3, t)
            d0t = _row(4, t)
            d1t = _row(5, t)
            d2t = _row(6, t)
            ndx0 = dx0 + a02t * dx2 + b00t * du0 + d0t
            ndx1 = dx1 + a12t * dx2 + b10t * du0 + d1t
            ndx2 = dx2 + dt * du1 + d2t
            dxs_ref[pl.ds((t + 1) * S, S)] = ndx0
            dxs_ref[pl.ds((T1 + t + 1) * S, S)] = ndx1
            dxs_ref[pl.ds((2 * T1 + t + 1) * S, S)] = ndx2
            return (ndx0, ndx1, ndx2)

        dxs_ref[pl.ds(0, S)] = pin0
        dxs_ref[pl.ds(T1 * S, S)] = pin1
        dxs_ref[pl.ds(2 * T1 * S, S)] = pin2
        jax.lax.fori_loop(0, N, fwd, (pin0, pin1, pin2))

        ddx = dxs_ref[0 : T1 * S]
        ddy = dxs_ref[T1 * S : 2 * T1 * S]
        ddth = dxs_ref[2 * T1 * S : 3 * T1 * S]
        ddv = dus_ref[0 : N * S]
        ddw = dus_ref[N * S : 2 * N * S]

        # --- slack / dual steps --------------------------------------------
        # Only the slack steps ds are *held* across the line search (the
        # merit needs them per candidate); the dual steps dnu contribute one
        # fraction-to-boundary reduction here and are recomputed bit-identical
        # at update time — holding all 18 dnu planes across the search is
        # pure VMEM liveness with no reuse.
        def step_ds(f: _Fam, jdz):
            return f.mask * (jdz + f.c - f.s)

        def step_dnu(f: _Fam, ds, mu_t):
            sig = _sigma(f)
            return f.mask * (
                mu_t / jnp.maximum(f.s, _F32_FLOOR) - f.nu - sig * ds
            )

        jdz_map = {
            "vl": ddv, "vu": -ddv, "wl": ddw, "wu": -ddw,
            "xl0": ddx, "xu0": -ddx, "xl1": ddy, "xu1": -ddy,
            "xl2": ddth, "xu2": -ddth,
        }
        mu_map = {
            "vl": mu_N, "vu": mu_N, "wl": mu_N, "wu": mu_N,
            "xl0": mu_T, "xu0": mu_T, "xl1": mu_T, "xu1": mu_T,
            "xl2": mu_T, "xu2": mu_T,
        }
        if K > 0:
            _, nxk_f, nyk_f = obsv
            ddxrep, ddyrep = _rep_k(ddx[S:]), _rep_k(ddy[S:])
            jdz_map["ob"] = nxk_f * ddxrep + nyk_f * ddyrep
            mu_map["ob"] = mu_KN
        deltas = {nm: step_ds(fams[nm], jdz_map[nm]) for nm in fams}
        de_ob = None
        if ELASTIC:
            # Eliminated (ds, de, dnu) of the elastic system
            # (solver/ipm.py::_iteration elastic branch); T_ob etc. carry
            # over from the condensation above (same iterate, same mu).
            fk = fams["ob"]
            beta = sig_e_ob / jnp.maximum(
                sig_s_ob + sig_e_ob, _F32_FLOOR
            )
            ds_el = fk.mask * beta * (
                jdz_map["ob"] + r_c_ob + (T_ob - r_e_ob) / sig_e_ob
            )
            de_ob = fk.mask * (
                T_ob - r_e_ob - sig_s_ob * ds_el
            ) / sig_e_ob
            dnu_ob_el = fk.mask * (T_ob - sig_s_ob * ds_el)
            deltas["ob"] = ds_el

        tau = jnp.float32(sc.tau)
        alpha_s = jnp.ones_like(x0p)
        alpha_nu = jnp.ones_like(x0p)
        for nm, f in fams.items():
            ds = deltas[nm]
            alpha_s = jnp.minimum(alpha_s, _ftb(f.s, ds, tau))
            if ELASTIC and nm == "ob":
                dnu = dnu_ob_el
            else:
                dnu = step_dnu(f, ds, mu_map[nm])
            alpha_nu = jnp.minimum(alpha_nu, _ftb(f.nu, dnu, tau))
        if ELASTIC:
            alpha_s = jnp.minimum(alpha_s, _ftb(e_cur, de_ob, tau))

        # rho: l1 penalty must dominate the multipliers
        nu_max = jnp.zeros_like(x0p)
        for f in fams.values():
            nu_max = jnp.maximum(nu_max, _reduce_max(f.mask * f.nu))
        rho = jnp.maximum(
            jnp.float32(sc.merit_penalty),
            2.0 * jnp.maximum(nu_max, lam_max),
        )

        # --- merit line search ---------------------------------------------
        # Box-family consistency is affine in alpha: with
        # ds = mask*(jdz + c - s) and trial value c + a*jdz (box constraints
        # are linear in z), c_trial - ts = (1 - a)*(c - s) exactly — one
        # precomputed scalar replaces 10 trial constraint planes per
        # candidate.  Obstacle distances are nonlinear and evaluated fully.
        consist0_box = jnp.zeros_like(x0p)
        for nm in ("vl", "vu", "wl", "wu",
                   "xl0", "xl1", "xl2", "xu0", "xu1", "xu2"):
            f = fams[nm]
            consist0_box = consist0_box + _reduce_sum(
                f.mask * jnp.abs(f.c - f.s)
            )

        def merit_at(alpha):
            """-> (merit, obj, log_term, eq + consist) at the trial point."""
            a_N = up(alpha, N)
            a_T = up(alpha, T1)
            txv = xv + a_T * ddx
            tyv = yv + a_T * ddy
            tthv = thv + a_T * ddth
            tvv = vv + a_N * ddv
            twv = wv + a_N * ddw
            obj, eq, _ = merit_terms(txv, tyv, tthv, tvv, twv)
            if K > 0:
                # Trial K-tiled planes from the current iterate's tiles —
                # one fused multiply-add per plane instead of a re-tile.
                a_KN = up(alpha, K * N)
                _, _, _, tobs = families(
                    None, None, None, None, None,
                    values_only=True, obstacles_only=True,
                    xyrep=(xyrep[0] + a_KN * ddxrep,
                           xyrep[1] + a_KN * ddyrep),
                )
            log_term = jnp.zeros_like(x0p)
            consist = (1.0 - alpha) * consist0_box
            for nm, f in fams.items():
                ds = deltas[nm]
                if nm == "ob":
                    a_f = a_KN
                elif ds.shape[0] == N * S:
                    a_f = a_N
                else:
                    a_f = a_T
                ts = f.s + a_f * ds
                log_term = log_term + _reduce_sum(
                    f.mask * jnp.log(jnp.maximum(ts, 1e-30))
                )
                if nm == "ob":
                    if ELASTIC:
                        te = e_cur + a_KN * de_ob
                        log_term = log_term + _reduce_sum(
                            f.mask * jnp.log(jnp.maximum(te, 1e-30))
                        )
                        obj = obj + rho_e * _reduce_sum(f.mask * te)
                        consist = consist + _reduce_sum(
                            f.mask * jnp.abs(tobs[0] + te - ts)
                        )
                    else:
                        consist = consist + _reduce_sum(
                            f.mask * jnp.abs(tobs[0] - ts)
                        )
            eqc = eq + consist
            return obj - mu * log_term + rho * eqc, obj, log_term, eqc

        merit0 = m_obj - mu * m_log + rho * m_eqc
        step_inf = jnp.zeros_like(x0p)
        for dzz in (ddx, ddy, ddth, ddv, ddw):
            step_inf = jnp.maximum(step_inf, _reduce_max(jnp.abs(dzz)))
        eps32 = jnp.float32(1.1920929e-07)
        # f32 noise regime up to 1e-2 (mirrors solver/ipm.py): strict merit
        # comparisons below that step size reject the Newton tail at random.
        newton_regime = step_inf < 1e-2
        tol = 16.0 * eps32 * (1.0 + jnp.abs(merit0)) + jnp.where(
            newton_regime, 10.0 * rho * step_inf * step_inf, 0.0
        )

        def ls(j, carry):
            # all-f32 carry: Mosaic mishandles i1 vectors in loop carries;
            # candidate alpha via multiplicative carry (no powf in Mosaic).
            # s_* stash the merit components of the candidate that will be
            # *executed*: the first accepted one, else the last (deepest)
            # candidate — which equals the alpha_min fallback by
            # construction.  They become the next iteration's merit0.
            (alpha_best, found, n_rej, aj,
             s_obj, s_log, s_eqc, fin_last) = carry
            m, c_obj, c_log, c_eqc = merit_at(aj)
            m_fin = jnp.isfinite(m).astype(jnp.float32)
            ok = m_fin * (m <= merit0 + tol).astype(jnp.float32)
            take = ok * (1.0 - found)
            found = jnp.maximum(found, ok)
            is_last = jnp.where(
                j == sc.ls_iters - 1, jnp.float32(1.0), jnp.float32(0.0)
            )
            sel = take + (1.0 - found) * is_last
            alpha_best = take * aj + (1.0 - take) * alpha_best
            s_obj = sel * c_obj + (1.0 - sel) * s_obj
            s_log = sel * c_log + (1.0 - sel) * s_log
            s_eqc = sel * c_eqc + (1.0 - sel) * s_eqc
            fin_last = is_last * m_fin + (1.0 - is_last) * fin_last
            n_rej = n_rej + (1.0 - found)
            return (alpha_best, found, n_rej,
                    aj * jnp.float32(sc.ls_backtrack),
                    s_obj, s_log, s_eqc, fin_last)

        alpha_min = alpha_s * jnp.float32(
            float(sc.ls_backtrack) ** (sc.ls_iters - 1)
        )
        z = jnp.zeros_like(x0p)
        alpha_best, found, n_rej, _, m_obj_n, m_log_n, m_eqc_n, fin_last = (
            jax.lax.fori_loop(
                0, sc.ls_iters, ls, (alpha_min, z, z, alpha_s, z, z, z, z)
            )
        )
        # All-rejected fallback executes the deepest candidate (it keeps
        # progress through merit deadlocks — the ls=2 convergence win lives
        # here) but ONLY when that trial's merit was finite: executing a
        # non-finite direction detonates the iterate (NaN states no later
        # iteration can repair — measured in the closed-loop fleet).  A
        # frozen lane (alpha=0) also freezes its carried merit components:
        # sel picked the last candidate's (non-finite) components, so zero
        # them back to the previous iterate's via fin_last masking below.
        alpha = alpha_best * (found + (1.0 - found) * fin_last)
        keep = jnp.maximum(found, fin_last)
        m_obj_n = keep * m_obj_n + (1.0 - keep) * m_obj
        m_log_n = keep * m_log_n + (1.0 - keep) * m_log
        m_eqc_n = keep * m_eqc_n + (1.0 - keep) * m_eqc
        alpha_nu = jnp.minimum(alpha_nu, alpha)
        alpha_N, alpha_T = up(alpha, N), up(alpha, T1)
        alpha_nu_N, alpha_nu_T = up(alpha_nu, N), up(alpha_nu, T1)

        # --- apply updates -------------------------------------------------
        x_ref[:] = xv + alpha_T * ddx
        y_ref[:] = yv + alpha_T * ddy
        th_ref[:] = thv + alpha_T * ddth
        v_ref[:] = vv + alpha_N * ddv
        w_ref[:] = wv + alpha_N * ddw

        def clamp(nu_new, s_new, mask, mu_t):
            center = mu_t / jnp.maximum(s_new, _F32_FLOOR)
            return mask * jnp.clip(nu_new, center / _KAPPA, center * _KAPPA)

        names_c = ("vl", "vu", "wl", "wu")
        for blk, nm in enumerate(names_c):
            f = fams[nm]
            ds = deltas[nm]
            dnu = step_dnu(f, ds, mu_N)
            s_new = f.s + alpha_N * ds
            s_c_ref[blk * N * S : (blk + 1) * N * S] = s_new
            nu_c_ref[blk * N * S : (blk + 1) * N * S] = clamp(
                f.nu + alpha_nu_N * dnu, s_new, f.mask, mu_N
            )
        for i in range(3):
            for lo, nm in ((True, f"xl{i}"), (False, f"xu{i}")):
                f = fams[nm]
                ds = deltas[nm]
                dnu = step_dnu(f, ds, mu_T)
                s_new = f.s + alpha_T * ds
                base = (i * T1 if lo else (3 + i) * T1) * S
                s_x_ref[base : base + T1 * S] = s_new
                nu_x_ref[base : base + T1 * S] = clamp(
                    f.nu + alpha_nu_T * dnu, s_new, f.mask, mu_T
                )
        if K > 0:
            alpha_KN = up(alpha, K * N)
            alpha_nu_KN = up(alpha_nu, K * N)
            f = fams["ob"]
            ds = deltas["ob"]
            dnu = dnu_ob_el if ELASTIC else step_dnu(f, ds, mu_KN)
            s_new = f.s + alpha_KN * ds
            s_ob_ref[:] = s_new
            nu_ob_ref[:] = clamp(
                f.nu + alpha_nu_KN * dnu, s_new, f.mask, mu_KN
            )
            if ELASTIC:
                e_ob_ref[:] = e_cur + alpha_KN * de_ob

        # Deep-backtrack reg growth only outside the small-step Newton
        # regime: near convergence the f32 merit comparison is noise and the
        # spurious 8x reg growth damps the superlinear tail (mirrors
        # solver/ipm.py).
        grow = (found < 0.5) | ((n_rej >= 4.0) & ~newton_regime)
        reg_new = jnp.where(
            grow,
            jnp.minimum(jnp.maximum(reg, jnp.float32(sc.reg)) * 8.0, 1e8),
            jnp.maximum(reg / 3.0, jnp.float32(sc.reg)),
        )
        if adaptive_sigma:
            # Adaptive centering (mirrors solver/ipm.py): throttled accepted
            # steps outside the Newton regime slow the barrier schedule.
            # The cap keeps growth >= the runtime floor when a refine stage
            # sets sigma above the static mu_sigma_max (else the clamp pair
            # would oscillate — config.py's mu_sigma_max note).
            sigma_new = jnp.where(
                (alpha < 0.25) & ~newton_regime,
                jnp.minimum(
                    sigma_c * 1.5,
                    jnp.maximum(jnp.float32(sc.mu_sigma_max), sig_row),
                ),
                jnp.maximum(sigma_c * 0.9, sig_row),
            )
        else:
            sigma_new = sigma_c
        return reg_new, sigma_new, m_obj_n, m_log_n, m_eqc_n, step_inf

    reg0 = jnp.full_like(x0p, jnp.float32(sc.reg))

    def body(i, carry):
        return _iteration(*carry)[:5]

    fin = jax.lax.fori_loop(
        0, it_ref[0], body,
        (reg0, sig_row, m_obj0, m_log0, m_eqc0),
    )
    sigma_fin = fin[1]

    # --- exact KKT diagnostics at the final iterate ----------------------
    # Mirrors solver/ipm.py::_diagnostics: Lagrangian gradient with the
    # final duals, one adjoint sweep for the control stationarity, IPOPT's
    # s_d dual scaling, feasibility/complementarity inf-norms, and the
    # dtype-aware convergence test.  Computing this in-kernel keeps the
    # slack/dual planes in scratch (no HBM round-trip) and replaces the
    # wrapper's vmapped jnp pass.
    xv, yv, thv = x_ref[:], y_ref[:], th_ref[:]
    vv, wv = v_ref[:], w_ref[:]
    cv, cxl, cxu, obsv = families(xv, yv, thv, vv, wv)
    fams = load_fams(cv, cxl, cxu, obsv)

    # Cost gradients (same expressions as the condensation).
    gxc = 2.0 * gm * w0 * (xv - gx_T)
    gyc = 2.0 * gm * w1 * (yv - gy_T)
    gthc = 2.0 * gm * w2 * (thv - gth_T)
    if cc.reverse_penalty_mode == "squared":
        gv = 2.0 * w_neg * jnp.minimum(vv, 0.0)
    else:
        gv = w_neg * (vv < 0.0).astype(vv.dtype)
    gv = gv + 2.0 * w_pos * jnp.maximum(vv, 0.0)
    gw = 2.0 * w_ang * wv

    # Lagrangian gradient contributions -J' nu per family (duals are stored
    # pre-masked).
    gxL0 = gxc - fams["xl0"].nu + fams["xu0"].nu
    gxL1 = gyc - fams["xl1"].nu + fams["xu1"].nu
    gxL2 = gthc - fams["xl2"].nu + fams["xu2"].nu
    guL0 = gv - fams["vl"].nu + fams["vu"].nu
    guL1 = gw - fams["wl"].nu + fams["wu"].nu
    if K > 0:
        _, nxk, nyk = obsv
        nu_ob = fams["ob"].nu
        addx = _kreduce(-nxk * nu_ob, jnp.add)
        addy = _kreduce(-nyk * nu_ob, jnp.add)
        cat = lambda base, add: jnp.concatenate(
            [base[:S], base[S:] + add], axis=0
        )
        gxL0 = cat(gxL0, addx)
        gxL1 = cat(gxL1, addy)

    # Stage per-time rows for the sequential adjoint sweep (reuses
    # stage_ref slots; the iteration loop is done with them).
    ctf = jnp.cos(thv[:-S])
    stf = jnp.sin(thv[:-S])
    for slot, arr in (
        (0, -vv * stf * dt), (1, vv * ctf * dt),  # a02, a12
        (2, ctf * dt), (3, stf * dt),  # b00, b10
        (4, gxL0), (5, gxL1), (6, gxL2),
        (7, guL0), (8, guL1),
    ):
        stage_ref[slot * T1 * S : slot * T1 * S + arr.shape[0]] = arr

    def _drow(slot, t):
        return stage_ref[pl.ds((slot * T1 + t) * S, S)]

    def adj(tr, carry):
        t = N - 1 - tr
        l0, l1, l2, ru_max = carry
        ru0 = _drow(7, t) + _drow(2, t) * l0 + _drow(3, t) * l1
        ru1 = _drow(8, t) + dt * l2
        ru_max = jnp.maximum(
            ru_max, jnp.maximum(jnp.abs(ru0), jnp.abs(ru1))
        )
        nl2 = _drow(6, t) + _drow(0, t) * l0 + _drow(1, t) * l1 + l2
        nl0 = _drow(4, t) + l0
        nl1 = _drow(5, t) + l1
        return (nl0, nl1, nl2, ru_max)

    lamN = (_drow(4, N), _drow(5, N), _drow(6, N))
    _, _, _, ru_max = jax.lax.fori_loop(
        0, N, adj, (*lamN, jnp.zeros_like(x0p))
    )

    # IPOPT s_d scaling + family reductions (masks live in fams).
    nu_sum = jnp.zeros_like(x0p)
    nu_cnt = jnp.zeros_like(x0p)
    viol = jnp.zeros_like(x0p)
    comp = jnp.zeros_like(x0p)
    tot = jnp.zeros_like(x0p)
    for f in fams.values():
        nu_sum = nu_sum + _reduce_sum(f.mask * jnp.abs(f.nu))
        nu_cnt = nu_cnt + _reduce_sum(f.mask * jnp.ones_like(f.s))
        viol = jnp.maximum(
            viol, _reduce_max(f.mask * jnp.maximum(-f.c, 0.0))
        )
        comp = jnp.maximum(comp, _reduce_max(f.mask * jnp.abs(f.s * f.nu)))
        tot = tot + _reduce_sum(f.mask * f.s * f.nu)
    s_d = jnp.maximum(100.0, nu_sum / jnp.maximum(nu_cnt, 1.0)) / 100.0
    stationarity = ru_max / s_d

    obj, _, (ctm, stm, d0r, d1r, d2r) = merit_terms(xv, yv, thv, vv, wv)
    feas = jnp.maximum(
        _reduce_max(jnp.abs(d0r)),
        jnp.maximum(_reduce_max(jnp.abs(d1r)), _reduce_max(jnp.abs(d2r))),
    )
    feas = jnp.maximum(feas, jnp.abs(x0p - xv[0:S]))
    feas = jnp.maximum(feas, jnp.abs(y0p - yv[0:S]))
    feas = jnp.maximum(feas, jnp.abs(th0p - thv[0:S]))
    feas = jnp.maximum(feas, viol)

    mu_fin = jnp.clip(
        sigma_fin * tot / jnp.maximum(nu_cnt, 1.0),
        jnp.float32(max(sc.mu_min, 50.0 * 1.1920929e-07)),
        jnp.float32(sc.mu_init),
    )
    # f32 tolerance floor: 50 * sqrt(eps) (solver/ipm.py::_diagnostics).
    tol = jnp.float32(max(sc.kkt_tol, 50.0 * 3.4526698e-04))
    comp_scaled = comp / s_d
    converged = (
        (stationarity < tol)
        & (feas < tol)
        & (comp_scaled < jnp.maximum(jnp.float32(10.0 * sc.mu_min), tol))
    ).astype(jnp.float32)

    diag_ref[0 * S : 1 * S] = converged
    diag_ref[1 * S : 2 * S] = stationarity
    diag_ref[2 * S : 3 * S] = feas
    diag_ref[3 * S : 4 * S] = comp
    diag_ref[4 * S : 5 * S] = obj
    diag_ref[5 * S : 6 * S] = mu_fin


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _pad_batch(x, b_padded):
    pad = b_padded - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
    )


def solve_batch_fused(cfg: MPCConfig, problems: Problem, *,
                      iterations: int | None = None,
                      mu_sigma=None,
                      interpret: bool = False, bt: int | None = None,
                      sb: int | None = None):
    """Solve a batched Problem with the fused IPM kernel.

    Returns a `Solution` (exact KKT diagnostics computed in-kernel at the
    final iterate — slacks/duals never leave VMEM).  Leaves of ``problems``
    have a
    leading batch axis B.  f32 path.  The scenario tile defaults to
    ``cfg.solver.fused_block`` if set, else the module-level measured ``BT``;
    ``sb`` sublane sub-blocks per program default to
    ``cfg.solver.fused_sublanes`` or the module-level ``SB`` (see the module
    docstring for the layout).

    ``iterations`` / ``mu_sigma`` override ``cfg.solver``'s values as
    *runtime* kernel inputs (an SMEM trip count and a per-scenario sigma
    row): every refine-stage schedule shares ONE compiled Mosaic binary
    per (N, K, bt, sb, flags) instead of one ~800 s cold compile per
    (iterations, mu_sigma) combination (SCALING.md compile-time budget).
    ``mu_sigma`` may be a scalar or a per-scenario ``[B]`` array.

    """
    if bt is None:
        bt = cfg.solver.fused_block or BT
    if sb is None:
        sb = getattr(cfg.solver, "fused_sublanes", 0) or SB
    # Compiled kernels need 128-lane alignment: Pallas' TPU lowering
    # rejects block shapes whose last dim is not a multiple of 128 (probed
    # r4 — sb=2/4 at bt=128, i.e. lanes 64/32, fails in lowering, which
    # structurally closes the "sublane-pack K=8 below the bt>=256 Mosaic
    # blocker" route).  Interpret mode only needs the tile to split evenly.
    assert bt % (sb if interpret else 128 * sb) == 0, (bt, sb)
    lanes = bt // sb
    from ...solver.problem import Diagnostics, Solution

    N = cfg.horizon
    K = cfg.max_obstacles
    T1 = N + 1
    B = problems.initial_state.shape[0]
    Bp = ((B + bt - 1) // bt) * bt
    nt = Bp // bt
    f32 = jnp.float32

    def sm(x):
        """[B, rows...] -> interleaved scenario-major [rows*sb, Bp//sb] f32.

        Scenario g = i*bt + s*lanes + lane lands at physical
        (row r*sb + s, column i*lanes + lane) for each logical row r.
        """
        x = _pad_batch(jnp.asarray(x, f32), Bp).reshape(Bp, -1)
        R = x.shape[1]
        x = x.reshape(nt, sb, lanes, R).transpose(3, 1, 0, 2)
        return x.reshape(R * sb, nt * lanes)

    def bm(a):
        """Inverse of `sm`: [rows*sb, Bp//sb] -> [B, rows]."""
        R = a.shape[0] // sb
        a = a.reshape(R, sb, nt, lanes).transpose(2, 1, 3, 0)
        return a.reshape(Bp, R)[:B]

    fin = lambda b: jnp.isfinite(b).astype(f32)
    safe = lambda b: jnp.where(jnp.isfinite(b), b, 0.0)
    scal = jnp.concatenate(
        [
            sm(problems.initial_state),  # 3
            sm(problems.goal_state),  # 3
            sm(safe(problems.control_lower[..., 0:1])),
            sm(safe(problems.control_upper[..., 0:1])),
            sm(safe(problems.control_lower[..., 1:2])),
            sm(safe(problems.control_upper[..., 1:2])),
            sm(fin(problems.control_lower[..., 0:1])),
            sm(fin(problems.control_upper[..., 0:1])),
            sm(fin(problems.control_lower[..., 1:2])),
            sm(fin(problems.control_upper[..., 1:2])),
            sm(safe(problems.state_lower)),  # 3
            sm(safe(problems.state_upper)),  # 3
            sm(fin(problems.state_lower)),  # 3
            sm(fin(problems.state_upper)),  # 3
            # Runtime centering sigma.  Pad lanes get the *static* mu_sigma
            # (not sm()'s zero padding): a sigma=0 pad lane runs a frozen
            # barrier schedule that never settles, keeping the final partial
            # tile iterating for the full budget under early exit (ADVICE
            # r3); with the configured value pad lanes behave like ordinary
            # default-schedule scenarios.
            sm(jnp.concatenate([
                jnp.broadcast_to(
                    jnp.asarray(
                        cfg.solver.mu_sigma if mu_sigma is None
                        else mu_sigma,
                        f32,
                    ).reshape(-1, 1),
                    (B, 1),
                ),
                jnp.full((Bp - B, 1), cfg.solver.mu_sigma, f32),
            ], axis=0)),  # 1: runtime centering sigma
        ],
        axis=0,
    )  # [27*sb, Bp//sb]
    warm = jnp.concatenate(
        [
            sm(problems.warm_states[..., 0]),  # T1
            sm(problems.warm_states[..., 1]),
            sm(problems.warm_states[..., 2]),
            sm(problems.warm_controls[..., 0]),  # N
            sm(problems.warm_controls[..., 1]),
        ],
        axis=0,
    )
    if K > 0:
        if cfg.solver.fused_affine_tracks:
            # (c0, per-step delta) rows; the kernel reconstructs c0 + t*d.
            c = problems.obstacle_centers  # [B, K, N, 2]
            d = (
                c[:, :, 1, :] - c[:, :, 0, :]
                if N > 1
                else jnp.zeros_like(c[:, :, 0, :])
            )
            # Guard (ADVICE r2): affine compression linearizes the track
            # through its first segment — exact for the reference's
            # constant-velocity prediction, silently wrong for curved
            # tracks (angular_velocity != 0).  Certify per scenario and
            # report non-convergence (plus gate-tripping infeasibility)
            # where the data is not actually affine, so diagnostics never
            # claim convergence against a different problem.
            t_idx = jnp.arange(N, dtype=f32)[None, None, :, None]
            recon = c[:, :, 0:1, :] + t_idx * d[:, :, None, :]
            affine_dev = jnp.max(
                jnp.abs(recon - c)
                * problems.obstacle_mask[..., None, None],
                axis=(1, 2, 3),
            )  # [B]
            tx = jnp.concatenate(
                [sm(c[:, :, 0, 0]), sm(d[..., 0])], axis=0
            )  # [2K*sb, Bp//sb]
            ty = jnp.concatenate(
                [sm(c[:, :, 0, 1]), sm(d[..., 1])], axis=0
            )
            kn_in = 2 * K
        else:
            tx = sm(problems.obstacle_centers[..., 0])  # [K*N*sb, Bp//sb]
            ty = sm(problems.obstacle_centers[..., 1])
            kn_in = K * N
        obinfo = jnp.concatenate(
            [
                sm(problems.obstacle_radii),  # K
                sm(problems.obstacle_mask),  # K
                sm(problems.inflation_radius.reshape(B, 1)
                   if problems.inflation_radius.ndim else
                   jnp.broadcast_to(problems.inflation_radius, (B, 1))),
            ],
            axis=0,
        )
        kn = K * N
    else:
        tx = jnp.zeros((sb, Bp // sb), f32)
        ty = jnp.zeros((sb, Bp // sb), f32)
        obinfo = jnp.zeros((sb, Bp // sb), f32)
        kn = 1
        kn_in = 1

    grid = (nt,)

    def spec(rows):
        return pl.BlockSpec((rows * sb, lanes), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(ipm_fused_kernel, cfg, sb)
    it_arr = jnp.asarray(
        [cfg.solver.iterations if iterations is None else iterations],
        jnp.int32,
    )
    out_rows = [T1, T1, T1, N, N, 6]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec(27), spec(3 * T1 + 2 * N), spec(kn_in), spec(kn_in),
                  spec(obinfo.shape[0] // sb)],
        out_specs=[spec(r) for r in out_rows],
        out_shape=[
            jax.ShapeDtypeStruct((r * sb, Bp // sb), f32) for r in out_rows
        ],
        scratch_shapes=[
            pltpu.VMEM((8 * N * sb, lanes), f32),
            pltpu.VMEM((3 * T1 * sb, lanes), f32),
            pltpu.VMEM((2 * N * sb, lanes), f32),
            pltpu.VMEM((18 * T1 * sb, lanes), f32),
            # Slack/dual iterate state: scratch, not outputs — the exact KKT
            # diagnostics are computed in-kernel, so these planes never
            # leave VMEM (saves their HBM round-trip and the double-buffered
            # output allocation that blocked sublane packing at K=8).
            pltpu.VMEM((4 * N * sb, lanes), f32),
            pltpu.VMEM((4 * N * sb, lanes), f32),
            pltpu.VMEM((6 * T1 * sb, lanes), f32),
            pltpu.VMEM((6 * T1 * sb, lanes), f32),
            pltpu.VMEM((kn * sb, lanes), f32),
            pltpu.VMEM((kn * sb, lanes), f32),
            # Elastic variables (full plane only when the flag is on).
            pltpu.VMEM(
                (
                    (kn if (K > 0 and cfg.solver.elastic_obstacles) else 1)
                    * sb,
                    lanes,
                ),
                f32,
            ),
            # Deliberately-unused VMEM scratch: removing it (r4, when the
            # early-exit carry buffer it used to be went away) cost -7.8%
            # on the free bt=256/sb=2 config same-process with IDENTICAL
            # kernel arithmetic, and restoring it recovered +2% over the
            # r3 kernel (scripts/ab_kernel.py vs 8e3f3e0, /tmp logs r4).
            # Mechanism: the extra allocation shifts Mosaic's VMEM buffer
            # placement; 5 rows x lanes is the empirically-good shim size.
            pltpu.VMEM((5 * sb, lanes), f32),
        ],
        interpret=interpret,
    )(it_arr, scal, warm, tx, ty, obinfo)

    (x, y, th, v, w, dg) = outs
    states = jnp.stack([bm(x), bm(y), bm(th)], axis=-1)  # [B, T1, 3]
    controls = jnp.stack([bm(v), bm(w)], axis=-1)  # [B, N, 2]

    def drow(i):
        return bm(dg[i * sb : (i + 1) * sb])[:, 0]

    converged = drow(0) > 0.5
    feas = drow(2)
    if K > 0 and cfg.solver.fused_affine_tracks:
        # Non-affine tracks were solved against the wrong constraints:
        # withdraw the convergence certificate and surface the deviation as
        # infeasibility (trips the agent's fallback gate).  1e-4 m sits far
        # above f32 reconstruction rounding and far below real curvature.
        affine_ok = affine_dev <= 1e-4
        converged = converged & affine_ok
        feas = jnp.maximum(feas, jnp.where(affine_ok, 0.0, affine_dev))
    diag = Diagnostics(
        converged=converged,
        kkt_stationarity=drow(1),
        kkt_feasibility=feas,
        kkt_complementarity=drow(3),
        final_cost=drow(4),
        final_mu=drow(5),
    )
    return Solution(states=states, controls=controls, diagnostics=diag)
