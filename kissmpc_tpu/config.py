"""Static configuration for the TPU-native MPC engine.

The reference (rtarun1/kiss-mpc) spreads configuration across constructor
defaults (`mpc/agent.py:99-106`), hardcoded cost weights
(`mpc/optimizer.py:57-60`), hardcoded IPOPT options (`mpc/optimizer.py:344-352`)
and deployment overrides in the ROS node (`ros2interface.py:28-38`).  Here the
whole surface is one frozen dataclass that is a static (hashable) argument to
`jax.jit`, so a config change recompiles and everything else is runtime data.

Two semantic switches capture places where the reference code differs from its
README (SURVEY.md section 2.4):

* ``goal_cost_mode``: the reference sums goal-tracking cost over states
  1..N-1 only (slice ``[:, 1:-1]``, `mpc/optimizer.py:80`) while the README
  sums 1..N.  ``"full"`` = README semantics (default), ``"exclude_terminal"``
  reproduces the committed code.
* ``reverse_penalty_mode``: the reference's negative-velocity cost is linear
  (``300 * sum(min(v, 0))``, `mpc/optimizer.py:91-96`) which *rewards*
  reversing; the README specifies squared.  ``"squared"`` (default) is the
  intended formulation, ``"linear"`` the committed one.
* ``bound_y``: the reference applies state box bounds to the x row only
  (`mpc/optimizer.py:114-115`); the README bounds x and y.  Default True
  (README semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Tuple

GoalCostMode = Literal["full", "exclude_terminal"]
ReversePenaltyMode = Literal["squared", "linear"]


@dataclasses.dataclass(frozen=True)
class CostConfig:
    """Cost weights.  Defaults follow `mpc/optimizer.py:57-60`."""

    goal_weights: Tuple[float, float, float] = (100.0, 100.0, 50.0)
    negative_velocity_weight: float = 300.0
    angular_velocity_weight: float = 10.0
    # The reference carries a commented-out positive-linear-velocity cost
    # (`mpc/optimizer.py:85-89`); exposed here, off by default.
    positive_velocity_weight: float = 0.0
    goal_cost_mode: GoalCostMode = "full"
    reverse_penalty_mode: ReversePenaltyMode = "squared"


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Interior-point SQP settings.

    The solver runs a fixed number of outer iterations (jit-friendly; no
    data-dependent control flow) with a geometric barrier schedule, mirroring
    the role IPOPT plays in the reference (`mpc/optimizer.py:344-354`) but as
    one compiled function instead of a per-tick rebuilt NLP object.
    """

    iterations: int = 40
    # Barrier parameter: adaptive, mu_j = clip(sigma * mean(s * nu), mu_min,
    # mu_init) — the classic centering rule, which self-paces against the
    # central path (a fixed geometric schedule outruns it and the
    # fraction-to-boundary rule then throttles steps to ~0).
    mu_init: float = 1.0
    mu_sigma: float = 0.2
    mu_min: float = 1e-9
    # Predictor-corrector mode:
    #   "off" — one centered Newton system per iteration (classic path).
    #   "pc"  — Mehrotra: solve the pure affine-scaling system (mu = 0)
    #           first, pick sigma = (mu_aff / mu)^3 from its fraction-to-
    #           boundary outcome, then re-solve with the centered mu plus
    #           the second-order correction ds_aff * dnu_aff in the
    #           complementarity RHS.  mu_sigma/mu_sigma_max are ignored.
    #   "soc" — second-order corrector at the *configured* centering: solve
    #           the centered system, form ds * dnu from it, re-solve with
    #           the correction (same mu).  Keeps the adaptive mu_sigma
    #           machinery; the re-solve shares the factorization, so the
    #           fused kernel pays only an RHS-sweep per iteration.
    # Both "pc" and "soc" are incompatible with elastic_obstacles (guarded
    # in solver/api.py).  Measured r5 (scripts/exp_mehrotra.py): per
    # *iteration* the corrected direction is ~2.5x better in the mid-phase;
    # "pc"'s affine probe costs a full extra solve and regresses early
    # feasibility, so "soc" is the production candidate.
    mehrotra: str = "off"
    # Per-scenario adaptive centering cap (0 disables).  When > 0, sigma
    # starts at mu_sigma and grows 1.5x toward this cap on every iteration
    # whose accepted step is throttled below 0.25 outside the small-step
    # Newton regime (the stall signature: the barrier schedule outran the
    # central path and fraction-to-boundary / merit are braking), decaying
    # 0.9x back to mu_sigma on healthy steps.  The staged-refinement data
    # motivates it: the hard ~2% of obstacle scenarios converge only under
    # a slowed schedule (mu_sigma 0.5-0.7), while easy scenarios want the
    # fast one — adapting per scenario gets both inside the base solve.
    mu_sigma_max: float = 0.0
    # Fraction-to-boundary rule coefficient for slack/dual steps.
    tau: float = 0.995
    # Backtracking line search: alpha in {1, ls_backtrack, ls_backtrack^2, ...}
    # 2 candidates measured best (r3, both backends, same-process A/B at
    # N=50/B=8192): K=8 converged 0.93 (ls=2) vs 0.73 (ls=4) at +18%
    # throughput; jnp path mirrors it (0.926 vs 0.705 at B=512).  Mechanism:
    # when the merit rejects every candidate, the executed fallback is the
    # deepest candidate alpha_s * bt^(ls-1) — a deep ladder turns every
    # deadlocked iteration into an 8x-smaller crawl step plus spurious
    # deep-backtrack regularization growth, while ls=2 keeps real progress
    # (the r1 "rejection margin" rationale for 4 was intuition; this is
    # measured).  Free config: 202k/0.969 (ls=2) vs 200k/0.966 (ls=4), r1.
    ls_iters: int = 2
    ls_backtrack: float = 0.5
    # l1 merit penalty weight for equality (dynamics + slack consistency)
    # residuals.
    merit_penalty: float = 1e3
    # Levenberg-style Hessian regularization added to Quu / Qxx diagonals.
    reg: float = 1e-8
    # Safeguard: minimum slack / constraint distance used in divisions.
    slack_floor: float = 1e-12
    # Include the exact curvature term of the obstacle distance constraint
    # ((I - n n^T)/dist weighted by the constraint dual) in the stage Hessian.
    obstacle_curvature: bool = True
    # Elastic obstacle constraints (SNOPT-style): c(z) + e - s = 0 with
    # e >= 0 and linear penalty elastic_penalty * e in the objective.  The
    # NLP is then always feasible: infeasible geometry yields bounded duals
    # (nu <= elastic_penalty) and graceful violation instead of a merit
    # deadlock, while feasible problems recover the exact hard-constrained
    # optimum (e -> 0) whenever elastic_penalty exceeds the true multiplier.
    elastic_obstacles: bool = False
    elastic_penalty: float = 1e4
    # KKT tolerance used only to *report* convergence (never for control flow).
    kkt_tol: float = 1e-6
    # Newton-KKT engine for *batched* solves: "auto" uses the scenario-major
    # Pallas Riccati kernel on TPU and the vmapped XLA scan elsewhere;
    # "xla" / "pallas" force a backend.  Unbatched solves always use XLA.
    lqr_backend: str = "auto"
    # Batched-solve strategy on TPU: "fused" (default) = the whole IPM loop
    # as one Pallas megakernel (152k solves/s at N=50/B=8192 vs 107k for
    # split; ~100 s compile); "split" = XLA iteration loop around the Pallas
    # Riccati kernel.  f64 batches and elastic mode automatically fall back
    # to split; CPU always uses the jnp path.
    solve_backend: str = "fused"
    # Scenarios per fused-kernel program instance (Pallas grid tile).  0 =
    # the measured default (`ops/pallas/ipm_fused.BT`); smaller tiles trade
    # throughput for VMEM headroom (large K needs it).
    fused_block: int = 0
    # Affine obstacle-track compression for the fused kernel: pass each
    # track as (position, per-step delta) — 2K input rows — and reconstruct
    # center_t = c0 + t*d in-kernel, instead of shipping K*N track planes
    # into VMEM (the dominant remaining VMEM cost at K=8, blocking sublane
    # packing).  Exact for constant-velocity prediction
    # (`obstacles.predict_tracks` with zero angular velocity — the
    # reference's model, `obstacle_handling/dynamic_obstacle.py:20-37`);
    # opt-in because the Problem API allows arbitrary curved tracks, which
    # this would silently linearize through their first segment.
    fused_affine_tracks: bool = False
    # (r4) `fused_low_liveness` was REMOVED: its +8% was measured against
    # the ls=4 ladder; at the ls=2 default it *loses* 2.9% same-process
    # (177.2k vs 182.5k, scripts/r4_kernel_ab.py) and its original purpose
    # (unlocking bt>=256 at K=8) was falsified in r2.  `fused_grouped_sweep`
    # (the r2/r3 "pack the sweep's 3-vector algebra into multi-sublane
    # planes" idea) was built, tested, measured (+0.7% at K=8/sb=1 — noise;
    # -4.5% at free/sb=2 from the scalar-row tiling copies) and removed:
    # the issue-slot model overestimated the sequential sweep's cost, and a
    # third mirror of the algorithm (jnp / scalar kernel / grouped kernel)
    # is drift surface with no payoff.  Numbers in SCALING.md r4.
    # Sublane sub-blocks per fused-kernel program (scenarios per program =
    # fused_block; lanes = fused_block / fused_sublanes).  >1 packs the
    # sequential Riccati sweep's per-time rows into (sb, 128) values so each
    # sweep op uses sb of the VPU's 8 sublanes instead of 1, at the cost of
    # real sublane copies wherever a per-scenario scalar row meets a family
    # block (free broadcasting only exists at sb=1).  0 = the measured
    # module default (`ops/pallas/ipm_fused.SB`).
    fused_sublanes: int = 0
    # (r4) `fused_early_exit_tol` (tile-level early exit) and
    # `sort_by_difficulty` (difficulty-homogeneous tiles to feed it) were
    # REMOVED after direct measurement: re-solving a batch FROM ITS OWN
    # SOLUTIONS with the exit gate on saved <= 4.5% even at tol=1e-2
    # (r4 exit probe, git history), because every solve re-initializes
    # slacks/duals and re-walks the central path regardless of warm-start
    # quality — the tile's max Newton direction stays above any honest
    # tolerance for most of the budget.  In the closed-loop fleet the
    # sorted+exit schedule measured 28.85 ms vs 29.06 ms baseline (noise).
    # Implementations in git history; numbers in SCALING.md r4.
    # Second-chance refinement (batched solves only): after the fixed
    # iteration budget, gather the worst ``refine_fraction`` of the batch by
    # convergence, re-solve them for ``refine_iterations`` more iterations
    # warm-started from their final iterates (the dual/slack re-centering of
    # the restart doubles as the perturbation that unsticks merit-stalled
    # scenarios), and scatter back whichever re-solves converged.  The role
    # IPOPT's restoration phase plays for its stuck iterates
    # (`mpc/optimizer.py:344-354` relies on it implicitly), shaped for a
    # fixed-iteration batched solver: the tail is a small dense sub-batch,
    # not a per-scenario branch.  0.0 disables.
    refine_fraction: float = 0.0
    refine_iterations: int = 64
    # Multi-stage refinement: tuple of (fraction, iterations, mu_sigma)
    # stages applied in order, each re-solving the still-non-converged tail
    # of the previous stage.  Supersedes refine_fraction/refine_iterations
    # when non-empty.  The mu_sigma override matters: the hard ~2% of
    # obstacle scenarios stall precisely because the default centering
    # (mu_sigma=0.2) outruns the central path on their landscapes — a
    # final stage at mu_sigma 0.5-0.7 converts ~60% of scenarios that a
    # same-budget default-schedule re-solve cannot (measured at
    # N=50/B=2048/K=8: 32it -> 0.710; +64it refine -> 0.975; +96it at
    # mu_sigma=0.7 -> 0.991).
    refine_stages: tuple = ()

    # NOTE on mu_sigma > mu_sigma_max: legal, not validated away.  The
    # adaptive growth cap is max(mu_sigma_max, mu_sigma) on BOTH backends
    # (solver/ipm.py and the fused kernel's runtime sigma row), so a base
    # sigma above the cap simply pins sigma at mu_sigma — no clamp-pair
    # oscillation.  Refine stages rely on this: a late stage's mu_sigma
    # (0.7-0.9) may exceed the base config's cap, and solver/api._dispatch
    # folds it into this dataclass on the jnp path.


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Full static problem + solver description.

    Shapes derived from this config are static under jit: horizon ``N``
    (`mpc/agent.py:100` default 50), max obstacle count ``max_obstacles``
    (the reference passes a dynamic python list, `mpc/optimizer.py:198`;
    TPU-native we pad to a fixed K and mask, mirroring the sensor-radius
    filter of `mpc/environment.py:48-65` as a top-K selection).
    """

    horizon: int = 50
    time_step: float = 0.041
    max_obstacles: int = 0
    cost: CostConfig = dataclasses.field(default_factory=CostConfig)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    bound_y: bool = True

    @property
    def num_states(self) -> int:
        return 3

    @property
    def num_controls(self) -> int:
        return 2

    def replace(self, **kw) -> "MPCConfig":
        return dataclasses.replace(self, **kw)


# Deployment preset used by the reference ROS node (`ros2interface.py:28-38`).
ROS_DEPLOYMENT = MPCConfig(
    horizon=7,
    time_step=0.8,
)

# Research preset matching `EgoAgent` defaults (`mpc/agent.py:99-106`).
RESEARCH = MPCConfig(
    horizon=50,
    time_step=0.041,
)
