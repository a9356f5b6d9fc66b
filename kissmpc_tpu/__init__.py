"""kissmpc_tpu — a TPU-native batched MPC / trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rtarun1/kiss-mpc (CasADi + IPOPT velocity MPC for a differential-drive robot):
receding-horizon planning with goal-tracking cost, asymmetric velocity
penalties, control/state bounds and static/dynamic circular-obstacle
avoidance — as one jitted fixed-iteration interior-point SQP over batched
scenario pytrees, sharded across TPU meshes.

See SURVEY.md at the repo root for the structural map of the reference and
file:line parity citations throughout this package.
"""

from . import agent, environment, scenarios
from .agent import AgentParams, AgentState
from .config import CostConfig, MPCConfig, SolverConfig
from .environment import EnvState
from .obstacles import ObstacleSet, dynamic_set, static_set
from .solver.api import make_batch_solver, make_solver
from .solver.problem import (
    Diagnostics,
    Problem,
    Solution,
    complete_warm_start,
    default_problem,
    problem_with_obstacles,
    repair_warm_start,
)

__version__ = "0.1.0"

__all__ = [
    "CostConfig",
    "MPCConfig",
    "SolverConfig",
    "Problem",
    "Solution",
    "Diagnostics",
    "default_problem",
    "problem_with_obstacles",
    "repair_warm_start",
    "complete_warm_start",
    "make_solver",
    "make_batch_solver",
    "scenarios",
]
