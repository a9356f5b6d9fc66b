"""Scenario recording / replay — the rosbag analogue, as arrays.

The reference's de-facto integration harness is rosbag replay
(`obstacle_handling/human_tracking.py:46-111`: a `BagReader` republishing a
recorded sensor session with wall-clock pacing).  The framework-native
equivalent records per-tick *arrays* — the solver's exact inputs (Problem)
and outputs (Solution) — into a single compressed npz, which replays
deterministically: re-solving a recorded Problem must reproduce the recorded
controls bit-for-bit on the same backend (SURVEY.md section 4: "the
rosbag-replay idea survives as recorded scenario-batch fixtures (arrays,
not bags)").
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple, Optional

import jax
import numpy as np

from ..solver.problem import Diagnostics, Problem, Solution


class TickRecord(NamedTuple):
    problem: Problem  # numpy leaves
    solution: Solution  # numpy leaves


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class ScenarioRecorder:
    """Accumulates per-tick (Problem, Solution) pairs; saves one npz."""

    def __init__(self):
        self._ticks: List[TickRecord] = []

    def record(self, problem: Problem, solution: Solution) -> None:
        self._ticks.append(
            TickRecord(_to_numpy(problem), _to_numpy(solution))
        )

    def __len__(self) -> int:
        return len(self._ticks)

    def save(self, path: str) -> None:
        if not self._ticks:
            raise ValueError("nothing recorded")
        # Stack along a leading tick axis; flat key naming field.index.
        stacked_p = jax.tree.map(lambda *xs: np.stack(xs),
                                 *[t.problem for t in self._ticks])
        stacked_s = jax.tree.map(lambda *xs: np.stack(xs),
                                 *[t.solution for t in self._ticks])
        payload = {}
        for name, val in stacked_p._asdict().items():
            payload[f"problem.{name}"] = val
        payload["solution.states"] = stacked_s.states
        payload["solution.controls"] = stacked_s.controls
        for name, val in stacked_s.diagnostics._asdict().items():
            payload[f"diagnostics.{name}"] = val
        np.savez_compressed(path, **payload)


class ScenarioReplayer:
    """Loads a recording; iterates ticks; verifies determinism on demand."""

    def __init__(self, path: str):
        data = np.load(path)
        p_fields = {
            k.split(".", 1)[1]: data[k]
            for k in data.files
            if k.startswith("problem.")
        }
        d_fields = {
            k.split(".", 1)[1]: data[k]
            for k in data.files
            if k.startswith("diagnostics.")
        }
        self._problems = Problem(**p_fields)
        self._solutions = Solution(
            states=data["solution.states"],
            controls=data["solution.controls"],
            diagnostics=Diagnostics(**d_fields),
        )
        self.num_ticks = self._problems.initial_state.shape[0]

    def tick(self, i: int) -> TickRecord:
        take = lambda tree: jax.tree.map(lambda x: x[i], tree)
        return TickRecord(take(self._problems), take(self._solutions))

    def __iter__(self) -> Iterator[TickRecord]:
        for i in range(self.num_ticks):
            yield self.tick(i)

    def verify(self, solver, atol: float = 0.0, ticks: Optional[int] = None):
        """Re-solve every recorded Problem and compare controls.

        Returns the max |u - u_recorded| over the verified ticks; with the
        same solver config/backend this is exactly 0 (XLA is deterministic).
        """
        worst = 0.0
        n = self.num_ticks if ticks is None else min(ticks, self.num_ticks)
        for i in range(n):
            rec = self.tick(i)
            sol = solver(rec.problem)
            err = float(
                np.max(
                    np.abs(np.asarray(sol.controls) - rec.solution.controls)
                )
            )
            worst = max(worst, err)
            if err > atol:
                raise AssertionError(
                    f"tick {i}: replay mismatch {err:.3e} > {atol:.3e}"
                )
        return worst
