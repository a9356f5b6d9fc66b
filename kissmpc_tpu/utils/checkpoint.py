"""Checkpoint / resume for batch-scenario runs (orbax-backed).

The reference persists nothing (SURVEY.md section 5.4: warm starts are
in-memory only, `mpc/agent.py:59-60`).  Fleet-scale batch runs need restart
safety: this module saves/restores arbitrary pytrees — typically a
`FleetCheckpoint` of environment states, RNG key, and scenario cursor —
using orbax's sharding-aware arrays (multi-host safe).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import numpy as np

try:  # orbax is in the base image; keep the import soft for minimal installs
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


class FleetCheckpoint(NamedTuple):
    """Everything needed to resume a batched receding-horizon run."""

    env_state: Any  # batched EnvState pytree
    rng_key: jax.Array
    scenario_cursor: jax.Array  # int: next scenario index to dispatch
    tick: jax.Array  # int: global tick counter


class CheckpointManager:
    """Thin orbax wrapper with a numpy fallback (single-host only).

    orbax handles sharded arrays across hosts; the fallback flattens to an
    npz for environments without orbax.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        else:  # pragma: no cover
            self._mgr = None
            import os

            os.makedirs(directory, exist_ok=True)

    def save(self, step: int, state: Any) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:  # pragma: no cover
            import os
            import pickle

            flat, treedef = jax.tree.flatten(state)
            with open(
                os.path.join(self.directory, f"ckpt_{step}.npz"), "wb"
            ) as f:
                np.savez(f, *[np.asarray(x) for x in flat])
            with open(
                os.path.join(self.directory, f"ckpt_{step}.tree"), "wb"
            ) as f:
                pickle.dump(treedef, f)

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        else:  # pragma: no cover
            import glob
            import os
            import re

            steps = [
                int(re.search(r"ckpt_(\d+)\.npz", p).group(1))
                for p in glob.glob(os.path.join(self.directory, "ckpt_*.npz"))
            ]
            return max(steps) if steps else None

    def restore(self, step: int, like: Any) -> Any:
        """Restore into the structure/shardings of ``like`` (an abstract or
        concrete example pytree)."""
        if self._mgr is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(like)
            )
        else:  # pragma: no cover
            import os
            import pickle

            with open(
                os.path.join(self.directory, f"ckpt_{step}.tree"), "rb"
            ) as f:
                treedef = pickle.load(f)
            data = np.load(os.path.join(self.directory, f"ckpt_{step}.npz"))
            flat = [data[k] for k in data.files]
            return jax.tree.unflatten(treedef, flat)

    def close(self):
        if self._mgr is not None:
            self._mgr.close()
