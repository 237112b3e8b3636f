"""Parameter checkpointing (orbax): save/restore pytrees.

Replaces the reference's torch.load state_dict path (planner.py:46-47) with
orbax pytree checkpoints; the torch import path lives in models/weights.py.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax


def save_params(path: str | Path, params: Any, step: int = 0) -> str:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(params))
        mgr.wait_until_finished()
    return str(path)


def load_params(path: str | Path, like: Any, step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        # carry the template's shardings so checkpoints restore onto the
        # CURRENT platform (a TPU-saved checkpoint restores on CPU and vice
        # versa; orbax falls back to the sharding file otherwise, which
        # breaks across platforms)
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=getattr(x, "sharding", None)), like)
        return mgr.restore(step, args=ocp.args.StandardRestore(shapes))
