"""Device meshes and sharded scale-out (BASELINE.json configs).

The reference is single-device (SURVEY.md §2.3); scale-out here is
first-class: a `jax.sharding.Mesh` with a 'data' axis carries batches of
scenarios / Monte-Carlo perturbations / parallel scenario trees, with
parameters replicated and gradient/metric reductions riding ICI collectives
that XLA inserts from the sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs).reshape(shape), axis_names)


def shard_rollouts(mesh: Mesh, tree):
    """Shard the leading (batch) axis of every leaf over the 'data' axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
