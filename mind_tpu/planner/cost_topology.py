"""Device-side cost-tree topology construction.

Turns AIME tree metadata (parent/duration/end/tree_id arrays) into the padded
TreeTopology + (slot, step) index arrays the batched iLQR consumes — entirely
on device, so the whole plan cycle can run as ONE program with a single
host sync (the tunnel costs ~40 ms per round trip).

Semantics match the host builder (trajectory_tree.build_cost_indices /
reference trajectory_tree.py:66-122): one cost node per even prediction step
of every end-flagged scenario node; a node's first cost node hangs off its
parent scenario node's last cost node; node levels are global prediction
half-steps, so level(slot, k) = start_t/2 + k, and sorting candidates by
(level, slot) yields a topological order with contiguous levels.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mind_tpu.planner.ilqr import TreeTopology

S_MAX = 30  # max cost nodes per scenario node (60 pred steps / 2)


class DeviceCostTrees(NamedTuple):
    topo: TreeTopology        # leaves stacked [T, ...]
    cost_slot: jnp.ndarray    # [T, MNC] scenario slot per cost node
    cost_step: jnp.ndarray    # [T, MNC] even step within the slot's slice
    tree_mask: jnp.ndarray    # [T] real trees
    n_trees: jnp.ndarray      # [] i32


def device_cost_topology(parent, depth, duration, start_t, end_flag, tree_id,
                         max_trees: int, max_cost_nodes: int,
                         max_levels: int, max_width: int) -> DeviceCostTrees:
    MN = parent.shape[0]
    MNC = max_cost_nodes
    big = jnp.int32(MN * S_MAX + 7)

    # roots = depth-1 end nodes, in slot order
    is_root = end_flag & (depth == 1)
    root_order = jnp.argsort(jnp.where(is_root, jnp.arange(MN), big))
    n_trees = jnp.sum(is_root).astype(jnp.int32)
    roots = root_order[:max_trees]                       # [T]
    tree_mask = jnp.arange(max_trees) < n_trees

    half_dur = duration // 2                             # ceil for even durations

    def one_tree(rc):
        member = end_flag & (tree_id == rc)              # [MN]
        steps = jnp.arange(S_MAX)
        valid = member[:, None] & (steps[None, :] < half_dur[:, None])  # [MN, S]
        level = (start_t // 2)[:, None] + steps[None, :]                # [MN, S]

        key = jnp.where(valid, level * MN + jnp.arange(MN)[:, None], big)
        flat_key = key.reshape(-1)
        order = jnp.argsort(flat_key)                    # [MN*S]
        rank = jnp.zeros(MN * S_MAX, jnp.int32).at[order].set(
            jnp.arange(MN * S_MAX, dtype=jnp.int32))

        n_c = jnp.sum(valid).astype(jnp.int32)
        sel = order[:MNC]
        c_slot = (sel // S_MAX).astype(jnp.int32)
        c_s = (sel % S_MAX).astype(jnp.int32)
        c_valid = jnp.arange(MNC) < jnp.minimum(n_c, MNC)

        # parent cost node: previous step of the same slot, or the parent
        # scenario node's last cost node; the root child's first node hangs
        # off x0 (scenario parent is the AIME root, slot 0)
        p_slot = parent[c_slot]
        par_flat = jnp.where(
            c_s > 0,
            c_slot * S_MAX + (c_s - 1),
            p_slot * S_MAX + jnp.maximum(half_dur[p_slot] - 1, 0),
        )
        root_attach = (c_s == 0) & (p_slot <= 0)
        c_parent = jnp.where(root_attach | ~c_valid, -1,
                             rank[jnp.clip(par_flat, 0, MN * S_MAX - 1)])
        c_parent = jnp.where(c_parent >= MNC, -1, c_parent)  # clipped overflow

        # level table: candidates are already sorted by level, so the in-level
        # position is rank minus the level's start offset
        c_level = level.reshape(-1)[sel]
        level_counts = jnp.zeros(max_levels, jnp.int32).at[
            jnp.clip(c_level, 0, max_levels - 1)].add(
            c_valid.astype(jnp.int32))
        level_start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(level_counts)[:-1]])
        w = jnp.arange(MNC) - level_start[jnp.clip(c_level, 0, max_levels - 1)]
        ok = c_valid & (w >= 0) & (w < max_width)
        lvl_idx = jnp.where(ok, jnp.clip(c_level, 0, max_levels - 1), max_levels)
        w_idx = jnp.where(ok, w, 0)
        table = jnp.full((max_levels + 1, max_width), -1, jnp.int32).at[
            lvl_idx, w_idx].set(jnp.arange(MNC, dtype=jnp.int32))[:max_levels]

        topo = TreeTopology(parent=c_parent, node_mask=c_valid,
                            level_table=table)
        return topo, c_slot, (2 * c_s).astype(jnp.int32)

    topo, cost_slot, cost_step = jax.vmap(one_tree)(roots)
    return DeviceCostTrees(topo=topo, cost_slot=cost_slot,
                           cost_step=cost_step, tree_mask=tree_mask,
                           n_trees=n_trees)
