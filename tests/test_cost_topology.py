"""Device cost-topology builder vs the host builder on the same tree meta."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.config import TrajTreeConfig
from mind_tpu.planner.cost_topology import device_cost_topology
from mind_tpu.planner.trajectory_tree import build_cost_indices

MN = 16


def make_meta():
    """Hand-built AIME tree:
      0 root
      1 (rc A, dur 20, end)   2 (rc B, dur 12, end)
      3 child of 1 (dur 40, end)  4 child of 1 (dur 40, end)
      5 child of 2 (dur 48, end)
      6 child of 2 (dur 10, not end)  -> excluded
    """
    parent = np.full(MN, -1, np.int32)
    depth = np.zeros(MN, np.int32)
    duration = np.zeros(MN, np.int32)
    start_t = np.zeros(MN, np.int32)
    end = np.zeros(MN, bool)
    tree_id = np.full(MN, -1, np.int32)

    def node(i, p, d, dur, st, e, t):
        parent[i], depth[i], duration[i], start_t[i], end[i], tree_id[i] = \
            p, d, dur, st, e, t

    node(1, 0, 1, 20, 0, True, 1)
    node(2, 0, 1, 12, 0, True, 2)
    node(3, 1, 2, 40, 20, True, 1)
    node(4, 1, 2, 40, 20, True, 1)
    node(5, 2, 2, 48, 12, True, 2)
    node(6, 2, 2, 10, 12, False, -1)
    return parent, depth, duration, start_t, end, tree_id


def test_device_matches_host_builder():
    parent, depth, duration, start_t, end, tree_id = make_meta()
    cfg = TrajTreeConfig(max_cost_nodes=64, max_depth_levels=32,
                         max_width_hint=8)

    host = build_cost_indices(parent, duration, end, tree_id, cfg)
    dev = jax.jit(lambda *a: device_cost_topology(
        *a, max_trees=6, max_cost_nodes=64, max_levels=32, max_width=8)
    )(jnp.asarray(parent), jnp.asarray(depth), jnp.asarray(duration),
      jnp.asarray(start_t), jnp.asarray(end), jnp.asarray(tree_id))

    assert int(dev.n_trees) == len(host) == 2
    for t, (topo_h, cs_h, st_h) in enumerate(host):
        mask_d = np.asarray(dev.topo.node_mask[t])
        mask_h = np.asarray(topo_h.node_mask)
        assert mask_d.sum() == mask_h.sum(), f"tree {t} node count"
        n = int(mask_h.sum())
        # same multiset of (slot, step, parent-slot/step) triples: compare by
        # sorting both node lists by (slot, step)
        def canon(cs, st, par):
            rows = []
            for i in range(n):
                p = int(par[i])
                pkey = (-1, -1) if p < 0 else (int(cs[p]), int(st[p]))
                rows.append((int(cs[i]), int(st[i]), pkey))
            return sorted(rows)

        got = canon(np.asarray(dev.cost_slot[t]), np.asarray(dev.cost_step[t]),
                    np.asarray(dev.topo.parent[t]))
        want = canon(cs_h, st_h, np.asarray(topo_h.parent))
        assert got == want, f"tree {t}"

        # level table: every active node appears exactly once
        tbl = np.asarray(dev.topo.level_table[t])
        ids = tbl[tbl >= 0]
        assert sorted(ids.tolist()) == list(range(n))
        # parents live strictly above children
        lvl_of = {int(i): l for l in range(tbl.shape[0]) for i in tbl[l] if i >= 0}
        par_d = np.asarray(dev.topo.parent[t])
        for i in range(n):
            if par_d[i] >= 0:
                assert lvl_of[int(par_d[i])] == lvl_of[i] - 1
