"""Scale-out workloads (BASELINE.json): parallel scenario trees with full
iLQR contingency planning sharded over a device mesh.

The solver (planner/ilqr.py) is shape-static and vmaps across trees; here the
tree batch axis is sharded over the mesh's 'data' axis so each chip solves
its slice and the only cross-chip traffic is the final gather — the layout
that saturates ICI-attached v5e slices with thousands of contingency solves.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mind_tpu.ops.potential import NodeCostData, CostParams
from mind_tpu.planner.ilqr import TreeTopology, ILQRConfig, ilqr_solve, build_topology


def _random_tree_parents(rng, n_nodes: int, max_levels: int, max_width: int,
                         branch_p: float = 0.2) -> list[int]:
    """Random branching parent list shaped like AIME cost-tree output: chains
    of cost nodes that fork at contingency branch points (reference
    trajectory_tree.py:36-50 builds exactly such trees from scenario nodes).

    Node i's parent is node i-1 (chain growth) except with probability
    branch_p it forks off any earlier node, subject to the depth and
    per-level width caps required by the fixed-shape topology tables.
    """
    parents = [-1]
    depth = [0]
    width = np.zeros(max_levels, np.int64)
    width[0] = 1
    for i in range(1, n_nodes):
        def has_room(j):
            return depth[j] + 1 < max_levels and width[depth[j] + 1] < max_width
        if rng.random() < branch_p:
            cands = [j for j in range(i) if has_room(j)]
        else:
            cands = [i - 1] if has_room(i - 1) else \
                [j for j in range(i) if has_room(j)]
        if not cands:
            break
        p = int(rng.choice(cands))
        parents.append(p)
        depth.append(depth[p] + 1)
        width[depth[p] + 1] += 1
    return parents


def make_tree_batch(n_trees: int, n_nodes: int, max_nodes: int,
                    max_levels: int, max_width: int, n_exo: int, seed: int = 0,
                    branching: bool = True):
    """A batch of randomized branching cost trees for scale tests/benches.

    Each tree gets its own random topology (mixed depths and fork points, the
    shape real AIME output has), stacked into a batched TreeTopology so the
    scatter-add child aggregation in the Riccati sweep is exercised at scale.
    Pass branching=False for plain shared-chain topologies.
    """
    rng = np.random.default_rng(seed)
    if branching:
        topos = []
        for _ in range(n_trees):
            n_i = int(rng.integers(max(2, n_nodes // 2), n_nodes + 1))
            parents = _random_tree_parents(rng, n_i, max_levels, max_width)
            topos.append(build_topology(parents, max_nodes, max_levels,
                                        max_width=max_width, as_numpy=True))
        topo = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *topos)
    else:
        topo = build_topology(list(range(-1, n_nodes - 1)), max_nodes,
                              max_levels, max_width=max_width)

    lane = np.stack([np.linspace(-50, 200, 64), np.zeros(64)], axis=1)
    params = CostParams(
        field_offset=jnp.asarray([-51.0, -51.0], jnp.float32),
        res=jnp.float32(0.4),
        grid_n=256,
        tgt_seg_start=jnp.asarray(lane[:-1], jnp.float32),
        tgt_seg_end=jnp.asarray(lane[1:], jnp.float32),
        tgt_seg_mask=jnp.ones(63, bool),
        w_tgt=jnp.float32(1.0),
        w_ego=jnp.float32(1.0),
        w_ego_cov_offset=jnp.float32(1.0),
        w_exo=jnp.float32(10.0),
        w_exo_cov_offset=jnp.float32(2.5),
        w_exo_cost_offset=jnp.float32(10.0),
        w_des_state=jnp.asarray([0, 0, 0.1, 0, 1.0, 10.0], jnp.float32),
        des_state=jnp.asarray([0, 0, 4.0, 0, 0, 0], jnp.float32),
        w_state_con=jnp.asarray([0, 0, 50.0, 50.0, 50.0, 500.0], jnp.float32),
        state_lb=jnp.asarray([-1e5, -1e5, 0.0, -10.0, -6.0, -0.2], jnp.float32),
        state_ub=jnp.asarray([1e5, 1e5, 8.0, 10.0, 4.0, 0.2], jnp.float32),
        w_ctrl=jnp.asarray([5.0, 5.0], jnp.float32),
    )

    MN = max_nodes
    nodes = NodeCostData(
        prob=jnp.ones((n_trees, MN), jnp.float32),
        ego_mean=jnp.asarray(
            rng.normal(0, 5, (n_trees, MN, 2)).astype(np.float32)),
        ego_cov=jnp.full((n_trees, MN), 0.5, jnp.float32),
        exo_mean=jnp.asarray(
            rng.normal(10, 10, (n_trees, MN, n_exo, 2)).astype(np.float32)),
        exo_cov=jnp.full((n_trees, MN, n_exo), 0.5, jnp.float32),
        exo_mask=jnp.ones((n_trees, MN, n_exo), bool),
    )
    x0 = jnp.asarray(
        rng.normal(0, 1, (n_trees, 6)).astype(np.float32))
    return topo, nodes, params, x0


def parallel_tree_solve(mesh: Mesh, topo: TreeTopology, nodes: NodeCostData,
                        params: CostParams, x0: jnp.ndarray,
                        ilqr_cfg: ILQRConfig = ILQRConfig(max_iterations=20)):
    """Solve a [n_trees]-batch of contingency problems, trees sharded over
    the mesh's 'data' axis. Returns (us [n_trees, MN, 2], J [n_trees]).

    `topo` may be a single TreeTopology shared by all trees, or a batched one
    (leaves with a leading [n_trees] axis, as produced by make_tree_batch)
    giving every tree its own branching structure.
    """
    batched_topo = topo.parent.ndim == 2
    MN = topo.parent.shape[-1]
    dp = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    nodes = jax.tree.map(lambda x: jax.device_put(x, dp), nodes)
    x0 = jax.device_put(x0, dp)
    topo = jax.tree.map(
        lambda x: jax.device_put(x, dp if batched_topo else repl), topo)
    params = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, params)

    def solve(topo_i, nodes_i, x0_i):
        us0 = jnp.zeros((MN, 2), x0_i.dtype)
        xs, us, info = ilqr_solve(topo_i, x0_i, us0, nodes_i, params, ilqr_cfg)
        return us, info["J"]

    fn = jax.jit(jax.vmap(solve, in_axes=(0 if batched_topo else None, 0, 0)))
    us, J = fn(topo, nodes, x0)
    return us, J
