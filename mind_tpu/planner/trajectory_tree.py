"""Trajectory-tree optimizer: scenario trees -> cost trees -> tree-iLQR.

Capability twin of the reference's TrajectoryTreeOptimizer
(planners/mind/trajectory_tree.py): one cost node per even prediction step
(0.2 s effective dt), exo agents entering only through the potential field,
two-phase solve (warm start on the target-lane field, then the full field
from the warm controls). The cost tree becomes fixed-width index/data arrays
(see planner/ilqr.py) and both phases run as one jitted, tree-vmapped call.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.common.tree import Tree, Node
from mind_tpu.config import TrajTreeConfig, OptPhaseConfig
from mind_tpu.ops.potential import NodeCostData, CostParams
from mind_tpu.planner.ilqr import (
    TreeTopology,
    ILQRConfig,
    ilqr_solve,
    build_topology,
)


class CostTreeArrays(NamedTuple):
    """One scenario tree flattened to cost-node arrays (padded to MN)."""

    topo: TreeTopology
    nodes: NodeCostData
    n_nodes: np.ndarray  # [] int32 real cost-node count


def flatten_scen_tree(scen_tree: Tree, actor_mask: np.ndarray,
                      cfg: TrajTreeConfig, max_exo: int) -> CostTreeArrays:
    """DFS over scenario nodes, one cost node per even step
    (reference trajectory_tree.py:28-54,66-122)."""
    MN = cfg.max_cost_nodes
    parents: List[int] = []
    probs: List[float] = []
    ego_means: List[np.ndarray] = []
    ego_covs: List[float] = []
    exo_means: List[np.ndarray] = []
    exo_covs: List[np.ndarray] = []

    exo_valid = np.asarray(actor_mask)[1:]
    n_exo = exo_valid.shape[0]

    last_index = {}
    stack = [scen_tree.get_root()]
    while stack:
        node = stack.pop()
        prob, trajs, covs, _tgt = node.data
        last = last_index[node.parent_key] if node.parent_key is not None else -1
        duration = trajs.shape[1]
        for i in range(0, duration, 2):
            parents.append(last)
            last = len(parents) - 1
            probs.append(float(prob))
            ego_means.append(trajs[0, i])
            ego_covs.append(float(covs[0, i]))
            em = np.full((max_exo, 2), 1e6, np.float32)
            ec = np.zeros(max_exo, np.float32)
            em[:n_exo] = trajs[1:, i]
            ec[:n_exo] = covs[1:, i]
            exo_means.append(em)
            exo_covs.append(ec)
        last_index[node.key] = len(parents) - 1
        for ck in node.children_keys:
            stack.append(scen_tree.get_node(ck))

    n = len(parents)
    topo = build_topology(parents, MN, cfg.max_depth_levels,
                          max_width=cfg.max_width_hint)

    def pad1(vals, fill=0.0):
        out = np.full(MN, fill, np.float32)
        out[:n] = vals
        return out

    exo_mask = np.zeros((MN, max_exo), bool)
    exo_mask[:n] = exo_valid[None, :]

    em = np.full((MN, max_exo, 2), 1e6, np.float32)
    em[:n] = np.stack(exo_means)
    ec = np.zeros((MN, max_exo), np.float32)
    ec[:n] = np.stack(exo_covs)
    egm = np.zeros((MN, 2), np.float32)
    egm[:n] = np.stack(ego_means)

    nodes = NodeCostData(
        prob=jnp.asarray(pad1(probs)),
        ego_mean=jnp.asarray(egm),
        ego_cov=jnp.asarray(pad1(ego_covs)),
        exo_mean=jnp.asarray(em),
        exo_cov=jnp.asarray(ec),
        exo_mask=jnp.asarray(exo_mask),
    )
    return CostTreeArrays(topo=topo, nodes=nodes, n_nodes=np.int32(n))


def build_cost_indices(parent: np.ndarray, duration: np.ndarray,
                       end_flag: np.ndarray, tree_id: np.ndarray,
                       cfg: TrajTreeConfig):
    """Host-side: AIME meta arrays -> per-tree cost-node index arrays.

    Same construction as flatten_scen_tree but without touching trajectories:
    cost node k of a tree references (scen slot, even step) pairs; the actual
    means/covs are gathered ON DEVICE by gather_cost_nodes. Returns a list of
    (topo, cost_slot [MN], cost_step [MN]) per scenario tree.
    """
    MN = cfg.max_cost_nodes
    roots = sorted({int(t) for t in np.unique(tree_id) if t >= 0})
    # children lists over end-flagged nodes
    kids = {}
    for i in np.flatnonzero(end_flag):
        p = int(parent[i])
        if p >= 0:
            kids.setdefault(p, []).append(int(i))

    out = []
    for rc in roots:
        parents_c, slots_c, steps_c = [], [], []
        last_index = {}
        stack = [(rc, -1)]
        while stack:
            node, last = stack.pop()
            d = int(duration[node])
            for s in range(0, d, 2):
                parents_c.append(last)
                last = len(parents_c) - 1
                slots_c.append(node)
                steps_c.append(s)
            last_index[node] = last
            for c in kids.get(node, []):
                stack.append((c, last))
        topo = build_topology(parents_c, MN, cfg.max_depth_levels,
                              max_width=cfg.max_width_hint, as_numpy=True)
        cs = np.zeros(MN, np.int32)
        cs[:len(slots_c)] = slots_c
        st = np.zeros(MN, np.int32)
        st[:len(steps_c)] = steps_c
        out.append((topo, cs, st))
    return out


def gather_cost_nodes(slots, norm_prob, cost_slot, cost_step, node_mask,
                      actor_mask, dtype=jnp.float32) -> NodeCostData:
    """Device-side: gather per-cost-node data from the tree slots.

    Scenario-node trajectory slice [OBS_LEN : OBS_LEN+duration] step i maps
    to hist index OBS_LEN + i (scenario_tree export semantics). Slots are
    stored in f64 (decision precision); `dtype` is the iLQR solve precision
    (ILQRConfig.dtype)."""
    OBS = 50
    t = OBS + cost_step                        # [MN]
    # advanced indices (cost_slot, t) around the agent slice put the gathered
    # [MN] axis first: pos_t [MN, A, 2], cov_t [MN, A]
    pos_t = slots.pos[cost_slot, :, t].astype(dtype)
    cov_t = slots.cov[cost_slot, :, t].astype(dtype)
    return NodeCostData(
        prob=(norm_prob[cost_slot] * node_mask).astype(dtype),
        ego_mean=pos_t[:, 0],
        ego_cov=cov_t[:, 0],
        exo_mean=pos_t[:, 1:],
        exo_cov=cov_t[:, 1:],
        exo_mask=node_mask[:, None] & actor_mask[None, 1:],
    )


def make_cost_params(phase: OptPhaseConfig, x0: np.ndarray,
                     tgt_lane: np.ndarray, target_vel: float,
                     max_tgt_pts: int, warm: bool) -> CostParams:
    """Per-phase CostParams; the warm phase zeroes the ego/exo disc fields
    (reference warm cost tree has only the target-lane field)."""
    n, _ = phase.smooth_grid_size
    res = phase.smooth_grid_res
    # gen_dist_field offset (reference ilqr/utils.py:5-11)
    field_size = (n - 1) * res
    # stored at float64 (the mirror's precision); two_phase_solve casts all
    # float leaves to the solve dtype, so the f32 path sees the same values
    # it always did while the f64 path sees the exact reference weights
    f64 = jnp.float64
    offset = np.array([x0[0] - 0.5 * field_size, x0[1] - 0.5 * field_size],
                      np.float64)

    P = max_tgt_pts
    pts = np.full((P, 2), 1e6, np.float64)
    m = min(len(tgt_lane), P)
    pts[:m] = tgt_lane[:m]
    seg_mask = np.zeros(P - 1, bool)
    seg_mask[:m - 1] = True

    return CostParams(
        field_offset=jnp.asarray(offset),
        res=jnp.asarray(res, f64),
        grid_n=n,
        tgt_seg_start=jnp.asarray(pts[:-1]),
        tgt_seg_end=jnp.asarray(pts[1:]),
        tgt_seg_mask=jnp.asarray(seg_mask),
        w_tgt=jnp.asarray(phase.w_tgt, f64),
        w_ego=jnp.asarray(0.0 if warm else phase.w_ego, f64),
        w_ego_cov_offset=jnp.asarray(phase.w_ego_cov_offset, f64),
        w_exo=jnp.asarray(0.0 if warm else phase.w_exo, f64),
        w_exo_cov_offset=jnp.asarray(phase.w_exo_cov_offset, f64),
        w_exo_cost_offset=jnp.asarray(phase.w_exo_cost_offset, f64),
        w_des_state=jnp.asarray(np.diag(phase.w_des_state()), f64),
        des_state=jnp.asarray([0, 0, target_vel, 0, 0, 0], f64),
        w_state_con=jnp.asarray(np.diag(phase.w_state_con()), f64),
        state_lb=jnp.asarray(phase.state_lower_bound, f64),
        state_ub=jnp.asarray(phase.state_upper_bound, f64),
        w_ctrl=jnp.asarray([phase.w_ctrl, phase.w_ctrl], f64),
    )


def two_phase_solve(topo: TreeTopology, x0, nodes: NodeCostData,
                    warm_params: CostParams, full_params: CostParams,
                    ilqr_cfg: ILQRConfig, warm_cfg: ILQRConfig = None):
    """Warm-start solve (target-lane cost only) then full solve from the warm
    controls (reference planner.py:174-178). `warm_cfg` optionally gives the
    warm phase its own (smaller) iteration budget.

    The solve runs at `ilqr_cfg.dtype` — float leaves of x0/nodes/params are
    cast here (the solver is dtype-polymorphic); results return in the solve
    dtype (callers cast controls to f32 for packing)."""
    sd = jnp.dtype(ilqr_cfg.dtype)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(sd)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, t)

    x0 = jnp.asarray(x0).astype(sd)
    nodes, warm_params, full_params = map(cast,
                                          (nodes, warm_params, full_params))
    MN = topo.parent.shape[0]
    us0 = jnp.zeros((MN, 2), sd)
    _, us_warm, info_w = ilqr_solve(topo, x0, us0, nodes, warm_params,
                                    warm_cfg or ilqr_cfg)
    xs, us, info = ilqr_solve(topo, x0, us_warm, nodes, full_params, ilqr_cfg)
    info["warm_iterations"] = info_w["iterations"]
    return xs, us, info


def polish_solve(topo: TreeTopology, x0, us_init, nodes: NodeCostData,
                 full_params: CostParams, ilqr_cfg: ILQRConfig):
    """ONE full-phase solve at `ilqr_cfg.dtype` warm-started from `us_init`
    (the winner tree's converged solve-dtype controls): the
    `TrajTreeConfig.exec_resolve_mode='polish'` re-solve.

    Where `two_phase_solve` re-runs the mirror's warm+full iteration path
    from scratch (~140 f64 iterations), the polish starts at the f32
    optimum and descends the same full cost surface the mirror's full solve
    ends on, so it reaches the shared optimum in a handful of f64
    iterations (the while_loop exits on rel_tol). Float leaves are cast to
    the solve dtype here, mirroring two_phase_solve's entry cast."""
    sd = jnp.dtype(ilqr_cfg.dtype)

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(sd)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, t)

    return ilqr_solve(topo, jnp.asarray(x0).astype(sd),
                      jnp.asarray(us_init).astype(sd), cast(nodes),
                      cast(full_params), ilqr_cfg)


def evaluate_traj_tree(xs, us, node_mask, n_nodes, x0,
                       eval_seg_start, eval_seg_end, eval_seg_mask,
                       target_vel, cfg_weights):
    """Best-tree selection cost (reference planner.py:180-198): mean over
    tree nodes (including the x0 root) of comfort + efficiency + target
    distance terms.

    Evaluated at the EVAL-SEGMENT dtype (float64 in production): argmin over
    candidate trees is a discrete decision, and near-tied trees can carry
    very different first controls — f32 cost noise would flip the selection
    against the float64 mirror (PARITY.md)."""
    from mind_tpu.common.geometry import jx_point_segments_dist

    dtype = eval_seg_start.dtype
    xs = xs.astype(dtype)
    us = us.astype(dtype)
    x0 = x0.astype(dtype)
    target_vel = jnp.asarray(target_vel, dtype)
    comfort_acc_w, comfort_str_w, eff_w, tgt_w = cfg_weights

    def node_cost(x, u, m):
        d = jx_point_segments_dist(x[:2], eval_seg_start, eval_seg_end,
                                   eval_seg_mask)
        c = (comfort_acc_w * u[0] ** 2 + comfort_str_w * u[1] ** 2
             + eff_w * (target_vel - x[2]) ** 2 + tgt_w * d)
        return jnp.where(m, c, 0.0)

    costs = jax.vmap(node_cost)(xs, us, node_mask)
    root_cost = node_cost(x0, jnp.zeros(2, dtype), True)
    return (jnp.sum(costs) + root_cost) / (n_nodes + 1)
