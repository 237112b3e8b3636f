"""MINDPlanner facade: observation buffering, AIME, tree-iLQR, selection.

Host-side twin of the reference's MINDPlanner (planners/mind/planner.py)
driving the device-side kernels: a rolling 10 Hz observation buffer, the
jitted AIME rounds, a tree-vmapped two-phase iLQR solve, and min-cost tree
selection. One planner instance serves one ego agent for a whole simulation;
every jitted program compiles once (fixed paddings) on the first plan.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.common.tree import Tree, Node
from mind_tpu.config import PlannerConfig
from mind_tpu.data.av2 import ObjectType
from mind_tpu.data.semantic_map import (
    SemanticMap,
    LocalSemanticMap,
    build_lane_graph,
    lane_graph_features,
)
from mind_tpu.common.geometry import resample_polyline
from mind_tpu.models import init_scene_pred
from mind_tpu.planner.scene_prep import (
    OBS_LEN,
    LaneGraphStatic,
    TargetLaneStatic,
)
from mind_tpu.planner.scenario_tree import ScenarioTreeGenerator, PRED_LEN
from mind_tpu.planner.trajectory_tree import (
    flatten_scen_tree,
    make_cost_params,
    two_phase_solve,
    evaluate_traj_tree,
)
from mind_tpu.planner.ilqr import ILQRConfig

MAX_TREES = 6  # <= num modes root children
MAX_TGT_PTS = 512

TYPE_ORDER = [
    ObjectType.VEHICLE,
    ObjectType.PEDESTRIAN,
    ObjectType.MOTORCYCLIST,
    ObjectType.CYCLIST,
    ObjectType.BUS,
    ObjectType.UNKNOWN,
]


def type_onehot(obj_type: ObjectType) -> np.ndarray:
    out = np.zeros(7, np.float32)
    try:
        out[TYPE_ORDER.index(obj_type)] = 1
    except ValueError:
        out[6] = 1  # static / background / construction / riderless
    return out


class ObsBuffer:
    """Rolling 10 Hz observation window per tracked agent
    (reference planner.py:66-95). Fixed [A, 50] numpy arrays; new agents get
    the next free slot; absent agents receive dummy unobserved frames."""

    def __init__(self, max_actors: int):
        self.A = max_actors
        self.slots: Dict[str, int] = {}
        self.pos = np.zeros((max_actors, OBS_LEN, 2), np.float32)
        self.ang = np.zeros((max_actors, OBS_LEN), np.float32)
        self.vel = np.zeros((max_actors, OBS_LEN, 2), np.float32)
        self.observed = np.zeros((max_actors, OBS_LEN), bool)
        self.types = np.zeros((max_actors, 7), np.float32)
        self.active = np.zeros(max_actors, bool)

    def _slot(self, track_id: str, obj_type: ObjectType) -> Optional[int]:
        if track_id in self.slots:
            return self.slots[track_id]
        free = np.flatnonzero(~self.active)
        if len(free) == 0:
            return None  # buffer full: ignore new tracks
        s = int(free[0])
        self.slots[track_id] = s
        self.active[s] = True
        self.types[s] = type_onehot(obj_type)
        return s

    def update(self, observations):
        """observations: list of (track_id, state[x,y,v,yaw], obj_type);
        the ego must be first with track_id 'AV'."""
        self.pos = np.roll(self.pos, -1, axis=1)
        self.ang = np.roll(self.ang, -1, axis=1)
        self.vel = np.roll(self.vel, -1, axis=1)
        self.observed = np.roll(self.observed, -1, axis=1)
        # default: dummy frame repeating previous values, unobserved
        self.pos[:, -1] = self.pos[:, -2]
        self.ang[:, -1] = self.ang[:, -2]
        self.vel[:, -1] = self.vel[:, -2]
        self.observed[:, -1] = False

        for track_id, state, obj_type in observations:
            s = self._slot(track_id, obj_type)
            if s is None:
                continue
            x, y, v, yaw = state
            self.pos[s, -1] = (x, y)
            self.ang[s, -1] = yaw
            self.vel[s, -1] = (v * np.cos(yaw), v * np.sin(yaw))
            self.observed[s, -1] = True

    def root_window(self):
        """NN-filled window + masks (reference utils.py:245-342 semantics):
        actors valid iff observed at the last frame; pos/ang nearest-neighbor
        filled over unobserved frames, velocity zero-filled."""
        A = self.A
        pos = self.pos.copy()
        ang = self.ang.copy()
        vel = self.vel.copy()
        vel[~self.observed] = 0.0
        # forward then backward fill pos/ang per agent
        for arr in (pos, ang):
            for a in range(A):
                obs_idx = np.flatnonzero(self.observed[a])
                if len(obs_idx) == 0:
                    continue
                idx = np.arange(OBS_LEN)
                # nearest previous observed index (forward fill)
                prev = np.maximum.accumulate(
                    np.where(self.observed[a], idx, -1))
                filled = np.where(prev >= 0, prev, obs_idx[0])
                arr[a] = arr[a][filled]
        actor_mask = self.active & self.observed[:, -1]
        return pos, ang, vel, self.observed.astype(np.float32), actor_mask


class MINDPlanner:
    """One ego agent's planner. Mirrors the reference's public surface:
    update_observation / update_state_ctrl / update_target_lane / plan."""

    def __init__(self, cfg: PlannerConfig, smp: SemanticMap,
                 lcl_smp: LocalSemanticMap):
        self.cfg = cfg
        self.obs_len = cfg.obs_len
        self.smp = smp
        self.lcl_smp = lcl_smp
        self.state: Optional[np.ndarray] = None
        self.ctrl: Optional[np.ndarray] = None
        self.gt_tgt_lane: Optional[np.ndarray] = None
        self.obs_buffer = ObsBuffer(cfg.max_actors)
        from mind_tpu.utils.metrics import Metrics

        self.metrics = Metrics()

        self._init_statics()
        self._init_network()
        self._init_generators()
        self._solve_fn = jax.jit(self._make_solve_fn())

    # ------------------------------------------------------------------
    def _init_statics(self):
        cfg = self.cfg
        # lane graph (static per scenario): instance-frame node features plus
        # global anchors (see scene_prep docstring)
        graph = build_lane_graph(self.smp.map_data, np.zeros(2), np.eye(2),
                                 cfg.scen_tree.seg_length,
                                 cfg.scen_tree.seg_n_node)
        feats = lane_graph_features(graph)  # [L, 10, 16]
        L = cfg.max_lanes
        n = feats.shape[0]
        assert n <= L, f"{n} lane segments exceed max_lanes={L}"
        node_feats = np.zeros((L, 10, 16), np.float32)
        node_feats[:n] = feats
        anchors = np.zeros((L, 2), np.float32)
        anchors[:n] = graph["lane_ctrs"]
        vecs = np.tile(np.array([1.0, 0.0], np.float32), (L, 1))
        vecs[:n] = graph["lane_vecs"]
        mask = np.zeros(L, bool)
        mask[:n] = True
        self.lane_static = LaneGraphStatic(
            node_feats=jnp.asarray(node_feats),
            anchors_g=jnp.asarray(anchors),
            anchor_vecs_g=jnp.asarray(vecs),
            mask=jnp.asarray(mask),
        )

        # resampled target lane (~1 m) + info (reference planner.py:147-171)
        lane = self.lcl_smp.target_lane
        info = self.lcl_smp.target_lane_info
        pts, src = resample_polyline(lane, 1.0)
        info_rows = np.concatenate([
            info[0][:, None], info[1], info[2], info[3],
            info[4][:, None], info[5][:, None],
        ], axis=-1).astype(np.float32)[src]  # [P, 12]
        P = MAX_TGT_PTS
        assert len(pts) <= P, f"target lane too long: {len(pts)}"
        tp = np.full((P, 2), 1e6, np.float32)
        tp[:len(pts)] = pts
        ti = np.zeros((P, 12), np.float32)
        ti[:len(pts)] = info_rows
        tm = np.zeros(P, bool)
        tm[:len(pts)] = True
        self.tgt_static = TargetLaneStatic(
            points=jnp.asarray(tp), info=jnp.asarray(ti),
            mask=jnp.asarray(tm), n_points=jnp.int32(len(pts)))

        # evaluation lane (unresampled target lane, planner.py:200-205)
        ev = np.asarray(lane, np.float32)
        S = MAX_TGT_PTS
        evp = np.full((S, 2), 1e6, np.float32)
        evp[:len(ev)] = ev
        evm = np.zeros(S - 1, bool)
        evm[:len(ev) - 1] = True
        self._eval_segs = (jnp.asarray(evp[:-1]), jnp.asarray(evp[1:]),
                          jnp.asarray(evm))

    def _init_network(self):
        cfg = self.cfg
        self.model, self.params, self.batched_apply = init_scene_pred(
            cfg.net, cfg.max_actors, cfg.max_lanes, seed=cfg.seed)
        if cfg.ckpt_path:
            from mind_tpu.models.weights import try_load_torch_checkpoint

            loaded = try_load_torch_checkpoint(cfg.ckpt_path, self.params)
            if loaded is not None:
                self.params = loaded

    def _init_generators(self):
        self.scen_gen = ScenarioTreeGenerator(
            self.cfg, self.batched_apply, self.params,
            self.lane_static, self.tgt_static, self.cfg.max_actors)
        self.ilqr_cfg = ILQRConfig(
            dt=self.cfg.traj_tree.dt,
            wheelbase=self.cfg.traj_tree.wheelbase,
            max_iterations=self.cfg.traj_tree.max_iterations,
            rel_tol=self.cfg.traj_tree.rel_tol,
            n_line_search=self.cfg.traj_tree.n_line_search,
            mu_max=self.cfg.traj_tree.max_reg,
        )

    def _make_solve_fn(self):
        cfg = self.cfg
        weights = (cfg.comfort_acc_weight, cfg.comfort_str_weight,
                   cfg.efficiency_weight, cfg.target_weight)

        def solve_all(topo_b, nodes_b, tree_mask, x0,
                      warm_params, full_params, target_vel):
            def one(topo, nodes):
                xs, us, info = two_phase_solve(
                    topo, x0, nodes, warm_params, full_params, self.ilqr_cfg)
                cost = evaluate_traj_tree(
                    xs, us, topo.node_mask,
                    jnp.sum(topo.node_mask), x0,
                    *self._eval_segs, target_vel, weights)
                return xs, us, cost

            xs_b, us_b, cost_b = jax.vmap(one)(topo_b, nodes_b)
            cost_b = jnp.where(tree_mask, cost_b, jnp.inf)
            best = jnp.argmin(cost_b)
            return xs_b, us_b, cost_b, best

        return solve_all

    # ------------------------------------------------------------------
    # reference public surface
    # ------------------------------------------------------------------
    def update_observation(self, observations):
        self.obs_buffer.update(observations)

    def update_state_ctrl(self, state, ctrl):
        self.state = np.asarray(state, np.float64)
        self.ctrl = np.asarray(ctrl, np.float64)

    def update_target_lane(self, gt_tgt_lane):
        self.gt_tgt_lane = np.asarray(gt_tgt_lane, np.float64)

    def plan(self) -> Tuple[bool, Optional[np.ndarray], Optional[list]]:
        cfg = self.cfg
        pos, ang, vel, obs_flags, actor_mask = self.obs_buffer.root_window()
        if not actor_mask[0]:
            return False, None, None  # no ego observation yet

        # window order: pos, ang, vel, cov (1e-5 at the root), observed
        root_window = (jnp.asarray(pos), jnp.asarray(ang), jnp.asarray(vel),
                       jnp.full_like(jnp.asarray(pos[..., 0]), 1e-5),
                       jnp.asarray(obs_flags))

        with self.metrics.timer.phase("aime"):
            scen_trees = self.scen_gen.branch_aime(
                root_window, jnp.asarray(self.obs_buffer.types),
                jnp.asarray(actor_mask), self.params)
        if not scen_trees:
            self.metrics.incr("plan_failures")
            return False, None, None
        self.metrics.incr("plans")
        self.metrics.observe("scen_trees", len(scen_trees))
        self.metrics.observe(
            "scen_nodes", sum(st.size() for st in scen_trees))

        # flatten all scenario trees to padded cost arrays
        with self.metrics.timer.phase("flatten"):
            arrays = [flatten_scen_tree(st, actor_mask, cfg.traj_tree,
                                        max_exo=cfg.max_actors - 1)
                      for st in scen_trees[:MAX_TREES]]
        n_real = len(arrays)
        while len(arrays) < MAX_TREES:
            arrays.append(arrays[0])
        topo_b = jax.tree.map(lambda *xs: jnp.stack(xs), *[a.topo for a in arrays])
        nodes_b = jax.tree.map(lambda *xs: jnp.stack(xs), *[a.nodes for a in arrays])
        tree_mask = jnp.asarray([i < n_real for i in range(MAX_TREES)])

        x0 = jnp.asarray([*self.state, *self.ctrl], jnp.float32)
        tv = float(self.lcl_smp.target_velocity)
        warm_p = make_cost_params(cfg.traj_tree.warm, np.asarray(x0),
                                  self.gt_tgt_lane, tv, MAX_TGT_PTS, warm=True)
        full_p = make_cost_params(cfg.traj_tree.full, np.asarray(x0),
                                  self.gt_tgt_lane, tv, MAX_TGT_PTS, warm=False)

        with self.metrics.timer.phase("solve"):
            xs_b, us_b, cost_b, best = self._solve_fn(
                topo_b, nodes_b, tree_mask, x0, warm_p, full_p, jnp.float32(tv))
            best = int(best)

        # control = first cost node's [accel, steer] (planner.py:141-144)
        ctrl = np.asarray(xs_b[best, 0, 4:6], np.float64)

        # host trajectory tree for visualization / evaluation
        traj_tree = self._export_traj_tree(
            arrays[best], np.asarray(xs_b[best]), np.asarray(us_b[best]),
            np.asarray(x0))
        return True, ctrl, [[scen_trees[best]], [traj_tree]]

    @staticmethod
    def _export_traj_tree(arrays, xs, us, x0) -> Tree:
        tree = Tree()
        tree.add_node(Node(-1, None, [x0, np.zeros(2)]))
        parent = np.asarray(arrays.topo.parent)
        n = int(arrays.n_nodes)
        for i in range(n):
            p = int(parent[i])
            tree.add_node(Node(i, p if p >= 0 else -1, [xs[i], us[i]]))
        return tree
