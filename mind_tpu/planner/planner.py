"""MINDPlanner facade: device-resident observation buffer, fused AIME, and
tree-vmapped two-phase iLQR with one host sync on each side of the solve.

Host-side twin of the reference's MINDPlanner (planners/mind/planner.py)
re-shaped for a high-latency host<->device link: per plan cycle the host
issues (1) the fused AIME program, (2) one small metadata pull, (3) the solve
program over index arrays, (4) one control pull. Trajectory tensors never
cross to the host except for optional visualization export.
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
from mind_tpu.planner.scenario_tree import NodeSlots
from mind_tpu.planner.aime_device import (
    DeviceObsBuffer,
    obs_buffer_update,
    aime_grow_tree,
)
from mind_tpu.planner.trajectory_tree import (
    build_cost_indices,
    gather_cost_nodes,
    make_cost_params,
    two_phase_solve,
    polish_solve,
    evaluate_traj_tree,
)
from mind_tpu.planner.cost_topology import device_cost_topology
from mind_tpu.planner.ilqr import ILQRConfig
from mind_tpu.utils.metrics import Metrics

MAX_TREES = 6  # <= num modes root children
MAX_TGT_PTS = 256       # AIME target lane, ~1 m resampled (demos use <= 213)
MAX_COST_TGT_PTS = 64   # cost-field target lane, 4 m simplified (<= 26)

TYPE_ORDER = [
    ObjectType.VEHICLE,
    ObjectType.PEDESTRIAN,
    ObjectType.MOTORCYCLIST,
    ObjectType.CYCLIST,
    ObjectType.BUS,
    ObjectType.UNKNOWN,
]


def resolve_exec_dtype(tt, solve_dtype):
    """TrajTreeConfig.exec_solve_dtype=None means 'follow solve_dtype'
    (the re-solve is disabled); the re-solve compiles in only when the
    resolved dtype differs from the solve dtype."""
    return jnp.dtype(tt.exec_solve_dtype or solve_dtype)


def exec_resolve_ctrl(slots, norm_prob, amask, dct, best, x0, us_best,
                      warm_params, full_params, ilqr_cfg, warm_ilqr_cfg, tt):
    """Re-solve the SELECTED tree at `tt.exec_solve_dtype` and return its
    first control. Selection ran on the fast f32 solves; only the winner —
    the one tree whose first control the vehicle executes — pays for the
    higher precision.

    Two strategies (TrajTreeConfig.exec_resolve_mode):
    - 'polish': one full-phase solve warm-started from the winner's
      converged f32 controls `us_best` — a handful of f64 iterations to the
      full-cost optimum the mirror's solve also approaches;
    - 'scratch': the full two-phase solve (reference planner.py:174-178),
      reproducing the f64 mirror's iteration path exactly (executed control
      mirror-exact whenever the selection agrees) at ~10x the polish cost.
    """
    ed = resolve_exec_dtype(tt, ilqr_cfg.dtype)
    topo_best = jax.tree.map(lambda x: x[best], dct.topo)
    nodes_e = gather_cost_nodes(slots, norm_prob, dct.cost_slot[best],
                                dct.cost_step[best], topo_best.node_mask,
                                amask, dtype=ed)
    dts = str(ed)
    if tt.exec_resolve_mode == "polish":
        xs_e, _, _ = polish_solve(
            topo_best, x0, us_best, nodes_e, full_params,
            ilqr_cfg._replace(dtype=dts,
                              max_iterations=tt.exec_polish_iterations))
    else:
        xs_e, _, _ = two_phase_solve(
            topo_best, x0, nodes_e, warm_params, full_params,
            ilqr_cfg._replace(dtype=dts), warm_ilqr_cfg._replace(dtype=dts))
    return xs_e[0, 4:6].astype(jnp.float32)


def fused_plan_core(params, buf, types, amask, x0, warm_params, full_params,
                    target_vel, lane_static, tgt_static, eval_segs, *,
                    batched_apply, cfg, ilqr_cfg, warm_ilqr_cfg, weights,
                    return_exec_payload=False):
    """The whole plan cycle as one pure program: AIME + device cost topology
    + two-phase solve + selection. Statics are data arguments so the same
    function vmaps across scenarios (parallel/multi_scenario.py).
    Returns [ctrl(2), ok, max_iterations]; with `return_exec_payload` (the
    native host exec re-solve, TrajTreeConfig.exec_resolve_mode='native')
    also returns the winner tree's (parent row, node mask, f64 cost-node
    data) for the C++ re-solver (mind_tpu/native)."""
    state, meta = aime_grow_tree(
        params, batched_apply, cfg, buf, types, amask,
        lane_static, tgt_static)
    dct = device_cost_topology(
        state.parent, state.depth, state.duration, state.start_t,
        state.end_flag, meta.tree_id,
        MAX_TREES, cfg.traj_tree.max_cost_nodes,
        cfg.traj_tree.max_depth_levels, cfg.traj_tree.max_width_hint)
    sd = jnp.dtype(ilqr_cfg.dtype)

    def one(topo, cs, st):
        nodes = gather_cost_nodes(state.slots, meta.norm_prob, cs, st,
                                  topo.node_mask, amask, dtype=sd)
        xs, us, info = two_phase_solve(
            topo, x0, nodes, warm_params, full_params, ilqr_cfg,
            warm_ilqr_cfg)
        cost = evaluate_traj_tree(
            xs, us, topo.node_mask, jnp.sum(topo.node_mask), x0,
            *eval_segs, target_vel, weights)
        return cost, xs[0, 4:6], us, info["iterations"]

    cost_b, ctrl_b, us_b, its = jax.vmap(one)(dct.topo, dct.cost_slot,
                                              dct.cost_step)
    cost_b = jnp.where(dct.tree_mask, cost_b, jnp.inf)
    best = jnp.argmin(cost_b)
    ctrl = ctrl_b[best].astype(jnp.float32)  # f64 under solve_dtype=float64
    ed = resolve_exec_dtype(cfg.traj_tree, ilqr_cfg.dtype)
    native = cfg.traj_tree.exec_resolve_mode == "native"
    if ed != sd and not native:  # static: compiled in only when enabled
        ctrl = exec_resolve_ctrl(
            state.slots, meta.norm_prob, amask, dct, best, x0, us_b[best],
            warm_params, full_params, ilqr_cfg, warm_ilqr_cfg,
            cfg.traj_tree)
    ok = (dct.n_trees > 0).astype(jnp.float32)
    out = jnp.concatenate([
        ctrl, jnp.array([ok], jnp.float32),
        jnp.array([jnp.max(jnp.where(dct.tree_mask, its, 0))], jnp.float32),
    ])
    if not return_exec_payload:
        return out
    # winner-tree payload for the NATIVE host exec re-solve: the f64 gather
    # the device 'scratch' re-solve would consume (gather_cost_nodes in
    # exec_resolve_ctrl), shipped to the host CPU where f64 is native.
    # Packed into ONE flat f64 vector so the host pulls it in a single
    # device->host transfer — over a high-RTT link, eight separate pulls
    # cost ~8x the round-trip latency (measured ~227 ms/plan vs ~40 ms).
    topo_best = jax.tree.map(lambda x: x[best], dct.topo)
    nodes_e = gather_cost_nodes(slots=state.slots, norm_prob=meta.norm_prob,
                                cost_slot=dct.cost_slot[best],
                                cost_step=dct.cost_step[best],
                                node_mask=topo_best.node_mask, actor_mask=amask,
                                dtype=jnp.float64)
    f64 = jnp.float64
    return jnp.concatenate([
        out.astype(f64),
        topo_best.parent.astype(f64),
        topo_best.node_mask.astype(f64),
        nodes_e.prob.astype(f64),
        nodes_e.ego_mean.astype(f64).ravel(),
        nodes_e.ego_cov.astype(f64),
        nodes_e.exo_mean.astype(f64).ravel(),
        nodes_e.exo_cov.astype(f64).ravel(),
        nodes_e.exo_mask.astype(f64).ravel(),
    ])


def type_onehot(obj_type: ObjectType) -> np.ndarray:
    out = np.zeros(7, np.float32)
    try:
        out[TYPE_ORDER.index(obj_type)] = 1
    except ValueError:
        out[6] = 1  # static / background / construction / riderless
    return out


class ObsBuffer:
    """Host shell around the device observation window: tracks id->slot
    assignment and presence; the rolling [A, 50] arrays live on device and
    update with one async dispatch per plan trigger.

    With `device_updates=False` the device dispatch is deferred: update()
    only records (states, present) in `.pending`, and a batched runner
    (parallel/multi_scenario.py) applies ONE vmapped update across all
    scenarios per trigger instead of S eager dispatches."""

    def __init__(self, max_actors: int, device_updates: bool = True,
                 origin: Optional[np.ndarray] = None,
                 dtype: str = "float64"):
        self.A = max_actors
        self.origin = origin  # local planning frame (see MINDPlanner)
        self.slots: Dict[str, int] = {}
        self.types = np.zeros((max_actors, 7), np.float32)
        self.active = np.zeros(max_actors, bool)
        self.last_present = np.zeros(max_actors, bool)
        self.buf = DeviceObsBuffer.create(max_actors, jnp.dtype(dtype))
        self._update_fn = jax.jit(obs_buffer_update)
        self.device_updates = device_updates
        self.pending = None
        # device-copy caches (uploads cost ~40 ms latency over the tunnel)
        self._types_d = None
        self._types_ver = -1
        self._ver = 0
        self._mask_d = None
        self._mask_key = None

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
        self._ver += 1
        return s

    def update(self, observations):
        """observations: list of (track_id, state[x,y,v,yaw], obj_type);
        the ego must be first with track_id 'AV' (slot 0)."""
        states = np.zeros((self.A, 4), np.float64)
        present = np.zeros(self.A, bool)
        for track_id, state, obj_type in observations:
            s = self._slot(track_id, obj_type)
            if s is None:
                continue
            states[s] = state
            present[s] = True
        if self.origin is not None:
            states[:, :2] -= self.origin
        # float64 end to end: the obs window is the root of the decision
        # pipeline (see DeviceObsBuffer docstring)
        self.last_present = present
        if self.device_updates:
            self.buf = self._update_fn(self.buf, jnp.asarray(states),
                                       jnp.asarray(present))
        else:
            self.pending = (states, present)

    def actor_mask(self) -> np.ndarray:
        """Agents predicted this plan: active and observed at the last frame
        (reference utils.py:274-276)."""
        return self.active & self.last_present

    def types_device(self):
        if self._types_ver != self._ver:
            self._types_d = jnp.asarray(self.types)
            self._types_ver = self._ver
        return self._types_d

    def mask_device(self, mask: np.ndarray):
        key = mask.tobytes()
        if self._mask_key != key:
            self._mask_d = jnp.asarray(mask)
            self._mask_key = key
        return self._mask_d


class MINDPlanner:
    """One ego agent's planner. Mirrors the reference's public surface:
    update_observation / update_state_ctrl / update_target_lane / plan."""

    def __init__(self, cfg: PlannerConfig, smp: SemanticMap,
                 lcl_smp: LocalSemanticMap, export_trees: bool = True,
                 shared_net=None):
        self.cfg = cfg
        self.obs_len = cfg.obs_len
        self.smp = smp
        self.lcl_smp = lcl_smp
        self.state: Optional[np.ndarray] = None
        self.ctrl: Optional[np.ndarray] = None
        self.gt_tgt_lane: Optional[np.ndarray] = None
        self.obs_buffer = ObsBuffer(cfg.max_actors, dtype=cfg.pipeline_dtype)
        self.metrics = Metrics()
        self.export_trees = export_trees

        self._init_statics()
        self.obs_buffer.origin = self.origin
        if shared_net is not None:
            self.model, self.params, self.batched_apply = shared_net
        else:
            self._init_network()
        self._init_programs()

    # ------------------------------------------------------------------
    def _init_statics(self):
        cfg = self.cfg
        # Plan in a per-scenario LOCAL frame: AV2 global coordinates sit
        # ~6500 m from the map origin, where float32 resolution is ~8e-4 m —
        # above the 1e-3 trajectory-parity budget (BASELINE.json). A fixed
        # 100 m-rounded origin is subtracted from every position before it
        # reaches the device (exactly representable, so the shift itself is
        # lossless in float64), bringing on-device coordinates to O(100) m
        # with ~6e-6 m resolution. Controls are frame-independent.
        self.origin = np.round(
            np.asarray(self.lcl_smp.target_lane, float).mean(axis=0)
            / 100.0) * 100.0
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
        # anchors at the PIPELINE dtype: under 'float64' they enter the scene
        # prep (and through it the network-input f32 cast + decision
        # pipeline) at the same precision the float64 mirror uses
        pdt = jnp.dtype(cfg.pipeline_dtype)
        anchors = np.zeros((L, 2), np.float64)
        anchors[:n] = graph["lane_ctrs"] - self.origin
        vecs = np.tile(np.array([1.0, 0.0], np.float64), (L, 1))
        vecs[:n] = graph["lane_vecs"]
        mask = np.zeros(L, bool)
        mask[:n] = True
        self.lane_static = LaneGraphStatic(
            node_feats=jnp.asarray(node_feats),
            anchors_g=jnp.asarray(anchors, pdt),
            anchor_vecs_g=jnp.asarray(vecs, pdt),
            mask=jnp.asarray(mask),
        )

        # resampled target lane (~1 m) + info (reference planner.py:147-171)
        lane = self.lcl_smp.target_lane
        info = self.lcl_smp.target_lane_info
        pts, src = resample_polyline(lane, 1.0)
        info_rows = np.concatenate([
            info[0][:, None], info[1], info[2], info[3],
            info[4][:, None], info[5][:, None],
        ], axis=-1).astype(np.float64)[src]  # [P, 12]
        P = MAX_TGT_PTS
        assert len(pts) <= P, f"target lane too long: {len(pts)}"
        tp = np.full((P, 2), 1e6, np.float64)
        tp[:len(pts)] = pts - self.origin
        ti = np.zeros((P, 12), np.float64)
        ti[:len(pts)] = info_rows
        tm = np.zeros(P, bool)
        tm[:len(pts)] = True
        self.tgt_static = TargetLaneStatic(
            points=jnp.asarray(tp, pdt), info=jnp.asarray(ti, pdt),
            mask=jnp.asarray(tm), n_points=jnp.int32(len(pts)))

        # evaluation lane (unresampled target lane, planner.py:200-205);
        # float64 — tree selection is a discrete decision (PARITY.md)
        ev = np.asarray(lane, np.float64) - self.origin
        S = MAX_TGT_PTS
        evp = np.full((S, 2), 1e6, np.float64)
        evp[:len(ev)] = ev
        evm = np.zeros(S - 1, bool)
        evm[:len(ev) - 1] = True
        self._eval_segs = (jnp.asarray(evp[:-1]), jnp.asarray(evp[1:]),
                           jnp.asarray(evm))

    def _init_network(self):
        import os

        cfg = self.cfg
        self.model, self.params, self.batched_apply = init_scene_pred(
            cfg.net, cfg.max_actors, cfg.max_lanes, seed=cfg.seed)
        if cfg.ckpt_path and os.path.isdir(cfg.ckpt_path):
            from mind_tpu.models.checkpoint import load_params

            self.params = load_params(cfg.ckpt_path, self.params)
        elif cfg.ckpt_path:
            from mind_tpu.models.weights import try_load_torch_checkpoint

            loaded = try_load_torch_checkpoint(cfg.ckpt_path, self.params,
                                               cfg.net)
            if loaded is not None:
                self.params = loaded

    def _init_programs(self):
        cfg = self.cfg
        self.ilqr_cfg = ILQRConfig(
            dt=cfg.traj_tree.dt,
            wheelbase=cfg.traj_tree.wheelbase,
            max_iterations=cfg.traj_tree.max_iterations,
            rel_tol=cfg.traj_tree.rel_tol,
            n_line_search=cfg.traj_tree.n_line_search,
            mu_max=cfg.traj_tree.max_reg,
            dtype=cfg.traj_tree.solve_dtype,
        )
        self.warm_ilqr_cfg = self.ilqr_cfg._replace(
            max_iterations=cfg.traj_tree.warm_max_iterations)

        MN = cfg.scen_tree.max_tree_nodes

        def aime_fn(params, buf, types, amask):
            state, meta = aime_grow_tree(
                params, self.batched_apply, cfg, buf, types, amask,
                self.lane_static, self.tgt_static)
            packed = jnp.concatenate([
                meta.parent.astype(jnp.float32),
                meta.duration.astype(jnp.float32),
                meta.end_flag.astype(jnp.float32),
                meta.tree_id.astype(jnp.float32),
                meta.norm_prob,
                jnp.array([meta.n_nodes], jnp.float32),
            ])
            return state, meta, packed

        self._aime_fn = jax.jit(aime_fn)

        weights = (cfg.comfort_acc_weight, cfg.comfort_str_weight,
                   cfg.efficiency_weight, cfg.target_weight)

        def solve_fn(slots, norm_prob, amask, topo_b, cost_slot_b, cost_step_b,
                     tree_mask, x0, warm_params, full_params, target_vel):
            sd = jnp.dtype(self.ilqr_cfg.dtype)

            def one(topo, cs, st):
                nodes = gather_cost_nodes(slots, norm_prob, cs, st,
                                          topo.node_mask, amask, dtype=sd)
                xs, us, info = two_phase_solve(
                    topo, x0, nodes, warm_params, full_params,
                    self.ilqr_cfg, self.warm_ilqr_cfg)
                cost = evaluate_traj_tree(
                    xs, us, topo.node_mask, jnp.sum(topo.node_mask), x0,
                    *self._eval_segs, target_vel, weights)
                return xs, us, cost, info["iterations"] + info["warm_iterations"]

            xs_b, us_b, cost_b, its = jax.vmap(one)(topo_b, cost_slot_b,
                                                    cost_step_b)
            cost_b = jnp.where(tree_mask, cost_b, jnp.inf)
            best = jnp.argmin(cost_b)
            # control = first cost node's [accel, steer] (planner.py:141-144)
            ctrl = xs_b[best, 0, 4:6].astype(jnp.float32)
            ed = resolve_exec_dtype(cfg.traj_tree, self.ilqr_cfg.dtype)
            if ed != sd:
                from mind_tpu.planner.cost_topology import DeviceCostTrees

                dct_like = DeviceCostTrees(
                    topo=topo_b, cost_slot=cost_slot_b, cost_step=cost_step_b,
                    tree_mask=tree_mask, n_trees=jnp.sum(tree_mask))
                ctrl = exec_resolve_ctrl(
                    slots, norm_prob, amask, dct_like, best, x0, us_b[best],
                    warm_params, full_params, self.ilqr_cfg,
                    self.warm_ilqr_cfg, cfg.traj_tree)
            # everything the host needs, in one small pull; the f64 tree
            # costs ride along separately for selection-margin diagnostics
            # (f32 packing would round away near-tie margins)
            packed = jnp.concatenate([
                ctrl,
                jnp.array([best], jnp.float32),
                jnp.array([jnp.max(jnp.where(tree_mask, its, 0))], jnp.float32),
            ])
            return xs_b, us_b, packed, cost_b

        self._solve_fn = jax.jit(solve_fn)

        import functools

        core = functools.partial(
            fused_plan_core, batched_apply=self.batched_apply, cfg=cfg,
            ilqr_cfg=self.ilqr_cfg, warm_ilqr_cfg=self.warm_ilqr_cfg,
            weights=weights)

        # native host exec re-solve: the fused program additionally returns
        # the winner tree's f64 cost nodes; the ~5 ms C++ two-phase solve
        # replaces the ~450 ms f64-emulated device re-solve (mind_tpu/native)
        self._exec_native = cfg.traj_tree.exec_resolve_mode == "native"
        if self._exec_native:
            from mind_tpu import native

            native.load()  # build/load the C++ solver now, not mid-episode

        def fused_fn(params, buf, types, amask, x0, warm_params, full_params,
                     target_vel):
            return core(params, buf, types, amask, x0, warm_params,
                        full_params, target_vel, self.lane_static,
                        self.tgt_static, self._eval_segs,
                        return_exec_payload=self._exec_native)

        self._fused_fn = jax.jit(fused_fn)
        self._fused_core = core  # statics-as-args version for batched runners

        if self._exec_native:
            def exec_gather_fn(slots, norm_prob, amask, cs, st, mask):
                return gather_cost_nodes(slots, norm_prob, cs, st, mask,
                                         amask, dtype=jnp.float64)

            self._exec_gather_fn = jax.jit(exec_gather_fn)

    def _cost_params(self):
        """Static parts of the warm/full CostParams (built once; only the
        state-centered grid origin changes per plan)."""
        if not hasattr(self, "_cost_params_cache"):
            cfg = self.cfg
            tv = float(self.lcl_smp.target_velocity)
            zero = np.zeros(6)
            lane_local = self.gt_tgt_lane - self.origin
            self._cost_params_cache = (
                make_cost_params(cfg.traj_tree.warm, zero, lane_local,
                                 tv, MAX_COST_TGT_PTS, warm=True),
                make_cost_params(cfg.traj_tree.full, zero, lane_local,
                                 tv, MAX_COST_TGT_PTS, warm=False),
            )
        return self._cost_params_cache

    def _field_offset(self, state: np.ndarray):
        """Grid origin from a LOCAL-frame state (f64, the mirror's
        precision; two_phase_solve casts cost params to the solve dtype)."""
        ph = self.cfg.traj_tree.full
        n, _ = ph.smooth_grid_size
        half = 0.5 * (n - 1) * ph.smooth_grid_res
        return jnp.asarray([state[0] - half, state[1] - half], jnp.float64)

    # ------------------------------------------------------------------
    # NATIVE execution re-solve (TrajTreeConfig.exec_resolve_mode='native'):
    # the winner tree's two-phase f64 solve runs as C++ on the host CPU
    # (mind_tpu/native/exec_ilqr.cpp), where f64 is a native ALU op instead
    # of TPU software emulation — same semantics as the device 'scratch'
    # re-solve (reference planner.py:174-178) at ~1% of its cost.
    # ------------------------------------------------------------------
    def _native_cost_params(self):
        """Flat phase-parameter blocks + target-lane points for the C++
        solver (built once; only the grid origin changes per plan)."""
        if not hasattr(self, "_native_params_cache"):
            from mind_tpu import native

            warm_p, full_p = self._cost_params()
            wf, pts = native.pack_cost_params(warm_p)
            ff, _ = native.pack_cost_params(full_p)  # phases share the lane
            self._native_params_cache = (wf, ff, pts)
        return self._native_params_cache

    def _native_exec_ctrl(self, parent, node_mask, nodes,
                          s_loc) -> Optional[np.ndarray]:
        """Staged-path entry: pull the winner-tree NodeCostData and run the
        native re-solve (the fused path uses _native_exec_ctrl_flat)."""
        parent = np.asarray(parent)
        mask = np.asarray(node_mask)
        return self._native_solve_arrays(
            parent, mask, np.asarray(nodes.prob), np.asarray(nodes.ego_mean),
            np.asarray(nodes.ego_cov), np.asarray(nodes.exo_mean),
            np.asarray(nodes.exo_cov), np.asarray(nodes.exo_mask), s_loc)

    def _native_exec_ctrl_flat(self, flat: np.ndarray,
                               s_loc) -> Optional[np.ndarray]:
        """Fused-path entry: unpack the single-pull payload vector written
        by fused_plan_core (layout documented there: [out(4), parent(MN),
        node_mask(MN), prob(MN), ego_mean(2*MN), ego_cov(MN),
        exo_mean(2*MN*E), exo_cov(MN*E), exo_mask(MN*E)])."""
        MN = self.cfg.traj_tree.max_cost_nodes
        E = self.cfg.max_actors - 1
        o = 4
        parent = flat[o:o + MN].astype(np.int32); o += MN
        mask = flat[o:o + MN] > 0.5; o += MN
        prob = flat[o:o + MN]; o += MN
        ego_mean = flat[o:o + 2 * MN].reshape(MN, 2); o += 2 * MN
        ego_cov = flat[o:o + MN]; o += MN
        exo_mean = flat[o:o + 2 * MN * E].reshape(MN, E, 2); o += 2 * MN * E
        exo_cov = flat[o:o + MN * E].reshape(MN, E); o += MN * E
        exo_mask = flat[o:o + MN * E].reshape(MN, E) > 0.5
        return self._native_solve_arrays(parent, mask, prob, ego_mean,
                                         ego_cov, exo_mean, exo_cov,
                                         exo_mask, s_loc)

    def _native_solve_arrays(self, parent, mask, prob, ego_mean, ego_cov,
                             exo_mean, exo_cov, exo_mask,
                             s_loc) -> Optional[np.ndarray]:
        """Run the native two-phase re-solve of the winner tree and return
        its first control (xs[0, 4:6], planner.py:141-144 semantics), or
        None when the tree is empty."""
        from mind_tpu import native

        n = int(mask.sum())
        if n <= 0:
            return None
        tt = self.cfg.traj_tree
        wf, ff, pts = self._native_cost_params()
        off = self._field_offset_np(s_loc)
        wf = wf.copy()
        ff = ff.copy()
        wf[0:2] = off
        ff[0:2] = off
        x0 = np.concatenate([np.asarray(s_loc, np.float64),
                             np.asarray(self.ctrl, np.float64)])
        xs, _us, _info = native.two_phase_solve(
            parent[:n], prob[:n], ego_mean[:n], ego_cov[:n],
            exo_mean[:n], exo_cov[:n], exo_mask[:n], pts, x0, wf, ff,
            dt=tt.dt, wb=tt.wheelbase,
            warm_max_iterations=tt.warm_max_iterations,
            max_iterations=tt.max_iterations, rel_tol=tt.rel_tol,
            n_line_search=tt.n_line_search, mu_max=tt.max_reg)
        return xs[0, 4:6]

    def _field_offset_np(self, state: np.ndarray) -> np.ndarray:
        """Numpy twin of _field_offset (identical f64 arithmetic)."""
        ph = self.cfg.traj_tree.full
        n, _ = ph.smooth_grid_size
        half = 0.5 * (n - 1) * ph.smooth_grid_res
        return np.array([state[0] - half, state[1] - half], np.float64)

    def local_state(self) -> np.ndarray:
        """Current ego state in the local planning frame (float64 host)."""
        s = np.asarray(self.state, np.float64).copy()
        s[:2] -= self.origin
        return s

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
        MN = cfg.scen_tree.max_tree_nodes
        actor_mask = self.obs_buffer.actor_mask()
        if not actor_mask[0]:
            return False, None, None  # no ego observation yet
        amask_d = self.obs_buffer.mask_device(actor_mask)

        if not self.export_trees:
            return self._plan_fused(amask_d)

        with self.metrics.timer.phase("aime"):
            state, meta, packed = self._aime_fn(
                self.params, self.obs_buffer.buf,
                self.obs_buffer.types_device(), amask_d)
            packed_np = np.asarray(packed)  # the one AIME-side sync

        parent = packed_np[0:MN].astype(np.int32)
        duration = packed_np[MN:2 * MN].astype(np.int32)
        end_flag = packed_np[2 * MN:3 * MN] > 0.5
        tree_id = packed_np[3 * MN:4 * MN].astype(np.int32)
        n_nodes = int(packed_np[5 * MN])

        if not end_flag.any():
            self.metrics.incr("plan_failures")
            return False, None, None
        self.metrics.incr("plans")
        self.last_n_nodes = n_nodes
        # AIME meta kept for stage-by-stage diagnostics (diag_playback)
        self.last_meta = {
            "parent": parent, "duration": duration, "end_flag": end_flag,
            "tree_id": tree_id,
            "norm_prob": packed_np[4 * MN:5 * MN].astype(np.float64),
        }

        with self.metrics.timer.phase("flatten"):
            trees = build_cost_indices(parent, duration, end_flag, tree_id,
                                       cfg.traj_tree)
            trees = trees[:MAX_TREES]
            n_real = len(trees)
            while len(trees) < MAX_TREES:
                trees.append(trees[0])
            # numpy-stack everything, upload once (eager per-tree device ops
            # cost ~40 ms each over the tunnel)
            topo_b = jax.tree.map(
                lambda *xs: jnp.asarray(np.stack(xs)), *[t[0] for t in trees])
            cost_slot_b = jnp.asarray(np.stack([t[1] for t in trees]))
            cost_step_b = jnp.asarray(np.stack([t[2] for t in trees]))
            tree_mask = jnp.asarray(
                np.arange(MAX_TREES) < n_real)
            self.last_n_trees = n_real
            self.metrics.observe("scen_trees", n_real)
            self.metrics.observe("scen_nodes", n_nodes)

        s_loc = self.local_state()
        # f64 like the mirror: two_phase_solve casts to the solve dtype, and
        # the exec re-solve sees the unrounded state
        x0 = jnp.asarray([*s_loc, *self.ctrl], jnp.float64)
        tv = float(self.lcl_smp.target_velocity)
        warm_p, full_p = self._cost_params()
        # only the grid origin depends on the current state
        offset = self._field_offset(s_loc)
        warm_p = warm_p._replace(field_offset=offset)
        full_p = full_p._replace(field_offset=offset)

        with self.metrics.timer.phase("solve"):
            xs_b, us_b, packed_s, cost_b = self._solve_fn(
                state.slots, meta.norm_prob, amask_d, topo_b,
                cost_slot_b, cost_step_b, tree_mask, x0, warm_p, full_p,
                jnp.float32(tv))
            small = np.asarray(packed_s)  # the one solve-side sync
        ctrl = small[:2].astype(np.float64)
        self.metrics.observe("ilqr_iterations", float(small[3]))
        self.last_tree_costs = np.asarray(cost_b)[:n_real]

        if self._exec_native and np.isfinite(ctrl).all():
            with self.metrics.timer.phase("exec_native"):
                topo_w, cs_w, st_w = trees[int(small[2])]
                nodes_e = self._exec_gather_fn(
                    state.slots, meta.norm_prob, amask_d, jnp.asarray(cs_w),
                    jnp.asarray(st_w), jnp.asarray(topo_w.node_mask))
                nat = self._native_exec_ctrl(topo_w.parent, topo_w.node_mask,
                                             nodes_e, s_loc)
                if nat is not None:
                    ctrl = np.asarray(nat, np.float64)

        if not np.isfinite(ctrl).all():
            self.metrics.incr("plan_failures")
            return False, None, None

        if not self.export_trees:
            return True, ctrl, None

        with self.metrics.timer.phase("export"):
            best = int(small[2])
            scen_tree = self._export_scen_tree(
                state.slots, parent, duration, end_flag, tree_id,
                np.asarray(meta.norm_prob), actor_mask, best)
            traj_tree = self._export_traj_tree(
                trees[best][0], np.asarray(xs_b[best]), np.asarray(us_b[best]),
                np.asarray(x0))
        return True, ctrl, [[scen_tree], [traj_tree]]

    def _plan_fused(self, amask_d):
        """Single-dispatch plan: one program, one ~24-byte sync."""
        with self.metrics.timer.phase("plan_fused"):
            s_loc = self.local_state()
            x0 = jnp.asarray([*s_loc, *self.ctrl], jnp.float64)
            tv = float(self.lcl_smp.target_velocity)
            warm_p, full_p = self._cost_params()
            offset = self._field_offset(s_loc)
            warm_p = warm_p._replace(field_offset=offset)
            full_p = full_p._replace(field_offset=offset)
            out = self._fused_fn(
                self.params, self.obs_buffer.buf,
                self.obs_buffer.types_device(), amask_d,
                x0, warm_p, full_p, jnp.float32(tv))
            flat = np.asarray(out)  # the one sync (packed payload in native)
            small = flat[:4]
        ctrl = small[:2].astype(np.float64)
        self.metrics.observe("ilqr_iterations", float(small[3]))
        if small[2] < 0.5 or not np.isfinite(ctrl).all():
            self.metrics.incr("plan_failures")
            return False, None, None
        if self._exec_native:
            with self.metrics.timer.phase("exec_native"):
                nat = self._native_exec_ctrl_flat(flat, s_loc)
            if nat is not None:
                ctrl = np.asarray(nat, np.float64)
                if not np.isfinite(ctrl).all():
                    self.metrics.incr("plan_failures")
                    return False, None, None
        self.metrics.incr("plans")
        return True, ctrl, None

    # ------------------------------------------------------------------
    def _export_scen_tree(self, slots: NodeSlots, parent, duration, end_flag,
                          tree_id, norm_prob, actor_mask, best: int) -> Tree:
        """Pull the best tree's node trajectories for visualization
        (reference get_scenario_tree export, scenario_tree.py:243-272)."""
        roots = sorted({int(t) for t in np.unique(tree_id) if t >= 0})
        rc = roots[best]
        members = [i for i in np.flatnonzero(end_flag) if tree_id[i] == rc]
        ids = jnp.asarray(members)
        pos = np.asarray(slots.pos[ids]) + self.origin  # back to global
        cov = np.asarray(slots.cov[ids])
        tgt = np.asarray(slots.tgt_pts[ids]) + self.origin
        row = {k: i for i, k in enumerate(members)}

        tree = Tree()
        # BFS insertion: root child first, then children by parent links
        inserted = set()
        queue = [rc]
        tree.add_node(Node(rc, None, self._payload(rc, row, pos, cov, tgt,
                                                   duration, norm_prob,
                                                   actor_mask)))
        inserted.add(rc)
        while queue:
            k = queue.pop(0)
            for c in members:
                if int(parent[c]) == k and c not in inserted:
                    tree.add_node(Node(c, k, self._payload(
                        c, row, pos, cov, tgt, duration, norm_prob,
                        actor_mask)))
                    inserted.add(c)
                    queue.append(c)
        return tree

    @staticmethod
    def _payload(i, row, pos, cov, tgt, duration, norm_prob, actor_mask):
        d = int(duration[i])
        r = row[i]
        traj = pos[r][actor_mask, OBS_LEN:OBS_LEN + d]
        cv = cov[r][actor_mask, OBS_LEN:OBS_LEN + d]
        return [float(norm_prob[i]), traj, cv, tgt[r]]

    def _export_traj_tree(self, topo, xs, us, x0) -> Tree:
        xs = np.asarray(xs, np.float64).copy()
        xs[:, :2] += self.origin  # back to global for visualization
        x0 = np.asarray(x0, np.float64).copy()
        x0[:2] += self.origin
        tree = Tree()
        tree.add_node(Node(-1, None, [x0, np.zeros(2)]))
        parent = np.asarray(topo.parent)
        mask = np.asarray(topo.node_mask)
        for i in range(int(mask.sum())):
            p = int(parent[i])
            tree.add_node(Node(i, p if p >= 0 else -1, [xs[i], us[i]]))
        return tree
