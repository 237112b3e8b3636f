"""AIME — Adaptive Interaction Modality Exploration — as batched rounds.

The reference grows the scenario tree with a Python while-loop, variable-size
batches and per-node torch calls (planners/mind/scenario_tree.py:38-108).
Here each AIME round is ONE jitted program over fixed-width tensors:

  round inputs   [B] branch-node slots (obs windows, probs, times, active)
  scene prep     vmapped normalization/RPE/high-level-command (scene_prep.py)
  prediction     one batched network forward over all branch nodes
  decode         denormalize all M modes to the global frame, accumulate
                 covariance, prune (probability + target-lane), merge
                 (bearing-topology greedy dedupe), branch-time rule
  round outputs  [B, M] candidate hists + keep/prob/t_b/end flags

The host keeps only the tiny tree bookkeeping (parent ids, depth, slot
allocation — a few hundred bytes per round) and never touches trajectories;
candidate hists are scattered into fixed node-slot arrays on device.

Replicated reference semantics, including the branch-time index arithmetic of
get_branch_time (scenario_tree.py:592-611) and the candidate ordering of
prune_merge (scenario_tree.py:281-412). Diverges intentionally where the
reference's caching was inconsistent: lane anchors are re-derived from global
coordinates each round (see scene_prep.py docstring).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.common.geometry import jx_points_polyline_dist
from mind_tpu.common.tree import Tree, Node
from mind_tpu.config import PlannerConfig
from mind_tpu.planner.scene_prep import (
    OBS_LEN,
    LaneGraphStatic,
    TargetLaneStatic,
    SceneInputs,
    prepare_node_inputs,
)

SEQ_LEN = 110  # obs 50 + pred 60
PRED_LEN = 60


class NodeSlots(NamedTuple):
    """Fixed-width device storage for scenario-tree nodes."""

    pos: jnp.ndarray   # [MN, A, 110, 2] global
    ang: jnp.ndarray   # [MN, A, 110]
    vel: jnp.ndarray   # [MN, A, 110, 2]
    cov: jnp.ndarray   # [MN, A, 110]
    tgt_pts: jnp.ndarray  # [MN, 11, 2]


class RoundOutputs(NamedTuple):
    pos: jnp.ndarray     # [B, M, A, 110, 2]
    ang: jnp.ndarray     # [B, M, A, 110]
    vel: jnp.ndarray     # [B, M, A, 110, 2]
    cov: jnp.ndarray     # [B, M, A, 110]
    tgt_pts: jnp.ndarray  # [B, 11, 2]
    prob: jnp.ndarray    # [B, M] joint path probability
    keep: jnp.ndarray    # [B, M] bool survived prune+merge
    t_b: jnp.ndarray     # [B, M] int32 branch time (== PRED_LEN if none)
    mode_prob: jnp.ndarray  # [B, M] raw cls prob (diagnostics)


class HostScenNode(NamedTuple):
    """One exported scenario-tree node on the host."""

    key: int
    parent: Optional[int]
    prob: float
    traj: np.ndarray      # [A_valid, duration, 2]
    cov: np.ndarray       # [A_valid, duration]
    tgt_pts: np.ndarray   # [11, 2]


def _wrap(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def _decode_node(cls, reg, vel_pred, inputs: SceneInputs,
                 win_pos, win_ang, win_vel, win_cov,
                 parent_prob, cur_t, actor_mask,
                 tgt_static: TargetLaneStatic, cfg):
    """Decode one branch node's M modes (reference prune_merge inner loop).

    cls [M], reg [A, M, 60, 5], vel_pred [A, M, 60, 2]; windows [A, 50, ...]
    in the global frame. Returns per-mode candidate hists + flags.

    Bulk arithmetic (denormalization, merge signature, target-distance)
    runs at the WINDOW dtype (PlannerConfig.pipeline_dtype); probabilities
    and covariance accumulation ALWAYS run in float64 — they carry the
    prune/branch-time decisions and cost a handful of scalar tracks. Under
    pipeline_dtype='float64' every quantity reproduces the float64 mirror's
    values bit-for-near-bit given equal network outputs.
    """
    dtype = win_pos.dtype
    f64 = jnp.float64
    cls64 = cls.astype(f64)
    cls = cls.astype(dtype)
    cov_p64 = jnp.maximum(reg[..., 2], reg[..., 3]).astype(f64)
    reg = reg.astype(dtype)
    vel_pred = vel_pred.astype(dtype)
    M = cls.shape[0]
    A = reg.shape[0]
    orig, rot, theta = inputs.orig, inputs.rot, inputs.theta
    a_ctrs, a_vecs = inputs.actor_ctrs, inputs.actor_vecs
    a_theta = jnp.arctan2(a_vecs[:, 1], a_vecs[:, 0])
    a_rot = jax.vmap(lambda t: jnp.array([[jnp.cos(t), -jnp.sin(t)],
                                          [jnp.sin(t), jnp.cos(t)]]))(a_theta)

    # instance -> scene -> global for all modes at once
    pos_p = jnp.einsum("amtd,aed->amte", reg[..., :2], a_rot) + a_ctrs[:, None, None]
    pos_g = jnp.einsum("amtd,ed->amte", pos_p, rot) + orig
    vel_s = jnp.einsum("amtd,aed->amte", vel_pred, a_rot)
    vel_g = jnp.einsum("amtd,ed->amte", vel_s, rot)
    ang_g = jnp.arctan2(vel_pred[..., 1], vel_pred[..., 0]) \
        + a_theta[:, None, None] + theta

    # [A, M, 60] max sigma, accumulated in f64 onto the last window cov
    cov_g = cov_p64 + win_cov.astype(f64)[:, None, -1:]

    # new 110-frame hists per mode
    def cat_mode(m):
        return (
            jnp.concatenate([win_pos, pos_g[:, m]], axis=1),
            jnp.concatenate([win_ang, ang_g[:, m]], axis=1),
            jnp.concatenate([win_vel, vel_g[:, m]], axis=1),
            jnp.concatenate([win_cov, cov_g[:, m]], axis=1),
        )
    hist_pos, hist_ang, hist_vel, hist_cov = jax.vmap(cat_mode)(jnp.arange(M))
    # -> [M, A, 110, *]

    prob = cls64 * parent_prob.astype(f64)                # [M], f64

    # prune: improbable scenes (scenario_tree.py:369-370)
    keep = prob >= cfg.prune_prob

    # prune: ego diverging from the target lane (scenario_tree.py:373-379)
    ego_mean = hist_pos[:, 0, -1]                          # [M, 2]
    ego_cov = hist_cov[:, 0, -1]                           # [M]
    d_tgt = jx_points_polyline_dist(ego_mean, tgt_static.points, tgt_static.mask)
    keep &= (d_tgt - ego_cov) <= cfg.tar_dist_thres

    # bearing-topology signature per exo (scenario_tree.py:382-394)
    rel = pos_g - pos_g[:1]                                # [A, M, 60, 2]
    rel = rel / (jnp.linalg.norm(rel, axis=-1, keepdims=True) + 1e-12)
    bear = jnp.arctan2(rel[..., 1], rel[..., 0])           # [A, M, 60]
    topo = jnp.sum(_wrap(bear[:, :, 1:] - bear[:, :, :-1]), axis=-1)  # [A, M]
    topo = topo[1:].T                                      # [M, A-1] exo only
    exo_valid = actor_mask[1:]                             # [A-1]

    # greedy merge in descending-probability order (scenario_tree.py:397-410)
    order = jnp.argsort(-cls)
    keep_sorted = keep[order]
    topo_sorted = topo[order]

    def merge_step(sel, i):
        diff = _wrap(topo_sorted - topo_sorted[i])  # [M, A-1] vs candidate i
        # a candidate is distinct iff ANY valid exo's signature differs > thres
        differs = jnp.any(((jnp.abs(diff) - cfg.merge_thres) > 0)
                          & exo_valid[None, :], axis=-1)  # [M]
        ok = jnp.all(jnp.where(sel, differs, True))
        sel = sel.at[i].set(keep_sorted[i] & ok)
        return sel, None

    keep_final_sorted, _ = jax.lax.scan(
        merge_step, jnp.zeros((M,), bool), jnp.arange(M))
    keep_final = jnp.zeros((M,), bool).at[order].set(keep_final_sorted)

    # branch time (scenario_tree.py:592-611), index arithmetic replicated
    compare_t = OBS_LEN + cur_t + jnp.where(cur_t == 0, 1, 0)
    ts = jnp.arange(SEQ_LEN)
    in_range = (ts >= cur_t + 1) & (ts < PRED_LEN) & (ts % 2 == 0)
    # cov ratio per agent at index OBS_LEN + t
    idx = jnp.clip(OBS_LEN + ts, 0, SEQ_LEN - 1)
    ratio = hist_cov[:, :, idx] / hist_cov[:, :, compare_t][..., None]  # [M, A, T]
    trig = jnp.any(ratio > cfg.cov_change_rate, axis=1,
                   where=actor_mask[None, :, None])  # [M, T]
    trig &= in_range[None, :]
    any_trig = jnp.any(trig, axis=-1)
    first_t = jnp.argmax(trig, axis=-1).astype(jnp.int32)
    t_b = jnp.where(any_trig, first_t, PRED_LEN)

    return RoundOutputs(
        pos=hist_pos, ang=hist_ang, vel=hist_vel, cov=hist_cov,
        tgt_pts=inputs.tgt_pts,
        prob=prob, keep=keep_final, t_b=t_b, mode_prob=cls,
    )


class ScenarioTreeGenerator:
    """Host orchestrator around the jitted AIME round."""

    def __init__(self, cfg: PlannerConfig, batched_apply, params,
                 lane_static: LaneGraphStatic, tgt_static: TargetLaneStatic,
                 max_actors: int):
        self.cfg = cfg
        self.scen_cfg = cfg.scen_tree
        self.params = params
        self.batched_apply = batched_apply
        self.lane_static = lane_static
        self.tgt_static = tgt_static
        self.A = max_actors
        self.B = cfg.scen_tree.max_branch_nodes
        self.MN = cfg.scen_tree.max_tree_nodes

        self._round_fn = jax.jit(self._make_round_fn())
        self._window_fn = jax.jit(self._make_window_fn())

    # ------------------------------------------------------------------
    def _make_round_fn(self):
        scen_cfg = self.scen_cfg

        def round_fn(params, win_pos, win_ang, win_vel, win_cov, win_obs,
                     actor_type, actor_mask, probs, cur_ts,
                     lane_static, tgt_static):
            # scene prep for every branch slot
            prep = jax.vmap(
                lambda p, a, v, o: prepare_node_inputs(
                    p, a, v, o, actor_type, actor_mask,
                    lane_static, tgt_static, scen_cfg.tar_time_ahead)
            )(win_pos, win_ang, win_vel, win_obs)

            f32 = jnp.float32
            cls, reg, vel = self.batched_apply(
                params, prep.actors.astype(f32), prep.actor_mask,
                prep.lanes.astype(f32), prep.lane_mask,
                prep.rpe.astype(f32), prep.tgt_nodes.astype(f32),
                prep.tgt_rpe.astype(f32))
            # cls [B, M], reg [B, A, M, 60, 5], vel [B, A, M, 60, 2]

            out = jax.vmap(
                lambda c, r, v, inp, wp, wa, wv, wc, pb, ct: _decode_node(
                    c, r, v, inp, wp, wa, wv, wc, pb, ct, actor_mask,
                    tgt_static, scen_cfg)
            )(cls, reg, vel, prep, win_pos, win_ang, win_vel, win_cov,
              probs, cur_ts)
            return out

        return round_fn

    def _make_window_fn(self):
        def window_fn(slots: NodeSlots, ids, durations):
            """Gather obs windows for the next round's branch nodes:
            window = hist[:, d : d+50] (update_obser semantics)."""
            def one(i, d):
                p = jax.lax.dynamic_slice_in_dim(slots.pos[i], d, OBS_LEN, axis=1)
                a = jax.lax.dynamic_slice_in_dim(slots.ang[i], d, OBS_LEN, axis=1)
                v = jax.lax.dynamic_slice_in_dim(slots.vel[i], d, OBS_LEN, axis=1)
                c = jax.lax.dynamic_slice_in_dim(slots.cov[i], d, OBS_LEN, axis=1)
                return p, a, v, c
            return jax.vmap(one)(ids, durations)
        return window_fn

    # ------------------------------------------------------------------
    def branch_aime(self, root_window, actor_type, actor_mask,
                    params=None) -> List[Tree]:
        """Grow the scenario tree; returns host scenario trees (one per
        surviving root child, probabilities renormalized) whose node data is
        [prob, traj [A,dur,2], cov [A,dur], tgt_pts] like the reference's
        get_scenario_tree export (scenario_tree.py:208-272)."""
        params = params if params is not None else self.params
        A, B, MN = self.A, self.B, self.MN
        win_pos0, win_ang0, win_vel0, win_cov0, win_obs0 = root_window

        # host tree bookkeeping
        tree = Tree()
        tree.add_node(Node(0, None, {"end": False, "terminated": False}))
        node_meta = {0: {"prob": 1.0, "cur_t": 0, "t_b": 0, "duration": 0}}
        next_slot = 1  # device slot 0 unused (root has no trajectory)

        dtype = win_pos0.dtype
        slots = NodeSlots(
            pos=jnp.zeros((MN, A, SEQ_LEN, 2), dtype),
            ang=jnp.zeros((MN, A, SEQ_LEN), dtype),
            vel=jnp.zeros((MN, A, SEQ_LEN, 2), dtype),
            # f64 like the fused path: covariance carries decisions
            cov=jnp.full((MN, A, SEQ_LEN), 1e-5, jnp.float64),
            tgt_pts=jnp.zeros((MN, 11, 2), dtype),
        )

        # round state: windows for the branch set
        def pad_b(x, fill=0.0):
            return jnp.broadcast_to(x[None], (B,) + x.shape)

        win_pos = pad_b(win_pos0)
        win_ang = pad_b(win_ang0)
        win_vel = pad_b(win_vel0)
        win_cov = pad_b(win_cov0)
        win_obs = pad_b(win_obs0)
        branch_keys = [0]
        probs = np.zeros(B, np.float64)
        probs[0] = 1.0
        cur_ts = np.zeros(B, np.int32)

        for depth in range(self.scen_cfg.max_depth):
            out = self._round_fn(
                params, win_pos, win_ang, win_vel, win_cov, win_obs,
                actor_type, actor_mask,
                jnp.asarray(probs), jnp.asarray(cur_ts),
                self.lane_static, self.tgt_static)

            keep = np.asarray(out.keep)
            prob = np.asarray(out.prob)
            t_b = np.asarray(out.t_b)

            # assemble children on host; scatter their hists into slots
            scatter_src = []  # (b, m) per new node
            scatter_dst = []
            new_branch = []   # (key, cur_t_new, duration)
            for bi, parent_key in enumerate(branch_keys):
                made_child = False
                for m in range(keep.shape[1]):
                    if not keep[bi, m]:
                        continue
                    if next_slot >= MN:
                        break
                    key = next_slot
                    next_slot += 1
                    made_child = True
                    cur_t = int(cur_ts[bi])
                    tb = int(t_b[bi, m])
                    child_depth = tree.get_node(parent_key).depth + 1
                    is_end = tb >= PRED_LEN
                    end_t = PRED_LEN if is_end else tb
                    duration = end_t - cur_t
                    tree.add_node(Node(key, parent_key,
                                       {"end": False, "terminated": False}))
                    node_meta[key] = {"prob": float(prob[bi, m]),
                                      "cur_t": cur_t, "t_b": tb,
                                      "duration": duration}
                    scatter_src.append((bi, m))
                    scatter_dst.append(key)
                    if is_end:
                        tree.get_node(key).data["end"] = True
                    elif child_depth >= self.scen_cfg.max_depth:
                        tree.get_node(key).data["terminated"] = True
                    else:
                        new_branch.append((key, end_t, duration))
                if not made_child:
                    tree.get_node(parent_key).data["terminated"] = True

            if scatter_dst:
                src_b = jnp.asarray([s[0] for s in scatter_src])
                src_m = jnp.asarray([s[1] for s in scatter_src])
                dst = jnp.asarray(scatter_dst)
                slots = NodeSlots(
                    pos=slots.pos.at[dst].set(out.pos[src_b, src_m]),
                    ang=slots.ang.at[dst].set(out.ang[src_b, src_m]),
                    vel=slots.vel.at[dst].set(out.vel[src_b, src_m]),
                    cov=slots.cov.at[dst].set(out.cov[src_b, src_m]),
                    tgt_pts=slots.tgt_pts.at[dst].set(out.tgt_pts[src_b]),
                )

            if not new_branch:
                break

            # overflow: keep the highest-probability branch nodes
            if len(new_branch) > B:
                new_branch.sort(key=lambda kd: -node_meta[kd[0]]["prob"])
                for key, _, _ in new_branch[B:]:
                    tree.get_node(key).data["end"] = True  # degrade to end node
                new_branch = new_branch[:B]

            ids = np.zeros(B, np.int32)
            durs = np.zeros(B, np.int32)
            probs = np.zeros(B, np.float64)
            cur_ts = np.zeros(B, np.int32)
            branch_keys = []
            for i, (key, end_t, duration) in enumerate(new_branch):
                ids[i] = key
                durs[i] = duration
                probs[i] = node_meta[key]["prob"]
                cur_ts[i] = end_t
                branch_keys.append(key)
            # pad inactive slots with the first entry (cheap, masked by probs=0)
            for i in range(len(new_branch), B):
                ids[i] = ids[0]
                durs[i] = durs[0]

            win_pos, win_ang, win_vel, win_cov = self._window_fn(
                slots, jnp.asarray(ids), jnp.asarray(durs))
            win_obs = jnp.ones((B, A, OBS_LEN), jnp.float32)
            branch_keys = branch_keys  # only first len(new_branch) slots real
            # mask padded slots: zero prob keeps their candidates pruned
            probs[len(new_branch):] = 0.0

        return self._export(tree, node_meta, slots, actor_mask)

    # ------------------------------------------------------------------
    def _export(self, tree: Tree, node_meta, slots: NodeSlots,
                actor_mask) -> List[Tree]:
        """Mark end paths, renormalize probabilities, split per root child
        (reference get_scenario_tree)."""
        # mark ancestors of end nodes
        for key in list(tree.nodes):
            node = tree.get_node(key)
            if node.data.get("end"):
                k = key
                while k is not None:
                    tree.get_node(k).data["end"] = True
                    k = tree.get_node(k).parent_key

        root = tree.get_root()
        end_children = [k for k in root.children_keys
                        if tree.get_node(k).data.get("end")]
        if not end_children:
            return []

        # pull hists for all end-flagged nodes in one transfer
        flagged = [k for k in tree.nodes
                   if k != 0 and tree.get_node(k).data.get("end")]
        ids = jnp.asarray(flagged)
        pos_h = np.asarray(slots.pos[ids])
        cov_h = np.asarray(slots.cov[ids])
        tgt_h = np.asarray(slots.tgt_pts[ids])
        hist = {k: i for i, k in enumerate(flagged)}

        # renormalized probability per node (BFS from root)
        norm_prob = {0: 1.0}
        queue = [0]
        while queue:
            k = queue.pop(0)
            kids = [c for c in tree.get_node(k).children_keys
                    if tree.get_node(c).data.get("end")]
            total = sum(node_meta[c]["prob"] for c in kids)
            for c in kids:
                norm_prob[c] = node_meta[c]["prob"] / total * norm_prob[k]
                queue.append(c)

        scen_trees = []
        for rc in end_children:
            st = Tree()

            def node_payload(k):
                m = node_meta[k]
                i = hist[k]
                d = m["duration"]
                # padded actor axis; pair with the plan's actor_mask
                traj = pos_h[i][:, OBS_LEN:OBS_LEN + d]    # [A, d, 2]
                cov = cov_h[i][:, OBS_LEN:OBS_LEN + d]     # [A, d]
                return [norm_prob[k], traj, cov, tgt_h[i]]

            st.add_node(Node(rc, None, node_payload(rc)))
            queue = [rc]
            while queue:
                k = queue.pop(0)
                for c in tree.get_node(k).children_keys:
                    if not tree.get_node(c).data.get("end"):
                        continue
                    st.add_node(Node(c, k, node_payload(c)))
                    queue.append(c)
            scen_trees.append(st)
        return scen_trees
