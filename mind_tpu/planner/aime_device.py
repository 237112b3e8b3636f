"""Fully device-resident AIME: the whole scenario-tree growth is ONE jitted
program; the host receives a few hundred bytes of tree metadata per plan.

Motivation: over the TPU tunnel a host<->device round trip costs ~40 ms, so
the host-orchestrated version (scenario_tree.py) pays ~0.5-1 s per plan in
sync latency alone. Here the branch-set selection, slot allocation, window
slicing, prediction rounds, prune/merge, branch-time rule, end-flag
propagation, probability renormalization and per-root-child tree splitting
all run on device with fixed shapes (reference semantics per
scenario_tree.py:38-272, same decode kernel as scenario_tree._decode_node).

The observation buffer also lives on device (DeviceObsBuffer): per plan
trigger the simulator issues one async roll+write dispatch; the nearest-
neighbor fill of unobserved frames (reference utils.py:315-325) happens
inside the plan program via a cumulative-max gather.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.config import PlannerConfig
from mind_tpu.planner.scene_prep import (
    OBS_LEN,
    LaneGraphStatic,
    TargetLaneStatic,
    prepare_node_inputs,
)
from mind_tpu.planner.scenario_tree import (
    SEQ_LEN,
    PRED_LEN,
    NodeSlots,
    _decode_node,
)


class DeviceObsBuffer(NamedTuple):
    """Rolling 10 Hz observation window, device-resident [A, 50].

    Stored in float64 by default: the observation stream and everything
    downstream of it up to the network inputs and the iLQR solve (scene
    normalization, covariance accumulation, prune/merge/branch decisions)
    runs at the float64 reference mirror's precision, so the production
    path takes the same discrete decisions (PARITY.md). The network
    consumes a float32 cast; the FLOP-heavy programs are unaffected."""

    pos: jnp.ndarray       # [A, 50, 2]
    ang: jnp.ndarray       # [A, 50]
    vel: jnp.ndarray       # [A, 50, 2]
    observed: jnp.ndarray  # [A, 50] bool

    @classmethod
    def create(cls, max_actors: int,
               dtype=jnp.float64) -> "DeviceObsBuffer":
        return cls(
            pos=jnp.zeros((max_actors, OBS_LEN, 2), dtype),
            ang=jnp.zeros((max_actors, OBS_LEN), dtype),
            vel=jnp.zeros((max_actors, OBS_LEN, 2), dtype),
            observed=jnp.zeros((max_actors, OBS_LEN), bool),
        )


def obs_buffer_update(buf: DeviceObsBuffer, states: jnp.ndarray,
                      present: jnp.ndarray) -> DeviceObsBuffer:
    """Shift the window and append one frame. states [A, 4] = [x, y, v, yaw]
    per slot; present [A] marks slots observed this trigger. Absent slots
    repeat their previous frame unobserved (reference planner.py:85-91)."""
    states = states.astype(buf.pos.dtype)  # host streams f64; buffer decides

    def roll(x):
        return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)

    pos = roll(buf.pos)
    ang = roll(buf.ang)
    vel = roll(buf.vel)
    obs = roll(buf.observed).at[:, -1].set(False)

    x, y, v, yaw = states[:, 0], states[:, 1], states[:, 2], states[:, 3]
    new_pos = jnp.stack([x, y], axis=-1)
    new_vel = jnp.stack([v * jnp.cos(yaw), v * jnp.sin(yaw)], axis=-1)
    p = present[:, None]
    pos = pos.at[:, -1].set(jnp.where(p, new_pos, pos[:, -1]))
    ang = ang.at[:, -1].set(jnp.where(present, yaw, ang[:, -1]))
    vel = vel.at[:, -1].set(jnp.where(p, new_vel, vel[:, -1]))
    obs = obs.at[:, -1].set(present)
    return DeviceObsBuffer(pos, ang, vel, obs)


def nn_fill_window(buf: DeviceObsBuffer):
    """Masked nearest-neighbor fill of pos/ang (forward then leading-edge
    backfill) and zeroed velocity at unobserved frames — the device analog of
    padding_traj_nn over the obs window (reference utils.py:315-325)."""
    T = buf.pos.shape[1]
    idx = jnp.arange(T)[None, :]
    prev = jax.lax.cummax(jnp.where(buf.observed, idx, -1), axis=1)
    first = jnp.argmax(buf.observed, axis=1)  # first observed frame
    fill = jnp.where(prev >= 0, prev, first[:, None])  # [A, T]
    pos = jnp.take_along_axis(buf.pos, fill[..., None], axis=1)
    ang = jnp.take_along_axis(buf.ang, fill, axis=1)
    vel = jnp.where(buf.observed[..., None], buf.vel, 0.0)
    return pos, ang, vel, buf.observed.astype(jnp.float32)


class DeviceTreeState(NamedTuple):
    """Fixed-width scenario tree on device (slot 0 = root, no trajectory)."""

    slots: NodeSlots
    parent: jnp.ndarray       # [MN] i32 (-1 root)
    depth: jnp.ndarray        # [MN] i32
    prob: jnp.ndarray         # [MN] f32 joint path probability
    start_t: jnp.ndarray      # [MN] i32 prediction start (parent's end)
    duration: jnp.ndarray     # [MN] i32 covered steps (end_t - start_t)
    end_flag: jnp.ndarray     # [MN] bool in the end set
    branch_flag: jnp.ndarray  # [MN] bool awaiting expansion
    active: jnp.ndarray       # [MN] bool slot in use
    n_nodes: jnp.ndarray      # [] i32


class AimeMeta(NamedTuple):
    """Per-plan host-visible summary (one small transfer)."""

    parent: jnp.ndarray     # [MN] i32
    duration: jnp.ndarray   # [MN] i32
    end_flag: jnp.ndarray   # [MN] bool (after ancestor propagation)
    tree_id: jnp.ndarray    # [MN] i32 root-child ancestor slot (-1 if none)
    norm_prob: jnp.ndarray  # [MN] f32 renormalized path probability
    n_nodes: jnp.ndarray    # [] i32


def _init_tree_state(cfg, max_actors: int, dtype) -> DeviceTreeState:
    MN = cfg.scen_tree.max_tree_nodes
    A = max_actors
    slots = NodeSlots(
        pos=jnp.zeros((MN, A, SEQ_LEN, 2), dtype),
        ang=jnp.zeros((MN, A, SEQ_LEN), dtype),
        vel=jnp.zeros((MN, A, SEQ_LEN, 2), dtype),
        # covariance stays f64 regardless of the pipeline dtype: it carries
        # the branch-time ratio and target-distance prune decisions and is a
        # scalar track per agent (negligible cost; see PlannerConfig)
        cov=jnp.full((MN, A, SEQ_LEN), 1e-5, jnp.float64),
        tgt_pts=jnp.zeros((MN, 11, 2), dtype),
    )
    return DeviceTreeState(
        slots=slots,
        parent=jnp.full((MN,), -1, jnp.int32),
        depth=jnp.zeros((MN,), jnp.int32),
        # path probability stays f64: the prune threshold compare and the
        # renormalization are decisions (reference scenario_tree.py:369-370)
        prob=jnp.zeros((MN,), jnp.float64).at[0].set(1.0),
        start_t=jnp.zeros((MN,), jnp.int32),
        duration=jnp.zeros((MN,), jnp.int32),
        end_flag=jnp.zeros((MN,), bool),
        branch_flag=jnp.zeros((MN,), bool).at[0].set(True),
        active=jnp.zeros((MN,), bool).at[0].set(True),
        n_nodes=jnp.int32(1),
    )


def aime_grow_tree(params, batched_apply, cfg: PlannerConfig,
                   buf: DeviceObsBuffer, actor_type, actor_mask,
                   lane_static: LaneGraphStatic, tgt_static: TargetLaneStatic
                   ) -> Tuple[DeviceTreeState, AimeMeta]:
    """Grow the full scenario tree on device; max_depth unconditional rounds
    (inactive rounds are masked no-ops)."""
    scen = cfg.scen_tree
    MN = scen.max_tree_nodes
    B = scen.max_branch_nodes
    A = actor_mask.shape[0]
    M = cfg.net.num_modes

    dtype = buf.pos.dtype  # pipeline dtype (see PlannerConfig.pipeline_dtype)
    root_pos, root_ang, root_vel, root_obs = nn_fill_window(buf)
    root_cov = jnp.full((A, OBS_LEN), 1e-5, jnp.float64)

    state = _init_tree_state(cfg, A, dtype)

    def one_round(state: DeviceTreeState) -> DeviceTreeState:
        # --- branch-set selection (top-B by prob among branch_flag) ---
        key = jnp.where(state.branch_flag, 1.0 + state.prob, 0.0)
        order = jnp.argsort(-key)          # stable
        rank = jnp.zeros((MN,), jnp.int32).at[order].set(jnp.arange(MN, dtype=jnp.int32))
        selected = state.branch_flag & (rank < B)
        overflow = state.branch_flag & ~selected
        nb = jnp.sum(selected)
        sel = order[:B]                    # [B] node ids (garbage past nb)
        bmask = jnp.arange(B) < nb

        # --- windows ---
        def window_of(i):
            d = jnp.clip(state.duration[i], 0, PRED_LEN)
            p = jax.lax.dynamic_slice_in_dim(state.slots.pos[i], d, OBS_LEN, axis=1)
            a = jax.lax.dynamic_slice_in_dim(state.slots.ang[i], d, OBS_LEN, axis=1)
            v = jax.lax.dynamic_slice_in_dim(state.slots.vel[i], d, OBS_LEN, axis=1)
            c = jax.lax.dynamic_slice_in_dim(state.slots.cov[i], d, OBS_LEN, axis=1)
            is_root = i == 0
            p = jnp.where(is_root, root_pos, p)
            a = jnp.where(is_root, root_ang, a)
            v = jnp.where(is_root, root_vel, v)
            c = jnp.where(is_root, root_cov, c)
            o = jnp.where(is_root, root_obs, jnp.ones_like(root_obs))
            return p, a, v, c, o

        win_pos, win_ang, win_vel, win_cov, win_obs = jax.vmap(window_of)(sel)
        probs_b = state.prob[sel]
        end_t_b = state.start_t[sel] + state.duration[sel]  # node's own cur_t

        # --- prediction + decode (shared with the host path) ---
        prep = jax.vmap(
            lambda p, a, v, o: prepare_node_inputs(
                p, a, v, o, actor_type, actor_mask,
                lane_static, tgt_static, scen.tar_time_ahead)
        )(win_pos, win_ang, win_vel, win_obs)

        # the network consumes float32 casts of the f64-prepared inputs —
        # the same rounding the float64 mirror applies before its (shared)
        # forward (parity/host_planner.py _predict)
        f32 = jnp.float32
        cls, reg, vel = batched_apply(
            params, prep.actors.astype(f32), prep.actor_mask,
            prep.lanes.astype(f32), prep.lane_mask, prep.rpe.astype(f32),
            prep.tgt_nodes.astype(f32), prep.tgt_rpe.astype(f32))

        out = jax.vmap(
            lambda c, r, v, inp, wp, wa, wv, wc, pb, ct: _decode_node(
                c, r, v, inp, wp, wa, wv, wc, pb, ct, actor_mask,
                tgt_static, scen)
        )(cls, reg, vel, prep, win_pos, win_ang, win_vel, win_cov,
          probs_b, end_t_b)

        # --- slot allocation ---
        valid = out.keep & bmask[:, None]                 # [B, M]
        vflat = valid.reshape(-1)
        dst = state.n_nodes + jnp.cumsum(vflat) - 1       # [B*M]
        ok = vflat & (dst < MN)
        write = jnp.where(ok, dst, MN).astype(jnp.int32)  # MN = dump slot

        b_idx = jnp.repeat(jnp.arange(B), M)
        parents_f = sel[b_idx].astype(jnp.int32)
        start_f = end_t_b[b_idx].astype(jnp.int32)
        t_b_f = out.t_b.reshape(-1)
        end_c = t_b_f >= PRED_LEN
        dur_f = jnp.where(end_c, PRED_LEN, t_b_f) - start_f
        depth_f = state.depth[parents_f] + 1
        branch_c = ~end_c & (depth_f < scen.max_depth)

        def scat(arr, val):
            pad = arr.shape[1:]
            a = jnp.concatenate([arr, jnp.zeros((1,) + pad, arr.dtype)], 0)
            a = a.at[write].set(val)
            return a[:MN]

        new_slots = NodeSlots(
            pos=scat(state.slots.pos, out.pos.reshape((-1,) + out.pos.shape[2:])),
            ang=scat(state.slots.ang, out.ang.reshape((-1,) + out.ang.shape[2:])),
            vel=scat(state.slots.vel, out.vel.reshape((-1,) + out.vel.shape[2:])),
            cov=scat(state.slots.cov, out.cov.reshape((-1,) + out.cov.shape[2:])),
            tgt_pts=scat(state.slots.tgt_pts, jnp.repeat(out.tgt_pts, M, axis=0)),
        )

        def scat1(arr, val):
            a = jnp.concatenate([arr, jnp.zeros((1,), arr.dtype)], 0)
            a = a.at[write].set(val.astype(arr.dtype))
            return a[:MN]

        prob_f = out.prob.reshape(-1)
        new_state = DeviceTreeState(
            slots=new_slots,
            parent=scat1(state.parent, parents_f),
            depth=scat1(state.depth, depth_f),
            prob=scat1(state.prob, prob_f),
            start_t=scat1(state.start_t, start_f),
            duration=scat1(state.duration, dur_f),
            # overflowed branch nodes degrade to end nodes; expanded branch
            # flags are consumed, children may set fresh ones
            end_flag=scat1(state.end_flag | overflow, end_c),
            branch_flag=scat1(jnp.zeros_like(state.branch_flag), branch_c),
            active=scat1(state.active, jnp.ones_like(ok)),
            n_nodes=jnp.minimum(state.n_nodes + jnp.sum(ok), MN).astype(jnp.int32),
        )
        return new_state

    # rounds with an empty branch set are skipped at runtime (lax.cond
    # executes a single branch on TPU) — typical trees stop after 1-3 rounds
    for _ in range(scen.max_depth):
        state = jax.lax.cond(jnp.any(state.branch_flag), one_round,
                             lambda s: s, state)

    # --- end-flag propagation to ancestors ---
    end = state.end_flag
    safe_par = jnp.where(state.parent >= 0, state.parent, MN)
    for _ in range(scen.max_depth):
        child_end = jnp.zeros((MN + 1,), bool).at[safe_par].max(
            end & state.active)
        end = end | child_end[:MN]
    end = end & state.active

    # --- renormalized probabilities over end-flagged children, per level ---
    norm = jnp.zeros((MN,), jnp.float64).at[0].set(1.0)
    contrib = jnp.where(end, state.prob, 0.0)
    totals = jnp.zeros((MN + 1,), jnp.float64).at[safe_par].add(contrib)
    for d in range(1, scen.max_depth + 1):
        at_d = state.active & end & (state.depth == d)
        par = jnp.where(at_d, state.parent, 0)
        t = totals[par]
        n = jnp.where(t > 0, state.prob / jnp.maximum(t, 1e-12) * norm[par], 0.0)
        norm = jnp.where(at_d, n, norm)

    # --- root-child ancestor (tree id) ---
    anc = jnp.arange(MN, dtype=jnp.int32)
    for _ in range(scen.max_depth):
        par = state.parent[anc]
        anc = jnp.where((par >= 0) & (state.depth[anc] > 1), par, anc)
    tid = jnp.where(end & state.active & (state.depth >= 1), anc, -1)

    meta = AimeMeta(parent=state.parent, duration=state.duration,
                    end_flag=end, tree_id=tid, norm_prob=norm,
                    n_nodes=state.n_nodes)
    return state._replace(end_flag=end), meta
