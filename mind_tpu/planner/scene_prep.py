"""Scene preparation: observation windows -> network inputs, on device.

Re-expresses the reference's data plumbing (planners/mind/scenario_tree.py
process_data/update_obser/get_high_level_command and planners/mind/utils.py
actor_gather/get_rpe) as fixed-shape jax functions that vmap over AIME branch
nodes. All inputs are padded to [A] actors / [L] lane segments with masks.

Frames: windows arrive in the GLOBAL frame; each call derives the
target-centric scene frame from the ego (actor 0) and per-actor instance
frames, exactly as the reference does per node.

Note on lane tokens: the reference transforms a *root-frame* cached lane
graph by each deeper node's global-frame origin (scenario_tree.py:539,
utils.py:171-177), silently misplacing lane anchors for depth>=2 nodes. We
keep the static per-scenario lane features (instance-frame, rigid-invariant)
and transform the *global* anchors by each node's frame — the self-consistent
semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


OBS_LEN = 50


class LaneGraphStatic(NamedTuple):
    """Per-scenario static lane-graph tensors (padded to L segments)."""

    node_feats: jnp.ndarray   # [L, 10, 16] instance-frame features
    anchors_g: jnp.ndarray    # [L, 2] global anchor positions
    anchor_vecs_g: jnp.ndarray  # [L, 2] global anchor directions
    mask: jnp.ndarray         # [L] bool


class TargetLaneStatic(NamedTuple):
    """Resampled (~1 m) target lane + per-point features (padded to P)."""

    points: jnp.ndarray       # [P, 2] global
    info: jnp.ndarray         # [P, 12] feature rows [intersect, type3, cl3, cr3, l, r]
    mask: jnp.ndarray         # [P] bool
    n_points: jnp.ndarray     # [] int32 actual count


class SceneInputs(NamedTuple):
    """Everything the network consumes for one node (see ScenePredNet)."""

    actors: jnp.ndarray      # [A, 48, 14]
    actor_mask: jnp.ndarray  # [A]
    lanes: jnp.ndarray       # [L, 10, 16]
    lane_mask: jnp.ndarray   # [L]
    rpe: jnp.ndarray         # [N, N, 5]
    tgt_nodes: jnp.ndarray   # [10, 16]
    tgt_rpe: jnp.ndarray     # [20]
    # frame bookkeeping needed to denormalize predictions
    orig: jnp.ndarray        # [2]
    rot: jnp.ndarray         # [2, 2]
    theta: jnp.ndarray       # []
    actor_ctrs: jnp.ndarray  # [A, 2] anchor positions (scene frame)
    actor_vecs: jnp.ndarray  # [A, 2] anchor headings (scene frame)
    tgt_pts: jnp.ndarray     # [11, 2] global high-level-command window


def rot_of(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s], [s, c]])


def make_rpe(ctrs: jnp.ndarray, vecs: jnp.ndarray, radius: float = 100.0):
    """Pairwise relative positional encoding [N, N, 5]
    (reference utils.py:193-212): [cos/sin heading diff, cos/sin bearing,
    scaled distance]. Entry [i, j] relates source i to target j with the
    same orientation conventions as the reference's stacked tensors."""
    d = ctrs[None, :, :] - ctrs[:, None, :]          # v_pos[i, j] = c_j - c_i
    dist = jnp.linalg.norm(d, axis=-1) * 2.0 / radius

    def cos_sin(v1, v2):
        n1 = jnp.linalg.norm(v1, axis=-1)
        n2 = jnp.linalg.norm(v2, axis=-1)
        denom = n1 * n2 + 1e-10
        cos = (v1[..., 0] * v2[..., 0] + v1[..., 1] * v2[..., 1]) / denom
        sin = (v1[..., 0] * v2[..., 1] - v1[..., 1] * v2[..., 0]) / denom
        return cos, sin

    # reference: vecs.unsqueeze(0) = v_j broadcast over rows i;
    # vecs.unsqueeze(1) = v_i broadcast over cols j
    v_a = jnp.broadcast_to(vecs[None, :, :], d.shape)  # v_j
    v_b = jnp.broadcast_to(vecs[:, None, :], d.shape)  # v_i
    cos_a1, sin_a1 = cos_sin(v_a, v_b)
    cos_a2, sin_a2 = cos_sin(v_a, d)
    return jnp.stack([cos_a1, sin_a1, cos_a2, sin_a2, dist], axis=-1)


def prepare_node_inputs(
    pos: jnp.ndarray,        # [A, 50, 2] global window
    ang: jnp.ndarray,        # [A, 50]
    vel: jnp.ndarray,        # [A, 50, 2]
    observed: jnp.ndarray,   # [A, 50] float 0/1 (network PAD feature)
    actor_type: jnp.ndarray,  # [A, 7] one-hot
    actor_mask: jnp.ndarray,  # [A]
    lane_static: LaneGraphStatic,
    tgt_static: TargetLaneStatic,
    tar_time_ahead: float,
) -> SceneInputs:
    """One AIME node's observation window -> padded network inputs."""
    # scene frame from ego's last window frame (utils.py:180-190)
    orig = pos[0, OBS_LEN - 1]
    theta = ang[0, OBS_LEN - 1]
    rot = rot_of(theta)

    pos_s = jnp.einsum("atd,de->ate", pos - orig, rot)
    ang_s = ang - theta
    vel_s = jnp.einsum("atd,de->ate", vel, rot)

    # per-actor instance frames from each actor's last frame
    a_orig = pos_s[:, OBS_LEN - 1]                    # [A, 2]
    a_theta = ang_s[:, OBS_LEN - 1]                   # [A]
    a_rot = jax.vmap(rot_of)(a_theta)                 # [A, 2, 2]
    pos_n = jnp.einsum("atd,ade->ate", pos_s - a_orig[:, None], a_rot)
    ang_n = ang_s - a_theta[:, None]
    vel_n = jnp.einsum("atd,ade->ate", vel_s, a_rot)
    a_vecs = jnp.stack([jnp.cos(a_theta), jnp.sin(a_theta)], axis=-1)

    # 14-dim actor features, first two timesteps dropped (utils.py:114-139)
    disp = jnp.zeros_like(pos_n).at[:, 1:].set(pos_n[:, 1:] - pos_n[:, :-1])
    ang_cs = jnp.stack([jnp.cos(ang_n), jnp.sin(ang_n)], axis=-1)
    # type one-hot is zeroed at unobserved steps (utils.py:312-313 assigns
    # types only at observed timesteps)
    type_feat = actor_type[:, None, :] * observed[..., None]
    type_feat = jnp.broadcast_to(type_feat, (pos.shape[0], OBS_LEN, 7))
    feats = jnp.concatenate(
        [disp, ang_cs, vel_n, type_feat, observed[..., None]], axis=-1)
    actors = feats[:, 2:, :]                          # [A, 48, 14]

    # lane anchors into the scene frame
    lane_ctrs = jnp.einsum("ld,de->le", lane_static.anchors_g - orig, rot)
    lane_vecs = jnp.einsum("ld,de->le", lane_static.anchor_vecs_g, rot)

    # scene RPE over [actors; lanes]
    scene_ctrs = jnp.concatenate([a_orig, lane_ctrs], axis=0)
    scene_vecs = jnp.concatenate([a_vecs, lane_vecs], axis=0)
    rpe = make_rpe(scene_ctrs, scene_vecs)

    # high-level command (scenario_tree.py:613-652)
    cur_vel = jnp.linalg.norm(vel[0, OBS_LEN - 1])
    tgt_pts, tgt_nodes, tgt_anch_pos, tgt_anch_vec = high_level_command(
        tgt_static, orig, rot, cur_vel, tar_time_ahead)

    # target RPE between the command anchor and the ego anchor
    tgt_ctrs = jnp.stack([tgt_anch_pos, a_orig[0]])
    tgt_vecs = jnp.stack([tgt_anch_vec, a_vecs[0]])
    tgt_rpe = make_rpe(tgt_ctrs, tgt_vecs).reshape(-1)  # [2*2*5] = [20]

    return SceneInputs(
        actors=actors,
        actor_mask=actor_mask,
        lanes=lane_static.node_feats,
        lane_mask=lane_static.mask,
        rpe=rpe,
        tgt_nodes=tgt_nodes,
        tgt_rpe=tgt_rpe,
        orig=orig,
        rot=rot,
        theta=theta,
        actor_ctrs=a_orig,
        actor_vecs=a_vecs,
        tgt_pts=tgt_pts,
    )


def high_level_command(tgt: TargetLaneStatic, orig, rot, cur_vel,
                       tar_time_ahead: float, min_vel: float = 0.5):
    """11-point target-lane window ahead of the ego by cur_vel * t_ahead
    (reference scenario_tree.py:613-652), with the arclength walk expressed
    as a masked searchsorted instead of a while loop."""
    P = tgt.points.shape[0]
    n = tgt.n_points
    big = jnp.float32(1e9)

    dists = jnp.linalg.norm(tgt.points - orig, axis=-1)
    dists = jnp.where(tgt.mask, dists, big)
    closest = jnp.argmin(dists).astype(jnp.int32)

    travel = jnp.maximum(cur_vel, min_vel) * tar_time_ahead
    seg_len = jnp.linalg.norm(
        jnp.roll(tgt.points, -1, axis=0) - tgt.points, axis=-1)  # seg i: i -> i+1
    idx = jnp.arange(P)
    # cumulative length of segments starting at `closest`
    ahead = (idx >= closest) & (idx < n - 1)
    cum = jnp.cumsum(jnp.where(ahead, seg_len, 0.0))
    base = jnp.where(closest > 0, cum[closest - 1], 0.0)
    rel_cum = cum - base
    # target_idx = first j>closest with sum of segs (closest..j-1] >= travel
    reached = ahead & (rel_cum >= travel)
    any_reach = jnp.any(reached)
    j = jnp.where(any_reach,
                  jnp.argmax(reached).astype(jnp.int32) + 1,
                  n - 1)
    j = jnp.where(j >= n - 1, n - 2, j)
    j = jnp.clip(j, 5, jnp.maximum(n - 6, 5))

    start = j - 5
    pts = jax.lax.dynamic_slice_in_dim(tgt.points, start, 11, axis=0)  # [11,2]
    info = jax.lax.dynamic_slice_in_dim(tgt.info, start + 1, 10, axis=0)  # rows 1:

    ctrln = jnp.einsum("pd,de->pe", pts - orig, rot)   # scene frame
    anch_pos = jnp.mean(ctrln, axis=0)
    span = ctrln[-1] - ctrln[0]
    anch_vec = span / jnp.linalg.norm(span)
    anch_rot = jnp.array([[anch_vec[0], -anch_vec[1]],
                          [anch_vec[1], anch_vec[0]]])
    ctrln_i = jnp.einsum("pd,de->pe", ctrln - anch_pos, anch_rot)
    ctrs = (ctrln_i[:-1] + ctrln_i[1:]) / 2.0
    vecs = ctrln_i[1:] - ctrln_i[:-1]
    tgt_nodes = jnp.concatenate([ctrs, vecs, info], axis=-1)  # [10, 16]
    return pts, tgt_nodes, anch_pos, anch_vec
