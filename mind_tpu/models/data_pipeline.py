"""Training-data pipeline: AV2 scenarios -> network training batches.

The reference ships no training code (its weights came from a stripped
checkpoint); this pipeline rebuilds the SIMPL-style supervision the
architecture implies: the 50-frame 10 Hz history becomes the padded network
inputs (same scene_prep path the planner uses) and the 60-frame future
becomes per-actor ground truth in each actor's instance frame — exactly the
frame the regression head predicts in.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.config import PlannerConfig
from mind_tpu.data.loader import TrajBundle
from mind_tpu.models.train import Batch
from mind_tpu.planner.scene_prep import (
    OBS_LEN,
    LaneGraphStatic,
    TargetLaneStatic,
    prepare_node_inputs,
    rot_of,
)

PRED_LEN = 60


def scenario_to_batch(bundle: TrajBundle, lane_static: LaneGraphStatic,
                      tgt_static: TargetLaneStatic, cfg: PlannerConfig,
                      types: np.ndarray) -> Batch:
    """One scenario -> a single-scene training batch.

    History = 10 Hz keyframes 0..49 of the resampled log; future = keyframes
    50..109. Requires the bundle's 110-frame span (546 steps at 50 Hz).
    """
    A = cfg.max_actors
    n = len(bundle)
    # 10 Hz keyframes from the 50 Hz arrays
    key_idx = np.arange(110) * 5
    key_idx[-1] = bundle.pos.shape[1] - 1
    pos = np.zeros((A, 110, 2), np.float32)
    ang = np.zeros((A, 110), np.float32)
    vel_s = np.zeros((A, 110), np.float32)
    valid = np.zeros((A, 110), bool)
    pos[:n] = bundle.pos[:, key_idx]
    ang[:n] = bundle.ang[:, key_idx]
    vel_s[:n] = bundle.vel[:, key_idx]
    valid[:n] = bundle.has_flag[:, key_idx]

    vel = np.stack([vel_s * np.cos(ang), vel_s * np.sin(ang)], axis=-1)
    actor_mask = np.zeros(A, bool)
    actor_mask[:n] = valid[:n, OBS_LEN - 1]

    obs = valid[:, :OBS_LEN].astype(np.float32)
    inputs = prepare_node_inputs(
        jnp.asarray(pos[:, :OBS_LEN]), jnp.asarray(ang[:, :OBS_LEN]),
        jnp.asarray(vel[:, :OBS_LEN]), jnp.asarray(obs),
        jnp.asarray(types), jnp.asarray(actor_mask),
        lane_static, tgt_static, cfg.scen_tree.tar_time_ahead)

    # ground-truth futures in each actor's instance frame
    fut = jnp.asarray(pos[:, OBS_LEN:OBS_LEN + PRED_LEN])      # [A, F, 2]
    fut_s = jnp.einsum("afd,de->afe", fut - inputs.orig, inputs.rot)
    a_theta = jnp.arctan2(inputs.actor_vecs[:, 1], inputs.actor_vecs[:, 0])
    a_rot = jax.vmap(rot_of)(a_theta)
    gt = jnp.einsum("afd,ade->afe",
                    fut_s - inputs.actor_ctrs[:, None], a_rot)   # [A, F, 2]
    gt_mask = jnp.asarray(valid[:, OBS_LEN:OBS_LEN + PRED_LEN]
                          & actor_mask[:, None])

    one = lambda x: jnp.asarray(x)[None]
    return Batch(
        actors=one(inputs.actors), actor_mask=one(inputs.actor_mask),
        lanes=one(inputs.lanes), lane_mask=one(inputs.lane_mask),
        rpe=one(inputs.rpe), tgt_nodes=one(inputs.tgt_nodes),
        tgt_rpe=one(inputs.tgt_rpe), gt_pos=one(gt), gt_mask=one(gt_mask),
    )


def stack_batches(batches: List[Batch]) -> Batch:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)
