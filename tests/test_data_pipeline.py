"""Training on real scenario data: batch construction + loss decrease."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mind_tpu.config import PlannerConfig, NetConfig
from mind_tpu.data.semantic_map import build_lane_graph, lane_graph_features
from mind_tpu.models import init_scene_pred
from mind_tpu.models.train import make_train_step
from mind_tpu.models.data_pipeline import scenario_to_batch
from mind_tpu.planner.scene_prep import LaneGraphStatic, TargetLaneStatic
from mind_tpu.planner.planner import type_onehot


@pytest.fixture(scope="module")
def real_batch(demo1_map, demo1_trajs):
    cfg = PlannerConfig(
        net=NetConfig(n_scene_layer=1, n_fpn_scale=2, d_actor=32, d_lane=32,
                      d_embed=32, d_rpe=32, n_scene_head=4))
    graph = build_lane_graph(demo1_map.map_data, np.zeros(2), np.eye(2))
    feats = lane_graph_features(graph)
    L = cfg.max_lanes
    node_feats = np.zeros((L, 10, 16), np.float32)
    node_feats[:len(feats)] = feats
    anchors = np.zeros((L, 2), np.float32)
    anchors[:len(feats)] = graph["lane_ctrs"]
    vecs = np.tile(np.array([1.0, 0.0], np.float32), (L, 1))
    vecs[:len(feats)] = graph["lane_vecs"]
    mask = np.arange(L) < len(feats)
    lane_static = LaneGraphStatic(jnp.asarray(node_feats), jnp.asarray(anchors),
                                  jnp.asarray(vecs), jnp.asarray(mask))
    # any long-enough lane serves as the training command lane
    lane = max(demo1_map.semantic_lanes.values(), key=len)
    P = 256
    tp = np.full((P, 2), 1e6, np.float32)
    tp[:len(lane)] = lane
    tgt_static = TargetLaneStatic(jnp.asarray(tp), jnp.zeros((P, 12)),
                                  jnp.asarray(np.arange(P) < len(lane)),
                                  jnp.int32(len(lane)))
    types = np.stack([type_onehot(t[0]) for t in demo1_trajs.types]
                     + [np.zeros(7, np.float32)] * (cfg.max_actors - len(demo1_trajs)))
    batch = scenario_to_batch(demo1_trajs, lane_static, tgt_static, cfg, types)
    return cfg, batch


def test_batch_shapes(real_batch, demo1_trajs):
    cfg, batch = real_batch
    A = cfg.max_actors
    assert batch.actors.shape == (1, A, 48, 14)
    assert batch.gt_pos.shape == (1, A, 60, 2)
    # AV (slot 1 in bundle order: focal first) observed through the future
    assert bool(batch.actor_mask[0, 0])
    assert np.isfinite(np.asarray(batch.gt_pos)).all()
    # ego-frame ground truth starts near the anchor (origin)
    m = np.asarray(batch.gt_mask[0])
    gt = np.asarray(batch.gt_pos[0])
    first_step = gt[m[:, 0], 0]
    assert np.abs(first_step).max() < 10.0


@pytest.mark.slow
def test_training_reduces_loss_on_real_data(real_batch):
    cfg, batch = real_batch
    _, params, _ = init_scene_pred(cfg.net, cfg.max_actors, cfg.max_lanes,
                                   seed=1)
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)
    _, train_step = make_train_step(cfg.net, optimizer)
    step = jax.jit(train_step)
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
