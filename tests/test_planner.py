"""Planner-stack tests: scene prep, cost-tree flattening, obs buffer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.config import PlannerConfig, TrajTreeConfig
from mind_tpu.common.tree import Tree, Node
from mind_tpu.planner.scene_prep import (
    OBS_LEN,
    LaneGraphStatic,
    TargetLaneStatic,
    make_rpe,
    prepare_node_inputs,
    high_level_command,
)
from mind_tpu.planner.trajectory_tree import flatten_scen_tree
from mind_tpu.planner.planner import ObsBuffer, type_onehot
from mind_tpu.data.av2 import ObjectType


def _target_static(n=100):
    pts = np.stack([np.linspace(0, n - 1.0, n), np.zeros(n)], axis=1)
    P = 128
    tp = np.full((P, 2), 1e6, np.float32)
    tp[:n] = pts
    ti = np.zeros((P, 12), np.float32)
    tm = np.zeros(P, bool)
    tm[:n] = True
    return TargetLaneStatic(points=jnp.asarray(tp), info=jnp.asarray(ti),
                            mask=jnp.asarray(tm), n_points=jnp.int32(n))


def test_rpe_properties():
    ctrs = jnp.asarray([[0.0, 0.0], [3.0, 4.0], [1.0, 0.0]])
    vecs = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    rpe = np.asarray(make_rpe(ctrs, vecs))
    assert rpe.shape == (3, 3, 5)
    # distance channel symmetric, diagonal zero
    np.testing.assert_allclose(rpe[..., 4], rpe[..., 4].T, atol=1e-6)
    np.testing.assert_allclose(np.diag(rpe[..., 4]), 0.0, atol=1e-6)
    # [0,1] distance = 5 scaled by 2/100
    np.testing.assert_allclose(rpe[0, 1, 4], 5 * 2 / 100, atol=1e-6)
    # heading-diff cos between token 0 (east) and 1 (north) = 0
    np.testing.assert_allclose(rpe[0, 1, 0], 0.0, atol=1e-5)


def test_high_level_command_window():
    tgt = _target_static(100)
    orig = jnp.asarray([10.0, 1.0])
    rot = jnp.eye(2)
    pts, tgt_nodes, anch_pos, anch_vec = high_level_command(
        tgt, orig, rot, cur_vel=jnp.float32(2.0), tar_time_ahead=5.0)
    pts = np.asarray(pts)
    assert pts.shape == (11, 2)
    # closest idx = 10, travel = 10 m -> window centered at idx 20
    np.testing.assert_allclose(pts[5, 0], 20.0, atol=1e-5)
    assert np.asarray(tgt_nodes).shape == (10, 16)
    # anchor direction along +x
    np.testing.assert_allclose(np.asarray(anch_vec), [1.0, 0.0], atol=1e-5)


def test_high_level_command_min_velocity():
    tgt = _target_static(100)
    pts, _, _, _ = high_level_command(
        tgt, jnp.asarray([50.0, 0.0]), jnp.eye(2),
        cur_vel=jnp.float32(0.0), tar_time_ahead=5.0)
    # min_vel 0.5 -> travel 2.5 -> target idx 53
    np.testing.assert_allclose(np.asarray(pts)[5, 0], 53.0, atol=1e-5)


def test_prepare_node_inputs_shapes():
    A, L = 4, 6
    lane = LaneGraphStatic(
        node_feats=jnp.zeros((L, 10, 16)),
        anchors_g=jnp.zeros((L, 2)),
        anchor_vecs_g=jnp.tile(jnp.asarray([[1.0, 0.0]]), (L, 1)),
        mask=jnp.ones(L, bool),
    )
    tgt = _target_static(60)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(A, OBS_LEN, 2)) * 5)
    ang = jnp.asarray(rng.normal(size=(A, OBS_LEN)) * 0.1)
    vel = jnp.asarray(rng.normal(size=(A, OBS_LEN, 2)))
    obs = jnp.ones((A, OBS_LEN))
    types = jnp.zeros((A, 7)).at[:, 0].set(1)
    mask = jnp.ones(A, bool)
    out = prepare_node_inputs(pos, ang, vel, obs, types, mask, lane, tgt, 5.0)
    assert out.actors.shape == (A, 48, 14)
    assert out.rpe.shape == (A + L, A + L, 5)
    assert out.tgt_nodes.shape == (10, 16)
    assert out.tgt_rpe.shape == (20,)
    # ego ends at the scene origin by construction
    np.testing.assert_allclose(np.asarray(out.actor_ctrs[0]), 0.0, atol=1e-5)


def test_flatten_scen_tree():
    A = 4
    cfg = TrajTreeConfig(max_cost_nodes=64, max_depth_levels=16, max_width_hint=4)
    tree = Tree()
    # root node: 6 steps -> cost nodes at i=0,2,4 (3 nodes)
    traj = np.zeros((A, 6, 2), np.float32)
    traj[:, :, 0] = np.arange(6)
    cov = np.full((A, 6), 0.5, np.float32)
    tree.add_node(Node("r", None, [1.0, traj, cov, np.zeros((11, 2))]))
    # two children, 4 steps each -> 2 cost nodes each
    for name, p in [("c1", 0.6), ("c2", 0.4)]:
        t2 = np.ones((A, 4, 2), np.float32)
        c2 = np.full((A, 4), 1.0, np.float32)
        tree.add_node(Node(name, "r", [p, t2, c2, np.zeros((11, 2))]))

    mask = np.array([True, True, True, False])
    arrays = flatten_scen_tree(tree, mask, cfg, max_exo=A - 1)
    n = int(arrays.n_nodes)
    assert n == 3 + 2 + 2
    parent = np.asarray(arrays.topo.parent)[:n]
    # first chain: -1 -> 0 -> 1; children attach to node 2 (last root cost node)
    assert parent[0] == -1 and parent[1] == 0 and parent[2] == 1
    assert list(parent[3:5]).count(2) + list(parent[5:7]).count(2) == 2
    probs = np.asarray(arrays.nodes.prob)[:n]
    np.testing.assert_allclose(sorted(set(np.round(probs, 3))), [0.4, 0.6, 1.0],
                               atol=1e-5)
    # exo mask respects actor validity (actors 1,2 valid exos; 3 invalid)
    em = np.asarray(arrays.nodes.exo_mask)[0]
    assert em[0] and em[1] and not em[2]


def test_obs_buffer_rolling():
    from mind_tpu.planner.aime_device import nn_fill_window

    buf = ObsBuffer(4)
    for t in range(60):
        obs = [("AV", np.array([t * 1.0, 0.0, 1.0, 0.0]), ObjectType.VEHICLE)]
        if t >= 10:
            obs.append(("exo1", np.array([0.0, t * 1.0, 2.0, np.pi / 2]),
                        ObjectType.PEDESTRIAN))
        buf.update(obs)
    pos, ang, vel, flags = map(np.asarray, nn_fill_window(buf.buf))
    mask = buf.actor_mask()
    assert buf.slots["AV"] == 0
    assert mask[0] and mask[1] and not mask[2]
    # AV observed for all 50 frames; last pos = 59
    np.testing.assert_allclose(pos[0, -1], [59.0, 0.0])
    np.testing.assert_allclose(pos[0, 0], [10.0, 0.0])
    assert flags[0].all()
    # exo1 fully observed within the window too (appeared at t=10 < 60-50)
    assert flags[1].all()
    np.testing.assert_allclose(vel[1, -1], [2 * np.cos(np.pi / 2), 2.0], atol=1e-6)


def test_obs_buffer_nn_fill():
    from mind_tpu.planner.aime_device import nn_fill_window

    buf = ObsBuffer(4)
    # agent appears only for the last 5 frames
    for t in range(50):
        obs = [("AV", np.array([t * 1.0, 0.0, 1.0, 0.0]), ObjectType.VEHICLE)]
        if t >= 45:
            obs.append(("late", np.array([100.0 + t, 5.0, 1.0, 0.0]),
                        ObjectType.VEHICLE))
        buf.update(obs)
    pos, ang, vel, flags = map(np.asarray, nn_fill_window(buf.buf))
    mask = buf.actor_mask()
    s = buf.slots["late"]
    assert mask[s]
    assert not flags[s, 0] and flags[s, -1]
    # early frames backfilled with the first observation
    np.testing.assert_allclose(pos[s, 0], [145.0, 5.0])
    # unobserved velocity zeroed
    np.testing.assert_allclose(vel[s, 0], [0.0, 0.0])


def test_type_onehot():
    assert type_onehot(ObjectType.VEHICLE)[0] == 1
    assert type_onehot(ObjectType.STATIC)[6] == 1
    assert type_onehot(ObjectType.BUS)[4] == 1
    assert type_onehot(ObjectType.UNKNOWN)[5] == 1
