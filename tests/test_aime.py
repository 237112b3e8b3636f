"""AIME equivalence: the fully device-resident tree growth (aime_device)
must reproduce the host-orchestrated generator (scenario_tree) node for node
on identical inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.config import PlannerConfig, NetConfig, ScenTreeConfig
from mind_tpu.models import init_scene_pred
from mind_tpu.planner.scene_prep import OBS_LEN, LaneGraphStatic, TargetLaneStatic
from mind_tpu.planner.scenario_tree import ScenarioTreeGenerator
from mind_tpu.planner.aime_device import (
    DeviceObsBuffer,
    aime_grow_tree,
    obs_buffer_update,
    nn_fill_window,
)

A, L = 6, 12


@pytest.fixture(scope="module")
def setup():
    cfg = PlannerConfig(
        net=NetConfig(n_scene_layer=1, n_fpn_scale=2, d_actor=32, d_lane=32,
                      d_embed=32, d_rpe=32, n_scene_head=4),
        max_actors=A, max_lanes=L,
    )
    cfg.scen_tree.max_branch_nodes = 4
    cfg.scen_tree.max_tree_nodes = 32
    _, params, batched_apply = init_scene_pred(cfg.net, A, L, seed=0)

    lane = LaneGraphStatic(
        node_feats=jnp.zeros((L, 10, 16)),
        anchors_g=jnp.asarray(
            np.random.default_rng(0).normal(0, 20, (L, 2)).astype(np.float32)),
        anchor_vecs_g=jnp.tile(jnp.asarray([[1.0, 0.0]]), (L, 1)),
        mask=jnp.ones(L, bool),
    )
    n = 200
    P = 256
    pts = np.full((P, 2), 1e6, np.float32)
    pts[:n, 0] = np.arange(n) - 50.0
    info = np.zeros((P, 12), np.float32)
    tgt = TargetLaneStatic(points=jnp.asarray(pts), info=jnp.asarray(info),
                           mask=jnp.asarray(np.arange(P) < n),
                           n_points=jnp.int32(n))
    return cfg, params, batched_apply, lane, tgt


def make_window(seed=0):
    """Agents drive along +x near the target lane (so pruning keeps some)."""
    rng = np.random.default_rng(seed)
    t = np.arange(OBS_LEN) * 0.1
    pos = np.zeros((A, OBS_LEN, 2), np.float32)
    for a in range(A):
        speed = rng.uniform(2, 6)
        y0 = rng.uniform(-3, 3)
        pos[a, :, 0] = -20 + a * 5 + speed * t
        pos[a, :, 1] = y0 + 0.1 * rng.normal(size=OBS_LEN).cumsum() * 0.1
    ang = np.zeros((A, OBS_LEN), np.float32)
    vel = np.zeros((A, OBS_LEN, 2), np.float32)
    vel[..., 0] = np.gradient(pos[..., 0], 0.1, axis=1)
    obs = np.ones((A, OBS_LEN), np.float32)
    return pos, ang, vel, obs


def test_device_matches_host(setup):
    cfg, params, batched_apply, lane, tgt = setup
    pos, ang, vel, obs = make_window()
    types = np.zeros((A, 7), np.float32)
    types[:, 0] = 1
    amask = np.ones(A, bool)

    # host path
    gen = ScenarioTreeGenerator(cfg, batched_apply, params, lane, tgt, A)
    root_window = (jnp.asarray(pos), jnp.asarray(ang), jnp.asarray(vel),
                   jnp.full((A, OBS_LEN), 1e-5, jnp.float32), jnp.asarray(obs))
    host_trees = gen.branch_aime(root_window, jnp.asarray(types),
                                 jnp.asarray(amask))

    # device path (fully-observed buffer == identical window)
    buf = DeviceObsBuffer(pos=jnp.asarray(pos), ang=jnp.asarray(ang),
                          vel=jnp.asarray(vel),
                          observed=jnp.ones((A, OBS_LEN), bool))
    state, meta = jax.jit(
        lambda p, b, t, m: aime_grow_tree(p, batched_apply, cfg, b, t, m,
                                          lane, tgt)
    )(params, buf, jnp.asarray(types), jnp.asarray(amask))

    end = np.asarray(meta.end_flag)
    tid = np.asarray(meta.tree_id)
    dur = np.asarray(meta.duration)
    nprob = np.asarray(meta.norm_prob)

    n_dev_trees = len({int(t) for t in np.unique(tid) if t >= 0})
    assert n_dev_trees == len(host_trees)

    # compare multiset of (duration, norm_prob) across all end nodes
    dev_nodes = sorted(
        (int(dur[i]), round(float(nprob[i]), 4))
        for i in np.flatnonzero(end))
    host_nodes = sorted(
        (node.data[1].shape[1], round(float(node.data[0]), 4))
        for t in host_trees for node in t.nodes.values())
    assert dev_nodes == host_nodes

    # trajectories of end nodes match (compare root-child nodes)
    host_rc = {}
    for t in host_trees:
        root = t.get_root()
        host_rc[(root.data[1].shape[1], round(float(root.data[0]), 4))] = \
            root.data[1]
    for i in np.flatnonzero(end & (np.asarray(state.depth) == 1)):
        key = (int(dur[i]), round(float(nprob[i]), 4))
        assert key in host_rc
        dev_traj = np.asarray(state.slots.pos[i])[:, 50:50 + int(dur[i])]
        np.testing.assert_allclose(dev_traj, host_rc[key], atol=2e-3)


def test_obs_buffer_device_fill():
    buf = DeviceObsBuffer.create(4)
    # feed 60 frames for slot 0, last 10 for slot 1
    for t in range(60):
        states = np.zeros((4, 4), np.float32)
        present = np.zeros(4, bool)
        states[0] = [t, 0, 1, 0]
        present[0] = True
        if t >= 50:
            states[1] = [0, t, 2, np.pi / 2]
            present[1] = True
        buf = obs_buffer_update(buf, jnp.asarray(states), jnp.asarray(present))
    pos, ang, vel, obs = nn_fill_window(buf)
    pos, vel, obs = np.asarray(pos), np.asarray(vel), np.asarray(obs)
    np.testing.assert_allclose(pos[0, -1], [59, 0])
    np.testing.assert_allclose(pos[0, 0], [10, 0])
    # slot 1: first 40 frames backfilled with its first observation
    np.testing.assert_allclose(pos[1, 0], [0, 50])
    np.testing.assert_allclose(pos[1, -1], [0, 59])
    assert obs[1, 0] == 0.0 and obs[1, -1] == 1.0
    # unobserved velocity zeroed
    np.testing.assert_allclose(vel[1, 0], [0, 0])
