"""Simulator integration tests (replay path; the closed-loop path is
exercised by the slow marker / bench since it compiles the full planner)."""

import numpy as np
import jax
import pytest

from mind_tpu.config import SimConfig, ClAgentConfig
from mind_tpu.sim.simulator import Simulator
from mind_tpu.sim.agents import NonReactiveAgent
from mind_tpu.sim.replay import scene_from_bundle, replay_rollout


@pytest.fixture(scope="module")
def replay_sim(demo1_paths):
    cfg = SimConfig(
        sim_name="replay_test",
        seq_id=demo1_paths["seq_id"],
        data_root=str(demo1_paths["map"].parent.parent),
        render=False,
        cl_agents=[],  # replay only
    )
    sim = Simulator(cfg, max_steps=100)
    sim.init_sim()
    sim.run_sim()
    return sim


def test_replay_sim_runs(replay_sim):
    m = replay_sim.metrics
    assert m["ticks"] == 100
    assert m["plan_calls"] == 0
    assert len(replay_sim.frames) == 100
    # every agent is a replay agent
    assert all(isinstance(a, NonReactiveAgent) for a in replay_sim.agents)


def test_host_replay_matches_device_rollout(replay_sim, demo1_trajs):
    """The lax.scan rollout reproduces the host agent loop exactly."""
    states, valid = jax.jit(lambda s: replay_rollout(s, 100))(
        scene_from_bundle(demo1_trajs))
    states = np.asarray(states)

    id_to_idx = {tid: i for i, tid in enumerate(demo1_trajs.track_ids)}
    for t in [0, 10, 57, 99]:
        frame = replay_sim.frames[t]
        # frame records the observation BEFORE the tick's step/update, i.e.
        # the state loaded from rec_step=t; device states[t] is post-update
        # (rec_step t+1), so compare frame t+1 against states[t]
        if t + 1 >= len(replay_sim.frames):
            continue
        for obs in replay_sim.frames[t + 1]["agents"]:
            idx = id_to_idx[obs.id]
            np.testing.assert_allclose(obs.state, states[t, idx], atol=1e-5,
                                       err_msg=f"agent {obs.id} t={t}")


def test_agent_validity_gating(replay_sim, demo1_trajs):
    # frames only include valid agents
    for t in [0, 50]:
        ids = {obs.id for obs in replay_sim.frames[t]["agents"]}
        for i, tid in enumerate(demo1_trajs.track_ids):
            if demo1_trajs.has_flag[i, t]:
                assert tid in ids
