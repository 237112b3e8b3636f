"""Sim-state checkpoint / resume round trip (replay agents)."""

import numpy as np

from mind_tpu.config import SimConfig
from mind_tpu.sim.simulator import Simulator
from mind_tpu.sim.state_io import save_sim_state, load_sim_state
from mind_tpu.utils.metrics import Metrics, PhaseTimer


def test_save_resume_replay(demo1_paths, tmp_path):
    cfg = SimConfig(sim_name="ck", seq_id=demo1_paths["seq_id"],
                    data_root=str(demo1_paths["map"].parent.parent),
                    render=False, cl_agents=[])
    sim = Simulator(cfg, max_steps=60)
    sim.init_sim()
    sim.run_sim()
    save_sim_state(sim, tmp_path / "state.npz")
    states_at_60 = {a.id: a.state.copy() for a in sim.agents}
    recs_at_60 = {a.id: a.rec_step for a in sim.agents}

    # continue 40 more steps from the checkpoint in a FRESH simulator
    sim2 = Simulator(cfg, max_steps=40)
    sim2.init_sim()
    load_sim_state(sim2, tmp_path / "state.npz")
    for a in sim2.agents:
        np.testing.assert_allclose(a.state, states_at_60[a.id])
        assert a.rec_step == recs_at_60[a.id]
    sim2.run_sim()

    # reference: uninterrupted 100-step run
    sim3 = Simulator(cfg, max_steps=100)
    sim3.init_sim()
    sim3.run_sim()
    for a2 in sim2.agents:
        a3 = next(a for a in sim3.agents if a.id == a2.id)
        np.testing.assert_allclose(a2.state, a3.state, atol=1e-12)
        assert a2.rec_step == a3.rec_step


def test_metrics_object():
    m = Metrics()
    m.incr("plans")
    m.incr("plans")
    m.observe("trees", 3)
    with m.timer.phase("aime"):
        pass
    d = m.to_dict()
    assert d["counters"]["plans"] == 2
    assert d["counters"]["gauge/trees"] == 3
    assert d["phases"]["aime"]["calls"] == 1
    assert isinstance(m.dump(), str)
