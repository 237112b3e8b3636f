"""Batched multi-scenario closed loop == individual sims, scenario for
scenario (tiny net; CPU)."""

import numpy as np
import jax
import pytest

from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.sim.simulator import Simulator
from mind_tpu.parallel.multi_scenario import MultiScenarioSim

DATA_ROOT = "/root/reference/data"


def tiny_pc():
    pc = planner_config_for_demo("demo_1")
    pc.net.n_scene_layer = 1
    pc.net.n_fpn_scale = 2
    pc.ckpt_path = None  # deterministic seeded weights
    return pc


def sim_cfg(demo):
    cfg = SimConfig.from_json(f"configs/{demo}.json", data_root=DATA_ROOT)
    cfg.render = False
    cfg.cl_agents[0].enable_timestep = 0.0
    return cfg


@pytest.mark.slow
def test_batched_matches_individual():
    steps = 12
    multi = MultiScenarioSim([sim_cfg("demo_1"), sim_cfg("demo_3")],
                             planner_cfg=tiny_pc(), max_steps=steps)
    m = multi.run(steps)
    assert m["plan_calls"] > 0
    batched_states = multi.ego_states()

    singles = []
    for demo in ["demo_1", "demo_3"]:
        sim = Simulator(sim_cfg(demo), planner_cfg=tiny_pc(), max_steps=steps)
        sim.init_sim()
        av = next(a for a in sim.agents if a.id == "AV")
        av.planner.export_trees = False
        sim.run_sim()
        singles.append(av.state)

    # batched (vmapped) vs individual programs are different XLA
    # compilations; agreement is bounded by the 1e-3 parity budget,
    # not by ULP identity
    np.testing.assert_allclose(batched_states, np.stack(singles), atol=1e-3)
