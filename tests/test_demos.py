"""All four demo scenarios load within the framework's fixed paddings."""

import json
from pathlib import Path

import numpy as np
import pytest

from mind_tpu.config import SimConfig, PlannerConfig, planner_config_for_demo
from mind_tpu.data import SemanticMap, ArgoAgentLoader
from mind_tpu.data.semantic_map import build_lane_graph

DATA_ROOT = Path("/root/reference/data")
DEMOS = ["demo_1", "demo_2", "demo_3", "demo_4"]


@pytest.mark.parametrize("demo", DEMOS)
def test_demo_loads_within_paddings(demo):
    cfg = SimConfig.from_json(f"configs/{demo}.json", data_root=str(DATA_ROOT))
    assert cfg.sim_name == demo
    smp = SemanticMap().load_from_argo2(cfg.map_path)
    bundle = ArgoAgentLoader(cfg.scenario_path).get_trajs_info(smp)
    graph = build_lane_graph(smp.map_data, np.zeros(2), np.eye(2))

    pc = planner_config_for_demo(demo)
    assert len(bundle) <= pc.max_actors
    assert graph["num_lanes"] <= pc.max_lanes
    assert "AV" in bundle.track_ids
    # demo_3 raises the desired-velocity weight (planning/demo_3.py:23)
    if demo == "demo_3":
        assert pc.traj_tree.full.w_des_velocity == 0.5
    else:
        assert pc.traj_tree.full.w_des_velocity == 0.1


@pytest.mark.parametrize("demo", DEMOS)
def test_demo_config_fields(demo):
    cfg = SimConfig.from_json(f"configs/{demo}.json", data_root=str(DATA_ROOT))
    assert cfg.cl_agents[0].id == "AV"
    assert cfg.cl_agents[0].enable_timestep == 4.0
    assert cfg.sim_horizon == 500 and cfg.sim_step == 0.02
    assert cfg.scenario_path.exists() and cfg.map_path.exists()
