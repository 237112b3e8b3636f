"""Monte-Carlo closed loop: K perturbed egos diverge but stay finite."""

import numpy as np
import pytest

from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.parallel.monte_carlo import MonteCarloSim

DATA_ROOT = "/root/reference/data"


@pytest.mark.slow
def test_monte_carlo_small():
    cfg = SimConfig.from_json("configs/demo_1.json", data_root=DATA_ROOT)
    pc = planner_config_for_demo("demo_1")
    pc.net.n_scene_layer = 1
    pc.net.n_fpn_scale = 2
    pc.net.compute_dtype = "float32"
    pc.ckpt_path = None
    mc = MonteCarloSim(cfg, k=4, planner_cfg=pc, max_steps=15, seed=3)
    m = mc.run()
    assert m["copies"] == 4 and m["plan_calls"] == 3
    traj = np.stack(mc.trajectory)  # [T, K, 4]
    assert np.isfinite(traj).all()
    # perturbed copies are distinct
    assert not np.allclose(traj[-1, 0], traj[-1, 1])
    # all copies move forward plausibly (positive-ish velocity)
    assert (traj[-1, :, 2] > -0.5).all()
