"""Monte-Carlo closed loop: K perturbed egos diverge but stay finite."""

import numpy as np
import pytest

from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.parallel.monte_carlo import MonteCarloSim

DATA_ROOT = "/root/reference/data"


def test_perturbed_starts_respect_corridor():
    """MC start noise must keep copies inside the target-lane corridor
    (reference scenario_tree.py:373-379 prunes plans whose ego leaves it):
    lateral sigma is capped at corridor_frac * tar_dist_thres regardless of
    how wide pos_sigma is."""
    from mind_tpu.sim.episode import perturb_ego_starts

    base = np.array([10.0, -4.0, 6.0, 0.7])
    thres, frac = 2.5, 0.1
    starts = perturb_ego_starts(base, 512, pos_sigma=5.0, vel_sigma=0.25,
                                tar_dist_thres=thres, seed=0,
                                corridor_frac=frac)
    d = starts[:, :2] - base[:2]
    yaw = base[3]
    lat = -d[:, 0] * np.sin(yaw) + d[:, 1] * np.cos(yaw)
    lon = d[:, 0] * np.cos(yaw) + d[:, 1] * np.sin(yaw)
    # lateral displacement bounded by ~5 sigma of the capped corridor noise
    assert np.abs(lat).max() <= 5 * frac * thres
    # longitudinal noise keeps the requested (wide) sigma
    assert lon.std() > 2.0
    assert (starts[:, 2] >= 0).all()
    assert np.allclose(starts[:, 3], yaw)


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
    # corridor-scaled perturbations: every copy's plans succeed
    assert m["failed"] == 0
    traj = np.stack(mc.trajectory)  # [T, K, 4]
    assert np.isfinite(traj).all()
    # perturbed copies are distinct
    assert not np.allclose(traj[-1, 0], traj[-1, 1])
    # all copies move forward plausibly (positive-ish velocity)
    assert (traj[-1, :, 2] > -0.5).all()
