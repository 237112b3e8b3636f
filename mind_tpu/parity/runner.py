"""Lockstep closed-loop parity runner: production planner vs host mirror.

Builds two simulators for one demo — one ego driven by the jitted production
MINDPlanner, one by the float64 reference-control-flow HostRefPlanner — with
shared network weights, runs both, and reports the per-step ego deviation
(the BASELINE.json 1e-3 north star).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

DATA_ROOT = "/root/reference/data"


def run_parity_demo(demo: str, max_steps: int,
                    data_root: str = DATA_ROOT) -> dict:
    from mind_tpu.config import SimConfig, planner_config_for_demo
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.agents import MINDAgent
    from mind_tpu.parity import HostRefPlanner

    def make_sim():
        cfg = SimConfig.from_json(f"configs/{demo}.json", data_root=data_root)
        cfg.render = False
        pcfg = planner_config_for_demo(demo)
        pcfg.net.compute_dtype = "float32"  # strict parity: no bf16
        # match the reference's solver tolerance exactly (solver.py:48);
        # the production default 1e-5 trades ~5e-4 control slack for speed
        pcfg.traj_tree.rel_tol = 1e-6
        sim = Simulator(cfg, planner_cfg=pcfg, max_steps=max_steps)
        sim.init_sim()
        return sim

    sim_dev = make_sim()
    sim_host = make_sim()

    # swap the host sim's ego planners for the reference mirror, sharing the
    # device planner's network weights
    for a_dev, a_host in zip(sim_dev.agents, sim_host.agents):
        if isinstance(a_host, MINDAgent):
            dev_pl = a_dev.planner
            shared = (dev_pl.model, dev_pl.params, dev_pl.batched_apply)
            a_host.planner = HostRefPlanner(
                dev_pl.cfg, a_host._smp, a_host.lcl_smp, shared_net=shared)
            a_host.planner.update_target_lane(a_host.gt_tgt_lane)

    t0 = time.perf_counter()
    sim_dev.run_sim()
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    sim_host.run_sim()
    t_host = time.perf_counter() - t0

    ego_dev = sim_dev.ego_trajectory()
    ego_host = sim_host.ego_trajectory()
    n = min(len(ego_dev), len(ego_host))
    dev_pos = np.linalg.norm(ego_dev[:n, :2] - ego_host[:n, :2], axis=-1)

    # closed-loop segment starts at the ego enable timestep
    enable = sim_dev.config.cl_agents[0].enable_timestep
    start = int(round(enable / sim_dev.config.sim_step))
    cl = dev_pos[start:] if len(dev_pos) > start else dev_pos

    host_pl = next(a.planner for a in sim_host.agents
                   if isinstance(a, MINDAgent))
    nan = float("nan")
    return {
        "demo": demo,
        "ticks_dev": sim_dev.metrics["ticks"],
        "ticks_host": sim_host.metrics["ticks"],
        "plans_dev": sim_dev.metrics["plan_calls"],
        "closed_loop_steps": int(len(cl)),
        "max_dev_all": float(dev_pos.max()) if len(dev_pos) else nan,
        "max_dev_cl": float(cl.max()) if len(cl) else nan,
        "mean_dev_cl": float(cl.mean()) if len(cl) else nan,
        "final_dev": float(dev_pos[-1]) if len(dev_pos) else nan,
        "host_failures": host_pl.diagnostics["plan_failures"],
        "branch_overflows": host_pl.diagnostics["branch_overflows"],
        "wall_dev_s": t_dev,
        "wall_host_s": t_host,
    }
