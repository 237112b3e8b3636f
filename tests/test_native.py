"""Native C++ exec re-solver (mind_tpu/native) vs the float64 numpy mirror.

The native solver exists to make the mirror-exact execution re-solve cheap
(reference planner.py:174-178 two-phase tree-iLQR; see exec_ilqr.cpp). These
tests certify it against `host_ilqr_solve` — the same mirror the strict-mode
device solver is certified against (tests/test_parity.py, PARITY_TRACES.md)
— on randomized tree problems, and against the device 'scratch' re-solve
through a full planner cycle.
"""

import numpy as np
import pytest


def _synthetic_problem(seed, n_nodes=41, n_exo=5):
    from mind_tpu.parity.host_ilqr import HostCostNode, HostCostParams

    rng = np.random.default_rng(seed)
    parents = [-1]
    for i in range(1, n_nodes):
        parents.append(int(rng.integers(max(0, i - 6), i)))
    lane = np.cumsum(rng.normal(0, 1.5, (12, 2)), axis=0) + np.array([5., 0.])
    nodes, prob_all, egm, egc, exm, exc, exmask = [], [], [], [], [], [], []
    for i in range(n_nodes):
        prob = float(rng.uniform(0.1, 1.0))
        ego = rng.normal(0, 8, 2)
        ec = float(rng.uniform(0.3, 2.0))
        xm = rng.normal(0, 12, (n_exo, 2))
        xc = rng.uniform(0.3, 2.0, n_exo)
        mask = rng.random(n_exo) > 0.3
        xm_h = np.where(mask[:, None], xm, 1e6)
        nodes.append(HostCostNode(parent=parents[i], prob=prob, ego_mean=ego,
                                  ego_cov=ec, exo_mean=xm_h,
                                  exo_cov=xc * mask))
        prob_all.append(prob)
        egm.append(ego)
        egc.append(ec)
        exm.append(xm_h)
        exc.append(xc * mask)
        exmask.append(mask)
    params = HostCostParams(
        field_offset=np.array([-51., -51.]), res=0.4, grid_n=256,
        tgt_lane=lane, w_tgt=1.0, w_ego=2.0, w_ego_cov_offset=0.5,
        w_exo=50.0, w_exo_cov_offset=1.0, w_exo_cost_offset=0.5,
        w_des_state=np.array([0., 0., 1.0, 0., 0.1, 0.1]),
        des_state=np.array([0., 0., 8., 0., 0., 0.]),
        w_state_con=np.array([0., 0., 5., 0., 5., 5.]),
        state_lb=np.array([-1e3, -1e3, 0., -1e3, -5., -0.6]),
        state_ub=np.array([1e3, 1e3, 15., 1e3, 3., 0.6]),
        w_ctrl=np.array([1.0, 1.0]))
    arrays = dict(parents=np.array(parents, np.int32),
                  prob=np.array(prob_all), ego_mean=np.array(egm),
                  ego_cov=np.array(egc), exo_mean=np.array(exm),
                  exo_cov=np.array(exc),
                  exo_mask=np.array(exmask, np.uint8))
    return nodes, params, arrays, lane


def _flat_params(native, params):
    return native.pack_phase_params(
        params.field_offset, params.res, params.grid_n, params.w_tgt,
        params.w_ego, params.w_ego_cov_offset, params.w_exo,
        params.w_exo_cov_offset, params.w_exo_cost_offset,
        params.w_des_state, params.des_state, params.w_state_con,
        params.state_lb, params.state_ub, params.w_ctrl)


def test_native_builds():
    from mind_tpu import native

    assert native.available()


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_matches_numpy_mirror(seed):
    """Same iteration path, same cost, controls to ~1e-9 (the residual is
    summation-order rounding, far below the 1e-3 trajectory budget and the
    strict-mode device-vs-mirror level of ~1e-12)."""
    from mind_tpu import native
    from mind_tpu.parity.host_ilqr import host_ilqr_solve

    nodes, params, arr, lane = _synthetic_problem(seed)
    x0 = np.array([0., 0., 7., 0.05, 0., 0.])
    us0 = np.zeros((len(nodes), 2))
    ref = host_ilqr_solve(nodes, x0, us0, params, dt=0.2, wb=2.5,
                          max_iterations=100, rel_tol=1e-6,
                          n_line_search=10, mu_max=1e10)
    xs, us, info = native.ilqr_solve(
        arr["parents"], arr["prob"], arr["ego_mean"], arr["ego_cov"],
        arr["exo_mean"], arr["exo_cov"], arr["exo_mask"], lane, x0, us0,
        _flat_params(native, params), dt=0.2, wb=2.5, max_iterations=100,
        rel_tol=1e-6, n_line_search=10, mu_max=1e10)
    assert info["iterations"] == ref.iterations
    np.testing.assert_allclose(info["J"], ref.J, rtol=1e-9)
    np.testing.assert_allclose(us, ref.us, atol=1e-8)
    np.testing.assert_allclose(xs[0, 4:6], ref.xs[0, 4:6], atol=1e-9)


def test_native_two_phase_matches_mirror_two_phase():
    """Two-phase surface (warm from zeros with the warm-phase cost, full
    from the warm controls) — the exact reference planner.py:174-178 path
    the execution re-solve replicates."""
    from mind_tpu import native
    from mind_tpu.parity.host_ilqr import host_ilqr_solve

    nodes, params, arr, lane = _synthetic_problem(7)
    # warm phase: target-lane field only (host_planner.py:421-423)
    import dataclasses

    warm_params = dataclasses.replace(params, w_ego=0.0, w_exo=0.0)
    x0 = np.array([0., 0., 7., 0.05, 0., 0.])
    us0 = np.zeros((len(nodes), 2))
    warm = host_ilqr_solve(nodes, x0, us0, warm_params, dt=0.2, wb=2.5,
                           max_iterations=40, rel_tol=1e-6,
                           n_line_search=10, mu_max=1e10)
    full = host_ilqr_solve(nodes, x0, warm.us, params, dt=0.2, wb=2.5,
                           max_iterations=100, rel_tol=1e-6,
                           n_line_search=10, mu_max=1e10)
    xs, us, info = native.two_phase_solve(
        arr["parents"], arr["prob"], arr["ego_mean"], arr["ego_cov"],
        arr["exo_mean"], arr["exo_cov"], arr["exo_mask"], lane, x0,
        _flat_params(native, warm_params), _flat_params(native, params),
        dt=0.2, wb=2.5, warm_max_iterations=40, max_iterations=100,
        rel_tol=1e-6, n_line_search=10, mu_max=1e10)
    np.testing.assert_allclose(info["J"], full.J, rtol=1e-8)
    np.testing.assert_allclose(us, full.us, atol=1e-8)
    np.testing.assert_allclose(xs[0, 4:6], full.xs[0, 4:6], atol=1e-9)


@pytest.mark.slow
def test_native_plan_cycle_matches_device_scratch():
    """One full planner cycle on demo_1: exec_resolve_mode='native' (host
    C++ re-solve) must reproduce the device 'scratch' f64 re-solve's
    executed control — both replicate the mirror's two-phase iteration
    path, so they agree to f64 rounding."""
    from mind_tpu.config import SimConfig, planner_config_for_demo
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.agents import MINDAgent

    ctrls = {}
    for mode in ("scratch", "native"):
        cfg = SimConfig.from_json("configs/demo_1.json",
                                  data_root="/root/reference/data")
        cfg.render = False
        pcfg = planner_config_for_demo("demo_1")
        pcfg.net.n_scene_layer = 1
        pcfg.net.n_fpn_scale = 2
        pcfg.ckpt_path = None  # deterministic seeded weights
        pcfg.traj_tree.exec_resolve_mode = mode
        if mode == "scratch":
            pcfg.traj_tree.exec_solve_dtype = "float64"
        sim = Simulator(cfg, planner_cfg=pcfg, max_steps=1)
        sim.init_sim()
        ego = next(a for a in sim.agents if isinstance(a, MINDAgent))
        for t in range(45):
            obs = [a.observe() for a in sim.agents
                   if not isinstance(a, MINDAgent) and a.is_valid()]
            obs = [ego.observe()] + obs
            ego.update_observation(obs)
            for a in sim.agents:
                a.step()
                a.update_state(0.1)
        state = ego.lcl_smp.ego_agent.state
        ego.planner.update_state_ctrl(state, np.zeros(2))
        ok, ctrl, _ = ego.planner.plan()
        assert ok
        ctrls[mode] = ctrl
    np.testing.assert_allclose(ctrls["native"], ctrls["scratch"], atol=1e-7)
