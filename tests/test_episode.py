"""Device-resident episode runner == host Simulator loop, tick for tick."""

import numpy as np
import pytest

from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.sim.simulator import Simulator
from mind_tpu.sim.episode import (build_episode_inputs, run_episode,
                                  run_episode_monte_carlo,
                                  run_episode_segmented)

DATA_ROOT = "/root/reference/data"


def tiny_pc():
    pc = planner_config_for_demo("demo_1")
    pc.net.n_scene_layer = 1
    pc.net.n_fpn_scale = 2
    pc.ckpt_path = None  # deterministic seeded weights
    return pc


def make_sim(steps):
    cfg = SimConfig.from_json("configs/demo_1.json", data_root=DATA_ROOT)
    cfg.render = False
    cfg.cl_agents[0].enable_timestep = 0.0
    sim = Simulator(cfg, planner_cfg=tiny_pc(), max_steps=steps)
    sim.init_sim()
    return sim


@pytest.mark.slow
def test_episode_inputs_match_host_obs_buffer():
    """The precomputed slot assignment / presence schedule must equal what
    the host ObsBuffer builds from the live observation stream."""
    steps = 30
    sim = make_sim(steps)
    inp = build_episode_inputs(sim, steps)

    sim2 = make_sim(steps)
    av = next(a for a in sim2.agents if a.id == "AV")
    av.planner.export_trees = False
    sim2.run_sim()
    buf = av.planner.obs_buffer
    C = steps // 5

    # same slot-type table for every assigned slot
    n_slots = len(buf.slots)
    np.testing.assert_array_equal(np.asarray(inp.types)[:n_slots],
                                  buf.types[:n_slots])
    # final presence mask matches (last trigger tick = 25)
    np.testing.assert_array_equal(np.asarray(inp.present)[C - 1],
                                  buf.last_present)
    np.testing.assert_array_equal(
        np.asarray(inp.active)[C - 1][: n_slots],
        buf.active[:n_slots])
    # device window contents: last appended frame equals the final trigger's
    # slot states for present EXO slots (slot 0 is the ego: the precompute
    # stores its replay log; the scan substitutes the carried state)
    pos = np.asarray(buf.buf.pos[:, -1])
    want = np.asarray(inp.slot_states)[C - 1, :, :2]
    pres = np.asarray(inp.present)[C - 1].copy()
    pres[0] = False
    np.testing.assert_allclose(pos[pres], want[pres], atol=1e-5)


@pytest.mark.slow
def test_episode_matches_host_loop():
    """Full-fidelity check: the one-dispatch episode program reproduces the
    host loop's ego trajectory within the 1e-3 north-star budget."""
    steps = 50
    sim_host = make_sim(steps)
    av = next(a for a in sim_host.agents if a.id == "AV")
    av.planner.export_trees = False
    m = sim_host.run_sim()
    traj_host = sim_host.ego_trajectory()
    assert m["plan_calls"] == steps // 5

    sim_dev = make_sim(steps)
    res = run_episode(sim_dev, steps)
    assert res.fail_cycle == -1
    assert res.plan_calls == steps // 5
    assert res.ego_states.shape == traj_host.shape

    dev = np.linalg.norm(res.ego_states[:, :2] - traj_host[:, :2], axis=1)
    assert dev.max() <= 1e-3, f"max deviation {dev.max():.2e}"


@pytest.mark.slow
def test_episode_mc_segmented_invariant_to_seg_cycles():
    """The Monte-Carlo runner's segment boundaries are pure bookkeeping: the
    carried-scan split must reproduce the single-program trajectories
    bit-for-bit (same programs, same data, only the scan cut differs)."""
    steps = 30
    sim = make_sim(steps)
    full = run_episode_monte_carlo(sim, k=2, horizon=steps, chunk=2,
                                   seg_cycles=steps // 5)   # one segment
    # 4-cycle segments over 6 cycles: [4, 2] — also covers the remainder
    # segment (its shorter scan is a separate compiled shape)
    seg = run_episode_monte_carlo(sim, k=2, horizon=steps, chunk=2,
                                  seg_cycles=4)
    assert [r.fail_cycle for r in seg] == [r.fail_cycle for r in full]
    for a, b in zip(seg, full):
        np.testing.assert_array_equal(a.plan_ok, b.plan_ok)
        np.testing.assert_array_equal(a.ego_states, b.ego_states)
        np.testing.assert_array_equal(a.controls, b.controls)


@pytest.mark.slow
def test_episode_single_segmented_matches_one_program():
    """The watchdog-safe segmented single-episode runner is pure
    bookkeeping: same cycle program, same data, only the scan cut differs —
    so its trajectory must match `run_episode`'s bit-for-bit. (The runner
    exists for configurations whose whole-episode program outlives the TPU
    execution watchdog, e.g. strict solve_dtype='float64'.)"""
    steps = 30
    sim = make_sim(steps)
    full = run_episode(sim, steps)
    # 4-cycle segments over 6 cycles: [4, 2] — covers the remainder segment
    seg = run_episode_segmented(sim, steps, seg_cycles=4)
    assert seg.fail_cycle == full.fail_cycle
    assert seg.plan_calls == full.plan_calls
    np.testing.assert_array_equal(seg.plan_ok, full.plan_ok)
    np.testing.assert_array_equal(seg.ego_states, full.ego_states)
    np.testing.assert_array_equal(seg.controls, full.controls)


def test_to_result_truncates_at_fail_cycle():
    """A plan failure truncates the returned rollout at the failing cycle
    (reference simulator.py:85-89 terminates on failure): the device
    program's post-failure frozen-ego frames are neither trajectory data
    nor countable throughput steps."""
    from mind_tpu.sim.episode import TICKS_PER_PLAN, _to_result

    class _Pl:
        origin = np.zeros(2)

    C = 4
    rec = np.zeros((C, TICKS_PER_PLAN, 4))
    ok = np.array([True, False, False, False])
    planned = np.array([True, True, False, False])
    res = _to_result(_Pl(), rec, ok, planned, np.zeros(C), np.zeros((C, 2)))
    assert res.fail_cycle == 1
    assert len(res.ego_states) == 2 * TICKS_PER_PLAN
    assert res.plan_calls == 2

    res = _to_result(_Pl(), rec, np.ones(C, bool), np.ones(C, bool),
                     np.zeros(C), np.zeros((C, 2)))
    assert res.fail_cycle == -1
    assert len(res.ego_states) == C * TICKS_PER_PLAN


def test_episode_signature_shared_across_demo_configs():
    """demo_3's cost-weight override is runtime CostParams data, not program
    structure — all four demo configs must map to ONE episode executable
    cache key. Structural differences (grid geometry) must not."""
    import dataclasses

    from mind_tpu.common.kinematics import VehicleParam
    from mind_tpu.sim.episode import _cfg_signature

    class _P:
        def __init__(self, cfg):
            self.cfg = cfg

    vp = VehicleParam()
    sigs = {_cfg_signature(_P(planner_config_for_demo(f"demo_{d}")), vp, 0.02)
            for d in (1, 2, 3, 4)}
    assert len(sigs) == 1, "demo configs must share one episode executable"

    other = planner_config_for_demo("demo_1")
    other.traj_tree.full = dataclasses.replace(other.traj_tree.full,
                                               smooth_grid_res=0.5)
    assert _cfg_signature(_P(other), vp, 0.02) not in sigs


def _run_exec_variant(steps, solve_dtype, exec_dtype, mode="scratch"):
    cfg = SimConfig.from_json("configs/demo_1.json", data_root=DATA_ROOT)
    cfg.render = False
    cfg.cl_agents[0].enable_timestep = 0.0
    pc = tiny_pc()
    pc.traj_tree.solve_dtype = solve_dtype
    pc.traj_tree.exec_solve_dtype = exec_dtype
    pc.traj_tree.exec_resolve_mode = mode
    sim = Simulator(cfg, planner_cfg=pc, max_steps=steps)
    sim.init_sim()
    return run_episode(sim, horizon=steps)


@pytest.mark.slow
def test_exec_resolve_matches_strict_mode():
    """`TrajTreeConfig.exec_solve_dtype='float64'` re-solves only the
    SELECTED tree at f64 for execution. In 'scratch' mode the re-solve
    reproduces the mirror's two-phase iteration path, so whenever the f32
    selection agrees with strict mode's (it does on the demos — zero flips,
    PARITY_TRACES) the executed control and hence the whole closed loop
    matches the full strict `solve_dtype='float64'` run to solver-ULP
    level. 'polish' mode warm-starts ONE full-phase f64 solve from the
    converged f32 controls: same optimum, not the same iterate — it must
    land far closer to strict than the plain f32 execution does."""
    steps = 15

    strict = _run_exec_variant(steps, "float64", "float64")  # resolve off
    scratch = _run_exec_variant(steps, "float32", "float64", "scratch")
    polish = _run_exec_variant(steps, "float32", "float64", "polish")
    plain = _run_exec_variant(steps, "float32", None)        # resolve off

    assert (strict.fail_cycle == scratch.fail_cycle == polish.fail_cycle
            == plain.fail_cycle)
    # scratch == strict, up to selection agreement
    np.testing.assert_allclose(scratch.ego_states, strict.ego_states,
                               atol=1e-8)
    # polish converges to the same full-cost optimum: well inside the
    # north-star budget of strict over this horizon
    np.testing.assert_allclose(polish.ego_states, strict.ego_states,
                               atol=1e-4)
    # and the f32-executed run deviates measurably more than that
    np.testing.assert_allclose(plain.ego_states, strict.ego_states,
                               atol=1e-2)


@pytest.mark.slow
def test_strict_mode_needs_only_solve_dtype():
    """Setting ONLY solve_dtype='float64' (how strict mode is configured
    everywhere: parity/runner.py, scripts/bench_strict.py) must run pure
    f64 end to end: exec_solve_dtype=None follows solve_dtype, so no f32
    re-solve fires. Regression test for the round-4 default
    exec_solve_dtype='float32', which silently downgraded strict runs'
    executed controls to f32."""
    steps = 10
    only_solve = _run_exec_variant(steps, "float64", None)
    explicit = _run_exec_variant(steps, "float64", "float64")
    np.testing.assert_array_equal(only_solve.ego_states, explicit.ego_states)
    np.testing.assert_array_equal(only_solve.controls, explicit.controls)
