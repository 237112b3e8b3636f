"""Benchmark: closed-loop simulation throughput on one TPU chip, all demos.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline: the reference's ~10-minute CPU wall clock for one 500-step demo
rollout (reference README.md:58) => 500/600 ~= 0.833 steps/s; vs_baseline is
steps/s over that.

Headline value = the MIN over the four demos of the fused-episode steps/s —
the weakest demo must clear the >=50x bar (BASELINE.json north star), not
just demo_1. One compiled episode program (statics are runtime arguments,
sim/episode.py) serves all four demos.

detail carries:
- per-demo fused-episode steps/s (warm executable, second call timed);
- the 4-demo batched episode (ONE vmapped device program, one host sync);
- the 64-way Monte-Carlo episode batch (perturbed egos, shared statics);
- host-loop mode on demo_1 (reference-shaped Simulator loop, warmed via
  state-checkpoint rewind) for comparability with round-1/2 numbers;
- a per-phase device-time breakdown of one plan cycle (network forward,
  AIME program, cost topology, warm solve, full solve, selection, export);
- network MFU: achieved FLOP/s of the scene-prediction forward over the
  chip's bf16 peak (v5e: 197 TFLOP/s).

Compilation/cache-load is excluded everywhere: each program is timed on its
second call (the persistent compile cache makes first calls cheap too).

Every section runs in its OWN subprocess (`bench.py --section NAME`): a TPU
worker fault (kernel fault / HBM exhaustion) in one section then kills only
that section's process, the parent records the error, sleeps out the
worker's recovery window, and the remaining sections still run with a fresh
client. Without this, one fault poisons every later section in-process
(observed in round 3's first bench attempt).
"""

import json
import os
import sys
import time


BASELINE_STEPS_PER_SEC = 500.0 / 600.0
V5E_PEAK_BF16 = 197e12
DEMOS = ["demo_1", "demo_2", "demo_3", "demo_4"]


def _timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    return out, time.perf_counter() - t0


def _progress(name, payload):
    """Per-section progress on stderr (stdout carries ONE final JSON line);
    a crash mid-bench then still leaves every finished section on record."""
    print(f"[bench] {name}: {json.dumps(payload)}", file=sys.stderr,
          flush=True)


def bench_network(pl):
    """Standalone forward timing + compiled FLOP count -> MFU."""
    import jax
    import jax.numpy as jnp

    cfg = pl.cfg
    B = cfg.scen_tree.max_branch_nodes
    A, L = cfg.max_actors, cfg.max_lanes
    N = A + L
    # explicit f32 (the staged path's input dtype): under the package-wide
    # x64 mode, dtype-less zeros would be f64 and a float32-compute config
    # would then time an emulated-f64 forward instead of the production one
    f32 = jnp.float32
    args = (
        pl.params,
        jnp.zeros((B, A, cfg.net.obs_len - 2, cfg.net.in_actor), f32),
        jnp.ones((B, A), bool),
        jnp.zeros((B, L, 10, cfg.net.in_lane), f32),
        jnp.ones((B, L), bool),
        jnp.zeros((B, N, N, cfg.net.d_rpe_in), f32),
        jnp.zeros((B, 10, cfg.net.in_lane), f32),
        jnp.zeros((B, 20), f32),
    )
    fn = jax.jit(pl.batched_apply)
    compiled = fn.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    jax.block_until_ready(fn(*args))  # warm
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    t_net = sorted(ts)[len(ts) // 2]
    mfu = flops / t_net / V5E_PEAK_BF16 if flops else float("nan")
    return {"net_forward_b8_ms": round(t_net * 1e3, 2),
            "net_flops_per_fwd": flops,
            "net_mfu_bf16_peak": round(mfu, 4)}


def bench_phases(sim, pl):
    """One plan cycle's device-time split, measured on demo_1's first
    enabled plan state via the staged programs + solver micro-programs."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mind_tpu.planner.trajectory_tree import (
        build_cost_indices, gather_cost_nodes, two_phase_solve,
        evaluate_traj_tree)
    from mind_tpu.planner.ilqr import ilqr_solve

    cfg = pl.cfg
    MN = cfg.scen_tree.max_tree_nodes

    def timed_dev(fn, *args, n=5):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    amask_d = pl.obs_buffer.mask_device(pl.obs_buffer.actor_mask())
    types_d = pl.obs_buffer.types_device()

    t_aime = timed_dev(pl._aime_fn, pl.params, pl.obs_buffer.buf, types_d,
                       amask_d)
    state, meta, packed = pl._aime_fn(pl.params, pl.obs_buffer.buf, types_d,
                                      amask_d)
    packed_np = np.asarray(packed)
    parent = packed_np[0:MN].astype(np.int32)
    duration = packed_np[MN:2 * MN].astype(np.int32)
    end_flag = packed_np[2 * MN:3 * MN] > 0.5
    tree_id = packed_np[3 * MN:4 * MN].astype(np.int32)

    t0 = time.perf_counter()
    trees = build_cost_indices(parent, duration, end_flag, tree_id,
                               cfg.traj_tree)
    t_topo_host = time.perf_counter() - t0
    from mind_tpu.planner.planner import MAX_TREES
    trees = trees[:MAX_TREES]
    n_real = len(trees)
    while len(trees) < MAX_TREES:
        trees.append(trees[0])
    topo_b = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                          *[t[0] for t in trees])
    cost_slot_b = jnp.asarray(np.stack([t[1] for t in trees]))
    cost_step_b = jnp.asarray(np.stack([t[2] for t in trees]))
    tree_mask = jnp.asarray(np.arange(MAX_TREES) < n_real)

    s_loc = pl.local_state()
    x0 = jnp.asarray([*s_loc, *pl.ctrl], jnp.float32)
    tv = jnp.float32(float(pl.lcl_smp.target_velocity))
    warm_p, full_p = pl._cost_params()
    offset = pl._field_offset(s_loc)
    warm_p = warm_p._replace(field_offset=offset)
    full_p = full_p._replace(field_offset=offset)
    # cost params carry f64 leaves (decision precision); the micro-solves
    # below call ilqr_solve directly, so cast to the f32 solve dtype the
    # production two_phase_solve would use — otherwise the timed solves run
    # promoted f64 math and overstate the production solver cost
    def _cast32(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, t)
    warm_p32, full_p32 = _cast32(warm_p), _cast32(full_p)

    t_solve = timed_dev(pl._solve_fn, state.slots, meta.norm_prob, amask_d,
                        topo_b, cost_slot_b, cost_step_b, tree_mask, x0,
                        warm_p, full_p, tv)

    # solver micro-programs over the same batched trees
    def gather(topo, cs, st):
        return gather_cost_nodes(state.slots, meta.norm_prob, cs, st,
                                 topo.node_mask, amask_d)

    nodes_b = jax.jit(jax.vmap(gather))(topo_b, cost_slot_b, cost_step_b)

    def warm_only(topo_bb, nodes_bb):
        def one(topo, nodes):
            us0 = jnp.zeros((topo.parent.shape[0], 2), x0.dtype)
            _, us, info = ilqr_solve(topo, x0, us0, nodes, warm_p32,
                                     pl.warm_ilqr_cfg)
            return us, info["iterations"]
        return jax.vmap(one)(topo_bb, nodes_bb)

    warm_fn = jax.jit(warm_only)
    t_warm = timed_dev(warm_fn, topo_b, nodes_b)
    us_warm_b, _ = warm_fn(topo_b, nodes_b)

    def full_only(topo_bb, nodes_bb, us_warm_bb):
        def one(topo, nodes, us_warm):
            xs, us, info = ilqr_solve(topo, x0, us_warm, nodes, full_p32,
                                      pl.ilqr_cfg)
            return xs, us
        return jax.vmap(one)(topo_bb, nodes_bb, us_warm_bb)

    full_fn = jax.jit(full_only)
    t_full = timed_dev(full_fn, topo_b, nodes_b, us_warm_b)
    xs_b, us_b = full_fn(topo_b, nodes_b, us_warm_b)

    weights = (cfg.comfort_acc_weight, cfg.comfort_str_weight,
               cfg.efficiency_weight, cfg.target_weight)

    def select(xs_bb, us_bb, topo_bb):
        def one(xs, us, topo):
            return evaluate_traj_tree(
                xs, us, topo.node_mask, jnp.sum(topo.node_mask), x0,
                *pl._eval_segs, tv, weights)
        costs = jax.vmap(one)(xs_bb, us_bb, topo_bb)
        return jnp.argmin(jnp.where(tree_mask, costs, jnp.inf))

    t_sel = timed_dev(jax.jit(select), xs_b, us_b, topo_b)

    return {
        "aime_program_ms": round(t_aime * 1e3, 2),
        "topology_host_ms": round(t_topo_host * 1e3, 2),
        "warm_solve_ms": round(t_warm * 1e3, 2),
        "full_solve_ms": round(t_full * 1e3, 2),
        "selection_ms": round(t_sel * 1e3, 2),
        "staged_solve_program_ms": round(t_solve * 1e3, 2),
    }


def _init_jax():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _build_sims(demos):
    from mind_tpu.config import SimConfig
    from mind_tpu.sim.simulator import Simulator

    root = os.path.dirname(os.path.abspath(__file__))
    sims = []
    for demo in demos:
        cfg = SimConfig.from_json(os.path.join(root, f"configs/{demo}.json"),
                                  data_root="/root/reference/data")
        cfg.render = False
        sim = Simulator(cfg)
        sim.init_sim()
        sims.append(sim)
    return sims


def section_per_demo():
    """Fused episode, per demo (ONE compiled program serves all four)."""
    _init_jax()
    from mind_tpu.sim.episode import run_episode_timed

    per_demo = {}
    for demo, sim in zip(DEMOS, _build_sims(DEMOS)):
        res, wall = run_episode_timed(sim)
        assert res.fail_cycle == -1, f"{demo}: plan failure {res.fail_cycle}"
        sps = len(res.ego_states) / wall
        per_demo[demo] = {
            "steps_per_s": round(sps, 2),
            "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
            "wall_s": round(wall, 2),
            "plan_calls": res.plan_calls,
        }
        _progress(f"episode/{demo}", per_demo[demo])
    return per_demo


def section_batched():
    """4-demo batched episode: one vmapped program, one host sync."""
    _init_jax()
    from mind_tpu.sim.episode import run_episodes_batched

    sims = _build_sims(DEMOS)
    results, _ = _timed(run_episodes_batched, sims)
    results, wall_b = _timed(run_episodes_batched, sims)
    total = sum(len(r.ego_states) for r in results)
    return {
        "scenarios": len(sims),
        "agg_steps_per_s": round(total / wall_b, 2),
        "vs_baseline": round(total / wall_b / BASELINE_STEPS_PER_SEC, 2),
        "wall_s": round(wall_b, 2),
        "fail_cycles": [r.fail_cycle for r in results],
    }


def section_mc():
    """64-way Monte-Carlo episode batch on demo_1."""
    _init_jax()
    from mind_tpu.sim.episode import run_episode_monte_carlo

    sim = _build_sims(DEMOS[:1])[0]
    # one-chunk warm run loads the (persistent-cached) executable; the
    # timed 64-copy run then measures warm chunk executions
    _timed(run_episode_monte_carlo, sim, 4)
    mc, wall_mc = _timed(run_episode_monte_carlo, sim, 64)
    mc_total = sum(len(r.ego_states) for r in mc)
    return {
        "copies": 64,
        "eff_steps_per_s": round(mc_total / wall_mc, 2),
        "vs_baseline": round(mc_total / wall_mc / BASELINE_STEPS_PER_SEC, 2),
        "wall_s": round(wall_mc, 2),
        "survived": sum(1 for r in mc if r.fail_cycle < 0),
    }


def _warm_host_loop(sim, av):
    """Compile/warm the staged-planner programs via a 12-tick run, then
    rewind the sim to its initial state for a clean timed run."""
    from mind_tpu.sim.state_io import save_sim_state, load_sim_state
    from mind_tpu.planner.planner import ObsBuffer

    snap = "/tmp/mind_tpu_bench_t0.npz"
    save_sim_state(sim, snap)
    av.set_enable_timestep(0.0)
    sim.sim_horizon = 12
    sim.run_sim()
    load_sim_state(sim, snap)
    av.set_enable_timestep(4.0)
    av.is_enable = False
    av.last_pl_tri = None
    av.planner.obs_buffer = ObsBuffer(av.planner.cfg.max_actors,
                                      origin=av.planner.origin)
    av.planner.metrics.timer.reset()
    sim.sim_horizon = sim.config.sim_horizon


def section_host_loop():
    """Host-loop mode on demo_1 (round-1/2 comparable numbers)."""
    _init_jax()
    sim = _build_sims(DEMOS[:1])[0]
    av = next(a for a in sim.agents if a.id == "AV")
    av.planner.export_trees = False
    _warm_host_loop(sim, av)
    t0 = time.perf_counter()
    metrics = sim.run_sim()
    wall = time.perf_counter() - t0
    return {
        "steps_per_s": round(metrics["ticks"] / wall, 2),
        "vs_baseline": round(metrics["ticks"] / wall
                             / BASELINE_STEPS_PER_SEC, 2),
        "wall_s": round(wall, 2),
        "plan_calls": metrics["plan_calls"],
        "phase_mean_ms": {
            k: v["mean_ms"]
            for k, v in av.planner.metrics.timer.summary().items()},
    }


def section_phase_split():
    """Per-phase device-time split + network MFU. Runs a short host loop
    first so the planner holds a real demo_1 plan state."""
    _init_jax()
    sim = _build_sims(DEMOS[:1])[0]
    av = next(a for a in sim.agents if a.id == "AV")
    av.planner.export_trees = True
    av.set_enable_timestep(0.0)
    sim.sim_horizon = 12
    sim.run_sim()
    phases = bench_phases(sim, av.planner)
    net = bench_network(av.planner)
    phases["net_forward_b8_ms"] = net["net_forward_b8_ms"]
    phases.update({k: net[k] for k in ("net_flops_per_fwd",
                                       "net_mfu_bf16_peak")})
    return phases


SECTIONS = {
    # MC last: its perturbed starts hit data-dependent max-iteration
    # cycles, making it the slowest / most timeout-prone section
    "per_demo_episode": section_per_demo,
    "batched_episode": section_batched,
    "host_loop_demo_1": section_host_loop,
    "phase_split": section_phase_split,
    "monte_carlo_episode": section_mc,
}
SECTION_TIMEOUT_S = {
    "per_demo_episode": 2400,
    "batched_episode": 1200,
    # MC is data-dependently slow (hard perturbed cycles run the iLQR to
    # max iterations) and runs last, so a generous cap risks nothing else
    "monte_carlo_episode": 3600,
    "host_loop_demo_1": 1200,
    "phase_split": 1200,
}
# a TPU-worker fault leaves the chip unusable for a few minutes; wait this
# long before the next section / retry (measured recovery ~5-10 min)
RECOVERY_SLEEP_S = 420
RESULT_TAG = "@@BENCH_SECTION@@ "


def _run_section_subprocess(name):
    """One section in its own process: a TPU-worker crash kills only this
    section and the next one starts with a fresh client. Returns (ok, dict);
    subprocess stderr (the _progress lines) passes through."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--section", name]
    try:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                              timeout=SECTION_TIMEOUT_S[name])
    except subprocess.TimeoutExpired:
        return False, {"error": f"section timeout {SECTION_TIMEOUT_S[name]}s"}
    out = proc.stdout.decode(errors="replace")
    for line in out.splitlines():
        if line.startswith(RESULT_TAG):
            return True, json.loads(line[len(RESULT_TAG):])
    return False, {"error": f"exit {proc.returncode}, no result line"}


def _wait_for_tpu(max_wait_s=2400):
    """Gate the bench on a healthy device: after a worker fault the chip
    needs a long IDLE recovery window during which clients hang in backend
    init or fail to initialize — and repeated probing appears to RESET that
    window, so probe rarely (20 min apart; the shared probe lives in
    mind_tpu.utils.tpu_health)."""
    from mind_tpu.utils.tpu_health import probe_once

    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        if probe_once():
            _progress("tpu_probe", {"ok": True, "attempt": attempt})
            return True
        waited = time.time() - t0
        if waited > max_wait_s:
            _progress("tpu_probe", {"ok": False, "attempt": attempt,
                                    "waited_s": round(waited)})
            return False
        _progress("tpu_probe", {"ok": False, "attempt": attempt,
                                "retry_in_s": 1200})
        time.sleep(1200)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        out = SECTIONS[sys.argv[2]]()
        print(RESULT_TAG + json.dumps(out), flush=True)
        return

    if not _wait_for_tpu():
        # dead chip: emit the one JSON line immediately instead of grinding
        # through hours of per-section subprocess timeouts
        print(json.dumps({
            "metric": "four-demo closed-loop sim throughput, worst demo "
                      "(500 steps each, TPU v5e-1, fused episode, one "
                      "program)",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "detail": {"error": "TPU backend unavailable: health probe "
                                "failed for 40 min (worker fault recovery "
                                "window)",
                       "last_committed_hardware_numbers": {
                           "where": "DEMOS_TPU.md / PARITY_TRACES.md "
                                    "(TPU v5e-1, 2026-08-17)",
                           "worst_demo_steps_per_s": 59.0,
                           "worst_demo_vs_baseline": 70.8}},
        }))
        return

    results = {}
    failed_prev = False
    for name in SECTIONS:
        if failed_prev:
            _progress("recovery", {"sleep_s": RECOVERY_SLEEP_S,
                                   "before": name})
            time.sleep(RECOVERY_SLEEP_S)
        ok, out = _run_section_subprocess(name)
        if not ok:  # one retry after letting the worker recover
            _progress(name, {**out, "retrying": True})
            time.sleep(RECOVERY_SLEEP_S)
            ok, out = _run_section_subprocess(name)
        failed_prev = not ok
        results[name] = out
        _progress(name, out)

    per_demo = results["per_demo_episode"]
    phases = results["phase_split"]
    if "error" in per_demo:
        worst = {"steps_per_s": 0.0, "vs_baseline": 0.0}
    else:
        worst = min(per_demo.values(), key=lambda d: d["steps_per_s"])
    result = {
        "metric": "four-demo closed-loop sim throughput, worst demo "
                  "(500 steps each, TPU v5e-1, fused episode, one program)",
        "value": worst["steps_per_s"],
        "unit": "steps/s",
        "vs_baseline": worst["vs_baseline"],
        "detail": {
            "per_demo_episode": per_demo,
            "batched_episode": results["batched_episode"],
            "monte_carlo_episode": results["monte_carlo_episode"],
            "host_loop_demo_1": results["host_loop_demo_1"],
            "phase_mean_ms": phases,
            "mfu": phases.get("net_mfu_bf16_peak"),
            "net_flops_per_fwd_b8": phases.get("net_flops_per_fwd"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
