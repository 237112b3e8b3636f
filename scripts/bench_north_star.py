"""North-star certification: throughput of the HOST closed loop under a
named precision policy (the same staged loop the free-run parity suite
drives), all four demos, full horizon.

BASELINE.json's north star asks for ONE configuration that free-runs within
1e-3 of the f64 reference-control-flow mirror AND sustains >= 50x the
reference's ~0.83 steps/s. parity_run.py measures the first half per policy;
this script measures the second half in the SAME configuration and merges
both into outputs/north_star.json when the policy's free-run rows are
available (written by parity_run via --free-json).

Usage: python scripts/bench_north_star.py [--policy native_bal]
           [--steps 500] [--out outputs/north_star.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_ROOT = "/root/reference/data"
BASELINE_SPS = 0.83  # reference host loop, BASELINE.md


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", default="native_bal")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--demos", default="1,2,3,4")
    ap.add_argument("--out", default="outputs/north_star.json")
    ap.add_argument("--free-log", default=None,
                    help="parity_run free-run log to merge parity rows from")
    args = ap.parse_args()

    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scripts.parity_run import FREE_MODES
    from mind_tpu.config import SimConfig, planner_config_for_demo
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.state_io import save_sim_state, load_sim_state
    from mind_tpu.planner.planner import ObsBuffer

    overrides = FREE_MODES[args.policy]
    rows = []
    for d in args.demos.split(","):
        demo = f"demo_{d.strip()}"
        cfg = SimConfig.from_json(f"configs/{demo}.json", data_root=DATA_ROOT)
        cfg.render = False
        pcfg = planner_config_for_demo(demo)
        for k, v in overrides.items():
            if k == "pipeline_dtype":
                pcfg.pipeline_dtype = v
            else:
                setattr(pcfg.traj_tree, k, v)
        sim = Simulator(cfg, max_steps=args.steps, planner_cfg=pcfg)
        sim.init_sim()
        av = next(a for a in sim.agents if a.id == "AV")
        av.planner.export_trees = False

        # warm the executables on a short burst, then rewind to t=0 so the
        # timed run measures steady state (run_all_demos.py discipline)
        snap = f"/tmp/mind_tpu_ns_{demo}_t0.npz"
        save_sim_state(sim, snap)
        enable_t = av.enable_timestep
        av.set_enable_timestep(0.0)
        sim.sim_horizon = 12
        sim.run_sim()
        load_sim_state(sim, snap)
        av.set_enable_timestep(enable_t)
        av.is_enable = False
        av.last_pl_tri = None
        av.planner.obs_buffer = ObsBuffer(av.planner.cfg.max_actors,
                                          origin=av.planner.origin,
                                          dtype=av.planner.cfg.pipeline_dtype)
        av.planner.metrics.timer.reset()
        av.planner.metrics.counters.clear()
        sim.sim_horizon = args.steps

        t0 = time.perf_counter()
        m = sim.run_sim()
        wall = time.perf_counter() - t0
        pf = av.planner.metrics.counters.get("plan_failures", 0)
        sps = m["ticks"] / wall
        phases = {k: v["mean_ms"]
                  for k, v in av.planner.metrics.timer.summary().items()}
        row = {
            "demo": demo, "policy": args.policy,
            "backend": jax.default_backend(),
            "ticks": m["ticks"], "plan_calls": m["plan_calls"],
            "plan_failures": int(pf),
            "steps_per_sec": round(sps, 2),
            "vs_baseline": round(sps / BASELINE_SPS, 1),
            "wall_s": round(wall, 2),
            "phase_mean_ms": phases,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"policy": args.policy, "overrides": overrides,
           "steps": args.steps, "baseline_steps_per_sec": BASELINE_SPS,
           "throughput": rows}

    if args.free_log and os.path.exists(args.free_log):
        # parse `show()` dict lines from the parity_run log
        free = []
        with open(args.free_log) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and "max_dev_cl" in line:
                    free.append(eval(line))  # trusted local artifact
        if free:
            out["free_run"] = free

    worst_sps = min(r["steps_per_sec"] for r in rows)
    out["worst_steps_per_sec"] = worst_sps
    out["worst_vs_baseline"] = round(worst_sps / BASELINE_SPS, 1)
    thr_ok = worst_sps / BASELINE_SPS >= 50.0
    par_ok = None
    if out.get("free_run"):
        par_ok = all(r["max_dev_cl"] <= 1e-3 for r in out["free_run"])
    out["throughput_ok_50x"] = thr_ok
    out["parity_ok_1e3"] = par_ok
    out["north_star"] = bool(thr_ok and par_ok)

    path = os.path.join(root, args.out)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"worst {worst_sps:.1f} steps/s = {out['worst_vs_baseline']}x; "
          f"throughput>=50x: {thr_ok}; parity<=1e-3: {par_ok}; "
          f"NORTH STAR: {out['north_star']}")


if __name__ == "__main__":
    main()
