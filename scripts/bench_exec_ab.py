"""A/B the plan-pipeline precision knobs on the real chip (VERDICT r3 #2/#3).

Times the fused demo_1 episode (the benched path) across the dtype-policy
matrix that round 4 introduced:

  r3_default : pipeline f64, exec off            (round-3 configuration)
  exec       : pipeline f64, exec f64 scratch    (two-phase re-solve)
  fast_exec  : pipeline f32, exec f64 scratch    (bulk tensors back to f32)
  fast_polish: pipeline f32, exec f64 polish     (warm-started winner polish)
  fast       : pipeline f32, exec off            (round-2-style speed ceiling)

Writes outputs/exec_ab.json with steps/s + per-plan-cycle ms per variant.
The production default is chosen from this measurement plus the parity
zero-flip runs (scripts/parity_run.py).

Usage: python scripts/bench_exec_ab.py [--steps 500] [--out outputs/exec_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    # (name, pipeline_dtype, exec_solve_dtype, exec_resolve_mode)
    # exec_solve_dtype=None follows solve_dtype (re-solve disabled)
    ("r3_default", "float64", None, "polish"),
    ("exec", "float64", "float64", "scratch"),
    ("fast_exec", "float32", "float64", "scratch"),
    ("fast_polish", "float32", "float64", "polish"),
    ("fast", "float32", None, "polish"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="outputs/exec_ab.json")
    ap.add_argument("--variants", default=",".join(v[0] for v in VARIANTS))
    args = ap.parse_args()

    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mind_tpu.config import SimConfig, planner_config_for_demo
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.episode import build_episode_inputs, run_episode

    wanted = set(args.variants.split(","))
    rows = {}
    if os.path.exists(args.out):  # merge: partial runs keep existing rows
        with open(args.out) as f:
            rows = json.load(f)
    for name, pdt, edt, mode in VARIANTS:
        if name not in wanted:
            continue
        pc = planner_config_for_demo("demo_1")
        pc.pipeline_dtype = pdt
        pc.traj_tree.exec_solve_dtype = edt
        pc.traj_tree.exec_resolve_mode = mode
        cfg = SimConfig.from_json(os.path.join(root, "configs/demo_1.json"),
                                  data_root="/root/reference/data")
        cfg.render = False
        sim = Simulator(cfg, planner_cfg=pc)
        sim.init_sim()
        inp = build_episode_inputs(sim)
        t0 = time.perf_counter()
        run_episode(sim, None, inp)  # compile + warm
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = run_episode(sim, None, inp)
        wall = time.perf_counter() - t0
        n = len(res.ego_states)
        rows[name] = {
            "pipeline_dtype": pdt,
            "exec_solve_dtype": edt,
            "exec_resolve_mode": mode if edt else None,
            "steps_per_s": round(n / wall, 2),
            "plan_cycle_ms": round(wall / max(res.plan_calls, 1) * 1e3, 1),
            "wall_s": round(wall, 2),
            "warm_wall_s": round(t_compile, 1),
            "fail_cycle": res.fail_cycle,
            "steps": n,
        }
        print(json.dumps({name: rows[name]}), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
