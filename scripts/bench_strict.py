"""Fused-episode throughput in STRICT f64 solve mode, all four demos.

Strict mode (`TrajTreeConfig.solve_dtype='float64'`, same production rel_tol)
is the configuration whose free-run whole-trajectory parity vs the f64
reference mirror is ~1e-7 (PARITY_TRACES.md §3). This script answers: what
does that certainty cost on TPU, and does strict mode still clear the >=50x
bar (41.7 steps/s)? If it did, strict could become the production default and
ONE mode would be simultaneously fastest-class, benched, and free-run
certified.

ROUND-3 FINDING: as a single whole-episode program, strict mode FAULTS the
TPU worker — the emulated-f64 iLQR makes the 100-cycle scan outlive the
runtime's ~8 min execution watchdog (observed 2026-08-18: 'TPU worker
process crashed or restarted ... kernel fault' on demo_1's first strict
run_episode dispatch, while the f32 program runs the same episode in ~7 s).
The episode is therefore run in watchdog-bounded SEGMENTS here
(`run_episode_segmented`, identical trajectory bit-for-bit —
tests/test_episode.py::test_episode_single_segmented_matches_one_program);
even so, strict f64 cannot approach the f32 path's throughput on TPU (no
native f64 MXU path), so strict remains the parity-CERTIFICATION mode and
production stays f32.

Usage: python scripts/bench_strict.py [--demos 1,2,3,4] [--steps 500]
       [--seg-cycles 5] [--out outputs/strict_episode.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_ROOT = "/root/reference/data"
BASELINE = 500.0 / 600.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", default="1,2,3,4")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--seg-cycles", type=int, default=5,
                    help="plan cycles per device program; 5 bounds even an "
                         "all-max-iteration f64 dispatch well under the "
                         "~8 min execution watchdog")
    ap.add_argument("--out", default="outputs/strict_episode.json")
    args = ap.parse_args()

    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mind_tpu.config import SimConfig, planner_config_for_demo
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.episode import (build_episode_inputs,
                                      run_episode_segmented)

    rows = []
    for d in args.demos.split(","):
        demo = f"demo_{d.strip()}"
        cfg = SimConfig.from_json(os.path.join(root, f"configs/{demo}.json"),
                                  data_root=DATA_ROOT)
        cfg.render = False
        pcfg = planner_config_for_demo(demo)
        pcfg.traj_tree.solve_dtype = "float64"
        sim = Simulator(cfg, planner_cfg=pcfg, max_steps=args.steps)
        sim.init_sim()
        # warm-measurement discipline (run_episode_timed's), segmented:
        # first pass absorbs compile/cache-load, the second is timed
        inp = build_episode_inputs(sim, args.steps)
        run_episode_segmented(sim, args.steps, seg_cycles=args.seg_cycles,
                              inputs=inp)
        t0 = time.perf_counter()
        res = run_episode_segmented(sim, args.steps,
                                    seg_cycles=args.seg_cycles, inputs=inp)
        wall = time.perf_counter() - t0
        if res.fail_cycle >= 0:
            print(f"WARNING: {demo} strict-mode plan failure at cycle "
                  f"{res.fail_cycle}; row times the truncated rollout",
                  file=sys.stderr)
        sps = len(res.ego_states) / wall
        row = {
            "demo": demo, "ticks": len(res.ego_states),
            "plan_calls": res.plan_calls, "fail_cycle": res.fail_cycle,
            "steps_per_s": round(sps, 2),
            "vs_baseline": round(sps / BASELINE, 2),
            "wall_s": round(wall, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    worst = min(rows, key=lambda r: r["steps_per_s"])
    out = {
        "mode": "strict solve_dtype=float64 fused episode (segmented)",
        "seg_cycles": args.seg_cycles,
        "backend": jax.default_backend(),
        "worst_steps_per_s": worst["steps_per_s"],
        "worst_vs_baseline": worst["vs_baseline"],
        "clears_50x": worst["vs_baseline"] >= 50.0,
        "per_demo": rows,
    }
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(os.path.join(root, args.out)), exist_ok=True)
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
