"""Closed-loop acceptance run: all four bundled demos, full 500-step horizon.

The reference's de-facto acceptance test is running every configs/demo_*.json
to completion (reference README.md:54-59). This script runs them on the
current jax backend (TPU when available), asserts zero plan failures, and
writes a per-demo metrics artifact.

Usage: python scripts/run_all_demos.py [--steps 500] [--report DEMOS_TPU.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_ROOT = "/root/reference/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--demos", default="1,2,3,4")
    ap.add_argument("--report", default=None)
    ap.add_argument("--json-out", default="outputs/demos_metrics.json")
    ap.add_argument("--mode", choices=["host", "episode", "both"],
                    default="host",
                    help="which loop(s) to run; 'episode' writes "
                         "--episode-json, 'host' merges it into --report. "
                         "Run them as two processes on TPU: holding both "
                         "mode's executables in one process pressures HBM.")
    ap.add_argument("--episode-json", default="outputs/episode_demos.json")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mind_tpu.config import SimConfig
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.state_io import save_sim_state, load_sim_state
    from mind_tpu.planner.planner import ObsBuffer
    from mind_tpu.sim.episode import run_episode_timed

    BASELINE = 500.0 / 600.0  # reference ~10 min per 500-step demo
    ep_rows = []
    if args.mode in ("episode", "both"):
        # fused-episode mode (the production/benched path): warm the one
        # shared executable on the first call, time the second
        for d in args.demos.split(","):
            demo = f"demo_{d.strip()}"
            cfg = SimConfig.from_json(f"configs/{demo}.json",
                                      data_root=DATA_ROOT)
            cfg.render = False
            sim = Simulator(cfg, max_steps=args.steps)
            sim.init_sim()
            res, wall = run_episode_timed(sim)
            sps = len(res.ego_states) / wall
            row = {
                "demo": demo, "ticks": len(res.ego_states),
                "plan_calls": res.plan_calls,
                "plan_failures": 0 if res.fail_cycle < 0 else 1,
                "fail_cycle": res.fail_cycle,
                "steps_per_sec": round(sps, 2),
                "vs_baseline": round(sps / BASELINE, 1),
                "wall_s": round(wall, 2),
            }
            ep_rows.append(row)
            print(json.dumps(row), flush=True)
        os.makedirs(os.path.dirname(args.episode_json) or ".", exist_ok=True)
        with open(args.episode_json, "w") as f:
            json.dump({"steps": args.steps, "demos": args.demos,
                       "rows": ep_rows}, f, indent=1)
        if args.mode == "episode":
            ok = all(r["ticks"] == args.steps and r["plan_failures"] == 0
                     for r in ep_rows)
            print(f"EPISODE DEMOS {'PASS' if ok else 'FAIL'}")
            return

    if not ep_rows and os.path.exists(args.episode_json):
        with open(args.episode_json) as f:
            saved = json.load(f)
        # merge only a run of the SAME horizon and demo set — a leftover
        # file from a different configuration (or the pre-stamp list
        # format) would silently misrepresent the acceptance evidence
        if (isinstance(saved, dict) and saved.get("steps") == args.steps
                and saved.get("demos") == args.demos):
            ep_rows = saved["rows"]
        else:
            print(f"ignoring stale {args.episode_json} "
                  "(horizon/demos mismatch)")

    rows = []
    for d in args.demos.split(","):
        demo = f"demo_{d.strip()}"
        cfg = SimConfig.from_json(f"configs/{demo}.json", data_root=DATA_ROOT)
        cfg.render = False
        sim = Simulator(cfg, max_steps=args.steps)
        sim.init_sim()
        av = next(a for a in sim.agents if a.id == "AV")
        av.planner.export_trees = False

        # Warm every executable on a short planning burst, then rewind the
        # sim to t=0 via a state checkpoint so the timed run measures
        # steady-state throughput, not residual compile/cache-load (the
        # same discipline as bench.py's host-loop section).
        snap = f"/tmp/mind_tpu_demos_{demo}_t0.npz"
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
        row = {
            "demo": demo,
            "backend": jax.default_backend(),
            "ticks": m["ticks"],
            "plan_calls": m["plan_calls"],
            "plan_failures": int(pf),
            "plans_ok": av.planner.metrics.counters.get("plans", 0),
            "steps_per_sec": round(m["ticks"] / wall, 2),
            "wall_s": round(wall, 2),
            "final_ego_v": round(float(av.state[2]), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(rows, f, indent=1)

    ok = all(r["ticks"] == args.steps and r["plan_failures"] == 0
             for r in rows)
    print(f"ALL DEMOS {'PASS' if ok else 'FAIL'}")

    ep_ok = all(r["ticks"] == args.steps and r["plan_failures"] == 0
                for r in ep_rows) if ep_rows else None
    if args.report:
        lines = [
            "# DEMOS — closed-loop acceptance (all four reference demos)",
            "",
            "Acceptance bar (reference README.md:54-59): every demo"
            " completes its full 500-step horizon with zero plan failures."
            f" Backend: {rows[0]['backend']}; horizon {args.steps} steps"
            " @ 50 Hz; plans at 10 Hz after the 4 s enable point.",
        ]
        if ep_rows:
            lines += [
                "",
                "## Fused-episode mode (the production/benched path)",
                "",
                "One device program per episode (`sim/episode.py`, one"
                " compiled executable serves all demos); warm — the second"
                " call is timed, so compile/cache-load is excluded.",
                "",
                "| demo | ticks | plans | plan failures | steps/s |"
                " vs 0.83 steps/s reference |",
                "|---|---|---|---|---|---|",
            ]
            for r in ep_rows:
                lines.append(
                    f"| {r['demo']} | {r['ticks']} | {r['plan_calls']} |"
                    f" {r['plan_failures']} | {r['steps_per_sec']} |"
                    f" {r['vs_baseline']}× |")
        lines += [
            "",
            "## Host-loop mode (reference-shaped 50 Hz Simulator loop)",
            "",
            "Every executable is warmed on a short planning burst and the"
            " sim rewound to t=0 via a state checkpoint before timing, so"
            " steps/s is steady-state host-loop throughput (compile and"
            " cache-load excluded).",
            "",
            "| demo | ticks | plans | plan failures | steps/s | wall (s) |",
            "|---|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['demo']} | {r['ticks']} | {r['plan_calls']} |"
                f" {r['plan_failures']} | {r['steps_per_sec']} |"
                f" {r['wall_s']} |")
        both_ok = ok and (ep_ok is not False)
        lines += [
            "",
            f"**Result: {'PASS' if both_ok else 'FAIL'}** — every demo"
            " completes the full horizon with zero plan failures"
            f"{' in both modes' if ep_rows else ''}.",
            "",
            "Note: in the tandem parity harness (PARITY_TRACES.md §2),"
            " demo_3's staged run once ended at tick 491 with the production"
            " planner AND the float64 reference-semantics mirror agreeing"
            " the final end-of-scenario plan fails — a knife-edge legitimate"
            " outcome under reference pruning rules, not an implementation"
            " failure; the standalone runs above complete all plan cycles.",
        ]
        with open(args.report, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
