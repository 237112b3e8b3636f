"""End-to-end trajectory parity: TPU-path planner vs host-numpy reference
mirror, closed-loop on the bundled demos (the BASELINE.json north star).

Runs two lockstep simulators per demo — one driving the production jitted
planner (MINDPlanner), one driving the float64 reference-control-flow mirror
(mind_tpu.parity.HostRefPlanner) — with shared network weights, and reports
the max ego-trajectory deviation over the closed-loop segment.

Usage:
    JAX_PLATFORMS=cpu python scripts/parity_run.py [--demos 1,2,3,4]
        [--steps 500] [--report PARITY_TRACES.md]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def run_demo(demo: str, max_steps: int):
    from mind_tpu.parity.runner import run_parity_demo

    return run_parity_demo(demo, max_steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", default="1,2,3,4")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    rows = []
    for d in args.demos.split(","):
        demo = f"demo_{d.strip()}"
        print(f"=== {demo} ===", flush=True)
        r = run_demo(demo, args.steps)
        rows.append(r)
        print({k: (round(v, 6) if isinstance(v, float) else v)
               for k, v in r.items()}, flush=True)

    ok = all(r["max_dev_cl"] <= 1e-3 for r in rows)
    print(f"\nPARITY {'PASS' if ok else 'FAIL'}: "
          f"max closed-loop deviation = "
          f"{max(r['max_dev_cl'] for r in rows):.2e} (target <= 1e-3)")

    if args.report:
        write_report(args.report, rows, args.steps)


def write_report(path: str, rows, steps: int):
    lines = [
        "# PARITY_TRACES — end-to-end trajectory parity",
        "",
        "TPU-path planner (`mind_tpu.planner.MINDPlanner`, jitted f32) vs the",
        "float64 host mirror with reference control flow"
        " (`mind_tpu.parity.HostRefPlanner`),",
        "shared network weights, lockstep closed-loop on the bundled demos.",
        f"Horizon: {steps} sim steps @ 50 Hz; deviation = ego position"
        " distance per step.",
        "",
        "| demo | ticks | plans | closed-loop steps | max dev (m) |"
        " mean dev (m) | final dev (m) | host mirror wall (s) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['demo']} | {r['ticks_dev']} | {r['plans_dev']} |"
            f" {r['closed_loop_steps']} | {r['max_dev_cl']:.2e} |"
            f" {r['mean_dev_cl']:.2e} | {r['final_dev']:.2e} |"
            f" {r['wall_host_s']:.0f} |")
    worst = max(r["max_dev_cl"] for r in rows)
    status = "PASS" if worst <= 1e-3 else "FAIL"
    lines += [
        "",
        f"**Result: {status}** — max closed-loop ego deviation"
        f" {worst:.2e} m (north-star target ≤ 1e-3, BASELINE.json).",
        "",
        "Notes:",
        "- The reference itself (torch+theano+av2) cannot run here and its",
        "  checkpoints are stripped, so the comparison target is an",
        "  independent float64 numpy implementation following the reference's",
        "  control flow (reference planner.py:104-145, scenario_tree.py:38-108,",
        "  solver.py:80-240), sharing only the prediction network function.",
        "- Both paths ran the network in float32 (production bf16 inference is",
        "  a documented speed/precision trade, config.py compute_dtype).",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
