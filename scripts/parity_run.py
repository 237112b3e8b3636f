"""End-to-end trajectory parity: TPU-path planner vs host-numpy reference
mirror, closed-loop on the bundled demos (the BASELINE.json north star).

Three certifications per demo, all against the float64 reference-control-flow
mirror (mind_tpu.parity.HostRefPlanner) with shared network weights, all on
the PRODUCTION planner configuration (bf16 network, production rel_tol):

1. EPISODE PLAYBACK (run_parity_episode_playback): the BENCHED path — the
   fused single-program episode that produces the headline steps/s — replayed
   per cycle against the mirror from identical inputs. Criterion: mean
   per-cycle rollout deviation <= 1e-3, zero plan-success flips.

2. RESYNCED per-cycle (run_parity_demo_resync): ONE closed-loop sim driven by
   the staged production planner with the mirror planning in tandem from
   identical inputs at every 10 Hz cycle, full horizon.

3. FREE-RUN lockstep (run_parity_demo): two independent closed-loop sims for
   60 closed-loop steps past enable; max ego deviation <= 1e-3. Run twice:
   production mode (f32 iLQR) and strict mode (solve_dtype=float64, whose
   device solver matches the mirror's to ~1e-12).

Usage:
    python scripts/parity_run.py [--demos 1,2,3,4] [--steps 500]
        [--report PARITY_TRACES.md] [--skip free|resync|playback ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CL_STEPS = 60  # free-run certified closed-loop segment (VERDICT bar: >= 50)

# free-run dtype-policy modes: label -> run_parity_demo overrides
FREE_MODES = {
    # whatever planner_config_for_demo ships (the production default)
    "production": {},
    # f32 pipeline/solve + f64 polish re-solve of the winner tree
    "polish": {"exec_solve_dtype": "float64", "exec_resolve_mode": "polish"},
    # f32 pipeline/solve + f64 two-phase SCRATCH re-solve of the winner:
    # reproduces the mirror's full iteration path, so the executed control
    # is mirror-exact whenever the scenario tree + selection agree
    "scratch": {"exec_solve_dtype": "float64", "exec_resolve_mode": "scratch"},
    # the r4 speed ceiling: f32 everything, exec re-solve off
    "fast_f32": {"exec_solve_dtype": "float32"},
    # r3 production policy: f64 bulk pipeline, f32 solve, exec off
    "balanced": {"pipeline_dtype": "float64",
                 "exec_solve_dtype": "float32"},
    # f64 bulk pipeline (mirror-precision AIME node data) + f64 scratch
    # exec re-solve: predicted to close BOTH drift seeds (demo_2/3's) at once
    "exec_bal": {"pipeline_dtype": "float64",
                 "exec_solve_dtype": "float64",
                 "exec_resolve_mode": "scratch"},
    # 'scratch' semantics computed as native C++ on the host CPU
    # (mind_tpu/native) — the production-speed version of exec_bal
    "native": {"exec_resolve_mode": "native"},
    "native_bal": {"pipeline_dtype": "float64",
                   "exec_resolve_mode": "native"},
    # strict: pure f64 solver (matches the mirror's to ~1e-12)
    "strict": {"solve_dtype": "float64"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", default="1,2,3,4")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--report", default=None)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["free", "resync", "playback"])
    ap.add_argument("--free-modes", default="production,fast_f32,strict",
                    help=f"comma list from {sorted(FREE_MODES)}")
    args = ap.parse_args()

    from mind_tpu.config import SimConfig
    from mind_tpu.parity.runner import (
        run_parity_demo,
        run_parity_demo_resync,
        run_parity_episode_playback,
    )

    def show(r):
        print({k: (round(v, 8) if isinstance(v, float) else v)
               for k, v in r.items() if k != "records"}, flush=True)

    play_rows, sync_rows = [], []
    free_rows = {}  # mode label -> rows
    demos = [f"demo_{d.strip()}" for d in args.demos.split(",")]
    free_modes = [m.strip() for m in args.free_modes.split(",") if m.strip()]
    for m in free_modes:
        assert m in FREE_MODES, f"unknown free mode {m!r}"

    if "playback" not in args.skip:
        for demo in demos:
            print(f"=== {demo} episode playback (benched path, "
                  f"{args.steps} steps) ===", flush=True)
            r = run_parity_episode_playback(demo, args.steps)
            r.pop("records")
            play_rows.append(r)
            show(r)

    if "resync" not in args.skip:
        for demo in demos:
            print(f"=== {demo} resynced per-cycle ({args.steps} steps) ===",
                  flush=True)
            s = run_parity_demo_resync(demo, args.steps)
            sync_rows.append(s)
            show(s)

    if "free" not in args.skip:
        for demo in demos:
            cfg = SimConfig.from_json(f"configs/{demo}.json",
                                      data_root="/root/reference/data")
            enable_ticks = int(round(cfg.cl_agents[0].enable_timestep
                                     / cfg.sim_step))
            free_steps = enable_ticks + CL_STEPS
            for mode in free_modes:
                print(f"=== {demo} free-run, {mode} ===", flush=True)
                r = run_parity_demo(demo, free_steps, **FREE_MODES[mode])
                free_rows.setdefault(mode, []).append(r)
                show(r)

    if play_rows:
        ok = all(p["mean_cycle_dev"] <= 1e-3 and p["ok_mismatches"] == 0
                 for p in play_rows)
        print(f"\nBENCHED-PATH playback {'PASS' if ok else 'FAIL'} "
              f"(worst mean {max(p['mean_cycle_dev'] for p in play_rows):.2e})")
    if sync_rows:
        ok = all(s["mean_cycle_dev"] <= 1e-3 and s["ok_mismatches"] == 0
                 for s in sync_rows)
        print(f"RESYNCED {'PASS' if ok else 'FAIL'} "
              f"(worst mean {max(s['mean_cycle_dev'] for s in sync_rows):.2e})")
    for mode, rows in free_rows.items():
        ok = all(r["max_dev_cl"] <= 1e-3 for r in rows)
        print(f"FREE-RUN {mode} {'PASS' if ok else 'FAIL'} "
              f"(max {max(r['max_dev_cl'] for r in rows):.2e})")

    if args.report:
        write_report(args.report, play_rows, sync_rows, free_rows, args.steps)


FREE_MODE_LABELS = {
    "production": "production (f32 + f64 polish exec)",
    "polish": "f64 polish exec",
    "scratch": "f64 scratch exec",
    "fast_f32": "fast f32 (exec off)",
    "balanced": "balanced (pipe f64)",
    "strict": "strict f64",
}


def write_report(path, play_rows, sync_rows, free_rows, steps):
    lines = [
        "# PARITY_TRACES — end-to-end trajectory parity",
        "",
        "Production planner configuration (bf16 network, production",
        "rel_tol) vs the float64 host mirror with reference control flow",
        "(`mind_tpu.parity.HostRefPlanner`), shared network weights, on the",
        "bundled demos. Deviation = ego position distance. All sections run",
        "on the real TPU chip.",
        "",
        f"## 1. BENCHED path: fused-episode playback, {steps}-step horizon",
        "",
        "The exact configuration the bench times (one device program per",
        "episode) replayed per cycle against the mirror from identical",
        "inputs. Criterion: per-cycle MEAN <= 1e-3, zero ok flips.",
        "",
        "| demo | plans | ok flips | max cycle dev (m) | mean cycle dev (m)"
        " | max ctrl dev | mirror wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for p in play_rows:
        lines.append(
            f"| {p['demo']} | {p['plans_compared']} | {p['ok_mismatches']} |"
            f" {p['max_cycle_dev']:.2e} | {p['mean_cycle_dev']:.2e} |"
            f" {p['max_ctrl_dev']:.2e} | {p['mirror_wall_s']:.0f} |")
    lines += [
        "",
        f"## 2. Staged path: resynced per-cycle, {steps}-step horizon",
        "",
        "One closed-loop sim driven by the staged production planner; the",
        "mirror plans in tandem from IDENTICAL inputs every 10 Hz cycle.",
        "",
        "| demo | plans compared | ok flips | max cycle dev (m) |"
        " mean cycle dev (m) | max ctrl dev | wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for s in sync_rows:
        lines.append(
            f"| {s['demo']} | {s['plans_compared']} | {s['ok_mismatches']} |"
            f" {s['max_cycle_dev']:.2e} | {s['mean_cycle_dev']:.2e} |"
            f" {s['max_ctrl_dev']:.2e} | {s['wall_s']:.0f} |")
    lines += [
        "",
        f"## 3. Free-run lockstep ({CL_STEPS} closed-loop steps past enable)",
        "",
        "Two independent closed-loop sims; whole-trajectory deviation,",
        "measured per dtype policy (see README 'Precision policy' and",
        "`scripts/parity_run.py:FREE_MODES`).",
        "",
        "| demo | mode | closed-loop steps | max dev (m) | mean dev (m) |"
        " final dev (m) |",
        "|---|---|---|---|---|---|",
    ]
    for mode, rows in free_rows.items():
        label = FREE_MODE_LABELS.get(mode, mode)
        for r in rows:
            lines.append(
                f"| {r['demo']} | {label} | {r['closed_loop_steps']} |"
                f" {r['max_dev_cl']:.2e} | {r['mean_dev_cl']:.2e} |"
                f" {r['final_dev']:.2e} |")

    verdicts = []
    if play_rows:
        ok = all(p["mean_cycle_dev"] <= 1e-3 and p["ok_mismatches"] == 0
                 for p in play_rows)
        verdicts.append(
            f"benched-path playback {'PASS' if ok else 'FAIL'} (worst mean "
            f"{max(p['mean_cycle_dev'] for p in play_rows):.2e})")
    if sync_rows:
        ok = all(s["mean_cycle_dev"] <= 1e-3 and s["ok_mismatches"] == 0
                 for s in sync_rows)
        verdicts.append(
            f"resynced {'PASS' if ok else 'FAIL'} (worst mean "
            f"{max(s['mean_cycle_dev'] for s in sync_rows):.2e})")
    for mode, rows in free_rows.items():
        ok = all(r["max_dev_cl"] <= 1e-3 for r in rows)
        verdicts.append(
            f"free-run {mode} {'PASS' if ok else 'FAIL'} (max "
            f"{max(r['max_dev_cl'] for r in rows):.2e})")
    lines += [
        "",
        "**Result: " + "; ".join(verdicts) + "; target <= 1e-3.**",
        "",
        "Notes:",
        "- The reference itself (torch+theano+av2) cannot run here and its",
        "  checkpoints are stripped, so the comparison target is an",
        "  independent float64 numpy implementation following the",
        "  reference's control flow (reference planner.py:104-145,",
        "  scenario_tree.py:38-108, solver.py:80-240), sharing only the",
        "  prediction network function (measured bitwise-identical across",
        "  compilation contexts on TPU).",
        "- The quantities that carry the discrete prune/merge/branch and",
        "  tree-selection decisions (mode probabilities, covariance",
        "  accumulation, renormalization, selection cost) run in float64",
        "  regardless of `PlannerConfig.pipeline_dtype`, so the production",
        "  path takes the same discrete decisions as the mirror; per-cycle",
        "  deviation is the f32 bulk pipeline + iLQR's smooth residual.",
        "- Free-run deviation amplifies per-cycle seeds exponentially",
        "  (Lyapunov growth of the coupled planner/vehicle loop); the",
        "  strict f64-solve mode shrinks the seeds to solver-ULP level.",
    ]
    short = [s for s in sync_rows if s["plans_compared"] < s.get("plans", 60)]
    agreed = [s for s in short if s["ok_mismatches"] == 0]
    flipped = [s for s in short if s["ok_mismatches"] > 0]
    if agreed:
        names = ", ".join(s["demo"] for s in agreed)
        lines += [
            f"- On {names} the resynced run ended early: near the end of",
            "  the scenario the production planner AND the f64 mirror",
            "  AGREED the plan fails (zero ok flips — an implementation",
            "  divergence would flip one side only), and the sim terminates",
            "  on plan failure exactly like the reference",
            "  (simulator.py:85-89).",
        ]
    if flipped:
        names = ", ".join(f"{s['demo']} ({s['ok_mismatches']} flips)"
                          for s in flipped)
        lines += [
            f"- On {names} the resynced run ended early WITH plan-success",
            "  flips: the two sides disagreed on plan feasibility. This is",
            "  a parity defect and is counted in the FAIL verdict above.",
        ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
