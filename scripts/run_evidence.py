"""Round-evidence pipeline: gate on TPU health, then run every pending
hardware-evidence task in sequence.

The axon-tunneled chip needs a LONG fully-idle recovery after a worker
fault, and repeated probing appears to reset that window (see
.claude/skills/verify/SKILL.md) — so this gate sleeps 40 idle minutes
between single subprocess-isolated probes instead of hammering it.

On a healthy probe it runs every step in STEPS, in order (dtype A/B, both
demo modes, bench, MC-64, strict pricing, 1024-tree scale, the full parity
suite, and the demo_1 video render) — or the `--only name,name` subset.

Each step is its own subprocess with a generous timeout; a step failure
sleeps out the worker recovery window before the next step.

Usage: python scripts/run_evidence.py [--max-wait-h 6] [--probe-now]
           [--only ab,bench,...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from mind_tpu.utils.tpu_health import probe_once  # noqa: E402

IDLE_SLEEP_S = 2400          # 40 min fully-idle between probes
RECOVERY_SLEEP_S = 600       # after a step failure, before the next step

STEPS = [
    ("ab", [sys.executable, "scripts/bench_exec_ab.py"], 2400, None),
    # two processes for the two demo modes: holding both executable sets in
    # one process pressures HBM (see bench.py's section isolation)
    ("demos_episode", [sys.executable, "scripts/run_all_demos.py",
                       "--mode", "episode"], 3600, None),
    ("demos_host", [sys.executable, "scripts/run_all_demos.py",
                    "--mode", "host", "--report", "DEMOS_TPU.md"],
     3600, None),
    ("bench", [sys.executable, "bench.py"], 4 * 3600, "BENCH_local.json"),
    # phase split + MFU as a committed, driver-independent artifact
    ("phases", [sys.executable, "bench.py", "--section", "phase_split",
                "--out", "outputs/phases.json"], 2400, None),
    ("mc64", [sys.executable, "scripts/bench_mc.py", "--k", "64",
              "--out", "outputs/mc64.json"], 3600, None),
    ("strict", [sys.executable, "scripts/bench_strict.py"], 3600, None),
    ("scale", [sys.executable, "scripts/bench_scale.py"], 2400, None),
    ("parity", [sys.executable, "scripts/parity_run.py",
                "--report", "PARITY_TRACES.md"], 3 * 3600, None),
    # regenerates the committed outputs/demo_1_full.avi at its documented
    # 800x800 size budget (NOT run_sim.py's interactive figsize-12 render)
    ("video", [sys.executable, "scripts/render_demo_video.py",
               "--demo", "1", "--out", "outputs/demo_1_full.avi"],
     3600, None),
]


def log(msg):
    print(f"[evidence {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-wait-h", type=float, default=6.0)
    ap.add_argument("--probe-now", action="store_true",
                    help="probe immediately instead of idling first")
    ap.add_argument("--only", default=None,
                    help="comma-separated step names to run (in STEPS order)")
    args = ap.parse_args()
    steps = STEPS
    if args.only:
        wanted = set(args.only.split(","))
        unknown = wanted - {n for n, *_ in STEPS}
        assert not unknown, f"unknown steps: {sorted(unknown)}"
        steps = [s for s in STEPS if s[0] in wanted]

    os.chdir(ROOT)
    t0 = time.time()
    attempt = 0
    while True:
        if attempt > 0 or not args.probe_now:
            log(f"idling {IDLE_SLEEP_S}s before probe {attempt + 1}")
            time.sleep(IDLE_SLEEP_S)
        attempt += 1
        if probe_once():
            log(f"probe {attempt} OK after {round(time.time() - t0)}s")
            break
        waited_h = (time.time() - t0) / 3600
        log(f"probe {attempt} failed ({waited_h:.1f}h waited)")
        if waited_h > args.max_wait_h:
            log("giving up: TPU never became healthy")
            sys.exit(2)

    results = {}
    for name, cmd, timeout_s, stdout_file in steps:
        log(f"step {name}: {' '.join(cmd)}")
        out = open(stdout_file, "w") if stdout_file else None
        try:
            p = subprocess.run(cmd, timeout=timeout_s,
                               stdout=out or None)
            results[name] = p.returncode
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        finally:
            if out:
                out.close()
        log(f"step {name} -> {results[name]}")
        if results[name] != 0:
            log(f"sleeping {RECOVERY_SLEEP_S}s (worker recovery)")
            time.sleep(RECOVERY_SLEEP_S)
    log("pipeline done: " + json.dumps(results))
    sys.exit(0 if all(v == 0 for v in results.values()) else 1)


if __name__ == "__main__":
    main()
