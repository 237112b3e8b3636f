"""Stage-by-stage playback divergence diagnostic (VERDICT r4 #4).

For one demo, replays the fused episode per cycle against BOTH the staged
production planner and the f64 reference-control-flow mirror from identical
inputs, and dumps — for the worst cycles by 5-tick rollout deviation — every
decision stage: scenario-tree structure (node count, per-node parent /
duration / normalized probability), the mirror's prune / merge / branch-time
margins per expansion round, per-tree selection costs and the selection
margin on both sides, and the executed-control deviation. This is the tool
that names WHICH boundary emits cm-scale cycles (demo_3 being the historical
outlier — PARITY_TRACES §1).

Usage: python scripts/diag_playback.py [--demo demo_3] [--steps 500]
           [--worst 5] [--out outputs/demo3_diag.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", default="demo_3")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--worst", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mind_tpu.parity.runner import run_playback_diagnostic

    out = run_playback_diagnostic(args.demo, args.steps, worst_k=args.worst)

    devs = [r["cycle_dev"] for r in out["cycles"] if "cycle_dev" in r]
    print(f"{args.demo}: {len(devs)} cycles compared, "
          f"max dev {max(devs):.2e}, mean {sum(devs) / len(devs):.2e}")
    for r in out["worst"]:
        print(f"-- cycle {r['cycle']}: dev {r['cycle_dev']:.2e}, "
              f"ctrl dev {r['ctrl_dev']:.2e}, "
              f"trees {r['n_trees_dev']}/{r['n_trees_host']}, "
              f"end nodes {r['n_end_nodes_dev']}/{r['n_end_nodes_host']}, "
              f"best {r['best_dev']}/{r['best_host']}, "
              f"sel margin {r['selection_margin_dev']:.2e}/"
              f"{r['selection_margin_host']:.2e}")

    path = args.out or f"outputs/{args.demo}_diag.json"
    os.makedirs(os.path.dirname(os.path.join(root, path)), exist_ok=True)
    with open(os.path.join(root, path), "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("wrote", path)


if __name__ == "__main__":
    main()
