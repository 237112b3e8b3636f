"""64-way Monte-Carlo episode sweep: perturbed-ego closed loops on device.

Runs `run_episode_monte_carlo` (chunked + segmented device programs, see
sim/episode.py) on one scenario and writes a JSON artifact with throughput,
survival, and per-chunk wall clocks. This is the BASELINE.json "64-way
Monte-Carlo rollout with perturbed agent initial states" scale config.

Usage: python scripts/bench_mc.py [--k 64] [--chunk 4] [--seg 10]
       [--demo demo_1] [--out outputs/mc64.json]
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
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--seg", type=int, default=10)
    ap.add_argument("--demo", default="demo_1")
    ap.add_argument("--out", default="outputs/mc64.json")
    ap.add_argument("--horizon", type=int, default=None,
                    help="sim ticks (default: the config's full horizon)")
    ap.add_argument("--tiny-net", action="store_true",
                    help="1-layer seeded network — smoke tests only")
    args = ap.parse_args()

    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mind_tpu.config import (SimConfig, planner_config_for_demo)
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.episode import run_episode_monte_carlo

    cfg = SimConfig.from_json(os.path.join(root, f"configs/{args.demo}.json"),
                              data_root=DATA_ROOT)
    cfg.render = False
    pcfg = None
    if args.tiny_net:
        pcfg = planner_config_for_demo(args.demo)
        pcfg.net.n_scene_layer = 1
        pcfg.net.n_fpn_scale = 2
        pcfg.ckpt_path = None
    sim = Simulator(cfg, planner_cfg=pcfg, max_steps=args.horizon)
    sim.init_sim()

    # compile/cache-load on one chunk's worth of copies (untimed prefix)
    t0 = time.perf_counter()
    run_episode_monte_carlo(sim, args.chunk, chunk=args.chunk,
                            seg_cycles=args.seg, horizon=args.horizon)
    compile_s = time.perf_counter() - t0

    walls = []
    t0 = time.perf_counter()
    res = run_episode_monte_carlo(sim, args.k, chunk=args.chunk,
                                  seg_cycles=args.seg, horizon=args.horizon,
                                  chunk_walls=walls)
    wall = time.perf_counter() - t0
    total = sum(len(r.ego_states) for r in res)
    baseline = 500.0 / 600.0
    out = {
        "demo": args.demo,
        "copies": args.k,
        "chunk": args.chunk,
        "seg_cycles": args.seg,
        "survived": sum(1 for r in res if r.fail_cycle < 0),
        "fail_cycles": sorted(r.fail_cycle for r in res if r.fail_cycle >= 0),
        "total_steps": total,
        "eff_steps_per_s": round(total / wall, 2),
        "vs_baseline_0p83": round(total / wall / baseline, 2),
        "wall_s": round(wall, 2),
        "compile_wall_s": round(compile_s, 2),
        "chunk_walls_s": [w for _, _, w in walls],
        "backend": jax.default_backend(),
    }
    # cold/warm split: the first timed chunk still pays executable-load +
    # scheduling cost the steady state does not; the warm rate over the
    # remaining chunks is the steady-state throughput headline, with the
    # cold wall disclosed alongside (VERDICT r4 #3)
    if len(walls) > 1:
        warm_wall = sum(w for _, _, w in walls[1:])
        warm_steps = sum(len(r.ego_states) for r in res[walls[0][1]:])
        out["cold_first_chunk_s"] = walls[0][2]
        out["warm_steps_per_s"] = round(warm_steps / warm_wall, 2)
        out["warm_vs_baseline_0p83"] = round(
            warm_steps / warm_wall / baseline, 2)
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(os.path.join(root, args.out)), exist_ok=True)
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
