"""CLI entry: run one closed-loop simulation (reference run_sim.py).

Usage: python run_sim.py --config configs/demo_1.json [--data-root PATH]
       [--episode]   # run the whole rollout as ONE device program
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description="mind_tpu closed-loop simulator")
    ap.add_argument("--config", required=True, help="sim config JSON")
    ap.add_argument("--data-root", default="/root/reference/data",
                    help="directory holding the AV2 scenario folders")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument("--episode", action="store_true",
                    help="run the fused-episode path (sim/episode.py): the "
                         "full closed loop as one device program, one host "
                         "sync per episode; implies --no-render")
    args = ap.parse_args()

    import os
    import sys

    if not os.path.exists(args.config):
        sys.exit(f"error: config file not found: {args.config}")

    from mind_tpu.config import SimConfig
    from mind_tpu.sim.simulator import Simulator

    cfg = SimConfig.from_json(args.config, data_root=args.data_root)
    if args.no_render or args.episode:
        cfg.render = False
    sim = Simulator(cfg, max_steps=args.max_steps)
    sim.init_sim()
    if args.episode:
        import time

        from mind_tpu.sim.episode import run_episode

        t0 = time.perf_counter()
        res = run_episode(sim, args.max_steps)
        wall = time.perf_counter() - t0
        print("metrics:", {
            "ticks": len(res.ego_states),
            "plan_calls": res.plan_calls,
            "fail_cycle": res.fail_cycle,
            "wall_time_s": wall,
        })
        return
    metrics = sim.run_sim()
    print("metrics:", metrics)
    if cfg.render:
        sim.render_video()


if __name__ == "__main__":
    main()
