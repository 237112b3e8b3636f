"""CLI entry: run one closed-loop simulation (reference run_sim.py).

Usage: python run_sim.py --config configs/demo_1.json [--data-root PATH]
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description="mind_tpu closed-loop simulator")
    ap.add_argument("--config", required=True, help="sim config JSON")
    ap.add_argument("--data-root", default="/root/reference/data",
                    help="directory holding the AV2 scenario folders")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--no-render", action="store_true")
    args = ap.parse_args()

    import os
    import sys

    if not os.path.exists(args.config):
        sys.exit(f"error: config file not found: {args.config}")

    from mind_tpu.config import SimConfig
    from mind_tpu.sim.simulator import Simulator

    cfg = SimConfig.from_json(args.config, data_root=args.data_root)
    if args.no_render:
        cfg.render = False
    sim = Simulator(cfg, max_steps=args.max_steps)
    sim.init_sim()
    metrics = sim.run_sim()
    print("metrics:", metrics)
    if cfg.render:
        sim.render_video()


if __name__ == "__main__":
    main()
