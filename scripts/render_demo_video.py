"""Render a full-horizon demo video (the reference's user-visible
deliverable — reference simulator.py:109-132 assembles a whole .mov per
demo run).

Runs the host-loop simulator with rendering enabled for the full 500-step
horizon, then assembles the committed artifact. The default figsize is 8
(800x800 px) instead of the interactive default 12: at MJPEG quality 85 a
500-frame 1200x1200 video weighs ~43 MB, which blows the repo size budget;
800x800 lands under ~20 MB and stays legible (this is the documented
size-budget decision — pass --figsize 12 for the full-resolution render).

Usage: python scripts/render_demo_video.py [--demo 1] [--max-steps 500]
           [--figsize 8] [--out outputs/demo_1_full.avi]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", type=int, default=1)
    ap.add_argument("--max-steps", type=int, default=500)
    ap.add_argument("--figsize", type=int, default=8)
    ap.add_argument("--data-root", default="/root/reference/data")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mind_tpu.config import SimConfig
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.viz.render import render_frames_to_video
    from mind_tpu.viz.video import probe_avi

    cfg = SimConfig.from_json(os.path.join(ROOT, f"configs/demo_{args.demo}.json"),
                              data_root=args.data_root)
    cfg.render = True
    sim = Simulator(cfg, max_steps=args.max_steps)
    sim.init_sim()
    metrics = sim.run_sim()
    print("sim metrics:", metrics, flush=True)

    video = render_frames_to_video(sim, figsize=args.figsize)
    out = args.out or os.path.join(ROOT, "outputs",
                                   f"demo_{args.demo}_full.avi")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.abspath(video) != os.path.abspath(out):
        shutil.move(video, out)
    info = probe_avi(out)
    print("video:", out, info, flush=True)
    assert info.get("jpeg_ok", False) and info.get("frames", 0) >= args.max_steps - 1, info


if __name__ == "__main__":
    main()
