"""Benchmark: demo_1 closed-loop simulation throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~10-minute CPU wall clock for the 500-step demo_1
rollout (README.md:58) => 500/600 ≈ 0.833 steps/s. vs_baseline is our
steps/s over that.

Compilation/cache-load is excluded by a warm-up phase (a few plan cycles),
after which the simulation state rewinds to t=0 via the sim-state checkpoint
and the full 500-step run is timed with the same compiled planner.
"""

import json
import os
import time


BASELINE_STEPS_PER_SEC = 500.0 / 600.0


def main():
    import jax

    # persistent compile cache: TPU compiles over the tunnel run minutes;
    # cached executables bring warm starts down to seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from mind_tpu.config import SimConfig
    from mind_tpu.sim.simulator import Simulator
    from mind_tpu.sim.state_io import save_sim_state, load_sim_state
    from mind_tpu.planner.planner import ObsBuffer

    cfg = SimConfig.from_json(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs/demo_1.json"),
        data_root="/root/reference/data")
    cfg.render = False

    sim = Simulator(cfg)
    sim.init_sim()
    av = next(a for a in sim.agents if a.id == "AV")
    av.planner.export_trees = False

    # snapshot t=0, then warm up the compiled programs with a few plans
    snap = "/tmp/mind_tpu_bench_t0.npz"
    save_sim_state(sim, snap)
    av.set_enable_timestep(0.0)
    sim.sim_horizon = 12
    sim.run_sim()

    # rewind and run the full scenario with warm programs
    load_sim_state(sim, snap)
    av.set_enable_timestep(4.0)
    av.is_enable = False
    av.last_pl_tri = None
    av.planner.obs_buffer = ObsBuffer(av.planner.cfg.max_actors,
                                      origin=av.planner.origin)
    av.planner.metrics.timer.reset()
    sim.sim_horizon = cfg.sim_horizon

    t0 = time.perf_counter()
    metrics = sim.run_sim()
    wall = time.perf_counter() - t0

    steps_per_sec = metrics["ticks"] / wall
    phases = av.planner.metrics.timer.summary()
    result = {
        "metric": "demo_1 closed-loop sim throughput (500 steps, TPU v5e-1)",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        "detail": {
            "ticks": metrics["ticks"],
            "wall_s": round(wall, 2),
            "plan_calls": metrics["plan_calls"],
            "plan_time_s": round(metrics["plan_time_s"], 2),
            "phase_mean_ms": {k: v["mean_ms"] for k, v in phases.items()},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
