"""Benchmark: demo_1 closed-loop simulation throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~10-minute CPU wall clock for the 500-step demo_1
rollout (README.md:58) => 500/600 ≈ 0.833 steps/s. vs_baseline is our
steps/s over that.

Two execution modes are measured with trained weights:
- fused-episode (headline): the whole 500-step closed loop as ONE device
  program (sim/episode.py) — a single host sync per episode;
- host-loop (detail): the reference-shaped Simulator loop dispatching one
  fused plan program per 10 Hz trigger.

Compilation/cache-load is excluded: the episode is timed on its second call;
the host loop warms up with a few plan cycles, then rewinds to t=0 via the
sim-state checkpoint and times the full run with compiled programs.
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

    # fused-episode mode: one device program for the whole closed loop
    from mind_tpu.sim.episode import run_episode

    epi_sim = Simulator(cfg)
    epi_sim.init_sim()
    res = run_episode(epi_sim)  # compile + warm caches
    assert res.fail_cycle == -1, f"episode plan failure at {res.fail_cycle}"
    t0 = time.perf_counter()
    res = run_episode(epi_sim)
    epi_wall = time.perf_counter() - t0
    epi_steps_per_sec = len(res.ego_states) / epi_wall

    result = {
        "metric": "demo_1 closed-loop sim throughput "
                  "(500 steps, TPU v5e-1, fused episode)",
        "value": round(epi_steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(epi_steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        "detail": {
            "episode_wall_s": round(epi_wall, 2),
            "episode_plan_calls": res.plan_calls,
            "host_loop_steps_per_sec": round(steps_per_sec, 3),
            "host_loop_vs_baseline": round(
                steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            "host_loop_wall_s": round(wall, 2),
            "host_loop_plan_calls": metrics["plan_calls"],
            "phase_mean_ms": {k: v["mean_ms"] for k, v in phases.items()},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
