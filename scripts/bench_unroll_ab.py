"""A/B the fused-episode throughput under a solver scheduling change.

Usage: python scripts/bench_unroll_ab.py <label> [demos...]

Measures the fused whole-episode program (sim/episode.run_episode) on the
given demos (default demo_1 demo_2), one untimed warm run then the median of
3 timed runs, and appends {label: {demo: steps_per_s}} to
outputs/unroll_ab.json. Run once per code state to build the before/after
table (VERDICT round-4 ask #7: a measured fused-episode perf win).
"""
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _build_sim(demo):
    from mind_tpu.config import SimConfig
    from mind_tpu.sim.simulator import Simulator

    cfg = SimConfig.from_json(os.path.join(ROOT, f"configs/{demo}.json"),
                              data_root="/root/reference/data")
    cfg.render = False
    sim = Simulator(cfg)
    sim.init_sim()
    return sim


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    label = sys.argv[1]
    demos = sys.argv[2:] or ["demo_1", "demo_2"]

    from mind_tpu.sim.episode import build_episode_inputs, run_episode

    out_path = os.path.join(ROOT, "outputs", "unroll_ab.json")
    table = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            table = json.load(f)

    row = {}
    sims = {d: _build_sim(d) for d in demos}
    run_episode(sims[demos[0]])  # absorb compile
    for d in demos:
        sim = sims[d]
        inp = build_episode_inputs(sim)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run_episode(sim, None, inp)
            walls.append(time.perf_counter() - t0)
        assert res.fail_cycle == -1, f"{d}: plan failure {res.fail_cycle}"
        sps = len(res.ego_states) / statistics.median(walls)
        row[d] = {"steps_per_s": round(sps, 2),
                  "walls_s": [round(w, 2) for w in walls]}
        print(f"{label} {d}: {row[d]}", flush=True)
    table[label] = row
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps({"label": label, "result": row}))


if __name__ == "__main__":
    main()
