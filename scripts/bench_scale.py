"""Scale bench: 1024 parallel branching-tree contingency solves (trees/s).

BASELINE.json's scale config names "1024 parallel scenario trees with full
iLQR sharded over v5e-8". On this box one real chip is available, so the
bench solves the full 1024-tree batch on a 1-device mesh (the same
parallel_tree_solve path the 8-device virtual-mesh test
tests/test_scale.py::test_parallel_tree_solve_1024_branching shards); per-chip
throughput multiplies across a v5e-8 slice since trees are embarrassingly
data-parallel (only the final gather crosses ICI).

Usage: python scripts/bench_scale.py [--trees 1024] [--json-out outputs/scale_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trees", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json-out", default="outputs/scale_bench.json")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from jax.sharding import Mesh
    from mind_tpu.parallel.scale import make_tree_batch, parallel_tree_solve
    from mind_tpu.planner.ilqr import ILQRConfig

    n_dev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("data",))
    topo, nodes, params, x0 = make_tree_batch(
        n_trees=args.trees, n_nodes=24, max_nodes=32, max_levels=24,
        max_width=4, n_exo=4, branching=True)
    cfg = ILQRConfig(max_iterations=args.iters)

    # warm-up (compile)
    us, J = parallel_tree_solve(mesh, topo, nodes, params, x0, ilqr_cfg=cfg)
    jax.block_until_ready(J)
    assert np.isfinite(np.asarray(J)).all()

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        us, J = parallel_tree_solve(mesh, topo, nodes, params, x0,
                                    ilqr_cfg=cfg)
        jax.block_until_ready(J)
    wall = (time.perf_counter() - t0) / n_rep

    row = {
        "metric": f"{args.trees} branching contingency-tree iLQR solves "
                  f"({args.iters} iters, {n_dev}x {jax.devices()[0].device_kind})",
        "value": round(args.trees / wall, 1),
        "unit": "trees/s",
        "detail": {
            "wall_s_per_batch": round(wall, 3),
            "n_trees": args.trees,
            "max_nodes": 32,
            "ilqr_iters": args.iters,
            "devices": n_dev,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(row))
    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
