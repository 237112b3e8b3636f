"""Decision benchmark: Pallas fused edge-attention vs plain XLA fusion.

Times the full ScenePredNet batched forward at the production planner shapes
(config.py max_actors=48 / max_lanes=80 -> 129 tokens incl. cls) with
`use_pallas_fusion` on and off, on the current backend. The result decides
the `NetConfig.use_pallas_fusion` default (VERDICT r1: a flagship kernel the
benchmark never runs is a claim, not a capability).

Usage: python scripts/bench_fusion.py [--batch 6] [--reps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_forward(use_pallas: bool, batch: int, reps: int):
    import jax
    import jax.numpy as jnp
    from mind_tpu.config import NetConfig, PlannerConfig
    from mind_tpu.models import init_scene_pred

    pcfg = PlannerConfig()
    cfg = NetConfig(use_pallas_fusion=use_pallas)
    A, L = pcfg.max_actors, pcfg.max_lanes
    model, params, batched_apply = init_scene_pred(cfg, A, L, seed=0)

    B = batch
    To = cfg.obs_len - 2
    N = A + L
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    args = (
        params,
        jax.random.normal(ks[0], (B, A, To, cfg.in_actor)),
        jnp.ones((B, A), bool),
        jax.random.normal(ks[1], (B, L, 10, cfg.in_lane)),
        jnp.ones((B, L), bool),
        jax.random.normal(ks[2], (B, N, N, cfg.d_rpe_in)),
        jax.random.normal(ks[3], (B, 10, cfg.in_lane)),
        jnp.zeros((B, 20)),
    )
    fn = jax.jit(batched_apply)
    out = fn(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    return ms, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert jax.default_backend() != "cpu", (
        "TPU claim unavailable (stale claim from a recently killed client?) "
        "- rerun in a few minutes; pallas compiled kernels need the TPU")
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    ms_xla, out_xla = time_forward(False, args.batch, args.reps)
    ms_pal, out_pal = time_forward(True, args.batch, args.reps)

    reg_diff = float(np.max(np.abs(
        np.asarray(out_xla[1], np.float32) - np.asarray(out_pal[1], np.float32))))
    print(json.dumps({
        "backend": jax.default_backend(),
        "batch": args.batch,
        "xla_ms": round(ms_xla, 3),
        "pallas_ms": round(ms_pal, 3),
        "speedup": round(ms_xla / ms_pal, 3),
        "max_reg_diff": reg_diff,
    }))


if __name__ == "__main__":
    main()
