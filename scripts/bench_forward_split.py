"""Bisect the scene-prediction forward: per-submodule device time at the
production batch shape (B=8, A=48, L=80), plus XLA-counted FLOPs of the
pallas-free reference path (pallas kernel FLOPs are opaque to XLA cost
analysis, so MFU must be computed against the reference-path count).

Usage: python scripts/bench_forward_split.py [--pallas|--no-pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def flops_of(fn, *args):
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--compute-dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mind_tpu.config import NetConfig
    from mind_tpu.models.scene_pred import (
        ActorNet, LaneNet, FusionNet, SceneDecoder, ScenePredNet,
        init_scene_pred, make_batched_apply)
    import dataclasses

    cfg = NetConfig(compute_dtype=args.compute_dtype,
                    use_pallas_fusion=not args.no_pallas)
    A, L, B = 48, 80, 8
    N = A + L
    To = cfg.obs_len - 2
    f32 = jnp.float32
    model, params, batched_apply = init_scene_pred(cfg, A, L, seed=0)

    inputs = (
        jnp.zeros((B, A, To, cfg.in_actor), f32),
        jnp.ones((B, A), bool),
        jnp.zeros((B, L, 10, cfg.in_lane), f32),
        jnp.ones((B, L), bool),
        jnp.zeros((B, N, N, cfg.d_rpe_in), f32),
        jnp.zeros((B, 10, cfg.in_lane), f32),
        jnp.zeros((B, 20), f32),
    )

    full = jax.jit(batched_apply)
    t_full = timed(full, params, *inputs)

    # submodule timings: bind the trained params of each submodule
    cdt = jnp.dtype(cfg.compute_dtype)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(cdt)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    p = params["params"]

    actor_net = ActorNet(cfg.d_actor, cfg.n_fpn_scale)
    ap_ = {"params": p["ActorNet_0"]}
    f_actor = jax.jit(lambda pp, x: jax.vmap(
        lambda xi: actor_net.apply(pp, xi))(x))
    x_act = cast(inputs[0])
    t_actor = timed(f_actor, cast(ap_), x_act)

    lane_net = LaneNet(cfg.d_lane)
    lp = {"params": p["LaneNet_0"]}
    f_lane = jax.jit(lambda pp, x: jax.vmap(
        lambda xi: lane_net.apply(pp, xi))(x))
    t_lane = timed(f_lane, cast(lp), cast(inputs[2]))

    fusion = FusionNet(cfg)
    fp = {"params": p["FusionNet_0"]}
    af = jnp.zeros((B, A, cfg.d_actor), cdt)
    lf = jnp.zeros((B, L, cfg.d_lane), cdt)
    rpe = cast(inputs[4])
    tmask = jnp.ones((B, N + 1), bool)
    f_fuse = jax.jit(lambda pp, a, l, r, m: jax.vmap(
        lambda ai, li, ri, mi: fusion.apply(pp, ai, li, ri, mi))(a, l, r, m))
    t_fuse = timed(f_fuse, cast(fp), af, lf, rpe, tmask)

    dec = SceneDecoder(cfg)
    dp = {"params": p["SceneDecoder_0"]}
    ctx = jnp.zeros((B, cfg.d_embed), cdt)
    aout = jnp.zeros((B, A, cfg.d_embed), cdt)
    tf = jnp.zeros((B, cfg.d_embed), cdt)
    trpe = cast(inputs[6])
    f_dec = jax.jit(lambda pp, c, a, t, r: jax.vmap(
        lambda ci, ai, ti, ri: dec.apply(pp, ci, ai, ti, ri))(c, a, t, r))
    t_dec = timed(f_dec, cast(dp), ctx, aout, tf, trpe)

    # XLA-countable FLOPs: the pallas-free reference path
    ref_cfg = dataclasses.replace(cfg, use_pallas_fusion=False)
    ref_apply = make_batched_apply(ScenePredNet(ref_cfg), ref_cfg)
    flops = flops_of(ref_apply, params, *inputs)
    t_ref = timed(jax.jit(ref_apply), params, *inputs)

    out = {
        "full_fwd_ms": round(t_full * 1e3, 2),
        "ref_xla_fwd_ms": round(t_ref * 1e3, 2),
        "actor_net_ms": round(t_actor * 1e3, 2),
        "lane_net_ms": round(t_lane * 1e3, 2),
        "fusion_net_ms": round(t_fuse * 1e3, 2),
        "decoder_ms": round(t_dec * 1e3, 2),
        "ref_flops": flops,
        "mfu_ref_path": round(flops / t_ref / 197e12, 4),
        "backend": jax.default_backend(),
        "pallas": not args.no_pallas,
        "compute_dtype": args.compute_dtype,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
