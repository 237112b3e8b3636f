"""Train demo prediction weights on the four bundled AV2 scenarios.

The reference's trained checkpoints are stripped from its snapshot
(.MISSING_LARGE_BLOBS), so this produces a working substitute: the scene
predictor fit to the bundled scenarios' logged futures (winner-takes-all
scene loss, models/train.py). The resulting orbax checkpoint under
weights/scene_pred_demo/ is picked up by planner configs automatically.

Usage: python scripts/train_demo_weights.py [--steps 600] [--lr 3e-4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--data-root", default="/root/reference/data")
    ap.add_argument("--out", default="weights/scene_pred_demo")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mind_tpu.config import SimConfig, PlannerConfig
    from mind_tpu.data.semantic_map import (SemanticMap, build_lane_graph,
                                            lane_graph_features)
    from mind_tpu.data.loader import ArgoAgentLoader
    from mind_tpu.models import init_scene_pred
    from mind_tpu.models.train import make_train_step
    from mind_tpu.models.data_pipeline import scenario_to_batch, stack_batches
    from mind_tpu.models.checkpoint import save_params
    from mind_tpu.planner.scene_prep import LaneGraphStatic, TargetLaneStatic
    from mind_tpu.planner.planner import type_onehot

    cfg = PlannerConfig()
    batches = []
    for d in range(1, 5):
        sim_cfg = SimConfig.from_json(f"configs/demo_{d}.json",
                                      data_root=args.data_root)
        smp = SemanticMap().load_from_argo2(sim_cfg.map_path)
        bundle = ArgoAgentLoader(sim_cfg.scenario_path).get_trajs_info(smp)

        graph = build_lane_graph(smp.map_data, np.zeros(2), np.eye(2))
        feats = lane_graph_features(graph)
        L = cfg.max_lanes
        node_feats = np.zeros((L, 10, 16), np.float32)
        node_feats[:len(feats)] = feats
        anchors = np.zeros((L, 2), np.float32)
        anchors[:len(feats)] = graph["lane_ctrs"]
        vecs = np.tile(np.array([1.0, 0.0], np.float32), (L, 1))
        vecs[:len(feats)] = graph["lane_vecs"]
        lane_static = LaneGraphStatic(
            jnp.asarray(node_feats), jnp.asarray(anchors), jnp.asarray(vecs),
            jnp.asarray(np.arange(L) < len(feats)))
        lane = max(smp.semantic_lanes.values(), key=len)
        P = 256
        tp = np.full((P, 2), 1e6, np.float32)
        tp[:len(lane)] = lane
        tgt_static = TargetLaneStatic(jnp.asarray(tp),
                                      jnp.zeros((P, 12), jnp.float32),
                                      jnp.asarray(np.arange(P) < len(lane)),
                                      jnp.int32(len(lane)))
        types = np.stack(
            [type_onehot(t[0]) for t in bundle.types]
            + [np.zeros(7, np.float32)] * (cfg.max_actors - len(bundle)))
        batches.append(scenario_to_batch(bundle, lane_static, tgt_static,
                                         cfg, types))
        print(f"demo_{d}: batch built ({len(bundle)} tracks)", flush=True)

    batch = stack_batches(batches)

    _, params, _ = init_scene_pred(cfg.net, cfg.max_actors, cfg.max_lanes,
                                   seed=cfg.seed)
    optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(params)
    _, train_step = make_train_step(cfg.net, optimizer)
    step = jax.jit(train_step)

    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, batch)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = save_params(args.out, params, step=args.steps)
    print("saved:", out, flush=True)


if __name__ == "__main__":
    main()
