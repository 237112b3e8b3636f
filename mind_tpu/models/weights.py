"""Torch checkpoint import: reference state_dict -> flax parameter tree.

The reference loads `torch.load(ckpt)['state_dict']` into its ScenePredNet
(planners/mind/planner.py:46-47). Both published checkpoints are stripped
from the snapshot (.MISSING_LARGE_BLOBS), so demo runs fall back to locally
trained weights — but the mapping below is complete and tested against the
reference torch network run live with random weights (tests/test_weights.py),
so a real checkpoint can be dropped in without code changes.

Layout conventions:
- torch Linear weight [out, in]      -> flax Dense kernel [in, out]   (.T)
- torch Conv1d weight [out, in, k]   -> flax Conv kernel  [k, in, out]
- torch LayerNorm/GroupNorm weight   -> flax scale
- torch MultiheadAttention packs q/k/v into in_proj_weight [3D, D]
  (rows 0:D = q, D:2D = k, 2D:3D = v); RelaFusionLayer's memory projection
  packs [edge, src, tar] into one Linear over the concatenated input
  (reference network.py:199), split here into wm_e/wm_s/wm_t column blocks.

All norms in mind_tpu use eps=1e-5 to match torch exactly.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np


def _t(w):
    return np.asarray(w).T


def _conv(w):  # [out, in, k] -> [k, in, out]
    return np.transpose(np.asarray(w), (2, 1, 0))


def _id(w):
    return np.asarray(w)


def build_torch_mapping(cfg) -> List[Tuple[Tuple[str, ...], Callable]]:
    """List of (flax_path_under_params, fn(state_dict) -> np.ndarray) covering
    every parameter of the reference ScenePredNet architecture
    (reference network.py:559-580 module tree)."""
    entries: List[Tuple[Tuple[str, ...], Callable]] = []

    def take(flax_path, torch_key, tr=_id):
        entries.append((tuple(flax_path), lambda sd, k=torch_key, t=tr: t(sd[k])))

    def lin(flax_prefix, torch_prefix):
        take(flax_prefix + ("kernel",), torch_prefix + ".weight", _t)
        take(flax_prefix + ("bias",), torch_prefix + ".bias")

    def norm(flax_prefix, torch_prefix):
        take(flax_prefix + ("scale",), torch_prefix + ".weight")
        take(flax_prefix + ("bias",), torch_prefix + ".bias")

    def mlp(flax_prefix, torch_prefix, n_layers):
        # torch nn.Sequential(Linear, LN, ReLU, [Linear, LN, ReLU]) indices
        for i in range(n_layers):
            lin(flax_prefix + (f"Dense_{i}",), f"{torch_prefix}.{3 * i}")
            norm(flax_prefix + (f"LayerNorm_{i}",), f"{torch_prefix}.{3 * i + 1}")

    def res1d(flax_prefix, torch_prefix, downsample):
        take(flax_prefix + ("GNConv1d_0", "Conv_0", "kernel"),
             torch_prefix + ".conv1.weight", _conv)
        norm(flax_prefix + ("GNConv1d_0", "GroupNorm_0"), torch_prefix + ".bn1")
        take(flax_prefix + ("Conv_0", "kernel"), torch_prefix + ".conv2.weight",
             _conv)
        norm(flax_prefix + ("GroupNorm_0",), torch_prefix + ".bn2")
        if downsample:
            take(flax_prefix + ("Conv_1", "kernel"),
                 torch_prefix + ".downsample.0.weight", _conv)
            norm(flax_prefix + ("GroupNorm_1",), torch_prefix + ".downsample.1")

    # --- ActorNet (reference network.py:12-61) ---
    nf = cfg.n_fpn_scale
    for s in range(nf):
        for j in range(2):
            res1d(("ActorNet_0", f"Res1d_{2 * s + j}"),
                  f"actor_net.groups.{s}.{j}",
                  downsample=(j == 0))  # first block of each group changes
                                        # channels (s=0) or strides (s>0)
    # laterals: flax creates GNConv1d_0 for the LAST scale first
    for i in range(nf):
        take(("ActorNet_0", f"GNConv1d_{i}", "Conv_0", "kernel"),
             f"actor_net.lateral.{nf - 1 - i}.conv.weight", _conv)
        norm(("ActorNet_0", f"GNConv1d_{i}", "GroupNorm_0"),
             f"actor_net.lateral.{nf - 1 - i}.norm")
    res1d(("ActorNet_0", f"Res1d_{2 * nf}"), "actor_net.output",
          downsample=False)

    # --- LaneNet (network.py:102-121) ---
    mlp(("LaneNet_0", "MLPBlock_0"), "lane_net.proj", 1)
    for a, agg in ((0, "aggre1"), (1, "aggre2")):
        pab = ("LaneNet_0", f"PointAggregateBlock_{a}")
        mlp(pab + ("MLPBlock_0",), f"lane_net.{agg}.fc1", 2)
        mlp(pab + ("MLPBlock_1",), f"lane_net.{agg}.fc2", 2)
        norm(pab + ("LayerNorm_0",), f"lane_net.{agg}.norm")

    # --- FusionNet (network.py:271-340) ---
    mlp(("FusionNet_0", "MLPBlock_0"), "fusion_net.proj_actor", 1)
    mlp(("FusionNet_0", "MLPBlock_1"), "fusion_net.proj_lane", 1)
    mlp(("FusionNet_0", "MLPBlock_2"), "fusion_net.proj_rpe_scene", 1)
    D, E = cfg.d_embed, cfg.d_rpe
    for i in range(cfg.n_scene_layer):
        fl = ("FusionNet_0", f"RelaFusionLayer_{i}")
        tp = f"fusion_net.fuse_scene.fusion.{i}"
        # memory projection over cat([edge, src, tar]) -> column blocks of
        # W.T. Note the repeat semantics (reference network.py:197-199):
        # src_x[i, j] = node[j] and tar_x[i, j] = node[i], while our twin's
        # wm_s multiplies node[i] (row axis) and wm_t node[j] — so the torch
        # 'tar' block feeds wm_s and 'src' feeds wm_t.
        take(fl + ("w_mem_edge",), f"{tp}.proj_memory.0.weight",
             lambda w: _t(w)[:E])
        take(fl + ("w_mem_src",), f"{tp}.proj_memory.0.weight",
             lambda w: _t(w)[E + D:])
        take(fl + ("w_mem_tar",), f"{tp}.proj_memory.0.weight",
             lambda w: _t(w)[E:E + D])
        take(fl + ("b_mem",), f"{tp}.proj_memory.0.bias")
        take(fl + ("ln_mem_scale",), f"{tp}.proj_memory.1.weight")
        take(fl + ("ln_mem_bias",), f"{tp}.proj_memory.1.bias")
        update_edge = cfg.update_edge and i != cfg.n_scene_layer - 1
        if update_edge:  # last layer's edge params exist in flax but are unused
            take(fl + ("w_edge",), f"{tp}.proj_edge.0.weight", _t)
            take(fl + ("b_edge",), f"{tp}.proj_edge.0.bias")
            take(fl + ("ln_e1_scale",), f"{tp}.proj_edge.1.weight")
            take(fl + ("ln_e1_bias",), f"{tp}.proj_edge.1.bias")
            take(fl + ("ln_e2_scale",), f"{tp}.norm_edge.weight")
            take(fl + ("ln_e2_bias",), f"{tp}.norm_edge.bias")
        # multi-head attention q/k/v/out
        for name, lo in (("w_q", 0), ("w_k", D), ("w_v", 2 * D)):
            take(fl + (name,), f"{tp}.multihead_attn.in_proj_weight",
                 lambda w, lo=lo: _t(np.asarray(w)[lo:lo + D]))
            take(fl + (name.replace("w", "b"),),
                 f"{tp}.multihead_attn.in_proj_bias",
                 lambda w, lo=lo: np.asarray(w)[lo:lo + D])
        take(fl + ("w_o",), f"{tp}.multihead_attn.out_proj.weight", _t)
        take(fl + ("b_o",), f"{tp}.multihead_attn.out_proj.bias")
        # feedforward + node norms
        lin(fl + ("Dense_0",), f"{tp}.linear1")
        lin(fl + ("Dense_1",), f"{tp}.linear2")
        norm(fl + ("LayerNorm_0",), f"{tp}.norm2")
        norm(fl + ("LayerNorm_1",), f"{tp}.norm3")

    # --- SceneDecoder (network.py:343-556) ---
    de = ("SceneDecoder_0",)
    mlp(de + ("MLPBlock_0",), "pred_scene.proj_rpe", 1)
    mlp(de + ("MLPBlock_1",), "pred_scene.proj_tgt", 2)
    mlp(de + ("MLPBlock_2",), "pred_scene.ctx_proj", 2)
    for i in range(2):  # ctx_sat TransformerEncoder layers
        sa = de + (f"SelfAttentionEncoderLayer_{i}",)
        tp = f"pred_scene.ctx_sat.layers.{i}"
        H = cfg.d_embed
        for j, lo in ((0, 0), (1, H), (2, 2 * H)):  # q, k, v
            take(sa + (f"Dense_{j}", "kernel"), f"{tp}.self_attn.in_proj_weight",
                 lambda w, lo=lo, H=H: _t(np.asarray(w)[lo:lo + H]))
            take(sa + (f"Dense_{j}", "bias"), f"{tp}.self_attn.in_proj_bias",
                 lambda w, lo=lo, H=H: np.asarray(w)[lo:lo + H])
        lin(sa + ("Dense_3",), f"{tp}.self_attn.out_proj")
        lin(sa + ("Dense_4",), f"{tp}.linear1")
        lin(sa + ("Dense_5",), f"{tp}.linear2")
        norm(sa + ("LayerNorm_0",), f"{tp}.norm1")
        norm(sa + ("LayerNorm_1",), f"{tp}.norm2")
    mlp(de + ("MLPBlock_3",), "pred_scene.actor_proj", 2)
    mlp(de + ("MLPBlock_4",), "pred_scene.cls", 2)
    lin(de + ("Dense_0",), "pred_scene.cls.6")
    mlp(de + ("MLPBlock_5",), "pred_scene.reg", 2)
    lin(de + ("Dense_1",), "pred_scene.reg.6")

    return entries


def torch_to_flax(state_dict, params, cfg, strict: bool = True):
    """Map a reference torch state_dict (tensors or ndarrays) onto our flax
    parameter tree. Returns a new {'params': ...} tree.

    strict=True additionally requires that every torch tensor was consumed
    and every flax leaf was written (except the last fusion layer's unused
    edge-update parameters, which the reference does not create)."""
    import jax
    import jax.numpy as jnp

    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    tree = jax.tree.map(lambda x: x, params)  # shallow-copy via rebuild
    from flax.core import unfreeze, freeze
    frozen = hasattr(tree, "unfreeze")
    tree = unfreeze(tree) if frozen else jax.tree_util.tree_map(lambda x: x, tree)

    # deep-copy mutable dict structure
    def to_mutable(d):
        if isinstance(d, dict):
            return {k: to_mutable(v) for k, v in d.items()}
        return d

    tree = to_mutable(tree)

    written = set()
    consumed = set()
    for path, fn in build_torch_mapping(cfg):
        val = fn(sd)
        node = tree["params"]
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        if tuple(val.shape) != tuple(old.shape):
            raise ValueError(
                f"shape mismatch at params/{'/'.join(path)}: torch gives "
                f"{val.shape}, flax expects {tuple(old.shape)}")
        node[path[-1]] = jnp.asarray(val, dtype=old.dtype)
        written.add(("params",) + path)

    # track which torch keys fed at least one flax leaf
    probe = {k: False for k in sd}

    class _Probe(dict):
        def __getitem__(self, k):
            probe[k] = True
            return sd[k]

    for _, fn in build_torch_mapping(cfg):
        fn(_Probe())

    if strict:
        import jax.tree_util as jtu

        def flat_paths(t):
            return {tuple(str(getattr(p, "key", p)) for p in path)
                    for path, _ in jtu.tree_leaves_with_path(t)}

        all_paths = flat_paths(tree)
        last = f"RelaFusionLayer_{cfg.n_scene_layer - 1}"
        allowed_unwritten = {
            p for p in all_paths
            if last in p and any(s.startswith(("w_edge", "b_edge", "ln_e1",
                                               "ln_e2")) for s in p)
        }
        missing = all_paths - written - allowed_unwritten
        if missing:
            raise ValueError(f"unmapped flax leaves: {sorted(missing)[:8]} "
                             f"(+{max(0, len(missing) - 8)} more)")
        leftover = [k for k, used in probe.items() if not used]
        if leftover:
            raise ValueError(f"torch tensors not consumed: {leftover[:8]} "
                             f"(+{max(0, len(leftover) - 8)} more)")

    return freeze(tree) if frozen else tree


def try_load_torch_checkpoint(ckpt_path: str, params, cfg) -> Optional[dict]:
    """Load a reference torch checkpoint into our flax parameter tree
    (reference planner.py:46-47 semantics). Returns None when the checkpoint
    file is absent; raises on a present-but-unmappable checkpoint so silent
    architecture drift can't happen."""
    if not ckpt_path or not os.path.exists(ckpt_path):
        return None

    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return torch_to_flax(state_dict, params, cfg)
