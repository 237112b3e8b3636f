"""ScenePredNet: joint multi-agent multi-modal scene prediction in flax.

Capability-equivalent redesign of the reference's SIMPL-derived network
(planners/mind/networks/network.py): conv-FPN actor encoder, PointNet lane
encoder, edge-conditioned symmetric fusion transformer, and a Bézier
regression decoder. Differences from the reference are purely structural for
TPU execution:

- fixed-width padded inputs ([A] actors, [L] lanes) with validity masks, so a
  whole batch of AIME branch nodes runs as ONE forward (the reference loops
  over batch items in Python, network.py:318,497);
- the fusion edge memory and attention are einsum formulations of the same
  math (see layers.EdgeMemoryAttention);
- the cls token's zero RPE row/column quirk (network.py:327-330) is
  reproduced by padding AFTER the RPE projection.

Inputs (B = batch of tree nodes):
  actors     [B, A, To, 14]   history features, time-major (To = obs_len - 2)
  actor_mask [B, A]
  lanes      [B, L, 10, 16]
  lane_mask  [B, L]
  rpe        [B, N, N, 5]     N = A + L (no cls)
  tgt_nodes  [B, 10, 16]
  tgt_rpe    [B, 20]

Outputs:
  cls [B, M]            mode probabilities (softmax)
  reg [B, A, M, F, 5]   positions (2) + exp(cov) (2) + unused 5th channel
  vel [B, A, M, F, 2]   velocities from the Bézier derivative matrix
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from mind_tpu.config import NetConfig
from mind_tpu.models.layers import (
    GNConv1d,
    Res1d,
    linear_upsample2,
    MLPBlock,
    PointAggregateBlock,
    EdgeMemoryAttention,
    SelfAttentionEncoderLayer,
)


class ActorNet(nn.Module):
    """1D-conv FPN over agent history (reference network.py:12-61).
    x: [A, T, 14] -> [A, D]."""

    hidden_size: int = 128
    n_fpn_scale: int = 4

    @nn.compact
    def __call__(self, x):
        outs = []
        h = x
        for s in range(self.n_fpn_scale):
            f = 2 ** (5 + s)
            h = Res1d(f, stride=1 if s == 0 else 2)(h)
            h = Res1d(f, stride=1)(h)
            outs.append(h)

        out = GNConv1d(self.hidden_size, act=False)(outs[-1])
        for i in range(len(outs) - 2, -1, -1):
            out = linear_upsample2(out)
            out = out + GNConv1d(self.hidden_size, act=False)(outs[i])
        out = Res1d(self.hidden_size)(out)
        return out[..., -1, :]  # last timestep


class LaneNet(nn.Module):
    """PointNet-ish per-lane encoder (reference network.py:102-121).
    feats: [L, P, 16] -> [L, D]."""

    hidden_size: int = 128

    @nn.compact
    def __call__(self, feats):
        x = MLPBlock((self.hidden_size,))(feats)
        x = PointAggregateBlock(self.hidden_size, aggre_out=False)(x)
        x = PointAggregateBlock(self.hidden_size, aggre_out=True)(x)
        return x


class RelaFusionLayer(nn.Module):
    """One edge-conditioned fusion layer (reference network.py:124-232).

    The layer core (memory build + optional edge update + edge-memory
    attention) has explicit parameters shared by two computation paths: the
    plain-XLA reference semantics and the Pallas VMEM-resident kernel
    (ops/fusion_attention.py), selected by `use_pallas`.
    """

    d_model: int
    d_edge: int
    n_head: int
    update_edge: bool
    use_pallas: bool = False

    @nn.compact
    def __call__(self, node, edge, key_mask):
        from mind_tpu.ops.fusion_attention import (
            FusionWeights,
            fused_edge_attention,
            fused_edge_attention_ref,
        )

        D, E = self.d_model, self.d_edge
        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        # dtype pinned explicitly: bare self.param would default to
        # jnp.float_ = float64 under the package-wide x64 mode
        p = lambda name, shape, init: self.param(name, init, shape,
                                                 jnp.float32)
        w = FusionWeights(
            wm_e=p("w_mem_edge", (E, D), lecun),
            wm_s=p("w_mem_src", (D, D), lecun),
            wm_t=p("w_mem_tar", (D, D), lecun),
            bm=p("b_mem", (D,), zeros),
            ln_m_g=p("ln_mem_scale", (D,), ones),
            ln_m_b=p("ln_mem_bias", (D,), zeros),
            wq=p("w_q", (D, D), lecun), bq=p("b_q", (D,), zeros),
            wk=p("w_k", (D, D), lecun), bk=p("b_k", (D,), zeros),
            wv=p("w_v", (D, D), lecun), bv=p("b_v", (D,), zeros),
            wo=p("w_o", (D, D), lecun), bo=p("b_o", (D,), zeros),
            we=p("w_edge", (D, E), lecun), be=p("b_edge", (E,), zeros),
            ln_e1_g=p("ln_e1_scale", (E,), ones),
            ln_e1_b=p("ln_e1_bias", (E,), zeros),
            ln_e2_g=p("ln_e2_scale", (E,), ones),
            ln_e2_b=p("ln_e2_bias", (E,), zeros),
        )

        if self.use_pallas:
            x_prime, edge = fused_edge_attention(
                node, edge, key_mask, w, self.n_head, self.update_edge)
        else:
            x_prime, edge = fused_edge_attention_ref(
                node, edge, key_mask, w, self.n_head, self.update_edge)

        x = nn.LayerNorm(epsilon=1e-5)(node + x_prime)
        ff = nn.Dense(self.d_model * 2)(x)
        ff = nn.Dense(self.d_model)(nn.relu(ff))
        x = nn.LayerNorm(epsilon=1e-5)(x + ff)
        return x, edge


class FusionNet(nn.Module):
    """Symmetric scene encoder over [actors; lanes; cls] tokens
    (reference network.py:271-340)."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, actors, lanes, rpe, token_mask):
        # actors [A, D], lanes [L, D], rpe [N, N, 5], token_mask [N+1]
        cfg = self.cfg
        actors = MLPBlock((cfg.d_embed,))(actors)
        lanes = MLPBlock((cfg.d_embed,))(lanes)
        tokens = jnp.concatenate(
            [actors, lanes, jnp.zeros((1, cfg.d_embed), actors.dtype)], axis=0)

        # project rpe first, then zero-pad the cls row/col (network.py:326-330)
        edge = MLPBlock((cfg.d_rpe,))(rpe)  # [N, N, E]
        edge = jnp.pad(edge, ((0, 1), (0, 1), (0, 0)))

        x = tokens
        use_pallas = resolve_pallas_fusion(cfg)
        for i in range(cfg.n_scene_layer):
            update_edge = cfg.update_edge and i != cfg.n_scene_layer - 1
            x, edge = RelaFusionLayer(cfg.d_embed, cfg.d_rpe, cfg.n_scene_head,
                                      update_edge, use_pallas)(
                x, edge, token_mask)

        A = actors.shape[0]
        return x[:A], x[A:-1], x[-1]  # actors, lanes, cls


def resolve_pallas_fusion(cfg) -> bool:
    """None = auto: pallas on real TPU backends only. The kernel targets
    Mosaic lowering; on CPU it would run interpreted (far too slow) and on
    any other backend it would not compile at all."""
    if cfg.use_pallas_fusion is not None:
        return cfg.use_pallas_fusion
    import jax

    return jax.default_backend() == "tpu"


def bezier_T(n_order: int, n_step: int) -> np.ndarray:
    ts = np.linspace(0.0, 1.0, n_step, endpoint=True)
    return np.stack([
        math.comb(n_order, i) * (1.0 - ts) ** (n_order - i) * ts**i
        for i in range(n_order + 1)
    ], axis=1)


def bezier_Tp(n_order: int, n_step: int) -> np.ndarray:
    ts = np.linspace(0.0, 1.0, n_step, endpoint=True)
    return np.stack([
        n_order * math.comb(n_order - 1, i) * (1.0 - ts) ** (n_order - 1 - i) * ts**i
        for i in range(n_order)
    ], axis=1)


def monomial_T(n_order: int, n_step: int) -> np.ndarray:
    ts = np.linspace(0.0, 1.0, n_step, endpoint=True)
    return np.stack([ts**i for i in range(n_order + 1)], axis=1)


def monomial_Tp(n_order: int, n_step: int) -> np.ndarray:
    ts = np.linspace(0.0, 1.0, n_step, endpoint=True)
    return np.stack([(i + 1) * ts**i for i in range(n_order)], axis=1)


def _central_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """Gradient along axis -2: central differences inside, one-sided at the
    edges (torch.gradient / np.gradient with unit spacing)."""
    fwd = x[..., 1:, :] - x[..., :-1, :]
    first = fwd[..., :1, :]
    last = fwd[..., -1:, :]
    central = (x[..., 2:, :] - x[..., :-2, :]) / 2.0
    return jnp.concatenate([first, central, last], axis=-2)


class SceneDecoder(nn.Module):
    """cls-token -> M modes; per-actor Bézier control-point regression
    (reference network.py:343-556, param_out='bezier')."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, ctx, actors, tgt_feat, tgt_rpe):
        # ctx [D], actors [A, D], tgt_feat [D], tgt_rpe [20]
        # the decoder runs in f32 even under bfloat16 inference: Bézier
        # control-point positions need more than 8 mantissa bits
        ctx, actors, tgt_feat, tgt_rpe = (
            x.astype(jnp.float32) for x in (ctx, actors, tgt_feat, tgt_rpe))
        cfg = self.cfg
        H, M = cfg.d_embed, cfg.num_modes
        F = cfg.pred_len
        n_order = cfg.bezier_order

        tgt_rpe_e = MLPBlock((H,))(tgt_rpe)
        tgt = MLPBlock((H, H))(jnp.concatenate([tgt_feat, tgt_rpe_e], axis=-1))  # [H]

        cls_embed = MLPBlock((H * M // 2, H * M))(ctx).reshape(M, H)
        for _ in range(2):
            cls_embed = SelfAttentionEncoderLayer(H, 4, H * 12)(cls_embed)

        actor_embed = MLPBlock((H * M // 2, H * M))(actors).reshape(-1, M, H)  # [A, M, H]
        actor_embed = jnp.transpose(actor_embed, (1, 0, 2))  # [M, A, H]

        # the target-lane embedding is injected into MODE 0 of every actor:
        # reference network.py:506-508 does tgt_embed[0] = tgt on the
        # [M, A, H] layout, broadcasting over the actor axis
        A = actors.shape[0]
        tgt_embed = jnp.zeros_like(actor_embed).at[0, :, :].set(tgt)

        embed = cls_embed[:, None, :] + actor_embed + tgt_embed  # [M, A, H]

        cls_logit = nn.Dense(1)(MLPBlock((H, H))(cls_embed))[:, 0]  # [M]
        cls_prob = jax.nn.softmax(cls_logit)

        # all three heads regress (n_order+1)*5 parameters per mode per actor
        # (reference network.py:408-447: for param_out='none' the same layout
        # is interpreted as future_steps*5 via n_order+1 == future_steps)
        n_param = F - 1 if cfg.param_out == "none" else n_order
        param = nn.Dense((n_param + 1) * 5)(MLPBlock((H, H))(embed))
        param = param.reshape(M, A, n_param + 1, 5)
        reg_param = jnp.transpose(param[..., :2], (1, 0, 2, 3))    # [A, M, K, 2]
        cov_param = jnp.transpose(param[..., 2:], (1, 0, 2, 3))    # [A, M, K, 3]

        if cfg.param_out == "bezier":
            mat_T = jnp.asarray(bezier_T(n_order, F), embed.dtype)
            mat_Tp = jnp.asarray(bezier_Tp(n_order, F), embed.dtype)
            reg = jnp.einsum("fk,amkd->amfd", mat_T, reg_param)
            vel = jnp.einsum("fk,amkd->amfd", mat_Tp,
                             jnp.diff(reg_param, axis=2)) / (F * 0.1)
            cov = jnp.einsum("fk,amkd->amfd", mat_T, cov_param)
        elif cfg.param_out == "monomial":
            mat_T = jnp.asarray(monomial_T(n_order, F), embed.dtype)
            mat_Tp = jnp.asarray(monomial_Tp(n_order, F), embed.dtype)
            reg = jnp.einsum("fk,amkd->amfd", mat_T, reg_param)
            vel = jnp.einsum("fk,amkd->amfd", mat_Tp,
                             reg_param[:, :, 1:, :]) / (F * 0.1)
            cov = jnp.einsum("fk,amkd->amfd", mat_T, cov_param)
        elif cfg.param_out == "none":
            reg = reg_param                                        # [A, M, F, 2]
            cov = cov_param
            vel = _central_gradient(reg) / 0.1  # torch.gradient semantics
        else:
            raise NotImplementedError(cfg.param_out)

        reg_out = jnp.concatenate([reg, jnp.exp(cov)], axis=-1)    # [A, M, F, 5]
        return cls_prob, reg_out, vel


class ScenePredNet(nn.Module):
    """Full scene predictor over one padded scene; vmapped over batches."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, actors, actor_mask, lanes, lane_mask, rpe,
                 tgt_nodes, tgt_rpe) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        actor_feat = ActorNet(cfg.d_actor, cfg.n_fpn_scale)(actors)   # [A, D]
        lane_net = LaneNet(cfg.d_lane)
        lane_feat = lane_net(lanes)                                   # [L, D]
        tgt_feat = lane_net(tgt_nodes[None])[0]                       # [D]

        token_mask = jnp.concatenate(
            [actor_mask, lane_mask, jnp.ones((1,), bool)], axis=0)
        a_out, _, cls_tok = FusionNet(cfg)(actor_feat, lane_feat, rpe, token_mask)

        return SceneDecoder(cfg)(cls_tok, a_out, tgt_feat, tgt_rpe)


def init_scene_pred(cfg: NetConfig, max_actors: int, max_lanes: int, seed: int = 0):
    """Initialize parameters against fixed-width dummy inputs and return
    (model, params, batched_apply) where batched_apply vmaps over a leading
    batch axis of tree nodes."""
    model = ScenePredNet(cfg)
    To = cfg.obs_len - 2
    N = max_actors + max_lanes
    f32 = jnp.float32
    dummy = (
        jnp.zeros((max_actors, To, cfg.in_actor), f32),
        jnp.ones((max_actors,), bool),
        jnp.zeros((max_lanes, 10, cfg.in_lane), f32),
        jnp.ones((max_lanes,), bool),
        jnp.zeros((N, N, cfg.d_rpe_in), f32),
        jnp.zeros((10, cfg.in_lane), f32),
        jnp.zeros((20,), f32),
    )
    # jit the whole init as ONE compiled (persistently cached) program:
    # un-jitted flax init traces the forward eagerly op-by-op, which costs
    # ~3.5 min of per-op latency over the TPU tunnel. The pallas kernel has
    # no init-time params of its own — the pallas and reference paths share
    # an IDENTICAL parameter structure (RelaFusionLayer creates FusionWeights
    # before selecting a path) — so init uses a pallas-disabled clone, which
    # also lets the same program serve the CPU backend.
    import dataclasses

    init_model = ScenePredNet(
        dataclasses.replace(cfg, use_pallas_fusion=False))
    params = jax.jit(init_model.init)(jax.random.PRNGKey(seed), *dummy)

    return model, params, make_batched_apply(model, cfg)


def make_batched_apply(model: ScenePredNet, cfg: NetConfig):
    """Batched forward (vmap over a leading axis of tree nodes) with the
    compute-dtype policy applied: under bfloat16 inference, params + float
    inputs are cast down and outputs return as float32."""
    dtype = jnp.dtype(cfg.compute_dtype)

    def batched_apply(params, actors, actor_mask, lanes, lane_mask, rpe,
                      tgt_nodes, tgt_rpe):
        if dtype != jnp.float32:
            # MXU-native inference: cast params + float inputs, return f32
            cast = lambda x: x.astype(dtype) if jnp.issubdtype(
                x.dtype, jnp.floating) else x
            params_c = jax.tree.map(cast, params)
            actors, lanes, rpe, tgt_nodes, tgt_rpe = map(
                cast, (actors, lanes, rpe, tgt_nodes, tgt_rpe))
        else:
            params_c = params
        out = jax.vmap(
            lambda *xs: model.apply(params_c, *xs)
        )(actors, actor_mask, lanes, lane_mask, rpe, tgt_nodes, tgt_rpe)
        if dtype != jnp.float32:
            out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        return out

    return batched_apply
