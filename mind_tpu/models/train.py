"""Training step for ScenePredNet (winner-takes-all scene loss) + sharding.

The reference ships no training code (weights came from a stripped
checkpoint, SURVEY.md §5 checkpoint/resume); this module provides the
TPU-native training path used for weight production and for the multi-chip
dry run: a SIMPL-style joint scene loss (best-mode regression + mode
classification), optax AdamW, and a data-parallel `jit` over an explicit
`jax.sharding.Mesh` so gradients reduce over ICI.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mind_tpu.config import NetConfig
from mind_tpu.models.scene_pred import ScenePredNet


class Batch(NamedTuple):
    """One padded training batch (B scenes)."""

    actors: jnp.ndarray      # [B, A, 48, 14]
    actor_mask: jnp.ndarray  # [B, A]
    lanes: jnp.ndarray       # [B, L, 10, 16]
    lane_mask: jnp.ndarray   # [B, L]
    rpe: jnp.ndarray         # [B, N, N, 5]
    tgt_nodes: jnp.ndarray   # [B, 10, 16]
    tgt_rpe: jnp.ndarray     # [B, 20]
    gt_pos: jnp.ndarray      # [B, A, F, 2] future positions (instance frame)
    gt_mask: jnp.ndarray     # [B, A, F] valid future steps


def scene_loss(cls_prob, reg, gt_pos, gt_mask, eps=1e-6):
    """Winner-takes-all joint loss: the mode with the lowest joint scene
    displacement gets the regression + NLL gradient; classification pushes
    probability mass onto it."""
    # reg: [A, M, F, 5] -> positions + sigmas
    pred = reg[..., :2]
    sigma = jnp.maximum(reg[..., 2:4], eps)
    err = jnp.abs(pred - gt_pos[:, None])                     # [A, M, F, 2]
    m = gt_mask[:, None, :, None]
    # joint scene displacement per mode
    ade = jnp.sum(jnp.where(m, err, 0.0), axis=(0, 2, 3)) / (
        jnp.sum(m, axis=(0, 2, 3)) * 2 + eps)                 # [M]
    best = jnp.argmin(ade)

    # Laplace NLL on the winning mode
    nll = jnp.log(2 * sigma[:, best]) + err[:, best] / sigma[:, best]
    reg_loss = jnp.sum(jnp.where(gt_mask[..., None], nll, 0.0)) / (
        jnp.sum(gt_mask) * 2 + eps)
    cls_loss = -jnp.log(cls_prob[best] + eps)
    return reg_loss + 0.5 * cls_loss


def make_train_step(cfg: NetConfig, optimizer):
    model = ScenePredNet(cfg)

    def loss_fn(params, batch: Batch):
        def one(a, am, l, lm, r, tn, tr, gp, gm):
            cls_prob, reg, _vel = model.apply(params, a, am, l, lm, r, tn, tr)
            return scene_loss(cls_prob, reg, gp, gm)

        losses = jax.vmap(one)(batch.actors, batch.actor_mask, batch.lanes,
                               batch.lane_mask, batch.rpe, batch.tgt_nodes,
                               batch.tgt_rpe, batch.gt_pos, batch.gt_mask)
        return jnp.mean(losses)

    def train_step(params, opt_state, batch: Batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return model, train_step


def dp_shardings(mesh: Mesh, params, opt_state, batch: Batch):
    """Data-parallel layout: batch split over the 'data' axis, parameters and
    optimizer state replicated (XLA inserts psum over ICI for gradients)."""
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    param_sh = jax.tree.map(lambda _: repl, params)
    opt_sh = jax.tree.map(lambda _: repl, opt_state)
    batch_sh = Batch(*(dp for _ in batch))
    return param_sh, opt_sh, batch_sh


def make_dummy_batch(cfg: NetConfig, batch_size: int, n_actors: int,
                     n_lanes: int, seed: int = 0) -> Batch:
    rng = np.random.default_rng(seed)
    To = cfg.obs_len - 2
    N = n_actors + n_lanes
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return Batch(
        actors=f(batch_size, n_actors, To, cfg.in_actor),
        actor_mask=jnp.ones((batch_size, n_actors), bool),
        lanes=f(batch_size, n_lanes, 10, cfg.in_lane),
        lane_mask=jnp.ones((batch_size, n_lanes), bool),
        rpe=f(batch_size, N, N, cfg.d_rpe_in),
        tgt_nodes=f(batch_size, 10, cfg.in_lane),
        tgt_rpe=f(batch_size, 20),
        gt_pos=f(batch_size, n_actors, cfg.pred_len, 2),
        gt_mask=jnp.ones((batch_size, n_actors, cfg.pred_len), bool),
    )
