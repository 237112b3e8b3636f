"""Building blocks for the scene-prediction network.

JAX/flax re-expressions of the blocks the reference network actually uses
(planners/mind/networks/layers.py: Conv1d + Res1d only — SURVEY.md §2.2) plus
small primitives (linear upsampling, LayerNorm MLPs, masked attention) that
replace torch built-ins. Everything takes fixed-shape padded tensors and is
written to vmap cleanly over batch/tree dimensions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class GNConv1d(nn.Module):
    """Conv1d + GroupNorm(1 group == LayerNorm over channel+time) + optional
    ReLU (reference layers.py Conv1d with norm='GN', ng=1)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):  # x: [..., T, C]
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                    padding=[(pad, pad)], use_bias=False)(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5)(x)
        if self.act:
            x = nn.relu(x)
        return x


class Res1d(nn.Module):
    """Residual temporal conv block (reference layers.py Res1d, GN ng=1)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):  # [..., T, C_in]
        identity = x
        h = GNConv1d(self.features, stride=self.stride, act=True)(x)
        h = nn.Conv(self.features, (3,), padding=[(1, 1)], use_bias=False)(h)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1,), strides=(self.stride,),
                               use_bias=False)(x)
            identity = nn.GroupNorm(num_groups=1, epsilon=1e-5)(identity)
        return nn.relu(h + identity)


def linear_upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Length-doubling linear interpolation matching
    F.interpolate(scale_factor=2, mode='linear', align_corners=False):
    out[i] samples the source at (i + 0.5) / 2 - 0.5, edge-clamped.
    x: [..., T, C] -> [..., 2T, C]."""
    T = x.shape[-2]
    src = ((jnp.arange(2 * T, dtype=jnp.int32) + jnp.float32(0.5)) / 2.0
           - 0.5).astype(x.dtype)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    w = jnp.clip(src - lo.astype(x.dtype), 0.0, 1.0)
    xl = jnp.take(x, lo, axis=-2)
    xh = jnp.take(x, hi, axis=-2)
    return xl + (xh - xl) * w[..., :, None]


class MLPBlock(nn.Module):
    """Linear -> LayerNorm -> ReLU stack (the reference's ubiquitous
    nn.Sequential(Linear, LayerNorm, ReLU) pattern)."""

    features: tuple

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            x = nn.Dense(f)(x)
            x = nn.LayerNorm(epsilon=1e-5)(x)
            x = nn.relu(x)
        return x


class PointAggregateBlock(nn.Module):
    """PointNet-style aggregation over a lane's points
    (reference network.py:64-99). x: [..., P, H]."""

    hidden_size: int
    aggre_out: bool

    @nn.compact
    def __call__(self, x_inp):
        H = self.hidden_size
        x = MLPBlock((H, H))(x_inp)
        x_agg = jnp.max(x, axis=-2, keepdims=True)  # [..., 1, H]
        x_cat = jnp.concatenate(
            [x, jnp.broadcast_to(x_agg, x.shape)], axis=-1)
        out = nn.LayerNorm(epsilon=1e-5)(x_inp + MLPBlock((H, H))(x_cat))
        if self.aggre_out:
            return jnp.max(out, axis=-2)  # [..., H]
        return out


def masked_softmax(logits: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1):
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    return jax.nn.softmax(logits, axis=axis)


class EdgeMemoryAttention(nn.Module):
    """Multi-head attention where token n attends over edge-conditioned
    memory column mem[:, n, :] (reference RelaFusionLayer._mha_block,
    network.py:207-226). Padded key tokens are masked.

    node: [N, D], memory: [N, N, D] (memory[i, j] conditions i->j),
    key_mask: [N] bool. Returns [N, D].
    """

    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, node, memory, key_mask):
        D, H = self.d_model, self.n_head
        dh = D // H
        q = nn.Dense(D)(node)            # [N, D]
        k = nn.Dense(D)(memory)          # [N, N, D]
        v = nn.Dense(D)(memory)
        N = node.shape[0]
        qh = q.reshape(N, H, dh)
        kh = k.reshape(N, N, H, dh)
        vh = v.reshape(N, N, H, dh)
        # logits[j, h, i] = q[j]·k[i, j] / sqrt(dh)
        logits = jnp.einsum("jhd,ijhd->jhi", qh, kh) / jnp.sqrt(dh).astype(node.dtype)
        attn = masked_softmax(logits, key_mask[None, None, :] if key_mask is not None else None)
        out = jnp.einsum("jhi,ijhd->jhd", attn, vh).reshape(N, D)
        return nn.Dense(D)(out)


class SelfAttentionEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch TransformerEncoderLayer
    defaults: relu, norm-after) used for mode self-attention
    (reference SceneDecoder.ctx_sat, network.py:378-380)."""

    d_model: int
    n_head: int
    d_ffn: int

    @nn.compact
    def __call__(self, x):  # [M, D]
        D, H = self.d_model, self.n_head
        dh = D // H
        M = x.shape[0]
        q = nn.Dense(D)(x).reshape(M, H, dh)
        k = nn.Dense(D)(x).reshape(M, H, dh)
        v = nn.Dense(D)(x).reshape(M, H, dh)
        logits = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        attn = jax.nn.softmax(logits, axis=-1)
        sa = jnp.einsum("hqk,khd->qhd", attn, v).reshape(M, D)
        sa = nn.Dense(D)(sa)
        x = nn.LayerNorm(epsilon=1e-5)(x + sa)
        ff = nn.Dense(self.d_ffn)(x)
        ff = nn.Dense(D)(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5)(x + ff)
