"""Pallas TPU kernel: fused edge-conditioned fusion layer core.

The fusion layer's hot path builds an edge-conditioned memory tensor
memory[i, j] = relu(LN(cat(edge[i,j], node[i], node[j]) W_m)), projects it to
keys/values, updates the edge, and attends each target j over its memory
column (reference network.py:165-232; our XLA formulation in
models/layers.py:EdgeMemoryAttention). In XLA this materializes four
[N, N, 128] tensors in HBM per layer; this kernel tiles over target tokens
and keeps memory/k/v entirely in VMEM — per tile the only HBM traffic is the
edge block in and (attention out, updated edge block) out.

Layout: grid over target tiles of TJ tokens. Per step the kernel holds
edge [N, TJ, E], memory/k/v [N, TJ, D] in VMEM (~8 MB at N=160, TJ=32,
D=E=128), computes everything with MXU matmuls, and writes [TJ, D] + the
updated edge tile.

A pure-jnp twin (`fused_edge_attention_ref`) defines the semantics; the
kernel is validated against it in interpret mode and on hardware.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusionWeights(NamedTuple):
    """Explicit parameters of the fused block (all [in, out] layout)."""

    wm_e: jnp.ndarray   # [E, D] memory proj, edge slice
    wm_s: jnp.ndarray   # [D, D] memory proj, source-node slice
    wm_t: jnp.ndarray   # [D, D] memory proj, target-node slice
    bm: jnp.ndarray     # [D]
    ln_m_g: jnp.ndarray  # [D] memory LayerNorm
    ln_m_b: jnp.ndarray
    wq: jnp.ndarray     # [D, D]
    bq: jnp.ndarray
    wk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray
    bo: jnp.ndarray
    we: jnp.ndarray     # [D, E] edge update proj
    be: jnp.ndarray
    ln_e1_g: jnp.ndarray  # [E] inner edge LN
    ln_e1_b: jnp.ndarray
    ln_e2_g: jnp.ndarray  # [E] residual edge LN
    ln_e2_b: jnp.ndarray


def _ln(x, g, b, eps=1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * g + b


def fused_edge_attention_ref(node, edge, key_mask, w: FusionWeights,
                             n_head: int, update_edge: bool = True):
    """jnp reference semantics (matches layers.RelaFusionLayer with explicit
    parameters). node [N, D], edge [N, N, E], key_mask [N] bool.
    Returns (attn_out [N, D], edge_new [N, N, E])."""
    N, D = node.shape
    dh = D // n_head
    mem = (jnp.einsum("ije,ed->ijd", edge, w.wm_e)
           + (node @ w.wm_s)[:, None, :]
           + (node @ w.wm_t)[None, :, :]
           + w.bm)
    mem = jax.nn.relu(_ln(mem, w.ln_m_g, w.ln_m_b))

    if update_edge:
        eu = jax.nn.relu(_ln(jnp.einsum("ijd,de->ije", mem, w.we) + w.be,
                             w.ln_e1_g, w.ln_e1_b))
        edge_new = _ln(edge + eu, w.ln_e2_g, w.ln_e2_b)
    else:
        edge_new = edge

    q = (node @ w.wq + w.bq).reshape(N, n_head, dh)
    k = (mem @ w.wk + w.bk).reshape(N, N, n_head, dh)
    v = (mem @ w.wv + w.bv).reshape(N, N, n_head, dh)
    logits = jnp.einsum("jhd,ijhd->hji", q, k) * jnp.asarray(
        1.0 / dh**0.5, node.dtype)
    logits = jnp.where(key_mask[None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hji,ijhd->jhd", attn, v).reshape(N, D)
    return out @ w.wo + w.bo, edge_new


def _kernel(node_ref, edge_ref, mask_ref,
            wm_e_ref, wm_s_ref, wm_t_ref, bm_ref, lnm_g_ref, lnm_b_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
            we_ref, be_ref, lne1_g_ref, lne1_b_ref, lne2_g_ref, lne2_b_ref,
            out_ref, edge_out_ref, *, tj: int, n_head: int, update_edge: bool):
    j0 = pl.program_id(0) * tj
    node = node_ref[:]                        # [N, D]
    N, D = node.shape
    dh = D // n_head
    E = edge_ref.shape[-1]
    tar = node_ref[pl.ds(j0, tj), :]          # [TJ, D]
    edge_t = edge_ref[:]                      # [N, TJ, E]

    f32 = jnp.float32
    src_proj = jnp.dot(node, wm_s_ref[:], preferred_element_type=f32)  # [N, D]
    tar_proj = jnp.dot(tar, wm_t_ref[:], preferred_element_type=f32)   # [TJ, D]
    mem = jnp.dot(edge_t.reshape(N * tj, E), wm_e_ref[:],
                  preferred_element_type=f32).reshape(N, tj, D)
    mem = mem + src_proj[:, None, :] + tar_proj[None, :, :] + bm_ref[0]
    mem = jax.nn.relu(_ln(mem, lnm_g_ref[0], lnm_b_ref[0]))

    if update_edge:
        eu = jnp.dot(mem.reshape(N * tj, D), we_ref[:],
                     preferred_element_type=f32).reshape(N, tj, E) + be_ref[0]
        eu = jax.nn.relu(_ln(eu, lne1_g_ref[0], lne1_b_ref[0]))
        edge_out_ref[:] = _ln(edge_t + eu, lne2_g_ref[0], lne2_b_ref[0])
    else:
        # the input edge may arrive bf16 (first layer under a bf16 compute
        # dtype); the passthrough still writes the f32 output ref
        edge_out_ref[:] = edge_t.astype(edge_out_ref.dtype)

    q = (jnp.dot(tar, wq_ref[:], preferred_element_type=f32) + bq_ref[0])
    k = (jnp.dot(mem.reshape(N * tj, D), wk_ref[:],
                 preferred_element_type=f32) + bk_ref[0]).reshape(N, tj, D)
    v = (jnp.dot(mem.reshape(N * tj, D), wv_ref[:],
                 preferred_element_type=f32) + bv_ref[0]).reshape(N, tj, D)

    # per-(i, j) keys make this a batched contraction, not a plain matmul;
    # Mosaic on this libtpu rejects dot_general with batch dims (and 4D
    # shape casts), and the attention part is ~1% of the tile's FLOPs (the
    # E x D memory matmuls dominate), so the contractions run per head as
    # 3D VPU multiply-reduce: logits_h[i, j] = sum_d q[j, d_h] * k[i, j, d_h]
    mask = mask_ref[:, 0] > 0.5               # [N]
    inv_sqrt = jnp.float32(1.0 / dh**0.5)     # host scalar: keep f32 on x64
    outs = []
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        kh = k[:, :, sl]                      # [N, tj, dh]
        vh = v[:, :, sl]
        qh = q[:, sl]                         # [tj, dh]
        logits = jnp.sum(kh * qh[None], axis=-1) * inv_sqrt   # [N, tj]
        logits = jnp.where(mask[:, None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=0)  # over sources
        outs.append(jnp.sum(vh * attn[:, :, None], axis=0))   # [tj, dh]
    out = jnp.concatenate(outs, axis=-1)      # [tj, D]
    out_ref[:] = jnp.dot(out, wo_ref[:], preferred_element_type=f32) + bo_ref[0]


def fused_edge_attention(node, edge, key_mask, w: FusionWeights, n_head: int,
                         update_edge: bool = True, tj: int = 16,
                         interpret: bool = False):
    """Pallas-fused layer core. Pads N up to a multiple of tj (padded tokens
    masked out of attention; padded edge rows/cols are dropped on return)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # pallas TPU kernels run interpreted on CPU
    N, D = node.shape
    E = edge.shape[-1]
    Np = -(-N // tj) * tj
    pad = Np - N
    if pad:
        node = jnp.pad(node, ((0, pad), (0, 0)))
        edge = jnp.pad(edge, ((0, pad), (0, pad), (0, 0)))
        key_mask = jnp.pad(key_mask, (0, pad))
    maskf = key_mask.astype(jnp.float32)[:, None]  # [Np, 1]

    grid = (Np // tj,)
    # index maps must yield i32: bare python 0s trace as i64 under the
    # package-wide x64 mode, which Mosaic refuses to legalize (and index
    # maps may not capture tracers, so this must be a host constant)
    zero = np.int32(0)
    full = lambda *s: pl.BlockSpec(s, lambda j: tuple(zero for _ in s),
                                   memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, tj=tj, n_head=n_head,
                               update_edge=update_edge)
    # biases / LN params as (1, D) rows (TPU scalars & vectors want >= 2D)
    row = lambda x: x[None, :]

    out, edge_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            full(Np, D),                                    # node
            pl.BlockSpec((Np, tj, E), lambda j: (zero, j, zero),
                         memory_space=pltpu.VMEM),          # edge tile
            full(Np, 1),                                    # mask
            full(E, D), full(D, D), full(D, D), full(1, D),  # memory proj
            full(1, D), full(1, D),                         # LN m
            full(D, D), full(1, D), full(D, D), full(1, D),  # q, k
            full(D, D), full(1, D), full(D, D), full(1, D),  # v, o
            full(D, E), full(1, E),                         # edge proj
            full(1, E), full(1, E), full(1, E), full(1, E),  # LN e1, e2
        ],
        out_specs=[
            pl.BlockSpec((tj, D), lambda j: (j, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, tj, E), lambda j: (zero, j, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, D), jnp.float32),
            jax.ShapeDtypeStruct((Np, Np, E), jnp.float32),
        ],
        interpret=interpret,
    )(node, edge, maskf, w.wm_e, w.wm_s, w.wm_t, row(w.bm),
      row(w.ln_m_g), row(w.ln_m_b),
      w.wq, row(w.bq), w.wk, row(w.bk), w.wv, row(w.bv), w.wo, row(w.bo),
      w.we, row(w.be), row(w.ln_e1_g), row(w.ln_e1_b),
      row(w.ln_e2_g), row(w.ln_e2_b))

    return out[:N], edge_new[:N, :N]


def random_weights(key, d: int, e: int) -> FusionWeights:
    ks = jax.random.split(key, 12)
    s = 0.08
    f32 = jnp.float32
    norm = lambda k, sh: jax.random.normal(k, sh, f32) * s
    return FusionWeights(
        wm_e=norm(ks[0], (e, d)),
        wm_s=norm(ks[1], (d, d)),
        wm_t=norm(ks[2], (d, d)),
        bm=jnp.zeros(d, f32),
        ln_m_g=jnp.ones(d, f32), ln_m_b=jnp.zeros(d, f32),
        wq=norm(ks[3], (d, d)), bq=jnp.zeros(d, f32),
        wk=norm(ks[4], (d, d)), bk=jnp.zeros(d, f32),
        wv=norm(ks[5], (d, d)), bv=jnp.zeros(d, f32),
        wo=norm(ks[6], (d, d)), bo=jnp.zeros(d, f32),
        we=norm(ks[7], (d, e)), be=jnp.zeros(e, f32),
        ln_e1_g=jnp.ones(e, f32), ln_e1_b=jnp.zeros(e, f32),
        ln_e2_g=jnp.ones(e, f32), ln_e2_b=jnp.zeros(e, f32),
    )
