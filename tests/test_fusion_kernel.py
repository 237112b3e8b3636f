"""Pallas fused edge-attention kernel vs the jnp reference (interpret mode
on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.ops.fusion_attention import (
    FusionWeights,
    fused_edge_attention,
    fused_edge_attention_ref,
    random_weights,
)

D = E = 128
H = 8


@pytest.mark.parametrize("n,update_edge", [(32, True), (40, True), (32, False)])
def test_kernel_matches_reference(n, update_edge):
    key = jax.random.PRNGKey(0)
    w = random_weights(key, D, E)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    node = jax.random.normal(ks[0], (n, D), jnp.float32)
    edge = jax.random.normal(ks[1], (n, n, E), jnp.float32) * 0.5
    mask = jnp.arange(n) < (n - 5)

    out_ref, edge_ref_new = fused_edge_attention_ref(node, edge, mask, w, H,
                                                     update_edge)
    out_k, edge_k = fused_edge_attention(node, edge, mask, w, H, update_edge,
                                         tj=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_k[:n - 5]),
                               np.asarray(out_ref[:n - 5]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(edge_k), np.asarray(edge_ref_new),
                               rtol=2e-4, atol=2e-4)


def test_kernel_padding_independence():
    """Outputs for valid tokens don't depend on padding to the tile size."""
    w = random_weights(jax.random.PRNGKey(2), D, E)
    n = 20
    node = jax.random.normal(jax.random.PRNGKey(3), (n, D), jnp.float32)
    edge = jax.random.normal(jax.random.PRNGKey(4), (n, n, E), jnp.float32) * 0.3
    mask = jnp.ones(n, bool)
    out8, _ = fused_edge_attention(node, edge, mask, w, H, tj=8, interpret=True)
    out16, _ = fused_edge_attention(node, edge, mask, w, H, tj=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out16),
                               rtol=1e-4, atol=1e-4)
