"""The pallas-fused model path shares parameters with the XLA path and
produces the same outputs (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.config import NetConfig
from mind_tpu.models import init_scene_pred

A, L = 4, 8


def _inputs(cfg, batch=1):
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    To = cfg.obs_len - 2
    N = A + L
    return (
        jax.random.normal(ks[0], (batch, A, To, cfg.in_actor), jnp.float32),
        jnp.ones((batch, A), bool),
        jax.random.normal(ks[1], (batch, L, 10, cfg.in_lane), jnp.float32),
        jnp.ones((batch, L), bool),
        jax.random.normal(ks[2], (batch, N, N, cfg.d_rpe_in), jnp.float32),
        jax.random.normal(ks[3], (batch, 10, cfg.in_lane), jnp.float32),
        jax.random.normal(ks[4], (batch, 20), jnp.float32),
    )


def test_pallas_path_matches_xla():
    base = dict(n_scene_layer=2, n_fpn_scale=2, d_actor=32, d_lane=32,
                d_embed=128, d_rpe=128, n_scene_head=8, pred_len=12)
    cfg_x = NetConfig(use_pallas_fusion=False, **base)
    cfg_p = NetConfig(use_pallas_fusion=True, **base)
    _, params, apply_x = init_scene_pred(cfg_x, A, L, seed=3)
    _, params_p, apply_p = init_scene_pred(cfg_p, A, L, seed=3)
    # identical parameter trees (paths share explicit weights)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b), params, params_p)

    inp = _inputs(cfg_x)
    cls_x, reg_x, vel_x = apply_x(params, *inp)
    cls_p, reg_p, vel_p = apply_p(params, *inp)
    np.testing.assert_allclose(np.asarray(cls_x), np.asarray(cls_p),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(reg_x), np.asarray(reg_p),
                               rtol=3e-3, atol=3e-3)
