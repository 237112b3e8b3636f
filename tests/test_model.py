"""Network tests: shapes, finiteness, masking invariance, Bézier consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.config import NetConfig
from mind_tpu.models import init_scene_pred
from mind_tpu.models.layers import linear_upsample2
from mind_tpu.models.scene_pred import bezier_T, bezier_Tp

A, L = 8, 16


@pytest.fixture(scope="module")
def small_net():
    cfg = NetConfig(n_scene_layer=2)
    model, params, batched_apply = init_scene_pred(cfg, A, L, seed=0)
    return cfg, model, params, batched_apply


def _rand_inputs(cfg, key, batch=2, n_actors=A, n_lanes=L):
    ks = jax.random.split(key, 6)
    To = cfg.obs_len - 2
    N = n_actors + n_lanes
    return dict(
        actors=jax.random.normal(ks[0], (batch, n_actors, To, cfg.in_actor), jnp.float32),
        actor_mask=jnp.ones((batch, n_actors), bool),
        lanes=jax.random.normal(ks[1], (batch, n_lanes, 10, cfg.in_lane), jnp.float32),
        lane_mask=jnp.ones((batch, n_lanes), bool),
        rpe=jax.random.normal(ks[2], (batch, N, N, cfg.d_rpe_in), jnp.float32),
        tgt_nodes=jax.random.normal(ks[3], (batch, 10, cfg.in_lane), jnp.float32),
        tgt_rpe=jax.random.normal(ks[4], (batch, 20), jnp.float32),
    )


def test_forward_shapes(small_net):
    cfg, model, params, batched_apply = small_net
    inp = _rand_inputs(cfg, jax.random.PRNGKey(1))
    cls, reg, vel = batched_apply(params, **inp)
    assert cls.shape == (2, cfg.num_modes)
    assert reg.shape == (2, A, cfg.num_modes, cfg.pred_len, 5)
    assert vel.shape == (2, A, cfg.num_modes, cfg.pred_len, 2)
    assert np.isfinite(np.asarray(cls)).all()
    assert np.isfinite(np.asarray(reg)).all()
    np.testing.assert_allclose(np.asarray(cls.sum(-1)), 1.0, atol=1e-5)
    # covariance channels are exp() > 0
    assert np.all(np.asarray(reg[..., 2:]) > 0)


@pytest.mark.slow
def test_mask_invariance(small_net):
    """Outputs for valid actors must not depend on padded actor/lane values."""
    cfg, model, params, batched_apply = small_net
    inp = _rand_inputs(cfg, jax.random.PRNGKey(2), batch=1)
    mask_a = jnp.array([[True] * 5 + [False] * (A - 5)])
    mask_l = jnp.array([[True] * 10 + [False] * (L - 10)])
    inp["actor_mask"], inp["lane_mask"] = mask_a, mask_l

    cls1, reg1, _ = batched_apply(params, **inp)

    # perturb padded entries only
    inp2 = dict(inp)
    inp2["actors"] = inp["actors"].at[:, 5:].add(100.0)
    inp2["lanes"] = inp["lanes"].at[:, 10:].add(-50.0)
    cls2, reg2, _ = batched_apply(params, **inp2)

    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg1[:, :5]), np.asarray(reg2[:, :5]),
                               atol=1e-4)


def test_linear_upsample2_matches_torch():
    """Golden check against torch.nn.functional.interpolate semantics."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(2, 4, 6)).astype(np.float32)  # [B,C,T]
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="linear",
                         align_corners=False).numpy()
    got = np.asarray(linear_upsample2(jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-6)


def test_bezier_matrices():
    T = bezier_T(7, 60)
    Tp = bezier_Tp(7, 60)
    assert T.shape == (60, 8) and Tp.shape == (60, 7)
    # partition of unity
    np.testing.assert_allclose(T.sum(1), 1.0, atol=1e-12)
    # endpoint interpolation
    np.testing.assert_allclose(T[0], [1, 0, 0, 0, 0, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(T[-1], [0, 0, 0, 0, 0, 0, 0, 1], atol=1e-12)
    # derivative matrix: curve of linear control points has constant derivative
    ctrl = np.linspace(0.0, 7.0, 8)[:, None]  # d/dt = 7 * diff = 7
    vel = Tp @ np.diff(ctrl, axis=0)
    np.testing.assert_allclose(vel, 7.0, atol=1e-9)


def test_jit_compiles_once(small_net):
    cfg, model, params, batched_apply = small_net
    fn = jax.jit(batched_apply)
    inp = _rand_inputs(cfg, jax.random.PRNGKey(3))
    out1 = fn(params, **inp)
    inp2 = _rand_inputs(cfg, jax.random.PRNGKey(4))
    out2 = fn(params, **inp2)  # same shapes -> cached executable
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))


def test_resolve_pallas_fusion_auto():
    """None = auto: off on the CPU suite backend, explicit values win."""
    from mind_tpu.config import NetConfig
    from mind_tpu.models.scene_pred import resolve_pallas_fusion

    assert resolve_pallas_fusion(NetConfig()) is False  # suite runs on CPU
    assert resolve_pallas_fusion(NetConfig(use_pallas_fusion=True)) is True
    assert resolve_pallas_fusion(NetConfig(use_pallas_fusion=False)) is False
