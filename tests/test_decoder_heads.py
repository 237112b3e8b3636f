"""Decoder head variants (bezier / monomial / none) and geometry helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.config import NetConfig
from mind_tpu.models import init_scene_pred
from mind_tpu.models.scene_pred import monomial_T, monomial_Tp, _central_gradient
from mind_tpu.common.geometry import (
    is_inside_ellipse,
    ellipse_points,
    mahalanobis_distances,
    point_mean_distances,
)

A, L = 4, 8


@pytest.mark.slow
@pytest.mark.parametrize("head", ["monomial", "none"])
def test_alt_decoder_heads(head):
    cfg = NetConfig(n_scene_layer=1, n_fpn_scale=2, d_actor=32, d_lane=32,
                    d_embed=32, d_rpe=32, n_scene_head=4, pred_len=12,
                    param_out=head)
    _, params, batched_apply = init_scene_pred(cfg, A, L, seed=0)
    To = cfg.obs_len - 2
    N = A + L
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    out = batched_apply(
        params,
        jax.random.normal(ks[0], (1, A, To, cfg.in_actor)),
        jnp.ones((1, A), bool),
        jax.random.normal(ks[1], (1, L, 10, cfg.in_lane)),
        jnp.ones((1, L), bool),
        jax.random.normal(ks[2], (1, N, N, cfg.d_rpe_in)),
        jax.random.normal(ks[3], (1, 10, cfg.in_lane)),
        jax.random.normal(ks[4], (1, 20)),
    )
    cls, reg, vel = out
    assert reg.shape == (1, A, cfg.num_modes, cfg.pred_len, 5)
    assert vel.shape == (1, A, cfg.num_modes, cfg.pred_len, 2)
    assert np.isfinite(np.asarray(reg)).all()


def test_monomial_matrices():
    T = monomial_T(3, 5)
    np.testing.assert_allclose(T[:, 0], 1.0)
    np.testing.assert_allclose(T[-1], [1, 1, 1, 1])
    Tp = monomial_Tp(3, 5)
    # derivative of t^1 is 1, of t^2 is 2t, of t^3 is 3t^2 at t=1 -> [1,2,3]
    np.testing.assert_allclose(Tp[-1], [1, 2, 3])


def test_central_gradient_matches_numpy():
    x = np.random.default_rng(0).normal(size=(2, 3, 10, 2)).astype(np.float32)
    got = np.asarray(_central_gradient(jnp.asarray(x)))
    want = np.gradient(x, axis=-2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ellipse_helpers():
    cov = np.array([[2.0, 0.0], [0.0, 0.5]])
    mean = np.array([1.0, -1.0])
    assert is_inside_ellipse(mean, mean, cov)
    pts = ellipse_points(mean, cov, n=32)
    assert pts.shape == (32, 2)
    # boundary points are at the chi2 contour
    d = mahalanobis_distances(pts, mean, cov)
    np.testing.assert_allclose(d, np.sqrt(5.991), rtol=1e-6)
    e = point_mean_distances(np.array([[4.0, 3.0]]), np.array([1.0, -1.0]))
    np.testing.assert_allclose(e, [5.0])
