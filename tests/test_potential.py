"""Potential-field numerics: analytic value/grad/Hessian vs an independent
numpy mirror and finite differences.

The numpy mirror below re-derives the reference's grid semantics
(gen_dist_field + 3x3 smoothing + biquadratic Bézier interpolation,
planners/ilqr/potential.py + utils.py) by actually rasterizing the grid —
the jax implementation computes the same surface analytically without the
grid, so agreement here validates the de-rasterization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.ops.potential import (
    NodeCostData,
    CostParams,
    potential_field_eval,
    cost_node_eval,
)

GRID_N = 64  # small grid for the mirror's rasterization
RES = 0.4


def make_setup(seed=0, w_ego=1.0, w_exo=10.0):
    rng = np.random.default_rng(seed)
    lane = np.stack([np.linspace(-10, 14, 13), 0.1 * rng.normal(size=13)], axis=1)
    x0 = np.array([0.0, 0.0])
    offset = x0 - 0.5 * (GRID_N - 1) * RES

    node = NodeCostData(
        prob=jnp.float32(0.7),
        ego_mean=jnp.asarray([1.0, 0.5], jnp.float32),
        ego_cov=jnp.float32(0.3),
        exo_mean=jnp.asarray([[3.0, -1.0], [-2.0, 2.0]], jnp.float32),
        exo_cov=jnp.asarray([0.4, 0.2], jnp.float32),
        exo_mask=jnp.asarray([True, True]),
    )
    params = CostParams(
        field_offset=jnp.asarray(offset, jnp.float32),
        res=jnp.float32(RES),
        grid_n=GRID_N,
        tgt_seg_start=jnp.asarray(lane[:-1], jnp.float32),
        tgt_seg_end=jnp.asarray(lane[1:], jnp.float32),
        tgt_seg_mask=jnp.ones(len(lane) - 1, bool),
        w_tgt=jnp.float32(1.0),
        w_ego=jnp.float32(w_ego),
        w_ego_cov_offset=jnp.float32(1.0),
        w_exo=jnp.float32(w_exo),
        w_exo_cov_offset=jnp.float32(2.5),
        w_exo_cost_offset=jnp.float32(10.0),
        w_des_state=jnp.asarray([0, 0, 0.1, 0, 1.0, 10.0], jnp.float32),
        des_state=jnp.asarray([0, 0, 3.0, 0, 0, 0], jnp.float32),
        w_state_con=jnp.asarray([0, 0, 50.0, 50.0, 50.0, 500.0], jnp.float32),
        state_lb=jnp.asarray([-1e5, -1e5, 0.0, -10.0, -6.0, -0.2], jnp.float32),
        state_ub=jnp.asarray([1e5, 1e5, 8.0, 10.0, 4.0, 0.2], jnp.float32),
        w_ctrl=jnp.asarray([5.0, 5.0], jnp.float32),
    )
    return node, params, lane, offset


def mirror_cell_value(cx, cy, node, lane, w_tgt, w_ego, w_exo):
    """Raw cost-field cell value, derived independently in numpy."""
    p = np.array([cx, cy])
    seg = lane[1:] - lane[:-1]
    t = np.clip(np.sum((p - lane[:-1]) * seg, 1) / np.sum(seg * seg, 1), 0, 1)
    proj = lane[:-1] + t[:, None] * seg
    d_tgt = np.min(np.linalg.norm(p - proj, axis=1))
    val = w_tgt * float(node.prob) * d_tgt**2

    ego_d = np.linalg.norm(p - np.asarray(node.ego_mean))
    val += w_ego * max(ego_d - (float(node.ego_cov) + 1.0), 0.0)

    for i in range(2):
        exo_d = np.linalg.norm(p - np.asarray(node.exo_mean[i]))
        f = max((float(node.exo_cov[i]) + 2.5) - exo_d, 0.0)
        if f > 0:
            f += 10.0
        val += w_exo * f
    return val


def mirror_eval(pos, node, lane, offset):
    """Rasterize the local patch, smooth, interpolate — the grid-based
    formulation the analytic path must reproduce."""
    x_idx = int(np.clip(round((pos[0] - offset[0]) / RES), 0, GRID_N - 1))
    y_idx = int(np.clip(round((pos[1] - offset[1]) / RES), 0, GRID_N - 1))
    local = np.zeros((3, 3))
    for r in range(3):
        for c in range(3):
            iy, ix = y_idx + r - 1, x_idx + c - 1
            if 0 <= iy < GRID_N and 0 <= ix < GRID_N:
                local[r, c] = mirror_cell_value(
                    offset[0] + ix * RES, offset[1] + iy * RES,
                    node, lane, 1.0, 1.0, 10.0)
    sm = np.zeros((3, 3))
    sm[0, 0] = local[:2, :2].mean(); sm[0, 2] = local[:2, 1:].mean()
    sm[2, 0] = local[1:, :2].mean(); sm[2, 2] = local[1:, 1:].mean()
    sm[0, 1] = local[:2, 1].mean(); sm[1, 0] = local[1, :2].mean()
    sm[1, 2] = local[1, 1:].mean(); sm[2, 1] = local[1:, 1].mean()
    sm[1, 1] = local[1, 1]
    u = (pos[0] - (offset[0] + x_idx * RES)) / RES + 0.5
    v = (pos[1] - (offset[1] + y_idx * RES)) / RES + 0.5
    bu = np.array([(1 - u) ** 2, 2 * (1 - u) * u, u**2])
    bv = np.array([(1 - v) ** 2, 2 * (1 - v) * v, v**2])
    return bv @ sm @ bu


def test_value_matches_numpy_mirror():
    node, params, lane, offset = make_setup()
    rng = np.random.default_rng(1)
    for _ in range(20):
        pos = rng.uniform(-8, 8, 2).astype(np.float32)
        val, _, _ = potential_field_eval(jnp.asarray(pos), node, params)
        want = mirror_eval(pos, node, lane, offset)
        np.testing.assert_allclose(float(val), want, rtol=2e-4, atol=1e-4)


def test_gradient_matches_finite_difference():
    node, params, lane, offset = make_setup()
    f = jax.jit(lambda p: potential_field_eval(p, node, params)[0])
    g = jax.jit(lambda p: potential_field_eval(p, node, params)[1])
    rng = np.random.default_rng(2)
    eps = 1e-3
    for _ in range(10):
        pos = rng.uniform(-6, 6, 2)
        # keep away from cell boundaries where the surface is only C0
        pos = (np.round((pos - offset) / RES) + 0.31) * RES + offset
        grad = np.asarray(g(jnp.asarray(pos, jnp.float32)))
        for d in range(2):
            dp = np.zeros(2); dp[d] = eps
            fd = (float(f(jnp.asarray(pos + dp, jnp.float32)))
                  - float(f(jnp.asarray(pos - dp, jnp.float32)))) / (2 * eps)
            np.testing.assert_allclose(grad[d], fd, rtol=5e-2, atol=5e-2)


def test_hessian_matches_finite_difference():
    node, params, lane, offset = make_setup()
    g = jax.jit(lambda p: potential_field_eval(p, node, params)[1])
    h = jax.jit(lambda p: potential_field_eval(p, node, params)[2])
    pos = np.array([0.71, 0.53])  # inside one cell
    eps = 1e-3
    hess = np.asarray(h(jnp.asarray(pos, jnp.float32)))
    np.testing.assert_allclose(hess, hess.T, atol=1e-5)
    for d in range(2):
        dp = np.zeros(2); dp[d] = eps
        fd = (np.asarray(g(jnp.asarray(pos + dp, jnp.float32)))
              - np.asarray(g(jnp.asarray(pos - dp, jnp.float32)))) / (2 * eps)
        np.testing.assert_allclose(hess[:, d], fd, rtol=5e-2, atol=8e-2)


def test_cost_node_eval_consistency():
    node, params, lane, offset = make_setup()
    x = jnp.asarray([0.5, -0.3, 9.0, 0.1, 5.0, 0.25], jnp.float32)  # violates bounds
    u = jnp.asarray([0.4, -0.1], jnp.float32)
    l, l_x, l_u, l_xx, l_uu = cost_node_eval(x, u, node, params)
    # gradient of the state terms via autodiff of the value
    f = lambda xx: cost_node_eval(xx, u, node, params)[0]
    # value includes only C0 kinks at bound crossings; x is strictly outside
    g_auto = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(l_x), np.asarray(g_auto),
                               rtol=1e-3, atol=1e-3)
    # control gradient exact
    np.testing.assert_allclose(np.asarray(l_u),
                               np.asarray(2 * params.w_ctrl * node.prob * u),
                               rtol=1e-5)
    assert float(l) > 0


def test_out_of_domain_query_stays_convex():
    """Queries beyond the grid must never score negative cost and must have a
    gradient pulling back toward the domain. The raw reference formula
    (potential.py:104-110 clamps only the cell index) extrapolates the border
    Bezier patch negatively, which let iLQR line searches accept runaway
    trajectories (episode-mode divergence, round 2)."""
    node, params, lane, offset = make_setup()
    f = jax.jit(lambda p: potential_field_eval(p, node, params))

    lo = np.asarray(params.field_offset)
    hi = lo + float(params.res) * (params.grid_n - 1)
    far = jnp.asarray([hi[0] + 200.0, lo[1] - 350.0], jnp.float32)
    val, grad, hess = [np.asarray(o) for o in f(far)]
    assert val > 0, f"negative out-of-domain cost {val}"
    # gradient points away from the domain (cost increases moving out)
    assert grad[0] > 0 and grad[1] < 0
    # convex along the outward axes
    assert hess[0, 0] > 0 and hess[1, 1] > 0

    # growing distance -> growing cost
    far2 = jnp.asarray([hi[0] + 400.0, lo[1] - 700.0], jnp.float32)
    val2 = float(f(far2)[0])
    assert val2 > val

    # boundary continuity: clamped eval == direct eval just inside
    edge_in = jnp.asarray([hi[0] - 1e-3, lo[1] + 1e-3], jnp.float32)
    edge_out = jnp.asarray([hi[0] + 1e-3, lo[1] - 1e-3], jnp.float32)
    v_in = float(f(edge_in)[0])
    v_out = float(f(edge_out)[0])
    # the surface gradient near the far corner is O(100)/m, so a 2e-3 step
    # moves the value by ~0.3; continuity just means no jump beyond that
    np.testing.assert_allclose(v_in, v_out, atol=1.0)
