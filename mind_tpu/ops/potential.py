"""Cost potentials for the trajectory-tree optimizer, evaluated on the fly.

The reference rasterizes a 256x256 cost grid per cost node and queries it
through a 3x3-smoothed biquadratic Bézier interpolation with closed-form
gradient/Hessian (planners/ilqr/potential.py:62-264, utils.py:5-22,
trajectory_tree.py:80-118). On TPU we keep the exact same mathematical
surface — the same integer grid, the same 2x2-mean smoothing, the same
interpolation polynomials — but never materialize the grid: the 9 raw cell
values around a query are computed analytically from the target-lane polyline
and the per-node agent discs. That turns a [nodes, 256, 256] rasterization
into a handful of fused FLOPs per query, which is the hot path of every iLQR
rollout.

Boundary note: when a query's 3x3 neighborhood crosses the grid edge the
reference shifts the local patch inconsistently per edge (potential.py:127-143
— latent off-by-one quirks that only trigger >51 m from the plan origin).
We use the uniform rule local[r,c] = field[y+r-1, x+c-1], zero outside —
identical everywhere the reference's cases are self-consistent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mind_tpu.common.geometry import jx_point_segments_dist


class NodeCostData(NamedTuple):
    """Per-cost-node data (one scenario-tree timestep), all device arrays.

    Leading axes may be batched ([MN, ...]); fields here describe one node.
    """

    prob: jnp.ndarray        # []       path probability
    ego_mean: jnp.ndarray    # [2]      predicted ego position
    ego_cov: jnp.ndarray     # []       max-sigma ego covariance
    exo_mean: jnp.ndarray    # [X, 2]   predicted exo positions
    exo_cov: jnp.ndarray     # [X]      max-sigma exo covariances
    exo_mask: jnp.ndarray    # [X] bool valid exo agents


class CostParams(NamedTuple):
    """Shared (per-phase) cost parameters."""

    # potential field
    field_offset: jnp.ndarray   # [2] grid origin (x0-centered)
    res: jnp.ndarray            # [] grid resolution
    grid_n: int                 # static grid size (256)
    tgt_seg_start: jnp.ndarray  # [S, 2] target-lane segments
    tgt_seg_end: jnp.ndarray    # [S, 2]
    tgt_seg_mask: jnp.ndarray   # [S] bool
    w_tgt: jnp.ndarray
    w_ego: jnp.ndarray          # 0 in warm-start phase
    w_ego_cov_offset: jnp.ndarray
    w_exo: jnp.ndarray          # 0 in warm-start phase
    w_exo_cov_offset: jnp.ndarray
    w_exo_cost_offset: jnp.ndarray
    # state / control potentials (diagonal weights)
    w_des_state: jnp.ndarray    # [6]
    des_state: jnp.ndarray      # [6] (target velocity in slot 2)
    w_state_con: jnp.ndarray    # [6]
    state_lb: jnp.ndarray       # [6]
    state_ub: jnp.ndarray       # [6]
    w_ctrl: jnp.ndarray         # [2]


def _cell_value(cell_xy: jnp.ndarray, node: NodeCostData, p: CostParams) -> jnp.ndarray:
    """Raw cost-field value at one grid-cell center (trajectory_tree.py:80-106)."""
    d_tgt = jx_point_segments_dist(cell_xy, p.tgt_seg_start, p.tgt_seg_end, p.tgt_seg_mask)
    val = p.w_tgt * node.prob * d_tgt**2

    ego_d = jnp.linalg.norm(cell_xy - node.ego_mean)
    ego_field = jnp.maximum(ego_d - (node.ego_cov + p.w_ego_cov_offset), 0.0)
    val = val + p.w_ego * ego_field

    exo_d = jnp.linalg.norm(cell_xy - node.exo_mean, axis=-1)          # [X]
    exo_f = jnp.maximum((node.exo_cov + p.w_exo_cov_offset) - exo_d, 0.0)
    exo_f = jnp.where(exo_f > 0, exo_f + p.w_exo_cost_offset, 0.0)
    exo_f = jnp.where(node.exo_mask, exo_f, 0.0)
    val = val + p.w_exo * jnp.sum(exo_f)
    return val


def _smooth_3x3(local: jnp.ndarray) -> jnp.ndarray:
    """2x2-mean smoothing of a 3x3 patch (reference potential.py:146-155)."""
    g = local
    return jnp.array([
        [(g[0, 0] + g[0, 1] + g[1, 0] + g[1, 1]) / 4,
         (g[0, 1] + g[1, 1]) / 2,
         (g[0, 1] + g[0, 2] + g[1, 1] + g[1, 2]) / 4],
        [(g[1, 0] + g[1, 1]) / 2,
         g[1, 1],
         (g[1, 1] + g[1, 2]) / 2],
        [(g[1, 0] + g[1, 1] + g[2, 0] + g[2, 1]) / 4,
         (g[1, 1] + g[2, 1]) / 2,
         (g[1, 1] + g[1, 2] + g[2, 1] + g[2, 2]) / 4],
    ])


def potential_field_eval(pos: jnp.ndarray, node: NodeCostData, p: CostParams):
    """Value, gradient [2] and Hessian [2,2] of the smoothed biquadratic
    potential at `pos` (reference potential.py:72-264).

    Queries outside the grid domain evaluate the polynomial at the projected
    boundary point plus a convex quadratic pull-back term. The reference
    clamps only the CELL index (potential.py:104-110), which extrapolates the
    border patch's Bezier polynomial: its middle basis term 2(1-t)t grows
    quadratically NEGATIVE for t outside [0,1], so a far-out-of-grid rollout
    candidate would score hugely negative cost and win the line search (a
    latent reference bug its in-grid CPU trajectories never trigger; our
    parallel alpha-grid line search does). In-grid queries are bit-identical
    to the reference formula."""
    lo = p.field_offset
    hi = p.field_offset + p.res * (p.grid_n - 1)
    pos_c = jnp.clip(pos, lo, hi)
    delta = pos - pos_c  # zero inside the domain
    pos = pos_c

    # integer cell of the query, clamped (potential.py:104-110)
    fx = (pos[0] - p.field_offset[0]) / p.res
    fy = (pos[1] - p.field_offset[1]) / p.res
    x_idx = jnp.clip(jnp.round(fx).astype(jnp.int32), 0, p.grid_n - 1)
    y_idx = jnp.clip(jnp.round(fy).astype(jnp.int32), 0, p.grid_n - 1)

    # 3x3 raw patch, zero outside the grid
    offs = jnp.array([-1, 0, 1], jnp.int32)
    def row(dy):
        def col(dx):
            ix, iy = x_idx + dx, y_idx + dy
            inside = (ix >= 0) & (ix < p.grid_n) & (iy >= 0) & (iy < p.grid_n)
            cell_xy = p.field_offset + p.res * jnp.stack(
                [ix.astype(pos.dtype), iy.astype(pos.dtype)])
            return jnp.where(inside, _cell_value(cell_xy, node, p), 0.0)
        return jax.vmap(col)(offs)
    local = jax.vmap(row)(offs)  # [3(y), 3(x)]

    grid = _smooth_3x3(local)

    # fractional offsets (potential.py:161-167)
    grid_ori = p.field_offset + p.res * jnp.stack(
        [x_idx.astype(pos.dtype), y_idx.astype(pos.dtype)])
    u = (pos[0] - grid_ori[0]) / p.res + 0.5
    v = (pos[1] - grid_ori[1]) / p.res + 0.5

    # biquadratic Bézier basis in u and v, plus first/second derivatives
    def basis(t):
        return jnp.array([(1 - t) ** 2, 2 * (1 - t) * t, t**2])

    def dbasis(t):
        return jnp.array([-2 + 2 * t, 2 - 4 * t, 2 * t])

    ddbasis = jnp.array([2.0, -4.0, 2.0], grid.dtype)

    bu, bv = basis(u), basis(v)
    dbu, dbv = dbasis(u), dbasis(v)

    # grid[row=v-index, col=u-index] per the reference's indexing
    val = bv @ grid @ bu
    gx = (bv @ grid @ dbu) / p.res
    gy = (dbv @ grid @ bu) / p.res
    hxx = (bv @ grid @ ddbasis) / p.res**2
    hyy = (ddbasis @ grid @ bu) / p.res**2
    hxy = (dbv @ grid @ dbu) / p.res**2

    grad = jnp.stack([gx, gy])
    hess = jnp.array([[hxx, hxy], [hxy, hyy]])

    # convex out-of-domain pull-back at the target-parabola scale (matches
    # the in-grid w_tgt * prob * d^2 growth rate); identity inside the grid.
    # On a clamped axis the polynomial is constant (evaluated at the
    # projection), so its grad/hess components there are zeroed for
    # value/derivative consistency.
    k = p.w_tgt * node.prob
    out_axis = (delta != 0.0).astype(hess.dtype)
    in_axis = 1.0 - out_axis
    val = val + k * jnp.sum(delta * delta)
    grad = grad * in_axis + 2.0 * k * delta
    hess = hess * in_axis[:, None] * in_axis[None, :] \
        + 2.0 * k * jnp.diag(out_axis)
    return val, grad, hess


def cost_node_eval(x: jnp.ndarray, u: jnp.ndarray, node: NodeCostData, p: CostParams):
    """Full cost expansion at one node: (l, l_x [6], l_u [2], l_xx [6,6],
    l_uu [2,2]). l_ux is identically zero (reference cost.py:416-428).

    Sums the four reference potentials (potential.py): PotentialField on the
    position slice, StatePotential, StateConstraint, ControlPotential — all
    prob-weighted as in trajectory_tree.py:40-50,104-118.
    """
    f_val, f_grad, f_hess = potential_field_eval(x[:2], node, p)

    # StatePotential: prob * w_des ⊙ (x - x*)²
    w_des = p.w_des_state * node.prob
    diff = x - p.des_state
    sp_val = jnp.sum(w_des * diff * diff)
    sp_grad = 2.0 * w_des * diff
    sp_hess = 2.0 * w_des

    # StateConstraint: one-sided quadratic bound penalty
    w_con = p.w_state_con * node.prob
    over = jnp.maximum(x - p.state_ub, 0.0)
    under = jnp.maximum(p.state_lb - x, 0.0)
    viol = over + under
    sc_val = jnp.sum(w_con * viol * viol)
    sc_grad = 2.0 * w_con * jnp.where(over > 0, over, -under)
    sc_hess = jnp.where(viol > 0, 2.0 * w_con, 0.0)

    # ControlPotential
    w_ctrl = p.w_ctrl * node.prob
    cp_val = jnp.sum(w_ctrl * u * u)
    cp_grad = 2.0 * w_ctrl * u
    cp_hess = 2.0 * w_ctrl

    l = f_val + sp_val + sc_val + cp_val
    l_x = sp_grad + sc_grad
    l_x = l_x.at[:2].add(f_grad)
    l_u = cp_grad
    # diag bases follow the state/control dtype (weight-only terms are f32;
    # under an f64 solve the scatter-adds below must not downcast)
    l_xx = jnp.diag((sp_hess + sc_hess).astype(x.dtype))
    l_xx = l_xx.at[:2, :2].add(f_hess)
    l_uu = jnp.diag(cp_hess.astype(u.dtype))
    return l, l_x, l_u, l_xx, l_uu
