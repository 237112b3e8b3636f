"""Batched tree-structured iLQR (contingency planner core).

A TPU-native re-expression of the reference's recursive tree iLQR
(planners/ilqr/solver.py, anassinator/ilqr-derived). The Python recursion,
per-node Theano calls and exception-driven regularization dissolve into:

- topology as index arrays: nodes sorted so that `level_table[l]` lists the
  node slots at tree depth l (padded with -1); `parent[n]` gives each node's
  parent slot (-1 = attached to the root state x0);
- forward rollout: `lax.scan` over depth levels, each level a vmapped
  dynamics step gathered from parents (solver.py:255-330 semantics — note
  the reference evaluates jacobians and cost at the *propagated* state
  (x_new, u), which we replicate);
- derivatives: one vmap over all node slots (jax.jacfwd of the bicycle step
  replaces Theano-compiled f_x/f_u);
- backward pass: reverse scan over levels with scatter-add of child values
  into parents (the contingency-planning sum of solver.py:349-350);
- line search: all alpha candidates rolled out in parallel (vmap), first
  improving alpha selected — exactly the reference's first-accept backtrack
  (solver.py:180-240) without the sequential loop;
- Levenberg-Marquardt schedule on a `lax.while_loop` carry
  (solver.py:40-49,153-158); non-PD Quu (LinAlgError in the reference) is
  treated as a rejected step that raises the regularizer.

Everything is fixed-shape, so one compilation serves every plan cycle, and
the whole solver vmaps across scenario trees.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.common.kinematics import ext_bicycle_step
from mind_tpu.ops.potential import NodeCostData, CostParams, cost_node_eval


class TreeTopology(NamedTuple):
    parent: jnp.ndarray       # [MN] int32, -1 = child of the root state x0
    node_mask: jnp.ndarray    # [MN] bool
    level_table: jnp.ndarray  # [LV, W] int32 node ids per depth level, -1 pad


class ILQRConfig(NamedTuple):
    dt: float = 0.2
    wheelbase: float = 2.5
    max_iterations: int = 100
    rel_tol: float = 1e-6
    n_line_search: int = 10
    mu_init: float = 1.0
    mu_min: float = 1e-6
    mu_max: float = 1e10
    delta_0: float = 2.0
    # solve precision: "float32" (default, MXU/VPU native) or "float64"
    # (strict-parity mode — matches the f64 reference mirror's solver to
    # ~1e-12, eliminating tree-selection flips at near-ties; ~f64-emulation
    # cost on TPU). The solver itself is dtype-polymorphic; this knob is
    # applied at two_phase_solve entry.
    dtype: str = "float32"


class _SolverState(NamedTuple):
    xs: jnp.ndarray       # [MN, 6] nominal states
    us: jnp.ndarray       # [MN, 2] nominal controls
    J_opt: jnp.ndarray    # [] accepted cost
    mu: jnp.ndarray       # [] LM regularizer
    delta: jnp.ndarray    # [] LM schedule factor
    accepted: jnp.ndarray  # [] bool: recompute derivatives this iteration
    converged: jnp.ndarray
    diverged: jnp.ndarray  # mu >= mu_max
    it: jnp.ndarray
    # derivative caches (valid when accepted was True last update)
    F_x: jnp.ndarray      # [MN, 6, 6]
    F_u: jnp.ndarray      # [MN, 6, 2]
    L: jnp.ndarray        # [MN]
    L_x: jnp.ndarray      # [MN, 6]
    L_u: jnp.ndarray      # [MN, 2]
    L_xx: jnp.ndarray     # [MN, 6, 6]
    L_uu: jnp.ndarray     # [MN, 2, 2]
    k: jnp.ndarray        # [MN, 2]
    K: jnp.ndarray        # [MN, 2, 6]


def _rollout(topo: TreeTopology, x0, us, dt, wb):
    """Tree forward rollout: xs[n] = f(xs[parent[n]] or x0, us[n]).

    Scan over depth levels; each level gathers parent states and steps all
    its nodes in parallel. Uses a dump slot at index MN for -1 ids.
    """
    MN = us.shape[0]
    xs0 = jnp.zeros((MN + 1, x0.shape[0]), x0.dtype)

    def level_step(xs, ids):
        safe_ids = jnp.where(ids >= 0, ids, MN)
        par = jnp.where(ids >= 0, topo.parent[jnp.clip(ids, 0, MN - 1)], -1)
        x_prev = jnp.where((par >= 0)[:, None], xs[jnp.where(par >= 0, par, 0)], x0)
        u = us[jnp.clip(ids, 0, MN - 1)]
        x_new = ext_bicycle_step(x_prev, u, dt, wb)
        xs = xs.at[safe_ids].set(jnp.where((ids >= 0)[:, None], x_new, xs[safe_ids]))
        return xs, None

    xs, _ = jax.lax.scan(level_step, xs0, topo.level_table, unroll=16)
    return xs[:MN]


def _rollout_policy(topo: TreeTopology, x0, xs_nom, us_nom, k, K, alpha, dt, wb):
    """Closed-loop tree re-rollout under the affine policy
    u = u_nom + alpha*k + K (x_parent_new - x_parent_nom) (solver.py:202-240)."""
    MN = us_nom.shape[0]
    xs0 = jnp.zeros((MN + 1, x0.shape[0]), x0.dtype)
    us0 = jnp.zeros((MN + 1, us_nom.shape[1]), us_nom.dtype)

    def level_step(carry, ids):
        xs, us = carry
        safe_ids = jnp.clip(ids, 0, MN - 1)
        par = jnp.where(ids >= 0, topo.parent[safe_ids], -1)
        safe_par = jnp.where(par >= 0, par, 0)
        x_prev_new = jnp.where((par >= 0)[:, None], xs[safe_par], x0)
        x_prev_nom = jnp.where((par >= 0)[:, None], xs_nom[safe_par], x0)
        du = jnp.einsum("nij,nj->ni", K[safe_ids], x_prev_new - x_prev_nom)
        u_new = us_nom[safe_ids] + alpha * k[safe_ids] + du
        x_new = ext_bicycle_step(x_prev_new, u_new, dt, wb)
        write = jnp.where(ids >= 0, safe_ids, MN)
        ok = (ids >= 0)[:, None]
        xs = xs.at[write].set(jnp.where(ok, x_new, xs[write]))
        us = us.at[write].set(jnp.where(ok, u_new, us[write]))
        return (xs, us), None

    (xs, us), _ = jax.lax.scan(level_step, (xs0, us0), topo.level_table,
                                unroll=16)
    return xs[:MN], us[:MN]


def _derivatives(xs, us, nodes: NodeCostData, params: CostParams,
                 node_mask, dt, wb):
    """Vmapped dynamics jacobians + cost expansion at (x_new, u) per node."""
    f = lambda x, u: ext_bicycle_step(x, u, dt, wb)
    F_x = jax.vmap(jax.jacfwd(f, argnums=0))(xs, us)
    F_u = jax.vmap(jax.jacfwd(f, argnums=1))(xs, us)
    L, L_x, L_u, L_xx, L_uu = jax.vmap(cost_node_eval, in_axes=(0, 0, 0, None))(
        xs, us, nodes, params)
    # masked nodes contribute nothing
    m = node_mask
    L = jnp.where(m, L, 0.0)
    L_x = jnp.where(m[:, None], L_x, 0.0)
    L_u = jnp.where(m[:, None], L_u, 0.0)
    L_xx = jnp.where(m[:, None, None], L_xx, 0.0)
    L_uu = jnp.where(m[:, None, None], L_uu,
                     jnp.eye(L_uu.shape[-1], dtype=L_uu.dtype))
    return F_x, F_u, L, L_x, L_u, L_xx, L_uu


def _tree_cost(topo: TreeTopology, xs, us, nodes, params):
    l = jax.vmap(lambda x, u, n: cost_node_eval(x, u, n, params)[0])(xs, us, nodes)
    return jnp.sum(jnp.where(topo.node_mask, l, 0.0))


def _backward(topo: TreeTopology, st: _SolverState, mu):
    """Leaf-to-root Riccati sweep with child-value aggregation.

    Returns (k, K, pd_ok). Parent V accumulates the SUM of children's V
    (solver.py:344-350) — the contingency core.
    """
    MN = st.us.shape[0]
    n_x = st.xs.shape[1]
    n_u = st.us.shape[1]
    dt_ = st.xs.dtype
    V_x = jnp.zeros((MN + 1, n_x), dt_)
    V_xx = jnp.zeros((MN + 1, n_x, n_x), dt_)
    # extra dump row: padded level entries (-1) must NOT alias a real slot —
    # duplicate-index scatter order is undefined in XLA, so a clip-to-0 write
    # can clobber node 0's gains (platform-dependent; bit us on CPU)
    k = jnp.zeros((MN + 1, n_u), dt_)
    K = jnp.zeros((MN + 1, n_u, n_x), dt_)
    eye = jnp.eye(n_x, dtype=dt_)

    def level_step(carry, ids):
        V_x, V_xx, k, K, pd_ok = carry
        safe_ids = jnp.clip(ids, 0, MN - 1)
        valid = ids >= 0

        f_x = st.F_x[safe_ids]
        f_u = st.F_u[safe_ids]
        v_x = V_x[safe_ids]
        v_xx = V_xx[safe_ids]

        Q_x = st.L_x[safe_ids] + jnp.einsum("nji,nj->ni", f_x, v_x)
        Q_u = st.L_u[safe_ids] + jnp.einsum("nji,nj->ni", f_u, v_x)
        Q_xx = st.L_xx[safe_ids] + jnp.einsum("nji,njk,nkl->nil", f_x, v_xx, f_x)
        V_reg = v_xx + mu * eye
        Q_ux = jnp.einsum("nji,njk,nkl->nil", f_u, V_reg, f_x)
        Q_uu = st.L_uu[safe_ids] + jnp.einsum("nji,njk,nkl->nil", f_u, V_reg, f_u)

        # PD check for 2x2 Quu: leading minor > 0 and det > 0
        a = Q_uu[:, 0, 0]
        b = Q_uu[:, 0, 1]
        c = Q_uu[:, 1, 0]
        d = Q_uu[:, 1, 1]
        det = a * d - b * c
        pd = (a > 0) & (det > 0)
        pd_ok = pd_ok & jnp.all(jnp.where(valid, pd, True))

        # closed-form 2x2 inverse (a generic batched LU solve is ~10x the
        # FLOPs and dominates this latency-bound level loop)
        inv_det = 1.0 / jnp.where(det != 0, det, 1.0)
        Quu_inv = jnp.stack([
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ], axis=-2) * inv_det[:, None, None]
        k_n = -jnp.einsum("nij,nj->ni", Quu_inv, Q_u)
        K_n = -jnp.einsum("nij,njk->nik", Quu_inv, Q_ux)

        Kt = jnp.swapaxes(K_n, -1, -2)
        v_x_new = (Q_x
                   + jnp.einsum("nij,njk,nk->ni", Kt, Q_uu, k_n)
                   + jnp.einsum("nij,nj->ni", Kt, Q_u)
                   + jnp.einsum("nji,nj->ni", Q_ux, k_n))
        v_xx_new = (Q_xx
                    + jnp.einsum("nij,njk,nkl->nil", Kt, Q_uu, K_n)
                    + jnp.einsum("nij,njl->nil", Kt, Q_ux)
                    + jnp.einsum("nji,njl->nil", Q_ux, K_n))
        v_xx_new = 0.5 * (v_xx_new + jnp.swapaxes(v_xx_new, -1, -2))

        write_kK = jnp.where(valid, safe_ids, MN)
        k = k.at[write_kK].set(k_n)
        K = K.at[write_kK].set(K_n)

        # accumulate into parents (root children dump into slot MN)
        par = jnp.where(valid, topo.parent[safe_ids], -1)
        write = jnp.where(par >= 0, par, MN)
        V_x = V_x.at[write].add(jnp.where(valid[:, None], v_x_new, 0.0))
        V_xx = V_xx.at[write].add(jnp.where(valid[:, None, None], v_xx_new, 0.0))
        return (V_x, V_xx, k, K, pd_ok), None

    init = (V_x, V_xx, k, K, jnp.array(True))
    (V_x, V_xx, k, K, pd_ok), _ = jax.lax.scan(
        level_step, init, topo.level_table, reverse=True, unroll=16)
    return k[:MN], K[:MN], pd_ok


def ilqr_solve(topo: TreeTopology, x0: jnp.ndarray, us_init: jnp.ndarray,
               nodes: NodeCostData, params: CostParams,
               cfg: ILQRConfig = ILQRConfig()):
    """Fit the tree iLQR. Returns (xs [MN,6], us [MN,2], info dict)."""
    dt, wb = cfg.dt, cfg.wheelbase
    MN = us_init.shape[0]

    xs = _rollout(topo, x0, us_init, dt, wb)
    derivs = _derivatives(xs, us_init, nodes, params, topo.node_mask, dt, wb)
    F_x, F_u, L, L_x, L_u, L_xx, L_uu = derivs

    dt_ = x0.dtype
    st = _SolverState(
        xs=xs, us=us_init, J_opt=jnp.sum(L),
        mu=jnp.asarray(cfg.mu_init, dt_), delta=jnp.asarray(cfg.delta_0, dt_),
        accepted=jnp.array(False), converged=jnp.array(False),
        diverged=jnp.array(False), it=jnp.int32(0),
        F_x=F_x, F_u=F_u, L=L, L_x=L_x, L_u=L_u, L_xx=L_xx, L_uu=L_uu,
        k=jnp.zeros_like(us_init),
        K=jnp.zeros((MN, us_init.shape[1], x0.shape[0]), dt_),
    )

    alphas = jnp.asarray(
        1.1 ** (-np.arange(cfg.n_line_search, dtype=np.float64) ** 2), dt_)

    def cond(st: _SolverState):
        return (~st.converged) & (~st.diverged) & (st.it < cfg.max_iterations)

    def body(st: _SolverState):
        # refresh derivatives if the previous step was accepted
        def recompute(_):
            d = _derivatives(st.xs, st.us, nodes, params, topo.node_mask, dt, wb)
            return d
        def keep(_):
            return (st.F_x, st.F_u, st.L, st.L_x, st.L_u, st.L_xx, st.L_uu)
        F_x, F_u, L, L_x, L_u, L_xx, L_uu = jax.lax.cond(
            st.accepted, recompute, keep, None)
        st1 = st._replace(F_x=F_x, F_u=F_u, L=L, L_x=L_x, L_u=L_u,
                          L_xx=L_xx, L_uu=L_uu)

        k, K, pd_ok = _backward(topo, st1, st1.mu)

        # parallel line search over all alphas
        def try_alpha(alpha):
            xs_new, us_new = _rollout_policy(
                topo, x0, st1.xs, st1.us, k, K, alpha, dt, wb)
            J = _tree_cost(topo, xs_new, us_new, nodes, params)
            return xs_new, us_new, J

        xs_c, us_c, J_c = jax.vmap(try_alpha)(alphas)
        improved = (J_c < st1.J_opt) & pd_ok
        any_improved = jnp.any(improved)
        # first improving alpha (largest step), reference solver.py:183-199
        first = jnp.argmax(improved)
        xs_new = xs_c[first]
        us_new = us_c[first]
        J_new = J_c[first]

        converged = any_improved & (
            jnp.abs((st1.J_opt - J_new) / st1.J_opt) < cfg.rel_tol)

        # LM schedule (solver.py:153-158, 194-198)
        delta_acc = jnp.minimum(1.0, st1.delta) / cfg.delta_0
        mu_acc = st1.mu * delta_acc
        mu_acc = jnp.where(mu_acc <= cfg.mu_min, 0.0, mu_acc)
        delta_rej = jnp.maximum(1.0, st1.delta) * cfg.delta_0
        mu_rej = jnp.maximum(cfg.mu_min, st1.mu * delta_rej)

        acc = any_improved
        st2 = st1._replace(
            xs=jnp.where(acc, xs_new, st1.xs),
            us=jnp.where(acc, us_new, st1.us),
            J_opt=jnp.where(acc, J_new, st1.J_opt),
            mu=jnp.where(acc, mu_acc, mu_rej),
            delta=jnp.where(acc, delta_acc, delta_rej),
            accepted=acc,
            converged=converged,
            diverged=~acc & (mu_rej >= cfg.mu_max),
            it=st1.it + 1,
            k=k, K=K,
        )
        return st2

    st = jax.lax.while_loop(cond, body, st)
    info = {"iterations": st.it, "J": st.J_opt, "converged": st.converged,
            "diverged": st.diverged}
    return st.xs, st.us, info


def build_topology(parent_list, max_nodes: int, max_levels: int,
                   max_width: int | None = None,
                   as_numpy: bool = False) -> TreeTopology:
    """Host helper: parent indices (-1 root-attached) -> padded TreeTopology.

    Nodes must be indexed in a topological order (parents before children),
    which the cost-tree builder guarantees. Pass `max_width` to get
    stack-compatible tables across trees of different shapes (for vmap), and
    `as_numpy=True` to defer device upload (callers stacking many trees
    should upload once, not per tree — device_put latency is ~40 ms over the
    TPU tunnel).
    """
    import numpy as np

    n = len(parent_list)
    assert n <= max_nodes, f"{n} cost nodes exceed max_nodes={max_nodes}"
    parent = np.full(max_nodes, -1, np.int32)
    parent[:n] = parent_list
    mask = np.zeros(max_nodes, bool)
    mask[:n] = True

    depth = np.zeros(max_nodes, np.int32)
    for i, p in enumerate(parent_list):
        depth[i] = 0 if p < 0 else depth[p] + 1
    levels = [[] for _ in range(max_levels)]
    for i in range(n):
        levels[depth[i]].append(i)
    width = max_width or max((len(l) for l in levels), default=1) or 1
    assert all(len(l) <= width for l in levels), "level width exceeds max_width"
    table = np.full((max_levels, width), -1, np.int32)
    for l, ids in enumerate(levels):
        table[l, :len(ids)] = ids
    if as_numpy:
        return TreeTopology(parent=parent, node_mask=mask, level_table=table)
    return TreeTopology(parent=jnp.asarray(parent),
                        node_mask=jnp.asarray(mask),
                        level_table=jnp.asarray(table))
