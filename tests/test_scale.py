"""Scale-out tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mind_tpu.parallel.mesh import make_mesh
from mind_tpu.parallel.scale import make_tree_batch, parallel_tree_solve
from mind_tpu.sim.replay import (
    ReplayScene,
    replay_rollout,
    perturbed_rollout,
    batched_replay,
    scene_from_bundle,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_parallel_tree_solve_sharded():
    mesh = make_mesh()
    topo, nodes, params, x0 = make_tree_batch(
        n_trees=16, n_nodes=10, max_nodes=16, max_levels=16, max_width=2,
        n_exo=4, branching=False)
    us, J = parallel_tree_solve(mesh, topo, nodes, params, x0)
    assert us.shape == (16, 16, 2)
    assert np.isfinite(np.asarray(J)).all()
    # outputs actually sharded over the mesh
    assert len(us.sharding.device_set) == 8


@pytest.mark.slow
def test_parallel_tree_solve_1024_branching():
    """BASELINE.json scale config: 1024 parallel contingency solves with
    per-tree branching topologies sharded over the mesh — exercises the
    scatter-add child aggregation in the Riccati sweep at scale."""
    from mind_tpu.planner.ilqr import ILQRConfig

    mesh = make_mesh()
    topo, nodes, params, x0 = make_tree_batch(
        n_trees=1024, n_nodes=24, max_nodes=32, max_levels=24, max_width=4,
        n_exo=4, branching=True)
    # genuinely branching: most trees have at least one multi-child node
    par = np.asarray(topo.parent)
    forked = 0
    for t in range(par.shape[0]):
        valid = par[t][np.asarray(topo.node_mask[t])]
        _, counts = np.unique(valid[valid >= 0], return_counts=True)
        forked += int((counts > 1).any())
    assert forked > 900, f"only {forked}/1024 trees have a fork"

    us, J = parallel_tree_solve(mesh, topo, nodes, params, x0,
                                ilqr_cfg=ILQRConfig(max_iterations=10))
    assert us.shape == (1024, 32, 2)
    assert np.isfinite(np.asarray(J)).all()
    assert len(us.sharding.device_set) == 8


def test_replay_rollout(demo1_trajs):
    scene = scene_from_bundle(demo1_trajs)
    states, valid = jax.jit(lambda s: replay_rollout(s, 500))(scene)
    assert states.shape == (500, len(demo1_trajs), 4)
    # replay equals the source log shifted by one step
    np.testing.assert_allclose(
        np.asarray(states[10, 0, :2]), demo1_trajs.pos[0, 11], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(states[0, 1, 3]), demo1_trajs.ang[1, 1], atol=1e-6)


def test_perturbed_rollout(demo1_trajs):
    scene = scene_from_bundle(demo1_trajs)
    N = len(demo1_trajs)
    offsets = jnp.zeros((N, 2))
    states = perturbed_rollout(scene, 100, offsets)
    assert states.shape == (100, N, 4)
    # zero offset: integrated positions stay near the log (velocity-profile
    # integration vs linear interpolation differ slightly)
    err = np.abs(np.asarray(states[50, 0, :2]) - demo1_trajs.pos[0, 51])
    assert err.max() < 2.0

    # 64-way Monte Carlo via vmap
    offs = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.5, (64, N, 2)).astype(np.float32))
    batch = jax.jit(jax.vmap(lambda o: perturbed_rollout(scene, 50, o)))(offs)
    assert batch.shape == (64, 50, N, 4)
    assert np.isfinite(np.asarray(batch)).all()


def test_batched_replay_multi_scene(demo1_trajs):
    # stack the same scene twice as a stand-in for the 4-demo batch
    scene = scene_from_bundle(demo1_trajs)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), scene)
    states, valid = jax.jit(lambda s: batched_replay(s, 100))(stacked)
    assert states.shape == (2, 100, len(demo1_trajs), 4)
    np.testing.assert_allclose(np.asarray(states[0]), np.asarray(states[1]))
