"""Training-step + checkpoint tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mind_tpu.config import NetConfig
from mind_tpu.models import init_scene_pred
from mind_tpu.models.train import (
    make_train_step,
    make_dummy_batch,
    dp_shardings,
    scene_loss,
)
from mind_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def tiny():
    cfg = NetConfig(n_scene_layer=1, n_fpn_scale=2, d_actor=32, d_lane=32,
                    d_embed=32, d_rpe=32, n_scene_head=4, pred_len=12)
    A, L = 4, 8
    _, params, _ = init_scene_pred(cfg, A, L, seed=0)
    return cfg, params, A, L


def test_scene_loss_prefers_accurate_mode():
    M, A, F = 3, 2, 4
    gt = jnp.zeros((A, F, 2))
    reg = jnp.ones((A, M, F, 5))
    reg = reg.at[:, 0, :, :2].set(0.0)   # mode 0 perfect
    reg = reg.at[:, 1:, :, :2].set(5.0)  # others bad
    mask = jnp.ones((A, F), bool)
    good_cls = jnp.asarray([0.9, 0.05, 0.05])
    bad_cls = jnp.asarray([0.05, 0.9, 0.05])
    l_good = float(scene_loss(good_cls, reg, gt, mask))
    l_bad = float(scene_loss(bad_cls, reg, gt, mask))
    assert l_good < l_bad  # cls loss targets the best (0th) mode


@pytest.mark.slow
def test_train_step_reduces_loss(tiny):
    cfg, params, A, L = tiny
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    _, train_step = make_train_step(cfg, optimizer)
    step = jax.jit(train_step)
    batch = make_dummy_batch(cfg, 4, A, L, seed=1)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_train_step(tiny):
    cfg, params, A, L = tiny
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    _, train_step = make_train_step(cfg, optimizer)
    mesh = make_mesh()
    batch = make_dummy_batch(cfg, mesh.devices.size * 2, A, L)
    p_sh, o_sh, b_sh = dp_shardings(mesh, params, opt_state, batch)
    params_s = jax.device_put(params, p_sh)
    opt_s = jax.device_put(opt_state, o_sh)
    batch_s = jax.device_put(batch, b_sh)
    step = jax.jit(train_step, in_shardings=(p_sh, o_sh, b_sh))
    params2, opt2, loss = step(params_s, opt_s, batch_s)
    assert np.isfinite(float(loss))
    # replicated-params result matches unsharded execution
    params3, _, loss_ref = jax.jit(train_step)(params, opt_state, batch)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_checkpoint_roundtrip(tiny, tmp_path):
    cfg, params, A, L = tiny
    from mind_tpu.models.checkpoint import save_params, load_params

    save_params(tmp_path / "ckpt", params, step=3)
    restored = load_params(tmp_path / "ckpt", params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b), params, restored)
