"""Torch->flax weight import, validated against the LIVE reference network.

The strongest possible check of models/weights.py: instantiate the actual
reference torch ScenePredNet (/root/reference/planners/mind/networks/
network.py) with random weights on CPU, map its state_dict onto our flax
model, and assert the two produce the same outputs on the same inputs.
This simultaneously proves the torch-import path works and that the flax
network is numerically equivalent to the reference architecture
(shared-weights parity, BASELINE.json north star)."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "planners")),
    reason="reference snapshot not present")


def _stub_reference_deps():
    """The reference's utils module imports shapely + av2 at module scope but
    the network forward path never touches them — stub just those names."""
    if "shapely" not in sys.modules:
        shp = types.ModuleType("shapely")
        geo = types.ModuleType("shapely.geometry")
        geo.LineString = type("LineString", (), {})
        shp.geometry = geo
        sys.modules["shapely"] = shp
        sys.modules["shapely.geometry"] = geo
    if "av2" not in sys.modules:
        av2 = types.ModuleType("av2")
        m = types.ModuleType("av2.map")
        ls = types.ModuleType("av2.map.lane_segment")
        ls.LaneType = type("LaneType", (), {})
        ls.LaneMarkType = type("LaneMarkType", (), {})
        ds = types.ModuleType("av2.datasets")
        mf = types.ModuleType("av2.datasets.motion_forecasting")
        sc = types.ModuleType("av2.datasets.motion_forecasting.data_schema")
        sc.ObjectType = type("ObjectType", (), {})
        for name, mod in [("av2", av2), ("av2.map", m),
                          ("av2.map.lane_segment", ls),
                          ("av2.datasets", ds),
                          ("av2.datasets.motion_forecasting", mf),
                          ("av2.datasets.motion_forecasting.data_schema", sc)]:
            sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref_network_module():
    _stub_reference_deps()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import planners.mind.networks.network as ref_net
    return ref_net


def _small_cfgs():
    from mind_tpu.config import NetConfig

    ncfg = NetConfig(obs_len=12, pred_len=12, d_actor=32, n_fpn_scale=2,
                     d_lane=32, d_rpe=32, d_embed=32, n_scene_layer=3,
                     n_scene_head=4, param_out="bezier")
    ref_cfg = {
        "in_actor": ncfg.in_actor, "d_actor": ncfg.d_actor,
        "n_fpn_scale": ncfg.n_fpn_scale, "in_lane": ncfg.in_lane,
        "d_lane": ncfg.d_lane, "d_rpe_in": ncfg.d_rpe_in, "d_rpe": ncfg.d_rpe,
        "d_embed": ncfg.d_embed, "n_scene_layer": ncfg.n_scene_layer,
        "n_scene_head": ncfg.n_scene_head, "dropout": 0.1,
        "update_edge": True, "param_out": ncfg.param_out,
        "g_pred_len": ncfg.pred_len, "g_num_modes": ncfg.num_modes,
    }
    return ncfg, ref_cfg


def _random_scene(ncfg, A, L, seed=0):
    rng = np.random.default_rng(seed)
    To = ncfg.obs_len - 2
    N = A + L
    return {
        "actors": rng.normal(0, 1, (A, To, ncfg.in_actor)).astype(np.float32),
        "lanes": rng.normal(0, 1, (L, 10, ncfg.in_lane)).astype(np.float32),
        "rpe": rng.normal(0, 1, (N, N, ncfg.d_rpe_in)).astype(np.float32),
        "tgt_nodes": rng.normal(0, 1, (10, ncfg.in_lane)).astype(np.float32),
        "tgt_rpe": rng.normal(0, 1, (20,)).astype(np.float32),
    }


def _run_reference(ref_net, ref_cfg, scene):
    net = ref_net.ScenePredNet(ref_cfg, torch.device("cpu"))
    net.eval()
    A = scene["actors"].shape[0]
    L = scene["lanes"].shape[0]
    data = (
        torch.from_numpy(scene["actors"]).permute(0, 2, 1),  # [A, C, T]
        [torch.arange(A)],
        torch.from_numpy(scene["lanes"]),
        [torch.arange(L)],
        [{"scene": torch.from_numpy(scene["rpe"]).permute(2, 0, 1)}],
        torch.from_numpy(scene["tgt_nodes"]).unsqueeze(0),
        torch.from_numpy(scene["tgt_rpe"]).unsqueeze(0),
    )
    with torch.no_grad():
        res_cls, res_reg, res_aux = net(data)
    return net, (res_cls[0].numpy(), res_reg[0].numpy(), res_aux[0][0].numpy())


def _run_flax(ncfg, state_dict, scene):
    import jax.numpy as jnp

    from mind_tpu.models import init_scene_pred
    from mind_tpu.models.weights import torch_to_flax

    A = scene["actors"].shape[0]
    L = scene["lanes"].shape[0]
    _, params, batched_apply = init_scene_pred(ncfg, A, L, seed=0)
    params = torch_to_flax(state_dict, params, ncfg)
    cls, reg, vel = batched_apply(
        params,
        jnp.asarray(scene["actors"])[None],
        jnp.ones((1, A), bool),
        jnp.asarray(scene["lanes"])[None],
        jnp.ones((1, L), bool),
        jnp.asarray(scene["rpe"])[None],
        jnp.asarray(scene["tgt_nodes"])[None],
        jnp.asarray(scene["tgt_rpe"])[None],
    )
    return params, (np.asarray(cls[0]), np.asarray(reg[0]), np.asarray(vel[0]))


@pytest.mark.slow
def test_forward_parity_with_reference_torch(ref_network_module):
    """Same weights, same inputs => same cls/reg/vel (shared-weights network
    parity at f32)."""
    ncfg, ref_cfg = _small_cfgs()
    scene = _random_scene(ncfg, A=3, L=5)
    net, (t_cls, t_reg, t_vel) = _run_reference(ref_network_module, ref_cfg,
                                                scene)
    _, (j_cls, j_reg, j_vel) = _run_flax(ncfg, net.state_dict(), scene)

    np.testing.assert_allclose(j_cls, t_cls[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j_reg, t_reg, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(j_vel, t_vel, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_forward_parity_param_out_monomial(ref_network_module):
    """The monomial decoder head. (The reference's third head,
    param_out='none', cannot run at all — its forward reads self.N_ORDER
    which __init__ only sets for bezier/monomial, reference
    network.py:436-447,537 — so there is nothing to compare against.)"""
    ncfg, ref_cfg = _small_cfgs()
    ncfg.param_out = "monomial"
    ref_cfg["param_out"] = "monomial"
    scene = _random_scene(ncfg, A=2, L=4, seed=3)
    net, (t_cls, t_reg, t_vel) = _run_reference(ref_network_module, ref_cfg,
                                                scene)
    _, (j_cls, j_reg, j_vel) = _run_flax(ncfg, net.state_dict(), scene)
    np.testing.assert_allclose(j_cls, t_cls[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j_reg, t_reg, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(j_vel, t_vel, rtol=1e-4, atol=1e-4)


def test_strict_mapping_flags_missing_and_extra_keys(ref_network_module):
    from mind_tpu.models import init_scene_pred
    from mind_tpu.models.weights import torch_to_flax

    ncfg, ref_cfg = _small_cfgs()
    net = ref_network_module.ScenePredNet(ref_cfg, torch.device("cpu"))
    _, params, _ = init_scene_pred(ncfg, 3, 5, seed=0)

    sd = dict(net.state_dict())
    key = next(iter(sd))
    sd_missing = {k: v for k, v in sd.items() if k != key}
    with pytest.raises(KeyError):
        torch_to_flax(sd_missing, params, ncfg)

    sd_extra = dict(sd)
    sd_extra["pred_scene.bogus.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="not consumed"):
        torch_to_flax(sd_extra, params, ncfg)

    sd_badshape = dict(sd)
    sd_badshape["pred_scene.cls.6.weight"] = torch.zeros(7, 7)
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_to_flax(sd_badshape, params, ncfg)


def test_try_load_torch_checkpoint_roundtrip(ref_network_module, tmp_path):
    """The public path the planner uses: torch.save'd checkpoint file ->
    mapped flax params."""
    from mind_tpu.models import init_scene_pred
    from mind_tpu.models.weights import (torch_to_flax,
                                         try_load_torch_checkpoint)

    ncfg, ref_cfg = _small_cfgs()
    net = ref_network_module.ScenePredNet(ref_cfg, torch.device("cpu"))
    ckpt = tmp_path / "ref_ckpt.tar"
    torch.save({"state_dict": net.state_dict()}, str(ckpt))

    _, params, _ = init_scene_pred(ncfg, 3, 5, seed=0)
    loaded = try_load_torch_checkpoint(str(ckpt), params, ncfg)
    assert loaded is not None
    direct = torch_to_flax(net.state_dict(), params, ncfg)

    import jax

    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert try_load_torch_checkpoint(str(tmp_path / "absent.tar"),
                                     params, ncfg) is None
