"""Rendering smoke tests (Agg backend, tiny figure)."""

import numpy as np
import pytest

from mind_tpu.config import SimConfig
from mind_tpu.sim.simulator import Simulator
from mind_tpu.viz.render import convex_hull, render_png, vehicle_vertices


def test_convex_hull():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_vehicle_vertices():
    v = vehicle_vertices(1.0, 2.0, 0.0, 0.0, 4.0, 2.0, 1.5)
    assert v.shape == (8, 3)
    np.testing.assert_allclose(v[:4, 2], 0.0)
    np.testing.assert_allclose(v[4:, 2], 1.5)
    np.testing.assert_allclose(v[:, 0].min(), -1.0)  # 1 - 4/2
    np.testing.assert_allclose(v[:, 0].max(), 3.0)


def test_render_frame_png(demo1_paths, tmp_path):
    cfg = SimConfig(sim_name="viz", seq_id=demo1_paths["seq_id"],
                    data_root=str(demo1_paths["map"].parent.parent),
                    render=False, cl_agents=[])
    cfg.render_config.camera_x = 6549
    cfg.render_config.camera_y = 962.5
    sim = Simulator(cfg, max_steps=3)
    sim.init_sim()
    sim.run_sim()
    render_png(sim, 2, str(tmp_path), figsize=4)
    out = tmp_path / "frame_002.png"
    assert out.exists() and out.stat().st_size > 1000
