"""Geometry/kinematics unit tests, including jax-vs-numpy golden checks."""

import numpy as np
import jax.numpy as jnp

from mind_tpu.common import (
    project_point_on_polyline,
    remove_close_points,
    point_line_distance,
    kine_propagate,
    kine_propagate_np,
    Tree,
    Node,
)
from mind_tpu.common.geometry import jx_points_polyline_dist, resample_polyline
from mind_tpu.common.kinematics import ext_bicycle_step


def test_project_point_on_polyline():
    line = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    pt, heading, arc = project_point_on_polyline(np.array([5.0, 2.0]), line)
    np.testing.assert_allclose(pt, [5.0, 0.0])
    assert heading == 0.0
    np.testing.assert_allclose(arc, 5.0)
    pt, heading, arc = project_point_on_polyline(np.array([12.0, 5.0]), line)
    np.testing.assert_allclose(pt, [10.0, 5.0])
    np.testing.assert_allclose(heading, np.pi / 2)
    np.testing.assert_allclose(arc, 15.0)


def test_remove_close_points():
    pts = np.array([[0.0, 0], [0.05, 0], [1.0, 0], [1.04, 0], [2.5, 0]])
    out = remove_close_points(pts, 0.1)
    np.testing.assert_allclose(out, [[0, 0], [1.0, 0], [2.5, 0]])


def test_point_line_distance():
    pts = np.array([[0.0, 1.0], [5.0, 2.0], [20.0, 0.0]])
    d = point_line_distance(pts, np.array([0.0, 0.0]), np.array([10.0, 0.0]))
    np.testing.assert_allclose(d, [1.0, 2.0, 10.0])


def test_kine_propagate_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        state = rng.normal(size=4)
        ctrl = rng.normal(size=2) * 3
        a = kine_propagate_np(state, ctrl, 0.02, wb=3.0, max_spd=15.0)
        b = np.asarray(kine_propagate(jnp.array(state), jnp.array(ctrl), 0.02,
                                      wb=3.0, max_spd=15.0))
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_kine_propagate_clips():
    # accel and steer clipped, speed clipped
    state = jnp.array([0.0, 0.0, 19.9, 0.0])
    ctrl = jnp.array([100.0, 100.0])
    out = np.asarray(kine_propagate(state, ctrl, 1.0, max_spd=20.0, max_acc=6.0))
    assert out[2] == 20.0  # 19.9 + 6*1 clipped to 20


def test_ext_bicycle_step():
    x = jnp.array([0.0, 0.0, 2.0, 0.0, 1.0, 0.1])
    u = jnp.array([0.5, -0.2])
    out = np.asarray(ext_bicycle_step(x, u, 0.2, wb=2.5))
    np.testing.assert_allclose(out[0], 0.4, atol=1e-6)   # x + v cos(q) dt
    np.testing.assert_allclose(out[2], 2.2, atol=1e-6)   # v + a dt
    np.testing.assert_allclose(out[4], 1.1, atol=1e-6)   # a + da dt
    np.testing.assert_allclose(out[5], 0.06, atol=1e-6)  # s + ds dt


def test_jx_points_polyline_dist_masked():
    poly = jnp.array([[0.0, 0.0], [10.0, 0.0], [99.0, 99.0]])  # last point padding
    mask = jnp.array([True, True, False])
    pts = jnp.array([[5.0, 3.0], [-2.0, 0.0]])
    d = np.asarray(jx_points_polyline_dist(pts, poly, mask))
    np.testing.assert_allclose(d, [3.0, 2.0], atol=1e-6)


def test_resample_polyline():
    line = np.array([[0.0, 0.0], [2.5, 0.0], [2.5, 1.0]])
    pts, src = resample_polyline(line, 1.0)
    # segment 1: len 2.5 -> 3 samples at 0, 2.5/3, 5/3 ; segment 2: len 1 -> 1 sample
    assert len(pts) == 5
    np.testing.assert_allclose(pts[0], [0, 0])
    np.testing.assert_allclose(pts[-1], [2.5, 1.0])


def test_tree():
    t = Tree()
    t.add_node(Node("root", None, 0))
    t.add_node(Node("a", "root", 1))
    t.add_node(Node("b", "root", 2))
    t.add_node(Node("a1", "a", 3))
    assert t.get_root().key == "root"
    assert set(t.get_leaf_keys()) == {"b", "a1"}
    assert t.get_node("a1").depth == 2
    assert [n.key for n in t.retrieve_nodes_to_root("a1")] == ["a1", "a", "root"]
    assert t.bfs_keys() == ["root", "a", "b", "a1"]
    assert t.size() == 4


def test_bbox_for_type_reference_mapping():
    """Reference agent.py:92-105: vehicle/pedestrian/bus get their own
    boxes, motorcyclist shares the cyclist box, everything else falls back
    to the unit-ish unknown box."""
    from mind_tpu.common.bbox import bbox_for_type, BBOX_DIMS
    from mind_tpu.data.av2 import ObjectType

    assert bbox_for_type(ObjectType.VEHICLE) == BBOX_DIMS["vehicle"]
    assert bbox_for_type(ObjectType.PEDESTRIAN) == BBOX_DIMS["pedestrian"]
    assert bbox_for_type(ObjectType.BUS) == BBOX_DIMS["bus"]
    assert (bbox_for_type(ObjectType.MOTORCYCLIST)
            == bbox_for_type(ObjectType.CYCLIST)
            == BBOX_DIMS["cyclist"])
    for t in (ObjectType.STATIC, ObjectType.BACKGROUND,
              ObjectType.CONSTRUCTION, ObjectType.RIDERLESS_BICYCLE,
              ObjectType.UNKNOWN):
        assert bbox_for_type(t) == BBOX_DIMS["unknown"]
    # (length, width, height), all positive
    for dims in BBOX_DIMS.values():
        assert len(dims) == 3 and all(d > 0 for d in dims)
