"""Tests for image conventions helpers and timing utilities."""

import time

import numpy as np

from bcd_tpu import image
from bcd_tpu.chrono import Chronometer, PhaseStats, format_time


def test_index_glue_split_roundtrip(rng):
    w, d = 17, 6
    for _ in range(20):
        l, c, ch = rng.integers(0, 9), rng.integers(0, w), rng.integers(0, d)
        idx = image.glue_indices(w, d, l, c, ch)
        assert image.split_index(w, d, idx) == (l, c, ch)


def test_window_bounds_truncation():
    # center near a corner with an inner border (the reference's search
    # window semantics, DeepImage.hpp:112-120)
    (l0, c0), (l1, c1) = image.window_bounds(20, 30, 2, 3, radius=6, border=1)
    assert (l0, c0) == (1, 1)
    assert (l1, c1) == (8, 9)
    (l0, c0), (l1, c1) = image.window_bounds(20, 30, 18, 28, radius=6, border=1)
    assert (l1, c1) == (18, 28)


def test_planar_interleaved_roundtrip(rng):
    img = rng.random((5, 7, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        image.planar_to_interleaved(image.interleaved_to_planar(img)), img)


def test_chronometer():
    c = Chronometer()
    c.start()
    time.sleep(0.01)
    c.stop()
    assert 0.005 < c.elapsed < 1.0
    assert "ms" in str(c)
    assert format_time(0.5).endswith("ms")
    assert "min" in format_time(65)
    assert "h" in format_time(7200)


def test_phase_stats():
    st = PhaseStats()
    with st.phase("denoise"):
        with st.phase("denoise/select"):
            time.sleep(0.002)
    st.count("pixels", 100)
    other = PhaseStats()
    other.count("pixels", 50)
    st.merge(other)
    report = st.report()
    assert "pixels: 150" in report
    assert "select" in report
