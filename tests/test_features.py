"""Feature extraction semantics (reference: main/categorize.c, main/kd.c).

These pin the exact-semantics traps from SURVEY.md §7.0: lroundf grid
boundaries, the %0.3f sprintf/sscanf round-trip, the aspect formula, and the
x3 weighting of dims 25-26.
"""

import numpy as np
import pytest

from tensorflow_ocr_ray.config import GRID, TUPLELENGTH
from tensorflow_ocr_ray.core.features import (
    _grid_edges,
    fill_tuple,
    lroundf,
    normalize_tuple,
    refill_tuple,
    round3,
)


def test_lroundf_half_away_from_zero():
    assert lroundf(0.5) == 1
    assert lroundf(1.5) == 2
    assert lroundf(2.4) == 2
    assert lroundf(0.0) == 0


def test_round3_is_sprintf_roundtrip():
    # categorize.c:106-109 — printf("%0.3f") then sscanf
    assert round3(0.12349) == np.float32("0.123")
    assert round3(0.12351) == np.float32("0.124")
    # banker's rounding would give 0.124 for 0.1235 via Python round();
    # printf gives the decimal-correct nearest representation
    assert round3(1.0) == np.float32(1.0)


def test_grid_edges_overlap_by_one():
    # lastLine = lround(delta*(k+1)) + 1 overlaps the next cell's first row
    first, last = _grid_edges(0, 10.0)
    assert len(first) == GRID and len(last) == GRID
    assert first[0] == 0
    for k in range(GRID - 1):
        assert last[k] == first[k + 1] + 1  # one-row overlap


def test_fill_tuple_solid_block():
    # A fully-black glyph: every grid cell fraction rounds to 1.0
    img = np.ones((20, 20), dtype=np.uint8)
    tup = fill_tuple(img, 0, 20, 0, 20, line_height=20, fallback_glyph_height=20)
    assert tup.shape == (TUPLELENGTH,)
    assert np.all(tup[: GRID * GRID] == np.float32(1.0))
    # square: aspect = 1 - w/2h = 0.5, then x3
    assert tup[GRID * GRID] == pytest.approx(1.5)
    # height/line_height = 1.0, x3
    assert tup[GRID * GRID + 1] == pytest.approx(3.0)


def test_fill_tuple_empty_block():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[0, 0] = 1  # keep bbox meaningful; one ink pixel
    tup = fill_tuple(img, 0, 20, 0, 20, line_height=20, fallback_glyph_height=20)
    assert tup[GRID * GRID - 1] == np.float32(0.0)  # far cell empty


def test_fill_tuple_aspect_wide_vs_tall():
    wide = np.ones((10, 30), dtype=np.uint8)
    tup = fill_tuple(wide, 0, 30, 0, 10, line_height=10, fallback_glyph_height=10)
    # h<w: aspect = h/2w = 10/60, x3 = 0.5
    assert tup[GRID * GRID] == pytest.approx(0.5)
    tall = np.ones((30, 10), dtype=np.uint8)
    tup = fill_tuple(tall, 0, 10, 0, 30, line_height=30, fallback_glyph_height=30)
    # h>=w: aspect = 1 - w/2h = 1 - 10/60, x3 = 2.5
    assert tup[GRID * GRID] == pytest.approx(2.5)


def test_fill_tuple_line_height_fallback():
    img = np.ones((10, 10), dtype=np.uint8)
    tup = fill_tuple(img, 0, 10, 0, 10, line_height=0, fallback_glyph_height=20)
    # denom falls back to 20: 10/20 * 3 = 1.5  (categorize.c:120-122)
    assert tup[GRID * GRID + 1] == pytest.approx(1.5)


def test_fill_tuple_path_exclusion_counts_denominator():
    """categorize.c:89-98 — pixels outside the cut paths are excluded from
    the numerator but still count in the denominator."""
    img = np.ones((10, 10), dtype=np.uint8)
    # left_path at column 5 for every row: left half excluded
    left_path = np.full(10, 5, dtype=np.int64)
    tup = fill_tuple(
        img, 0, 10, 0, 10, line_height=10, fallback_glyph_height=10,
        left_path=left_path,
    )
    free = fill_tuple(img, 0, 10, 0, 10, line_height=10, fallback_glyph_height=10)
    # leftmost grid cells lose ink, rightmost keep it
    assert tup[0] < free[0]
    assert tup[GRID - 1] == free[GRID - 1]


def test_fill_tuple_flood_marks_count_as_ink():
    # value 2 ("marked" during flood fill) is ISFILLED in the reference
    img = np.full((10, 10), 2, dtype=np.uint8)
    tup = fill_tuple(img, 0, 10, 0, 10, line_height=10, fallback_glyph_height=10)
    assert np.all(tup[: GRID * GRID] == np.float32(1.0))


def test_normalize_tuple_x3():
    tup = np.ones(TUPLELENGTH, dtype=np.float32)
    normalize_tuple(tup)
    assert np.all(tup[: GRID * GRID] == 1.0)
    assert tup[GRID * GRID] == 3.0
    assert tup[GRID * GRID + 1] == 3.0


def test_refill_tuple_only_touches_trailing_dims():
    img = np.ones((10, 10), dtype=np.uint8)
    tup = fill_tuple(img, 0, 10, 0, 10, line_height=10, fallback_glyph_height=10)
    grid_before = tup[: GRID * GRID].copy()
    refill_tuple(tup, 0, 20, 0, 10, line_height=10, fallback_glyph_height=10)
    assert np.array_equal(tup[: GRID * GRID], grid_before)
    # now h=10 < w=20: aspect = 10/40 x3 = 0.75
    assert tup[GRID * GRID] == pytest.approx(0.75)
