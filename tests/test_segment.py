"""Segmentation semantics on hand-built rasters (reference: main/segment.c)."""

import numpy as np
import pytest

from tensorflow_ocr_ray.config import FIXTURE_CONFIG, OcrConfig
from tensorflow_ocr_ray.core.knn import FontIndex
from tensorflow_ocr_ray.core.segment import PageSegmenter
from tensorflow_ocr_ray.fonts import get_font_index, glyph_bitmap


def _blank_page(h=60, w=120):
    return np.zeros((h, w), dtype=np.uint8)


def _put(page, top, left, bmp):
    h, w = bmp.shape
    page[top : top + h, left : left + w] |= bmp
    return page


def _seg(page, cfg=None, index=None):
    return PageSegmenter(
        page.copy(), cfg or FIXTURE_CONFIG, index or FontIndex.empty()
    )


def test_xycut_finds_separated_boxes():
    page = _blank_page()
    page[10:20, 10:20] = 1
    page[10:20, 40:50] = 1
    page[35:45, 10:20] = 1
    seg = _seg(page)
    assert seg.find_lines(0)
    boxes = sorted(
        (g.top, g.left, g.bottom, g.right)
        for line in seg.lines
        for g in line.glyphs
    )
    assert boxes == [(10, 10, 20, 20), (10, 40, 20, 50), (35, 10, 45, 20)]
    # two lines, top-sorted
    assert len(seg.lines) == 2
    assert seg.lines[0].top < seg.lines[1].top


def test_min_size_gates_reject_specks():
    page = _blank_page()
    page[10:12, 10:12] = 1  # 2x2 speck below min 3x3
    page[30:40, 30:40] = 1
    seg = _seg(page)
    assert seg.find_lines(0)
    glyphs = [g for line in seg.lines for g in line.glyphs]
    assert len(glyphs) == 1
    assert (glyphs[0].top, glyphs[0].left) == (30, 30)


def test_flood_fill_matches_xycut_on_separated_boxes():
    page = _blank_page()
    page[10:20, 10:20] = 1
    page[10:20, 40:50] = 1
    cfg = FIXTURE_CONFIG.with_(use_flood=True)
    seg = _seg(page, cfg)
    assert seg.find_lines(0)
    boxes = sorted(
        (g.top, g.left, g.bottom, g.right)
        for line in seg.lines
        for g in line.glyphs
    )
    assert boxes == [(10, 10, 20, 20), (10, 40, 20, 50)]


def test_flood_fill_8_connectivity():
    # two blocks touching only diagonally are ONE component under
    # 8-connectivity (segment.c flood explores all 8 neighbors)
    page = _blank_page()
    page[10:20, 10:20] = 1
    page[20:30, 20:30] = 1
    cfg = FIXTURE_CONFIG.with_(use_flood=True)
    seg = _seg(page, cfg)
    assert seg.find_lines(0)
    glyphs = [g for line in seg.lines for g in line.glyphs]
    assert len(glyphs) == 1
    g = glyphs[0]
    assert (g.top, g.left, g.bottom, g.right) == (10, 10, 30, 30)


def test_glyphs_sorted_by_left_within_line():
    page = _blank_page()
    for left in (70, 10, 40):
        page[10:20, left : left + 8] = 1
    seg = _seg(page)
    assert seg.find_lines(0)
    lefts = [g.left for g in seg.lines[0].glyphs]
    assert lefts == sorted(lefts)


def test_vertical_merge_dotted_i():
    """An 'i' segments as dot + body; vertical closeness must re-join them
    into one line, and horizontal overlap combine merges them into one
    glyph (needs the classifier in the loop)."""
    idx = get_font_index()
    page = _blank_page(h=50, w=40)
    bmp = glyph_bitmap("i")
    _put(page, 10, 10, bmp)
    seg = _seg(page, FIXTURE_CONFIG, idx)
    assert seg.find_lines(0)
    seg.build_tuples()
    glyphs = [g for line in seg.lines for g in line.glyphs]
    assert len(glyphs) == 1  # combined
    g = glyphs[0]
    assert g.height == bmp.shape[0]
    values, _ = idx.ocr_values(g.tuple.reshape(1, -1), min_match=0.9)
    assert values == ["i"]


def test_forced_line_split_on_touching_lines():
    # two "lines" sharing every column with no blank row between them, but
    # with a min-black row at the junction → findLinesHarder splits there
    page = _blank_page(h=60, w=200)
    page[10:24, 5:195] = 1
    page[26:40, 5:195] = 1
    page[24:26, 100] = 1  # bridge: no fully-blank row
    cfg = FIXTURE_CONFIG.with_(max_glyph_height=20, max_glyph_width=600)
    seg = _seg(page, cfg)
    assert seg.find_lines(0)
    glyphs = [g for line in seg.lines for g in line.glyphs]
    assert len(glyphs) >= 2


def test_compute_borders_single_column():
    page = _blank_page()
    page[10:20, 30:40] = 1
    seg = _seg(page)
    seg.compute_borders(0)
    assert seg.left_border == 0
    assert seg.right_border == page.shape[1] - 1  # segment.c:779


def test_compute_borders_two_columns():
    page = _blank_page(h=40, w=100)
    page[10:30, 5:40] = 1
    page[10:30, 60:95] = 1
    cfg = FIXTURE_CONFIG.with_(columns=2)
    seg = _seg(page, cfg)
    seg.compute_borders(0)
    l0, r0 = seg.left_border, seg.right_border
    seg.compute_borders(1)
    l1, r1 = seg.left_border, seg.right_border
    assert l0 == 0 and r1 == 100
    assert r0 == l1  # shared divide
    assert 40 <= r0 <= 60  # divide falls in the white gutter


def test_page_stats_are_per_page():
    # SURVEY §7.0 deviation: stats must be a pure function of the page
    page = _blank_page()
    page[10:20, 10:20] = 1
    seg1 = _seg(page)
    seg1.find_lines(0)
    w1 = seg1.glyph_width
    seg2 = _seg(page)
    seg2.find_lines(0)
    assert seg2.glyph_width == w1
