"""Classifier-in-the-loop segmentation: wide-glyph split (M10),
narrow-glyph combine (M11), and RTL assembly end-to-end."""

import numpy as np

from tensorflow_ocr_ray.config import FIXTURE_CONFIG, OCRFAILS
from tensorflow_ocr_ray.core.assemble import assemble_page_text
from tensorflow_ocr_ray.core.knn import FontIndex
from tensorflow_ocr_ray.core.page import ocr_page_image
from tensorflow_ocr_ray.core.segment import PageSegmenter
from tensorflow_ocr_ray.fonts import get_font_index, glyph_bitmap


def _labels(seg, idx):
    glyphs = [g for l in seg.lines for g in l.glyphs]
    feats = np.stack([g.tuple for g in glyphs])
    values, _ = idx.ocr_values(feats, FIXTURE_CONFIG.min_match)
    return glyphs, values


def test_wide_glyph_split_recovers_fused_pair():
    """Two 'o's fused (1-column overlap, no blank cut line): the straight
    split sweep (segment.c:1224-1386) must recover both letters."""
    idx = get_font_index()
    o = glyph_bitmap("o")
    h, w = o.shape
    page = np.zeros((h + 20, 4 * w + 60), dtype=np.uint8)
    page[10 : 10 + h, 10 : 10 + w] |= o            # normal glyphs pull the
    page[10 : 10 + h, 18 + w : 18 + 2 * w] |= o    # page-average width down
    x = 40 + 2 * w
    page[10 : 10 + h, x : x + w] |= o
    page[10 : 10 + h, x + w - 1 : x + 2 * w - 1] |= o  # fused pair
    seg = PageSegmenter(page, FIXTURE_CONFIG, idx)
    assert seg.find_lines(0)
    assert len([g for l in seg.lines for g in l.glyphs]) == 3  # fused = 1
    seg.build_tuples()
    seg.split_wide_glyphs()
    glyphs, values = _labels(seg, idx)
    assert len(glyphs) == 4
    assert values == ["o", "o", "o", "o"]


def test_narrow_glyph_combine_joins_fragments():
    """An 'H' broken into two unrecognized halves (2-px gap <
    minGlyphWidth): narrowGlyphs (segment.c:1414-1476) re-joins them."""
    idx = get_font_index()
    H = glyph_bitmap("H")
    h, w = H.shape
    mid = w // 2
    o = glyph_bitmap("o")
    oh, ow = o.shape
    page = np.zeros((h + 20, 3 * w + 60), dtype=np.uint8)
    page[10 + h - oh : 10 + h, 10 : 10 + ow] |= o
    page[10 + h - oh : 10 + h, 20 + ow : 20 + 2 * ow] |= o
    x = 40 + 2 * ow
    page[10 : 10 + h, x : x + mid] |= H[:, :mid]
    page[10 : 10 + h, x + mid + 2 : x + w + 2] |= H[:, mid:]
    seg = PageSegmenter(page, FIXTURE_CONFIG, idx)
    assert seg.find_lines(0)
    seg.build_tuples()
    _, before = _labels(seg, idx)
    assert before.count(OCRFAILS) == 2  # both halves unrecognized
    seg.split_wide_glyphs()
    seg.narrow_glyphs()
    glyphs, values = _labels(seg, idx)
    assert len(glyphs) == 3
    assert values == ["o", "o", "H"]


def test_may_combine_off_disables_split(monkeypatch):
    """-X (mayCombine off) leaves the fused pair as one failing glyph."""
    idx = get_font_index()
    o = glyph_bitmap("o")
    h, w = o.shape
    page = np.zeros((h + 20, 4 * w + 60), dtype=np.uint8)
    page[10 : 10 + h, 10 : 10 + w] |= o
    page[10 : 10 + h, 18 + w : 18 + 2 * w] |= o
    x = 40 + 2 * w
    page[10 : 10 + h, x : x + w] |= o
    page[10 : 10 + h, x + w - 1 : x + 2 * w - 1] |= o
    cfg = FIXTURE_CONFIG.with_(may_combine=False)
    res = ocr_page_image(page, cfg, idx)
    assert OCRFAILS in res.text  # fused pair stays unsplit


def _hebrew_index() -> FontIndex:
    """A tiny RTL font: Latin tuples re-labeled with Hebrew letters (the
    geometry is irrelevant — RTL behavior keys off the LABELS,
    kd.c:700-711)."""
    base = get_font_index()
    pick = {"A": "א", "B": "ב", "C": "ג"}
    tuples, labels = [], []
    for tup, label in zip(base.tuples, base.labels):
        if label in pick:
            tuples.append(tup)
            labels.append(pick[label])
    return FontIndex(np.stack(tuples), labels)


def test_rtl_page_end_to_end():
    """Latin shapes labeled with Hebrew: the index sniffs RTL, assembly
    reorders the line visually right-to-left."""
    idx = _hebrew_index()
    assert idx.rtl
    A, B = glyph_bitmap("A"), glyph_bitmap("B")
    h, w = A.shape
    page = np.zeros((h + 20, 3 * w + 40), dtype=np.uint8)
    # logical order: א (at left=10), ב (to its right) — physically L-to-R
    page[10 : 10 + h, 10 : 10 + w] |= A
    page[10 : 10 + h, 14 + w : 14 + 2 * w] |= B
    res = ocr_page_image(page, FIXTURE_CONFIG, idx)
    # log2vis with an RTL base reverses the glyph sequence visually:
    # physically-left א renders last
    assert res.text.strip() == "בא"


def test_split_of_top_bridged_pair():
    """Two 'l' bars joined by a 1-px top bridge: the path walk correctly
    FAILS (every start pixel on the glyph's top row is ink —
    tryPathSeparation needs a blank start, segment.c:1577) and the
    straight sweep (tolerant of the bridge remnant) splits instead."""
    idx = get_font_index()
    l = glyph_bitmap("l")
    h, w = l.shape
    page = np.zeros((h + 20, 4 * w + 80), dtype=np.uint8)
    page[10 : 10 + h, 10 : 10 + w] |= l            # page-average anchors
    page[10 : 10 + h, 20 + w : 20 + 2 * w] |= l
    x = 40 + 2 * w
    page[10 : 10 + h, x : x + w] |= l
    page[10 : 10 + h, x + w + 2 : x + 2 * w + 2] |= l
    page[10, x : x + 2 * w + 2] = 1                # the bridge
    seg = PageSegmenter(page, FIXTURE_CONFIG, idx)
    assert seg.find_lines(0)
    glyphs = [g for li in seg.lines for g in li.glyphs]
    assert len(glyphs) == 3
    seg.build_tuples()
    # the path walk refuses: every start pixel on the top row is ink
    bridged = max(glyphs, key=lambda g: g.width)
    assert seg.try_path_separation(bridged) is None
    seg.split_wide_glyphs()
    assert len([g for li in seg.lines for g in li.glyphs]) == 4
