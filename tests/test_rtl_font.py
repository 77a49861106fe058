"""Real Hebrew fixture font: RTL sniffing and visual assembly with actual
RTL glyph shapes (not relabeled Latin ones)."""

import numpy as np

from tensorflow_ocr_ray.config import FIXTURE_CONFIG
from tensorflow_ocr_ray.core.page import ocr_page_image
from tensorflow_ocr_ray.fonts import (
    font_labels,
    get_font_index,
    glyph_bitmap,
    glyph_cell_top_offset,
)


def _render_line(word: str, gap: int = 6, margin: int = 12) -> np.ndarray:
    bmps = [(glyph_bitmap(c), glyph_cell_top_offset(c)) for c in word]
    h = max(t + b.shape[0] for b, t in bmps) + 2 * margin
    w = sum(b.shape[1] for b, _ in bmps) + gap * (len(bmps) - 1) + 2 * margin
    img = np.zeros((h, w), dtype=np.uint8)
    x = margin
    for b, t in bmps:
        img[margin + t : margin + t + b.shape[0], x : x + b.shape[1]] = b
        x += b.shape[1] + gap
    return img


def test_hebrew_index_is_rtl():
    idx = get_font_index(alphabet="hebrew")
    assert idx.rtl
    assert not get_font_index(alphabet="latin").rtl
    assert len(idx) >= len(font_labels("hebrew"))


def test_hebrew_glyphs_classify():
    idx = get_font_index(alphabet="hebrew")
    for label in font_labels("hebrew"):
        bmp = glyph_bitmap(label)
        h, w = bmp.shape
        page = np.zeros((h + 2, w + 2), dtype=np.uint8)
        page[1 : 1 + h, 1 : 1 + w] = bmp
        res = ocr_page_image(page, FIXTURE_CONFIG, idx)
        assert res.text.strip() == label


def test_hebrew_line_visual_order():
    """Glyphs laid out left-to-right spelling שלם in LOGICAL order; RTL
    assembly renders the line reversed (visual order)."""
    idx = get_font_index(alphabet="hebrew")
    img = _render_line("שלם")
    res = ocr_page_image(img, FIXTURE_CONFIG, idx)
    assert res.text.strip() == "םלש"


def test_hebrew_via_stage_spec(ray_session):
    """alphabet reaches the actor stages through the font spec."""
    from tensorflow_ocr_ray.stages.ocr_stages import OcrSpanStage

    stage = OcrSpanStage(font_spec={"kind": "builtin", "alphabet": "hebrew"})
    assert stage.index.rtl
