"""Single-process end-to-end: OCR of rendered fixture pages must equal the
analytic expected text (computed from construction geometry, independent of
the pipeline code — SURVEY.md §5)."""

import numpy as np
import pytest

from tensorflow_ocr_ray.config import FIXTURE_CONFIG, OCRFAILS
from tensorflow_ocr_ray.core.page import ocr_page_image, ocr_payload
from tensorflow_ocr_ray.fixtures import (
    PageSpec,
    expected_page_text,
    page_spec_for_ref,
    payload_for_ref,
    render_page,
    truth_for_ref,
)
from tensorflow_ocr_ray.fonts import get_font_index


@pytest.fixture(scope="module")
def index():
    return get_font_index()


def test_single_line_exact(index):
    spec = PageSpec(lines=["Hello World"], indents=[0], para_breaks=[False])
    res = ocr_page_image(render_page(spec), FIXTURE_CONFIG, index)
    assert res.text == expected_page_text(spec) == "Hello World\n"


def test_digits_and_mixed_case(index):
    spec = PageSpec(lines=["A42 zero B7"], indents=[0], para_breaks=[False])
    res = ocr_page_image(render_page(spec), FIXTURE_CONFIG, index)
    assert res.text == "A42 zero B7\n"


def test_multiline_with_indent_and_break(index):
    spec = PageSpec(
        lines=["the quick brown", "fox jumps", "over the lazy dog"],
        indents=[0, 2, 0],
        para_breaks=[False, False, True],
    )
    res = ocr_page_image(render_page(spec), FIXTURE_CONFIG, index)
    assert res.text == expected_page_text(spec)


def test_dotted_letters_combine(index):
    # i and j segment as two components; the combine path must produce
    # single glyphs and the truth model must agree on resulting spacing
    spec = PageSpec(lines=["jig jig"], indents=[0], para_breaks=[False])
    res = ocr_page_image(render_page(spec), FIXTURE_CONFIG, index)
    assert res.text == expected_page_text(spec)
    assert "jig jig" in res.text


def test_payload_roundtrip_random_refs(index):
    for ref in ["page-42-000000-0", "page-42-000007-3", "page-7-000001-2"]:
        res = ocr_payload(payload_for_ref(ref), FIXTURE_CONFIG, index,
                          collect_glyphs=False)
        assert res.text == truth_for_ref(ref), f"mismatch for {ref}"


def test_gray_payload_binarized(index):
    # refs whose spec chose gray encoding exercise the binarizer
    found = False
    for d in range(20):
        ref = f"page-42-{d:06d}-0"
        if page_spec_for_ref(ref).gray:
            found = True
            res = ocr_payload(payload_for_ref(ref), FIXTURE_CONFIG, index,
                              collect_glyphs=False)
            assert res.text == truth_for_ref(ref)
            break
    assert found


def test_unknown_glyph_yields_ocrfails(index):
    # a solid blob matches nothing in the font within minMatch
    img = np.zeros((40, 40), dtype=np.uint8)
    img[5:35, 5:35] = 1
    res = ocr_page_image(img, FIXTURE_CONFIG, index)
    assert OCRFAILS in res.text


def test_glyph_records_ordered(index):
    spec = PageSpec(lines=["abc", "def"], indents=[0, 0],
                    para_breaks=[False, False])
    res = ocr_page_image(render_page(spec), FIXTURE_CONFIG, index)
    keys = [(g.column, g.line_idx, g.glyph_idx) for g in res.glyphs]
    assert keys == sorted(keys)
    assert [g.label for g in res.glyphs] == list("abcdef")
    assert all(g.features.shape == (27,) for g in res.glyphs)


def test_prediction_substitution_positional(index):
    # the -P mode: labels replaced positionally in glyph order
    spec = PageSpec(lines=["ab"], indents=[0], para_breaks=[False])
    img = render_page(spec)
    res = ocr_page_image(img, FIXTURE_CONFIG, index, predictions=["X", "Y"])
    assert res.text == "XY\n"


def test_flood_fill_e2e_matches_xycut(index):
    # -x (flood) and the default XY-cut agree on fixture pages
    spec = PageSpec(
        lines=["the quick brown", "fox jumps over"],
        indents=[0, 1], para_breaks=[False, False],
    )
    img = render_page(spec)
    cfg = FIXTURE_CONFIG.with_(use_flood=True)
    res = ocr_page_image(img.copy(), cfg, index)
    assert res.text == expected_page_text(spec)


def test_two_column_page(index):
    # -c 2: left column read first (LTR), then right (main/main.c:250-295)
    left = render_page(
        PageSpec(lines=["ab", "cd"], indents=[0, 0],
                 para_breaks=[False, False]))
    right = render_page(
        PageSpec(lines=["xy", "zw"], indents=[0, 0],
                 para_breaks=[False, False]))
    h = max(left.shape[0], right.shape[0])
    page = np.zeros((h, left.shape[1] + right.shape[1] + 40), dtype=np.uint8)
    page[: left.shape[0], : left.shape[1]] = left
    page[: right.shape[0], left.shape[1] + 40 :] = right
    cfg = FIXTURE_CONFIG.with_(columns=2)
    res = ocr_page_image(page, cfg, index)
    flat = res.text.replace("\n", " ").split()
    assert flat == ["ab", "cd", "xy", "zw"]


def test_kafka_preset_large_scale():
    """The reference's tuned Kafka flag set (-H600 -W600 -x -i -p1.8
    -s0.4 -A -m1.1) on a large-scale rendered page."""
    from tensorflow_ocr_ray.config import KAFKA_CONFIG
    from tensorflow_ocr_ray.fonts import get_font_index

    spec = PageSpec(lines=["Hello World", "fox jumps"], indents=[0, 1],
                    para_breaks=[False, False], scale=8, letter_gap=10,
                    word_gap=50, line_gap=36, margin=30)
    res = ocr_page_image(
        render_page(spec), KAFKA_CONFIG.with_(no_shear=True),
        get_font_index(scale=8),
    )
    assert res.text == expected_page_text(spec)


def test_deskew_in_the_loop(index):
    """A physically sheared page is recovered by the shear search before
    segmentation (readPicture.c:145-221)."""
    from tensorflow_ocr_ray.core.raster import apply_shear

    spec = PageSpec(lines=["the quick brown fox"], indents=[0],
                    para_breaks=[False], margin=24)
    sheared = apply_shear(render_page(spec).copy(), 3, 100)
    res = ocr_page_image(sheared, FIXTURE_CONFIG.with_(no_shear=False), index)
    assert res.text == expected_page_text(spec)


def test_multipage_payload_preserves_page_order(ray_session):
    """A 3-page TIFF payload OCRs to the concatenation of its pages'
    texts in directory order, and glyph records carry page_idx
    (ref main/readPicture.c:223-233)."""
    from tensorflow_ocr_ray.config import FIXTURE_CONFIG
    from tensorflow_ocr_ray.core.page import ocr_page_image, ocr_payload
    from tensorflow_ocr_ray.core.raster import encode_tiff_multi
    from tensorflow_ocr_ray.fixtures import page_spec_for_ref, render_page
    from tensorflow_ocr_ray.fonts import get_font_index

    idx = get_font_index()
    specs = [page_spec_for_ref(f"page-42-{d:06d}-0") for d in range(3)]
    images = [render_page(s) for s in specs]
    payload = encode_tiff_multi(images, bilevel=True, compression="g4")
    res = ocr_payload(payload, FIXTURE_CONFIG, idx)
    singles = [ocr_page_image(img, FIXTURE_CONFIG, idx) for img in images]
    assert res.text == "".join(s.text for s in singles)
    assert sorted(set(g.page_idx for g in res.glyphs)) == [0, 1, 2]
    assert res.n_glyphs == sum(s.n_glyphs for s in singles)


def test_prediction_shortfall_raises(index):
    import pytest

    spec = PageSpec(lines=["ab"], indents=[0], para_breaks=[False])
    img = render_page(spec)
    with pytest.raises(ValueError, match="prediction list exhausted"):
        ocr_page_image(img, FIXTURE_CONFIG, index, predictions=["X"])
