"""core/pdftext: PDF layout parse — text recovered from content
streams alone (no raster, no OCR).

Headline check: on the same Type3 vector PDFs the rasterizer is
pixel-exact on, the layout parser's line content must equal the
analytic expected OCR text (``expected_page_text``) — the two
extraction paths (parse layout vs rasterize+OCR) agree on WHAT the
page says.  The text-derived fixture (``vector_pdf_for_text``) is
exact including whitespace, which is what the ``pdf_layout_text``
oracle hashes corpus-wide.
"""

from __future__ import annotations

from tensorflow_ocr_ray.core.pdftext import extract_text_layout
from tensorflow_ocr_ray.fixtures import (
    expected_page_text,
    page_spec_for_ref,
    pdf_text_lines,
    vector_pdf_for_spec,
    vector_pdf_for_text,
)


def _line_content(s: str) -> list[str]:
    """Lines with indent/blank-line whitespace stripped (vertical
    whitespace reconstruction is the OCR assembly's job, not the
    layout parser's)."""
    return [ln.strip() for ln in s.split("\n") if ln.strip()]


def test_fixture_pages_match_expected_text():
    """30 deterministic pages (mixed fonts/indents/paragraph breaks):
    layout parse == analytic OCR truth, line for line."""
    for i in range(30):
        ref = f"pdftext-{i}/0"
        spec = page_spec_for_ref(ref)
        got = extract_text_layout(vector_pdf_for_spec(spec))
        exp = expected_page_text(spec)
        assert _line_content(got) == _line_content(exp), ref


def test_text_roundtrip_exact():
    """Text-derived PDFs round-trip EXACTLY (incl. spaces + the
    reversed second line) — the corpus oracle's contract."""
    cases = [
        "Héllo, wörld 42!",
        "a",
        "x" * 100,
        "iiii llll 1111 IIII",          # narrowest glyphs: avg width 9
        "WWWW mmmm",                     # widest
        "mixed Case 0123456789 and punct;;; ok",
    ]
    for t in cases:
        pdf = vector_pdf_for_text(t)
        assert pdf is not None
        assert extract_text_layout(pdf) == "\n".join(pdf_text_lines(t))


def test_empty_and_unrenderable_text():
    assert pdf_text_lines("") == []
    assert pdf_text_lines("   ;;; --- !!!") == []
    assert vector_pdf_for_text("¡™£¢") is None


def _simple_font_pdf(content: bytes, npages: int = 1) -> bytes:
    """Classic simple font (no CharProcs): /Widths metrics only —
    exercises the non-Type3 path (default 1/1000 FontMatrix, latin-1
    codes, width-table advances)."""
    widths = b" ".join(b"500" for _ in range(96))
    font = (b"5 0 obj\n<< /Type /Font /Subtype /Type1 "
            b"/BaseFont /Courier /FirstChar 32 /LastChar 127 "
            b"/Widths [ " + widths + b" ] >>\nendobj\n")
    kids = b" ".join(b"%d 0 R" % (10 + i) for i in range(npages))
    pages = b""
    for i in range(npages):
        pages += (b"%d 0 obj\n<< /Type /Page /Parent 2 0 R "
                  b"/MediaBox [0 0 612 792] "
                  b"/Resources << /Font << /F1 5 0 R >> >> "
                  b"/Contents %d 0 R >>\nendobj\n" % (10 + i, 20 + i))
        pages += (b"%d 0 obj\n<< /Length %d >>\nstream\n" % (20 + i, len(content))
                  + content + b"\nendstream\nendobj\n")
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [" + kids + b"] /Count %d >>\nendobj\n"
        % npages + font + pages +
        b"trailer\n<< /Size 30 /Root 1 0 R >>\n"
    )


def test_simple_font_td_tj_lines():
    """Td positioning + Tj with a width-table font: two lines, spaces
    carried IN the strings (code 32 has a width, paints nothing)."""
    content = (b"BT /F1 12 Tf 72 700 Td (Hello world) Tj "
               b"0 -20 Td (second line) Tj ET")
    got = extract_text_layout(_simple_font_pdf(content))
    assert got == "Hello world\nsecond line"


def test_tj_array_kerning_gap_becomes_space():
    """TJ negative adjustment opens a gap wider than the space
    threshold -> geometric word break (3 chars x 500/1000 x 12pt = 6pt
    avg width; -2000 adjustment = 24pt gap -> max(1, 24//6-1) = 3
    spaces)."""
    content = b"BT /F1 12 Tf 72 700 Td [(abc) -2000 (def)] TJ ET"
    got = extract_text_layout(_simple_font_pdf(content))
    assert got == "abc   def"


def test_tstar_and_quote_ops():
    """TL/T*/' line machinery: three baselines, top-to-bottom order."""
    content = (b"BT /F1 12 Tf 14 TL 72 700 Td (first) Tj "
               b"T* (second) Tj (third) ' ET")
    got = extract_text_layout(_simple_font_pdf(content))
    assert got == "first\nsecond\nthird"


def test_multipage_formfeed_join():
    content = b"BT /F1 12 Tf 72 700 Td (pg) Tj ET"
    got = extract_text_layout(_simple_font_pdf(content, npages=2))
    assert got == "pg\fpg"


def test_out_of_order_show_ops_sort_by_layout():
    """Show operators emitted in scrambled order still assemble in
    layout order — position decides, not stream order."""
    content = (b"BT /F1 12 Tf "
               b"1 0 0 1 108 680 Tm (B) Tj "      # line 2, second col
               b"1 0 0 1 72 700 Tm (A) Tj "       # line 1
               b"1 0 0 1 72 680 Tm (a) Tj "       # line 2, first col
               b"ET")
    got = extract_text_layout(_simple_font_pdf(content))
    assert got.split("\n")[0] == "A"
    assert got.split("\n")[1].startswith("a")
    assert got.split("\n")[1].endswith("B")


def test_two_column_reading_order():
    """A projection gutter supported by two baselines on each side
    splits columns: left column read fully before the right (the
    raster find_borders analogue)."""
    content = (b"BT /F1 12 Tf "
               b"1 0 0 1 72 700 Tm (L1a) Tj "
               b"1 0 0 1 72 680 Tm (L2a) Tj "
               b"1 0 0 1 300 700 Tm (R1b) Tj "
               b"1 0 0 1 300 680 Tm (R2b) Tj "
               b"ET")
    got = extract_text_layout(_simple_font_pdf(content))
    assert got == "L1a\nL2a\nR1b\nR2b"


def test_wide_word_gap_is_not_a_column():
    """The same horizontal gap WITHOUT two-baseline support on both
    sides stays a word gap (one line) / stays merged (second line has
    no right-side text)."""
    content = (b"BT /F1 12 Tf "
               b"1 0 0 1 72 700 Tm (left) Tj "
               b"1 0 0 1 300 700 Tm (right) Tj "
               b"1 0 0 1 72 680 Tm (only) Tj "
               b"ET")
    got = extract_text_layout(_simple_font_pdf(content))
    lines = got.split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("left") and lines[0].endswith("right")
    assert lines[1] == "only"
