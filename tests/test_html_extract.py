"""HTML boilerplate strip (the extraction tier's DOM-heuristic op)."""

from __future__ import annotations

import pandas as pd

from tensorflow_ocr_ray.functions.html_extract import (
    extract_main_content,
    wrap_in_boilerplate,
)


def test_recovers_wrapped_text_exactly():
    text = "The quick brown fox jumps over the lazy dog again and again."
    assert extract_main_content(wrap_in_boilerplate("d1", text)) == text


def test_entities_roundtrip():
    text = "Angle <brackets> & ampersands \"quotes\" survive the trip fine."
    assert extract_main_content(wrap_in_boilerplate("d2", text)) == text


def test_boilerplate_only_page_yields_nothing():
    html = ("<html><body><nav><a href='/'>Home</a><a href='/x'>X</a></nav>"
            "<footer><a href='/tos'>ToS</a> (c) 2024</footer></body></html>")
    assert extract_main_content(html) == ""


def test_link_dense_block_dropped_long_prose_kept():
    html = ("<div><a href='/1'>one</a> <a href='/2'>two</a> "
            "<a href='/3'>three four five six seven</a></div>"
            "<p>This paragraph has plenty of plain prose text and just "
            "one <a href='/ref'>link</a> inside it, so it stays.</p>")
    out = extract_main_content(html)
    assert "plenty of plain prose" in out
    assert "one two three" not in out


def test_script_style_comment_noise_removed():
    html = ("<html><head><style>p { color: red; }</style>"
            "<script>if (a < b) { alert('hello world from script'); }"
            "</script></head><body><!-- a comment with words words words "
            "words words --><p>Actual visible article content long enough "
            "to keep around here.</p></body></html>")
    out = extract_main_content(html)
    assert out == ("Actual visible article content long enough to keep "
                   "around here.")


def test_multiple_paragraphs_join_in_order():
    html = ("<article><p>First paragraph of the piece with enough text "
            "to pass.</p><p>Second paragraph of the piece with enough "
            "text to pass.</p></article>")
    out = extract_main_content(html)
    assert out.split("\n") == [
        "First paragraph of the piece with enough text to pass.",
        "Second paragraph of the piece with enough text to pass.",
    ]


def test_query_matches_documents_text(ray_session):
    import __ray_entry__ as E

    res = E.queries()["html_main_content"]("/root/testdata/sf0.001")
    df = res.to_pandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    m = df.merge(docs, on="doc_id")
    assert (m["extracted"] == m["text"]).all()
    assert (m["n_blocks"] == 1).all()
