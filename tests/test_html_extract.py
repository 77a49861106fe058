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


def test_realistic_page_shapes():
    """Hand-written page skeletons in the wild shapes (nav + sidebar +
    article + footer; nested divs; table layout) — main prose recovered,
    chrome dropped.  Guards against the oracle's wrap-fixture closed
    loop: these inputs were never produced by the repo's boilerplate
    generator."""
    from tensorflow_ocr_ray.functions.html_extract import extract_main_content

    article = (
        "The migration of the monarch butterfly spans four generations "
        "and thousands of kilometres across North America every year."
    )
    second = (
        "Researchers tracked the insects with miniature radio tags and "
        "found unexpected stopover sites along the gulf coastline."
    )
    page = f"""
    <html><head><title>x</title><style>.a{{color:red}}</style></head>
    <body>
      <nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li>
        <li><a href="/about">About us</a></li></ul></nav>
      <div class="wrap">
        <aside><h3>Trending</h3>
          <a href="/1">Ten shocking facts</a> <a href="/2">You won't believe</a>
        </aside>
        <article>
          <h1>Monarch migration mapped</h1>
          <p>{article}</p>
          <p>{second}</p>
        </article>
      </div>
      <footer><a href="/tos">Terms</a> | <a href="/priv">Privacy</a>
        &copy; 2026 Example Corp</footer>
    </body></html>
    """
    out = extract_main_content(page)
    assert article in out
    assert second in out
    assert "Home" not in out and "Privacy" not in out
    assert "shocking" not in out  # link-dense sidebar dropped

    # table-layout page (1990s shape)
    table_page = f"""
    <table><tr><td><a href="/m1">Menu one</a> <a href="/m2">Menu two</a></td>
    <td>{article}</td></tr></table>
    """
    out2 = extract_main_content(table_page)
    assert article in out2
    assert "Menu one" not in out2


# ---------------- table extraction -----------------------------------------


def test_extract_tables_header_and_decoy():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_main_table,
        extract_tables,
        table_page_for,
    )

    page = table_page_for(5, "fr", "book")
    tables = extract_tables(page)
    assert len(tables) == 2                      # decoy nav + data table
    assert tables[0] == [["Home", "About"]]      # th-less decoy kept as data
    main = extract_main_table(page)
    assert main == [["50", "fr", "book-0"], ["51", "fr", "book-1"],
                    ["52", "fr", "book-2"]]


def test_extract_main_table_prefers_most_cells():
    from tensorflow_ocr_ray.functions.html_extract import extract_main_table

    html = (
        "<table><tr><td>a</td><td>b</td></tr></table>"
        "<table><tr><td>1</td></tr><tr><td>2</td></tr>"
        "<tr><td>3</td></tr></table>"
    )
    assert extract_main_table(html) == [["1"], ["2"], ["3"]]


def test_extract_tables_th_only_rows_dropped_entities_unescaped():
    from tensorflow_ocr_ray.functions.html_extract import extract_tables

    html = ("<table><tr><th>h1</th><th>h2</th></tr>"
            "<tr><td> a&amp;b </td><th>mixed</th></tr></table>")
    # th-ONLY row dropped; mixed td/th row is data; entities unescaped
    assert extract_tables(html) == [[["a&b", "mixed"]]]


def test_extract_tables_none():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_main_table,
        extract_tables,
    )

    assert extract_tables("<p>no tables here</p>") == []
    assert extract_main_table("<p>none</p>") == []


# ---------------- outlink extraction ---------------------------------------


def test_extract_outlinks_filters_and_folds():
    from tensorflow_ocr_ray.functions.html_extract import extract_outlinks

    html = ('<a href="/rel">r</a> <a href="#f">f</a> '
            '<a href="mailto:a@b.c">m</a> <a href="javascript:x()">j</a> '
            "<a href='HTTPS://WWW.Example.COM/path?q=1'>abs</a> "
            '<a class="x" href=http://plain.org>bare</a>')
    assert extract_outlinks(html) == ["www.example.com", "plain.org"]


def test_link_page_decoys_ignored():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_outlinks,
        link_page_for,
    )

    # doc 6: k in 0..2 -> hosts (42+k)%50, scheme alternates, HOST folds
    assert extract_outlinks(link_page_for(6)) == [
        "host42.example", "host43.example", "host44.example"]
    # doc 0: exactly one outlink, every decoy dropped
    assert extract_outlinks(link_page_for(0)) == ["host0.example"]
