"""Property tests for the round-5 web-tier parsers — synthesis→parse
roundtrips on RANDOM content, not just the fixture arithmetic (no Ray
needed)."""

import html as _htmlmod
import re

from hypothesis import given, settings, strategies as st

# text with no markup-significant characters (the parsers' contract is
# markup in, text out — angle brackets in source text are entity-escaped
# by any sane generator, which escape-roundtrip tests cover separately)
_plain = st.text(
    alphabet=st.characters(
        blacklist_characters="<>&\x00", blacklist_categories=("Cs", "Cc")),
    min_size=1, max_size=40,
).map(lambda s: re.sub(r"\s+", " ", s).strip()).filter(bool)


@settings(max_examples=80, deadline=None)
@given(st.lists(_plain, min_size=1, max_size=6))
def test_code_block_roundtrip_random_lines(lines):
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_code_blocks,
    )

    code = "\n".join(_htmlmod.escape(ln) for ln in lines)
    html = ("<body><pre><code class=\"language-py\">"
            + code + "</code></pre></body>")
    blocks = extract_code_blocks(html)
    assert blocks == [("py", "\n".join(lines))]


@settings(max_examples=80, deadline=None)
@given(_plain, _plain)
def test_pdf_info_string_escaping_roundtrip(title, author):
    from tensorflow_ocr_ray.functions.pdfmeta import (
        extract_pdf_info,
        pdf_with_info_for,
    )

    # splice arbitrary latin-1-safe strings into the Info dict with
    # proper PDF escaping; the parser must invert it exactly
    t = title.encode("latin-1", "replace").decode("latin-1")
    a = author.encode("latin-1", "replace").decode("latin-1")

    def esc(s: str) -> str:
        return (s.replace("\\", r"\\")
                 .replace("(", r"\(").replace(")", r"\)"))

    pdf = pdf_with_info_for(1)
    pdf = pdf.replace(b"(Doc 1 \\(v1\\))",
                      b"(" + esc(t).encode("latin-1") + b")")
    pdf = pdf.replace(b"(A1)", b"(" + esc(a).encode("latin-1") + b")")
    info = extract_pdf_info(pdf)
    assert info["title"] == t
    assert info["author"] == a


_mime = st.from_regex(r"[a-z]{1,10}/[a-z0-9.+-]{1,12}", fullmatch=True)


@settings(max_examples=80, deadline=None)
@given(st.integers(100, 599), _mime, st.booleans())
def test_http_response_arbitrary_status_and_ctype(status, mime, params):
    from tensorflow_ocr_ray.functions.warc import parse_http_response

    ct = mime + ("; charset=utf-8" if params else "")
    raw = ("HTTP/1.1 %d Z\r\ncOntEnt-tYpE: %s\r\n"
           "X-Decoy-Location: https://no.example/\r\n\r\nbody"
           % (status, ct)).encode("latin-1")
    s, got_ct, loc = parse_http_response(raw)
    assert (s, got_ct, loc) == (status, mime, "")


@settings(max_examples=60, deadline=None)
@given(st.lists(_plain, min_size=1, max_size=5))
def test_breadcrumb_roundtrip_random_items(items):
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_breadcrumb,
    )

    lis = "".join("<li>%s</li>" % _htmlmod.escape(i) for i in items)
    html = '<nav class="breadcrumb"><ol>%s</ol></nav>' % lis
    depth, path = extract_breadcrumb(html)
    assert depth == len(items)
    assert path == " > ".join(items)
