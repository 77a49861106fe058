"""PDF document-information dictionary (trailer /Info) — the metadata
sidecar of the layout parse (:mod:`core.pdftext` reads content streams;
this reads the object tree's Info dict).

Real-PDF hazards covered: literal strings with ESCAPED parens and
backslashes (``(Doc 7 \\(v2\\))``), hex strings (``<41424344>``), and a
decoy ``/Title`` inside a content stream that must never win over the
trailer-referenced Info object.

Fixture synthesis is deterministic ``doc_id`` arithmetic (the repo's
media_* convention) so a DuckDB oracle re-derives every field without
parsing a byte.
"""

from __future__ import annotations

import re

_INFO_REF = re.compile(rb"/Info\s+(\d+)\s+0\s+R")
_NAME_VAL = re.compile(
    rb"/(Title|Author|CreationDate)\s*(\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)"
)
_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _pdf_string(tok: bytes) -> str:
    """Decode one PDF string token — literal ``(...)`` with escapes or
    hex ``<...>``."""
    if tok.startswith(b"<"):
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1:i + 2]
            out += _ESC.get(nxt, nxt)
            i += 2
        else:
            out += c
            i += 1
    return out.decode("latin-1")


def extract_pdf_info(payload: bytes) -> dict:
    """``{"title", "author", "created_year"}`` from the trailer's
    /Info object; empty-string / -1 when absent.  Only the trailer
    REFERENCE decides which object is the Info dict — a /Title
    appearing anywhere else (content stream decoy) is not metadata."""
    out = {"title": "", "author": "", "created_year": -1}
    tpos = payload.rfind(b"trailer")
    if tpos < 0:
        return out
    m = _INFO_REF.search(payload, tpos)
    if not m:
        return out
    num = int(m.group(1))
    opos = re.search(rb"(?<![0-9])%d\s+0\s+obj" % num, payload)
    if not opos:
        return out
    end = payload.find(b"endobj", opos.end())
    body = payload[opos.end():end if end >= 0 else len(payload)]
    for name, tok in _NAME_VAL.findall(body):
        val = _pdf_string(tok)
        if name == b"Title":
            out["title"] = val
        elif name == b"Author":
            out["author"] = val
        elif name == b"CreationDate":
            ym = re.match(r"D:(\d{4})", val)
            if ym:
                out["created_year"] = int(ym.group(1))
    return out


def pdf_with_info_for(doc_id: int) -> bytes:
    """Minimal one-page PDF whose Info dict derives from ``doc_id``:
    title ``Doc {d} (v{d%5})`` (the parens are ESCAPED in the literal
    string), author ``A{d%20}`` (hex-encoded every third doc),
    creation year ``2000 + d % 30``.  A ``/Title (decoy)`` inside the
    content stream must never be read."""
    d = doc_id
    title = "Doc %d \\(v%d\\)" % (d, d % 5)
    if d % 3 == 0:
        author = "<%s>" % ("A%d" % (d % 20)).encode("latin-1").hex()
    else:
        author = "(A%d)" % (d % 20)
    stream = b"BT /Title (decoy) Td ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(stream), stream),
        ("<< /Title (%s) /Author %s /CreationDate (D:20%02d0101) >>"
         % (title, author, d % 30)).encode("latin-1"),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R /Info 5 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (len(objs) + 1, xref_at))
    return bytes(out)
