"""WARC-style record stream parsing — the ingestion step of a web
corpus: one blob holds MANY length-prefixed records (version line +
header lines + ``Content-Length`` + blank line + payload + separator),
and the reader must walk headers to find each payload boundary —
offsets are not stored anywhere.

The subset implemented is the framing layer (what a 100-TB reader
actually needs to split records): version line, ``WARC-Type`` and
``Content-Length`` headers (other headers skipped, order-insensitive),
CRLF discipline, double-CRLF record separator.  Stateless per blob, so
the parse is a plain task map over the payload column — the scale
contract is one record stream per row, never one giant file.
"""

from __future__ import annotations

import re

_SEP = b"\r\n\r\n"


def warc_stream_for(doc_id: int) -> bytes:
    """Deterministic multi-record stream for ``doc_id`` (fixture
    synthesis): ``1 + doc_id % 3`` records; record ``r`` has type
    ``response`` iff ``(doc_id+r) % 2 == 0`` else ``request``, payload
    length ``10 + (3*doc_id + r) % 23`` and payload bytes
    ``(doc_id + r + j) % 251`` — every quantity arithmetic so a SQL
    oracle re-derives the parse without parsing."""
    out = bytearray()
    for r in range(1 + doc_id % 3):
        rec_type = "response" if (doc_id + r) % 2 == 0 else "request"
        n = 10 + (3 * doc_id + r) % 23
        payload = bytes((doc_id + r + j) % 251 for j in range(n))
        out += (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Record-ID: <urn:test:{doc_id}-{r}>\r\n"
            f"Content-Length: {n}\r\n"
            f"\r\n"
        ).encode()
        out += payload
        out += _SEP
    return bytes(out)


def parse_warc_stream(blob: bytes) -> list[tuple[str, int, int]]:
    """Walk the record stream; per record return ``(rec_type,
    content_length, payload_byte_sum)``.  Raises ValueError on a
    malformed stream (bad version line, missing Content-Length,
    truncated payload) — a corrupt blob must fail loudly, not emit
    partial records."""
    out: list[tuple[str, int, int]] = []
    pos = 0
    n_total = len(blob)
    while pos < n_total:
        head_end = blob.find(_SEP, pos)
        if head_end < 0:
            raise ValueError("unterminated record header")
        head = blob[pos:head_end].decode("ascii")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad version line {lines[0]!r}")
        rec_type, length = None, None
        for ln in lines[1:]:
            name, _, value = ln.partition(":")
            name = name.strip().lower()
            if name == "warc-type":
                rec_type = value.strip()
            elif name == "content-length":
                length = int(value.strip())
        if rec_type is None or length is None:
            raise ValueError("missing WARC-Type / Content-Length")
        body_start = head_end + len(_SEP)
        body_end = body_start + length
        if blob[body_end:body_end + len(_SEP)] != _SEP:
            raise ValueError("truncated or unterminated payload")
        payload = blob[body_start:body_end]
        out.append((rec_type, length, int(sum(payload))))
        pos = body_end + len(_SEP)
    return out


# ---------------- HTTP response-head parsing --------------------------------

def http_response_for(doc_id: int) -> bytes:
    """Deterministic raw HTTP response head for one fetch: status 404
    every 13th doc, 301 (with a Location header) every 7th surviving
    doc, else 200; Content-Type text/html except every 4th doc
    (application/pdf); header-name case varies and an X- decoy header
    is always present."""
    d = doc_id
    if d % 13 == 0:
        status = b"HTTP/1.1 404 Not Found"
    elif d % 7 == 0:
        status = b"HTTP/1.1 301 Moved Permanently"
    else:
        status = b"HTTP/1.1 200 OK"
    ctype = b"application/pdf" if d % 4 == 0 else b"text/html; charset=utf-8"
    lines = [status,
             b"Server: fixture",
             b"content-TYPE: " + ctype,
             b"X-Decoy-Location: https://never.example/"]
    if d % 13 != 0 and d % 7 == 0:
        lines.append(b"LOCATION: https://s%d.example.com/moved/%d"
                     % (d % 7, d))
    return b"\r\n".join(lines) + b"\r\n\r\n<body>"


def parse_http_response(raw: bytes) -> tuple[int, str, str]:
    """(status, content_type_token, location) from a raw response —
    header names case-insensitive, the mime token cut before any
    ``;`` params, ``X-*`` decoys never matched, body bytes ignored."""
    head = raw.split(b"\r\n\r\n", 1)[0].decode("latin-1")
    lines = head.split("\r\n")
    status = int(lines[0].split(" ", 2)[1])
    ctype, loc = "", ""
    for line in lines[1:]:
        name, _, val = line.partition(":")
        key = name.strip().lower()
        if key == "content-type":
            ctype = val.split(";", 1)[0].strip().lower()
        elif key == "location":
            loc = val.strip()
    return status, ctype, loc


def cache_head_for(doc_id: int) -> bytes:
    """Cache-policy response head: ``no-store`` every 11th doc, else
    ``max-age=(doc_id%7)*600`` (zero every 7th — immediately stale);
    ETag present unless ``doc_id%5==0``; header-name case varies and
    the ``X-Cache-Decoy`` header never matches."""
    d = doc_id
    if d % 11 == 0:
        cc = b"Cache-Control: no-store"
    else:
        cc = b"cache-control: public, max-age=%d" % ((d % 7) * 600)
    lines = [b"HTTP/1.1 200 OK", cc,
             b"X-Cache-Decoy: max-age=99999"]
    if d % 5 != 0:
        lines.append(b'etag: "v%d"' % (d * 3))
    return b"\r\n".join(lines) + b"\r\n\r\n"


def parse_cache_head(raw: bytes) -> tuple[int, int, int, str]:
    """(max_age, no_store, has_etag, policy) — policy buckets a
    recrawl scheduler routes on: ``no-store`` / ``fresh`` (positive
    max-age) / ``etag-only`` (revalidate) / ``unvalidated``."""
    head = raw.split(b"\r\n\r\n", 1)[0].decode("latin-1")
    max_age, no_store, has_etag = 0, 0, 0
    for line in head.split("\r\n")[1:]:
        name, _, val = line.partition(":")
        key = name.strip().lower()
        if key == "cache-control":
            v = val.lower()
            if "no-store" in v:
                no_store = 1
            m = re.search(r"max-age=(\d+)", v)
            if m:
                max_age = int(m.group(1))
        elif key == "etag":
            has_etag = 1
    if no_store:
        policy = "no-store"
    elif max_age > 0:
        policy = "fresh"
    elif has_etag:
        policy = "etag-only"
    else:
        policy = "unvalidated"
    return max_age, no_store, has_etag, policy


# ---------------- MIME multipart ---------------------------------------------


def mime_for(doc_id: int) -> bytes:
    """Deterministic multipart/mixed message: ``doc_id%3+1`` parts,
    content-type alternating text/plain / text/html by ``(d+i)%2``,
    transfer-encoding base64 on even parts and quoted-printable on odd
    parts (payload carries a literal ``=`` to force a ``=3D`` escape);
    the preamble and epilogue are the framing decoys."""
    import base64 as _b64

    d = doc_id
    bnd = b"b%d" % d
    out = [b"MIME-Version: 1.0",
           b"Content-Type: multipart/mixed; boundary=%s" % bnd,
           b"",
           b"This preamble is not a part."]
    for i in range(d % 3 + 1):
        payload = ("mime %d part %d =ok" % (d, i)).encode()
        ctype = b"text/plain" if (d + i) % 2 == 0 else b"text/html"
        if i % 2 == 0:
            enc, body = b"base64", _b64.b64encode(payload)
        else:
            enc, body = b"quoted-printable", payload.replace(
                b"=", b"=3D")
        out += [b"--" + bnd,
                b"Content-Type: " + ctype,
                b"Content-Transfer-Encoding: " + enc,
                b"",
                body]
    out += [b"--" + bnd + b"--", b"Epilogue decoy."]
    return b"\r\n".join(out)


_QP_HEX = re.compile(rb"=([0-9A-F]{2})")


def parse_mime(raw: bytes) -> list[tuple[int, str, str, str]]:
    """(part_idx, content_type, encoding, decoded_text) per part —
    boundary from the top-level Content-Type, preamble/epilogue
    dropped, base64 and quoted-printable payloads decoded."""
    import base64 as _b64

    head, _, rest = raw.partition(b"\r\n\r\n")
    m = re.search(rb"boundary=([^\s;]+)", head)
    if not m:
        return []
    bnd = b"--" + m.group(1)
    chunks = rest.split(bnd)
    out = []
    # chunks[0] = preamble; last chunk after the closing "--" marker
    for chunk in chunks[1:]:
        if chunk.startswith(b"--"):
            break
        ph, _, body = chunk.strip(b"\r\n").partition(b"\r\n\r\n")
        ctype, enc = "", "7bit"
        for line in ph.split(b"\r\n"):
            name, _, val = line.partition(b":")
            key = name.strip().lower()
            if key == b"content-type":
                ctype = val.strip().decode().lower()
            elif key == b"content-transfer-encoding":
                enc = val.strip().decode().lower()
        if enc == "base64":
            text = _b64.b64decode(body).decode()
        elif enc == "quoted-printable":
            text = _QP_HEX.sub(
                lambda g: bytes([int(g.group(1), 16)]), body).decode()
        else:
            text = body.decode()
        out.append((len(out), ctype, enc, text))
    return out
