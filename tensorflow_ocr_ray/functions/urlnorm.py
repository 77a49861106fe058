"""URL canonicalization — the normalize step of every crawl frontier
and link-graph builder (reference analogue: the host folding its
``-h`` HTML tier performs before link accounting; here the FULL
canonical form, not just the host).

Rules applied, in order (the RFC 3986 §6 normalizations every crawler
agrees on, plus the one policy rule — tracking-param removal — that a
dedup tier needs):

1. scheme and host lowercase;
2. default port dropped (``:80`` for http, ``:443`` for https);
   non-default ports kept;
3. path dot-segments resolved (``/a/./b/../c`` → ``/a/c``, RFC 3986
   §5.2.4);
4. query parameters: ``utm_*`` tracking params dropped, the rest
   sorted by name (stable for equal names);
5. fragment dropped.

Pure string functions — no network, no stdlib ``urllib`` dependency on
parse quirks; the grammar subset handled is exactly the http(s) URL
shape a crawler's extractor emits.
"""

from __future__ import annotations

import re

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/:?#]+)"
    r"(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#.*)?$"
)

_DEFAULT_PORT = {"http": "80", "https": "443"}


def _resolve_dots(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    return "/".join(out) or "/"


def canonicalize_url(raw: str) -> str | None:
    """Canonical form of an http(s) URL, or None if ``raw`` is not an
    absolute http(s) URL (relative links, mailto:, javascript: — the
    same non-web shapes :func:`html_extract.extract_outlinks` skips)."""
    m = _URL_RE.match(raw.strip())
    if not m:
        return None
    scheme = m.group("scheme").lower()
    if scheme not in ("http", "https"):
        return None
    host = m.group("host").lower()
    port = m.group("port")
    port_part = ""
    if port and port != _DEFAULT_PORT[scheme]:
        port_part = f":{port}"
    path = _resolve_dots(m.group("path") or "/")
    query = m.group("query") or ""
    params = [
        p for p in query.split("&")
        if p and not p.split("=", 1)[0].lower().startswith("utm_")
    ]
    params.sort(key=lambda p: p.split("=", 1)[0])
    q_part = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{port_part}{path}{q_part}"


def raw_urls_for(doc_id: int) -> list[str]:
    """Deterministic messy-URL synthesis for ``doc_id`` (the fixture
    convention: generation stands in for the crawl-log read a
    deployment does).  ``1 + doc_id % 3`` URLs, each exercising every
    canonicalization rule: upper-cased scheme and host, a default OR
    non-default port, dot-segments, a ``utm_`` tracking param, unsorted
    params, and a fragment.

    Canonical form (the arithmetic identity the SQL oracle re-derives):
    ``{http|https}://host{(3*doc_id+k)%40}.example.com[:8080]``
    ``/a/q{(doc_id+k)%7}/doc?a={doc_id%5}&b={k}`` — scheme http iff
    ``(doc_id+k)%2==0``, ``:8080`` kept iff ``(doc_id+k)%5==0``."""
    urls = []
    for k in range(1 + doc_id % 3):
        s = doc_id + k
        scheme = "HTTP" if s % 2 == 0 else "HTTPS"
        host = f"Host{(3 * doc_id + k) % 40}.Example.COM"
        if s % 5 == 0:
            port = ":8080"
        elif s % 3 == 0:
            port = ":80" if s % 2 == 0 else ":443"
        else:
            port = ""
        m = s % 7
        path = f"/a/./q{m}/../q{m}/doc"
        query = f"utm_source=feed&b={k}&a={doc_id % 5}"
        urls.append(f"{scheme}://{host}{port}{path}?{query}#s{k}")
    return urls


# ---------------- path-template mining --------------------------------------

_DIGITS = re.compile(r"^\d+$")


def template_urls_for(doc_id: int) -> list[str]:
    """Deterministic URL-pattern fixture: every doc contributes a detail
    page and a nested user/post page (numeric ids in the path), docs
    divisible by 3 also a static ``/about`` — three path shapes whose
    numeric segments must generalize to the same templates."""
    host = "site%d.example.com" % (doc_id % 5)
    urls = [
        "https://%s/p/%d/detail" % (host, doc_id),
        "https://%s/u/%d/posts/%d" % (host, doc_id % 50, doc_id),
    ]
    if doc_id % 3 == 0:
        urls.append("https://%s/about" % host)
    return urls


def path_template(url: str) -> tuple[str, str] | None:
    """(host, template) with every all-digit path segment generalized
    to ``{n}`` — the URL-pattern key a crawl scheduler and a
    template-page detector cluster on."""
    canon = canonicalize_url(url)
    if canon is None:
        return None
    rest = canon.split("://", 1)[1]
    host, _, path = rest.partition("/")
    host = host.split(":", 1)[0]
    segs = [
        "{n}" if _DIGITS.match(s) else s
        for s in ("/" + path).split("/")
    ]
    return host, "/".join(segs) or "/"


# ---------------- crawl-frontier synthesis ----------------------------------


def frontier_urls_for(doc_id: int) -> list[tuple[str, str]]:
    """(raw_url, source) candidates a crawl frontier merges for one
    document: its sitemap entries plus its extracted outlinks.  Planted
    structure: on even docs the link side re-discovers the sitemap's
    first URL in MESSY form (upper-case scheme/host, default port,
    dot-segment, fragment — only canonicalization collapses the pair);
    ``/about`` is shared by every third doc (cross-document dedup);
    ``/u/...`` paths will be robots-dropped on odd-digit hosts."""
    out: list[tuple[str, str]] = []
    for i in range(doc_id % 4 + 1):
        out.append((
            "https://site%d.example.com/p/%d/%d" % (doc_id % 7, doc_id, i),
            "sitemap",
        ))
    h5 = doc_id % 5
    out.append((
        "https://site%d.example.com/p/%d/detail" % (h5, doc_id), "link"))
    out.append((
        "https://site%d.example.com/u/%d/posts/%d"
        % (h5, doc_id % 50, doc_id), "link"))
    if doc_id % 3 == 0:
        out.append(("https://site%d.example.com/about" % h5, "link"))
    if doc_id % 2 == 0:
        out.append((
            "HTTPS://SITE%d.EXAMPLE.COM:443/p/%d/./0#ref"
            % (doc_id % 7, doc_id), "link"))
    return out


# ---------------- registrable-domain (public-suffix) rollup ----------------

# PSL-lite: the longest listed suffix wins, which is the whole public-
# suffix algorithm — 'a.d3.co.uk' must fold to 'd3.co.uk' (via the
# two-label suffix), never 'co.uk' (via the bare 'uk' entry).
PUBLIC_SUFFIXES = frozenset({"com", "net", "org", "uk", "co.uk"})


def registrable_domain(host: str) -> str | None:
    """The PLD (paid-level / registrable domain) of ``host``: one label
    more than the longest matching public suffix.  None when the host
    IS a bare suffix or matches nothing — both unattributable."""
    labels = host.lower().split(".")
    best = 0
    for k in range(1, len(labels) + 1):
        if ".".join(labels[-k:]) in PUBLIC_SUFFIXES:
            best = k
    if best == 0 or best >= len(labels):
        return None
    return ".".join(labels[-(best + 1):])


_PLD_SUFFIXES = ("com", "co.uk", "org", "net")


def pld_hosts_for(doc_id: int) -> list[str]:
    """``1 + doc_id % 3`` deterministic full hosts
    ``h{(3d+i)%30}.d{(d+i)%8}.{suffix}`` with the suffix cycling
    ``(2d+i) % 4`` over ``(com, co.uk, org, net)`` — the co.uk rows
    are the longest-match trap."""
    return [
        "h%d.d%d.%s" % ((3 * doc_id + i) % 30, (doc_id + i) % 8,
                        _PLD_SUFFIXES[(2 * doc_id + i) % 4])
        for i in range(1 + doc_id % 3)
    ]


# ---------------- recrawl snapshots (crawl-delta fixture) -------------------

def crawl_snapshot_for(doc_id: int, t: int) -> list[tuple[str, int]]:
    """(url, content_hash) rows for document ``doc_id`` in crawl
    snapshot ``t`` (0 = previous crawl, 1 = current):

    - base URL ``https://s{d%7}.example.com/p/{d}`` with hash
      ``(13·d) % 1000`` at t0;
    - every 11th doc's URL is GONE at t1;
    - every 5th (still-present) doc's content CHANGED at t1
      (hash + 1);
    - every 9th doc contributes a NEW ``/p/{d}/new`` URL (hash
      ``d % 1000``) that exists only at t1.
    """
    d = doc_id
    base = "https://s%d.example.com/p/%d" % (d % 7, d)
    h0 = (13 * d) % 1000
    rows: list[tuple[str, int]] = []
    if t == 0:
        rows.append((base, h0))
    else:
        if d % 11 != 0:
            rows.append((base, h0 + 1 if d % 5 == 0 else h0))
        if d % 9 == 0:
            rows.append((base + "/new", d % 1000))
    return rows
