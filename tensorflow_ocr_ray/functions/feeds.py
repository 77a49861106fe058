"""Sitemap / RSS feed parsing — the crawl-discovery formats next to
WARC in the web-ingestion tier (``pipelines/webtier``).

Same fixture discipline as ``functions/html_extract``: payload
synthesis is deterministic arithmetic on ``doc_id`` so every parse is
hash-checked against a DuckDB oracle that re-derives the answer
without parsing.  Both parsers are pure compiled-regex work — one
stateless task map per operator, no shuffle.
"""

from __future__ import annotations

import html as _html
import re

_XML_COMMENT = re.compile(r"<!--.*?-->", re.S)

# ------------------------------------------------------------- sitemap ----

_URL_BLOCK = re.compile(r"<url>(.*?)</url>", re.S | re.I)
_LOC = re.compile(r"<loc>(.*?)</loc>", re.S | re.I)
_LASTMOD = re.compile(r"<lastmod>(.*?)</lastmod>", re.S | re.I)
_PRIORITY = re.compile(r"<priority>0\.(\d)</priority>", re.I)


def sitemap_for(doc_id: int) -> str:
    """Deterministic sitemap fixture: ``doc_id%4+1`` ``<url>`` entries;
    ``<lastmod>`` is ABSENT when ``(doc_id+i)%5==0`` and ``<priority>``
    when ``(doc_id+i)%3==0`` (both optional per the protocol), plus a
    commented-out decoy entry the parser must skip."""
    n = doc_id % 4 + 1
    host = "site%d.example.com" % (doc_id % 7)
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
        "<!-- <url><loc>https://decoy.example.com/x</loc></url> -->",
    ]
    for i in range(n):
        lastmod = (
            ""
            if (doc_id + i) % 5 == 0
            else "<lastmod>2024-%02d-%02d</lastmod>"
            % ((doc_id + i) % 12 + 1, (doc_id * 3 + i) % 28 + 1)
        )
        prio = (
            ""
            if (doc_id + i) % 3 == 0
            else "<priority>0.%d</priority>" % ((doc_id + i) % 10)
        )
        parts.append(
            "<url><loc>https://%s/p/%d/%d</loc>%s%s</url>"
            % (host, doc_id, i, lastmod, prio)
        )
    parts.append("</urlset>")
    return "\n".join(parts)


def parse_sitemap(xml: str) -> list[tuple[str, str, int]]:
    """(loc, lastmod, priority_pct) per ``<url>`` entry in order.
    Missing lastmod surfaces as ``''``, missing priority as ``-1``;
    priority ``0.p`` becomes the integer ``p*10`` (no floats cross the
    oracle hash)."""
    clean = _XML_COMMENT.sub(" ", xml)
    out = []
    for m in _URL_BLOCK.finditer(clean):
        body = m.group(1)
        loc = _LOC.search(body)
        if not loc:
            continue
        lm = _LASTMOD.search(body)
        pr = _PRIORITY.search(body)
        out.append(
            (
                loc.group(1).strip(),
                lm.group(1).strip() if lm else "",
                int(pr.group(1)) * 10 if pr else -1,
            )
        )
    return out


# ----------------------------------------------------------------- RSS ----

_ITEM_BLOCK = re.compile(r"<item>(.*?)</item>", re.S | re.I)
_TITLE_CDATA = re.compile(r"<title><!\[CDATA\[(.*?)\]\]></title>", re.S)
_TITLE_PLAIN = re.compile(r"<title>(.*?)</title>", re.S | re.I)
_LINK = re.compile(r"<link>(.*?)</link>", re.S | re.I)
_GUID = re.compile(r"<guid>(.*?)</guid>", re.S | re.I)
_PUBDATE_DAY = re.compile(r"<pubDate>\w{3}, (\d{2}) ", re.I)


def rss_for(doc_id: int) -> str:
    """Deterministic RSS 2.0 fixture: ``doc_id%3+1`` items; the title is
    CDATA-wrapped on even ``doc_id+i`` and entity-escaped otherwise
    (both must decode to the same string), and every 7th document's
    feed ends with a TRUNCATED item (no ``</item>``) the parser must
    skip without error — crawl reality."""
    n = doc_id % 3 + 1
    parts = [
        '<?xml version="1.0"?><rss version="2.0"><channel>',
        "<title>Feed %d</title>" % doc_id,
    ]
    for i in range(n):
        if (doc_id + i) % 2 == 0:
            title = "<title><![CDATA[T %d %d & more]]></title>" % (doc_id, i)
        else:
            title = "<title>T %d %d &amp; more</title>" % (doc_id, i)
        parts.append(
            "<item>%s<link>https://feed.example.com/a/%d/%d</link>"
            "<guid>g-%d-%d</guid>"
            "<pubDate>Tue, %02d Jan 2024 00:00:00 GMT</pubDate></item>"
            % (title, doc_id, i, doc_id, i, (doc_id + i) % 28 + 1)
        )
    if doc_id % 7 == 0:
        parts.append("<item><title>broken tail")
    parts.append("</channel></rss>")
    return "".join(parts)


def parse_rss(xml: str) -> list[tuple[str, str, str, int]]:
    """(title, link, guid, pub_day) per complete ``<item>`` in order;
    CDATA and entity-escaped titles decode identically, truncated items
    never match the block regex and are skipped."""
    out = []
    for m in _ITEM_BLOCK.finditer(xml):
        body = m.group(1)
        cd = _TITLE_CDATA.search(body)
        if cd:
            title = cd.group(1)
        else:
            tp = _TITLE_PLAIN.search(body)
            title = _html.unescape(tp.group(1)) if tp else ""
        link = _LINK.search(body)
        guid = _GUID.search(body)
        day = _PUBDATE_DAY.search(body)
        out.append(
            (
                title,
                link.group(1).strip() if link else "",
                guid.group(1).strip() if guid else "",
                int(day.group(1)) if day else -1,
            )
        )
    return out


# ---------------- robots.txt sitemap discovery ------------------------------

import re as _re

_SITEMAP_LINE = _re.compile(r"^\s*sitemap\s*:\s*(\S+)\s*$",
                            _re.I | _re.M)


def robots_txt_for(host_idx: int) -> str:
    """Deterministic robots.txt for host ``h``: a User-agent block
    with Disallow decoys, ``1 + h % 3`` Sitemap lines (the KEY's case
    cycles — the directive is case-insensitive) and a commented-out
    sitemap that must never parse."""
    h = host_idx
    keys = ("Sitemap", "sitemap", "SITEMAP")
    lines = [
        "User-agent: *",
        "Disallow: /q%d/" % (h % 7),
        "# Sitemap: https://site%d.example.com/old.xml" % h,
    ]
    for j in range(1 + h % 3):
        lines.append("%s: https://site%d.example.com/sitemap%d.xml"
                     % (keys[(h + j) % 3], h, j))
    return "\n".join(lines) + "\n"


def parse_robots_sitemaps(text: str) -> list[str]:
    """Sitemap URLs declared in a robots.txt — key case-insensitive,
    comment lines never match, document order kept."""
    return [
        m.group(1)
        for m in _SITEMAP_LINE.finditer(text)
        if not text[:m.start()].rstrip("\n").endswith("#")
        and not m.group(0).lstrip().startswith("#")
    ]


# ---------------- WebVTT subtitle cues ---------------------------------------

_VTT_TS = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(\d{2}):(\d{2}):(\d{2})\.(\d{3})")
_VTT_VOICE = re.compile(r"^<v ([^>]+)>")


def vtt_for(doc_id: int) -> str:
    """Deterministic WebVTT track: ``doc_id%4+1`` cues; cue ``i``
    spans ``doc_id*1000 + i*2500 .. +2000`` ms, text ``cue {d} {i}``
    with a ``<v S{i%2}>`` voice tag on even cues; a NOTE block and a
    STYLE block are decoys a naive blank-line split would emit."""
    def ts(ms: int) -> str:
        return "%02d:%02d:%02d.%03d" % (
            ms // 3600000, ms // 60000 % 60, ms // 1000 % 60, ms % 1000)

    parts = ["WEBVTT", "",
             "NOTE this block is metadata, not a cue", "",
             "STYLE", "::cue { color: red }", ""]
    for i in range(doc_id % 4 + 1):
        start = doc_id * 1000 + i * 2500
        voice = "<v S%d>" % (i % 2) if i % 2 == 0 else ""
        parts += ["%s --> %s" % (ts(start), ts(start + 2000)),
                  "%scue %d %d" % (voice, doc_id, i), ""]
    return "\n".join(parts)


def parse_vtt(text: str) -> list[tuple[int, int, int, str, str]]:
    """(seq, start_ms, end_ms, speaker, cue_text) per cue — blocks
    split on blank lines; only blocks whose first line is a timestamp
    count (NOTE/STYLE/WEBVTT headers skipped); the voice tag strips
    into the speaker column."""
    out = []
    for block in text.split("\n\n"):
        lines = [ln for ln in block.split("\n") if ln != ""]
        if not lines:
            continue
        m = _VTT_TS.match(lines[0])
        if not m:
            continue
        g = [int(x) for x in m.groups()]
        start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
        end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
        cue = " ".join(lines[1:])
        speaker = ""
        vm = _VTT_VOICE.match(cue)
        if vm:
            speaker = vm.group(1)
            cue = cue[vm.end():]
        out.append((len(out), start, end, speaker, cue))
    return out
