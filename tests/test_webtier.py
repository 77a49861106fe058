"""Web-ingestion tier: URL canonicalization, WARC framing, head
metadata, robots gating, redirect pointer-doubling."""

import numpy as np
import pytest

from tensorflow_ocr_ray.functions.urlnorm import (
    canonicalize_url,
    raw_urls_for,
)
from tensorflow_ocr_ray.functions.warc import (
    parse_warc_stream,
    warc_stream_for,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- urlnorm ----


def test_canonicalize_case_and_default_ports():
    assert (canonicalize_url("HTTP://WWW.Example.COM:80/A/b")
            == "http://www.example.com/A/b")
    assert (canonicalize_url("https://Host.example:443/x")
            == "https://host.example/x")
    # non-default port kept; http's default is NOT https's
    assert (canonicalize_url("http://h.example:8080/x")
            == "http://h.example:8080/x")
    assert (canonicalize_url("http://h.example:443/x")
            == "http://h.example:443/x")


def test_canonicalize_dot_segments_params_fragment():
    assert (canonicalize_url("http://h.ex/a/./b/../c/doc")
            == "http://h.ex/a/c/doc")
    assert (canonicalize_url(
        "http://h.ex/p?utm_source=x&z=1&a=2&utm_campaign=y#frag")
        == "http://h.ex/p?a=2&z=1")
    # all params tracking -> no query part at all
    assert (canonicalize_url("http://h.ex/p?utm_a=1&UTM_b=2")
            == "http://h.ex/p")
    # bare host -> root path
    assert canonicalize_url("http://h.ex") == "http://h.ex/"


def test_canonicalize_rejects_non_web():
    for raw in ("mailto:x@example.org", "javascript:void(0)",
                "/relative/path", "#frag", "ftp://h.ex/x", ""):
        assert canonicalize_url(raw) is None


def test_raw_urls_canonical_identity():
    """The synthesis docstring's arithmetic identity holds through the
    real parser for every doc shape."""
    for d in range(40):
        for k, raw in enumerate(raw_urls_for(d)):
            s = d + k
            scheme = "http" if s % 2 == 0 else "https"
            port = ":8080" if s % 5 == 0 else ""
            want = (f"{scheme}://host{(3 * d + k) % 40}.example.com"
                    f"{port}/a/q{s % 7}/doc?a={d % 5}&b={k}")
            assert canonicalize_url(raw) == want, (d, k, raw)


# ---------------------------------------------------------------- warc ----


def test_warc_roundtrip_counts_and_sums():
    for d in (0, 1, 5, 17, 100):
        recs = parse_warc_stream(warc_stream_for(d))
        assert len(recs) == 1 + d % 3
        for r, (typ, n, ssum) in enumerate(recs):
            assert typ == ("response" if (d + r) % 2 == 0 else "request")
            assert n == 10 + (3 * d + r) % 23
            assert ssum == sum((d + r + j) % 251 for j in range(n))


def test_warc_malformed_streams_raise():
    good = warc_stream_for(3)
    with pytest.raises(ValueError):
        parse_warc_stream(good[:-2])        # separator truncated
    with pytest.raises(ValueError):
        parse_warc_stream(b"HTTP/1.1 200\r\n\r\nbody\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc_stream(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")  # no length
    assert parse_warc_stream(b"") == []


# ----------------------------------------------------------- head meta ----


def test_extract_meta_ignores_decoys():
    from tensorflow_ocr_ray.functions.html_extract import extract_meta

    html = """<head><title> A &amp; B </title>
    <meta property="og:title" content="OG decoy">
    <meta property="og:description" content="og d decoy">
    <meta name="description" content="real &amp; desc">
    <meta name="robots" content="INDEX, NOFOLLOW">
    <link rel="stylesheet" href="/x.css">
    <link rel="canonical" href="https://h.ex/c">
    </head>"""
    m = extract_meta(html)
    assert m == {"title": "A & B", "description": "real & desc",
                 "canonical": "https://h.ex/c", "noindex": 0}
    assert extract_meta("<body>no head</body>") == {
        "title": "", "description": "", "canonical": "", "noindex": 0}
    assert extract_meta(
        '<meta name="robots" content="noindex">')["noindex"] == 1


# ----------------------------------------------- redirect resolution ------


def _walk_reference(ids: list[int], cap: int = 8):
    """Sequential single-process reference walk (what the SQL oracle
    does), for invariance tests against the doubled plan."""
    idset = set(ids)
    n = max(ids) + 1
    out = {}
    for u in ids:
        cur, hops = u, 0
        if u % 16 == 0:
            out[u] = (u, 0, "resolved")
            continue
        status = ""
        while hops < cap:
            cur = (13 * cur + 7) % n
            hops += 1
            if cur not in idset:
                status = "dangling"
                break
            if cur % 16 == 0:
                status = "resolved"
                break
        out[u] = (cur, hops, status or "unresolved")
    return out


def test_redirect_doubling_equals_sequential_walk(ray_session, tmp_path):
    """Pointer doubling over a SPARSE id set (holes -> dangling) with
    shard-count invariance: the composed 4-round plan takes exactly the
    sequential walk's stops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tensorflow_ocr_ray.pipelines.webtier import redirect_resolution

    ids = [i for i in range(97) if i % 11 != 3]  # punch holes
    pq.write_table(pa.table({"doc_id": ids}), tmp_path / "documents.parquet")
    want = _walk_reference(ids)
    for shards in (2, 16):
        got = (redirect_resolution(str(tmp_path), n_shards=shards)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert len(got) == len(ids)
        for _, row in got.iterrows():
            w = want[int(row["doc_id"])]
            assert (int(row["final_id"]), int(row["hops"]),
                    str(row["status"])) == w, (shards, row.to_dict())
    # all three statuses must actually occur on this fixture
    sts = set(got["status"].astype(str))
    assert sts == {"resolved", "dangling", "unresolved"}


def test_redirect_empty_corpus(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tensorflow_ocr_ray.pipelines.webtier import redirect_resolution

    pq.write_table(pa.table({"doc_id": pa.array([], type=pa.int64())}),
                   tmp_path / "documents.parquet")
    got = redirect_resolution(str(tmp_path)).to_pandas()
    assert len(got) == 0
    assert sorted(got.columns) == ["doc_id", "final_id", "hops", "status"]


# ------------------------------------------------------ url pipeline ------


def test_url_canonicalize_shard_invariance(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import url_canonicalize

    a = (url_canonicalize(SF, n_shards=3).to_pandas()
         .sort_values("canonical_url").reset_index(drop=True))
    b = (url_canonicalize(SF, n_shards=32).to_pandas()
         .sort_values("canonical_url").reset_index(drop=True))
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c


# ----------------------------------------------------- content sniff ------


def test_sniff_content_type():
    from tensorflow_ocr_ray.pipelines.webtier import sniff_content_type

    assert sniff_content_type(b"%PDF-1.7\n...") == "application/pdf"
    assert sniff_content_type(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert sniff_content_type(b"II*\x00\x08\x00\x00\x00") == "image/tiff"
    assert sniff_content_type(b"MM\x00*\x00\x00") == "image/tiff"
    assert sniff_content_type(b"  <!DOCTYPE HTML><html>") == "text/html"
    assert sniff_content_type(b"<html><body>") == "text/html"
    assert sniff_content_type(b"\x00\x01\x02") == "unknown"


# ------------------------------------------------- boilerplate lines ------


def test_boiler_page_lines_shape():
    from tensorflow_ocr_ray.functions.html_extract import boiler_page_lines

    lines = boiler_page_lines(103, "unique content here")
    h = 103 % 50  # -> 3, 3 % 3 + 2 = 2 nav lines
    assert lines == ["nav 3 item 0", "nav 3 item 1",
                     "unique content here", "footer 3"]
    assert all(str(h) in ln for ln in lines if ln != "unique content here")


def test_host_boilerplate_strip_semantics(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import host_boilerplate_strip

    df = host_boilerplate_strip(SF).to_pandas()
    assert len(df) == 500
    # chrome (nav + footer) always dies: every host has ~10 docs, so the
    # shared lines are >= 60% frequent; unique content survives
    assert (df["n_boiler"] >= 3).all()
    # kept_text never contains chrome
    assert not df["kept_text"].str.contains("nav ").any()
    assert not df["kept_text"].str.contains("footer").any()
    # a doc whose text is globally unique keeps exactly its text
    import duckdb
    uniq = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "QUALIFY count(*) OVER (PARTITION BY doc_id % 50, text) = 1 "
        "LIMIT 5").df()
    sub = df.set_index("doc_id").loc[uniq["doc_id"]]
    assert (sub["kept_text"].to_numpy() == uniq["text"].to_numpy()).all()


def test_host_boilerplate_strip_shard_invariance(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import host_boilerplate_strip

    a = (host_boilerplate_strip(SF, n_shards=2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (host_boilerplate_strip(SF, n_shards=16).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert len(a) == len(b) == 500
    for c in a.columns:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c


# ---------------------------------------------------------- JSON-LD -------


def test_extract_jsonld_skips_decoys_and_malformed():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_jsonld, jsonld_page_for)

    # doc 35: malformed block (35%7==0) AND article (35%5==0)
    objs = extract_jsonld(jsonld_page_for(35, "de"))
    assert [o["@type"] for o in objs] == ["Product", "Article"]
    assert objs[0]["sku"] == 35
    assert objs[0]["priceCents"] == (35 * 37) % 10000 + 99
    # plain-JS decoy never parsed
    assert all(o.get("@type") != "Decoy" for o in objs)
    # non-object JSON is skipped
    assert extract_jsonld(
        '<script type="application/ld+json">[1,2]</script>') == []
    assert extract_jsonld(
        '<script type="application/ld+json">{broken</script>') == []


def test_jsonld_extract_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import jsonld_extract

    df = jsonld_extract(SF).to_pandas()
    # 500 products + every-5th article
    assert len(df) == 500 + 100
    prods = df[df["item_type"] == "Product"]
    assert (prods["block_idx"] == 0).all()
    assert (prods["sku"] == prods["doc_id"]).all()
    arts = df[df["item_type"] == "Article"]
    assert (arts["block_idx"] == 1).all()
    assert (arts["sku"] == -1).all() and (arts["price_cents"] == -1).all()


# --------------------------------------------------- heading outline ------


def test_extract_heading_outline_stack_and_decoys():
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_heading_outline, outline_page_for)

    rows = extract_heading_outline(outline_page_for(5))
    assert rows[0] == (0, 1, "H1 5", "H1 5")
    assert rows[1] == (1, 2, "S 5 0", "H1 5 > S 5 0")
    assert rows[2][3] == "H1 5 > S 5 0 > T 5 0 0"
    # decoys (comment h2, script h2) never appear
    assert all("fake" not in r[2] and "commented" not in r[2]
               for r in rows)
    # sibling h2 pops the previous h2 AND its h3s off the stack
    h2_rows = [r for r in rows if r[1] == 2]
    assert all(r[3].count(">") == 1 for r in h2_rows)
    # level jump back up: an h2 after h3s has a 2-element path
    assert extract_heading_outline(
        "<h1>a</h1><h3>deep</h3><h2>side</h2>")[2][3] == "a > side"


def test_heading_outline_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import heading_outline

    df = heading_outline(SF).to_pandas()
    # per doc: 1 + ns + ns*nt headings
    import duckdb
    n_expect = duckdb.sql(
        f"SELECT CAST(sum(1 + (doc_id%3+1)*(1 + doc_id%2+1)) AS BIGINT) "
        f"FROM read_parquet('{SF}/documents.parquet')").fetchone()[0]
    assert len(df) == n_expect
    assert set(df["level"].unique()) == {1, 2, 3}
    # every h3 path has exactly 3 components
    assert (df.loc[df["level"] == 3, "section_path"]
            .str.count(" > ") == 2).all()


# -------------------------------------------------- charset sniffing ------


def test_sniff_and_decode_variants():
    from tensorflow_ocr_ray.pipelines.webtier import (
        charset_payload_for, sniff_and_decode)

    assert sniff_and_decode(b"plain ascii") == ("utf-8", "plain ascii")
    assert sniff_and_decode(b"\xef\xbb\xbfbom") == ("utf-8-sig", "bom")
    cs, t = sniff_and_decode(charset_payload_for(2, "x"))
    assert (cs, t) == ("utf-16-le", "\xe9 x")
    cs, t = sniff_and_decode(charset_payload_for(3, "y"))
    assert (cs, t) == ("iso-8859-1", "\xe9 y")
    # meta tag is stripped from content, not decoded into it
    assert "<meta" not in t


def test_charset_transcode_pipeline(ray_session):
    from tensorflow_ocr_ray.pipelines.webtier import charset_transcode

    df = charset_transcode(SF).to_pandas()
    assert len(df) == 500
    assert set(df["charset"].unique()) == {
        "utf-8", "utf-8-sig", "utf-16-le", "iso-8859-1"}
    non_utf = df[df["doc_id"] % 4 >= 2]
    assert non_utf["text"].str.startswith("\xe9 ").all()
    assert (df["n_chars"] == df["text"].str.len()).all()


def test_politeness_schedule_invariants(ray_session):
    """slots are a 1..N permutation; within a round (host_rank) every
    host appears at most once; each host's slots strictly increase
    with its queue rank; rounds are contiguous slot ranges (round r
    occupies slots right after round r-1 — the interleave order)."""
    from tensorflow_ocr_ray.pipelines.webtier import (
        crawl_politeness_schedule,
    )

    df = (crawl_politeness_schedule("/root/testdata/sf0.001")
          .to_pandas().sort_values("slot").reset_index(drop=True))
    n = len(df)
    assert sorted(df["slot"].tolist()) == list(range(1, n + 1))
    assert (df.groupby("host_rank")["host"].nunique()
            == df.groupby("host_rank").size()).all()
    for _, g in df.groupby("host"):
        s = g.sort_values("host_rank")["slot"].to_numpy()
        assert (np.diff(s) > 0).all()
    # rounds partition the slot sequence contiguously in rank order
    bounds = df.groupby("host_rank")["slot"].agg(["min", "max", "size"])
    bounds = bounds.sort_index()
    assert (bounds["max"] - bounds["min"] + 1 == bounds["size"]).all()
    assert bounds["min"].iloc[0] == 1
    assert (bounds["min"].to_numpy()[1:]
            == bounds["max"].to_numpy()[:-1] + 1).all()


def test_politeness_schedule_shard_invariance(ray_session):
    """The schedule is a pure function of the frontier: shard counts
    must not change any (url, host_rank, slot)."""
    from tensorflow_ocr_ray.pipelines.webtier import (
        crawl_politeness_schedule,
    )

    sf = "/root/testdata/sf0.001"
    a = (crawl_politeness_schedule(sf, n_shards=1)
         .to_pandas().sort_values("slot").reset_index(drop=True))
    b = (crawl_politeness_schedule(sf, n_shards=13)
         .to_pandas().sort_values("slot").reset_index(drop=True))
    assert a.equals(b)
