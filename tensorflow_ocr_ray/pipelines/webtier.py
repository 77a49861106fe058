"""Web-ingestion tier operators — the steps BETWEEN the crawl and the
extraction flagship: record-stream parsing, URL canonicalization,
redirect resolution, head-metadata and anchor-text extraction, robots
gating, content-type auditing.

Reference analogue: the reference's pipeline starts at "a directory of
TIFFs" (``main/ocr.c`` argv loop); a 100-TB corpus starts at crawl
blobs, and these operators are the missing on-ramp, built with the
same fixture discipline as the ``media_*`` family — payload synthesis
is deterministic arithmetic on ``doc_id``, so every parse is
hash-checked against a DuckDB oracle that re-derives the answer
WITHOUT parsing.

Scale shapes used here (all established in-repo):
- stateless parses = plain task ``map_batches`` (no shuffle);
- unbounded-key aggregation (canonical URLs) = map-side partials +
  ONE key-hash exchange (``stages/exchange``);
- bounded grids (content-type pairs, host anchors) = map-side Counter
  partials, driver merge (the benford convention);
- iterative pointer chasing (redirects) = POINTER DOUBLING: O(log H)
  rounds of a union-tag hash-exchange join, never a driver-side walk.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from tensorflow_ocr_ray.stages.exchange import (
    adaptive_shards,
    hash_exchange,
    meta_rows,
)


def _docs(sf_dir: str, columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------- URLs ----


def url_canonicalize(sf_dir: str, n_shards: int | None = None) -> "rd.Dataset":
    """Canonical-URL dedup counts — the crawl-frontier normalize step:
    each document contributes ``1 + doc_id % 3`` deterministically
    messy URLs (``functions/urlnorm.raw_urls_for``: upper-case scheme /
    host, default and non-default ports, dot-segments, ``utm_``
    tracking params, unsorted query, fragment); the operator PARSES and
    canonicalizes each string (``canonicalize_url`` — the engine never
    sees the arithmetic identity) and returns per canonical URL the raw
    occurrence count and the distinct-document count.

    Plan: per-batch (canon, doc_id)->n pre-reduce (raw multiplicity
    collapses map-side), ONE canon-hash exchange makes both counts
    exact — n_raw sums, n_docs counts distinct doc_ids co-located by
    the shard key.  Canonical-URL keyspace is unbounded at web scale,
    so a driver merge is wrong here; the exchange is the plan."""
    from tensorflow_ocr_ray.functions.textstats import _md5_prefix_batch
    from tensorflow_ocr_ray.functions.urlnorm import (
        canonicalize_url,
        raw_urls_for,
    )

    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents") * 2)

    def partial(batch: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for did in batch.column("doc_id").to_pylist():
            for raw in raw_urls_for(int(did)):
                canon = canonicalize_url(raw)
                if canon is not None:
                    c[(canon, int(did))] += 1
        if not c:
            return pd.DataFrame(
                {"canonical_url": pd.Series([], dtype="string"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "shard": pd.Series([], dtype="int64")})
        urls = [k[0] for k in c]
        out = pd.DataFrame(
            {"canonical_url": urls,
             "doc_id": np.fromiter((k[1] for k in c), np.int64, len(c)),
             "n": np.fromiter(c.values(), np.int64, len(c))})
        out["shard"] = (
            _md5_prefix_batch(urls, 8).astype(np.uint64) % n_shards
        ).astype(np.int64)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"canonical_url": pd.Series([], dtype="string"),
                 "n_raw": pd.Series([], dtype="int64"),
                 "n_docs": pd.Series([], dtype="int64")})
        g = df.groupby("canonical_url").agg(
            n_raw=("n", "sum"), n_docs=("doc_id", "nunique"))
        return g.reset_index().astype({"n_raw": "int64", "n_docs": "int64"})

    rows = _docs(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    return hash_exchange(rows, "shard", n_shards, combine)


# ----------------------------------------------------------- redirects ----

REDIRECT_HOP_CAP = 8


def redirect_resolution(
    sf_dir: str, n_shards: int | None = None
) -> "rd.Dataset":
    """Redirect-chain resolution by POINTER DOUBLING — the crawl-graph
    op a driver-side walk cannot do at scale: node ``u`` (a doc_id)
    redirects to ``(13*u + 7) % N`` (N = max id + 1) unless
    ``u % 16 == 0`` (a terminal page); chains are followed to at most
    ``REDIRECT_HOP_CAP`` hops.  Per node the result is its ``status``
    — ``resolved`` (terminal reached), ``dangling`` (stepped onto an id
    not in the corpus; synthetic ids make holes wherever doc_ids are
    not the full range) or ``unresolved`` (cap exhausted) — plus
    ``final_id`` (the terminal / missing / last-seen id) and the exact
    ``hops`` taken.

    Instead of H sequential rounds, the state table f_t (every node ->
    its position after min(2^t, stop) hops) composes with ITSELF:
    f_{t+1}[u] = f_t[f_t[u].cur], hops adding — so the 8-hop cap costs
    1 + log2(8) = 4 exchange-join rounds, each a union-tag hash
    exchange (lookup side keyed by src, walker side keyed by cur; a
    shard joins them locally).  The driver never holds node-sized
    state; every round is one exchange over skinny int rows.

    Oracle: a DuckDB recursive CTE walks the same capped chain
    sequentially — hash equality proves the doubled composition takes
    exactly the same stops."""
    ids = _docs(sf_dir, ["doc_id"])
    max_id = ids.max("doc_id")
    if max_id is None:
        # typed-empty convention: a bare Arrow table (an empty table
        # loses its schema through Ray's to_pandas round-trip)
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "final_id": pa.array([], type=pa.int64()),
             "hops": pa.array([], type=pa.int64()),
             "status": pa.array([], type=pa.string())})
    n_nodes = int(max_id) + 1
    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents") * 2)

    # roles in the union-tag exchange: 0 = lookup rows, 1 = walkers
    def _one_step(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "cur": "int64", "hops": "int64",
                "done": "int64", "status": "string"}
        nodes = df.loc[df["role"] == 0, "key"].to_numpy(np.int64)
        w = df[df["role"] == 1]
        if not len(w):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        cur = w["key"].to_numpy(np.int64)  # walkers were keyed by target
        exists = np.isin(cur, nodes)
        terminal = cur % 16 == 0
        done = (~exists) | terminal
        status = np.where(
            ~exists, "dangling", np.where(terminal, "resolved", ""))
        return pd.DataFrame(
            {"src": w["src"].to_numpy(np.int64), "cur": cur,
             "hops": np.ones(len(w), np.int64),
             "done": done.astype(np.int64),
             "status": pd.array(status, dtype="string")})

    def _compose(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "cur": "int64", "hops": "int64",
                "done": "int64", "status": "string"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        lk = df.loc[df["role"] == 0,
                    ["f_src", "f_cur", "f_hops", "f_done", "f_status"]]
        w = df.loc[df["role"] == 1, ["key", "src", "hops"]]
        if not len(w):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        m = w.merge(lk, left_on="key", right_on="f_src", how="left")
        return pd.DataFrame(
            {"src": m["src"].to_numpy(np.int64),
             "cur": m["f_cur"].to_numpy(np.int64),
             "hops": (m["hops"].to_numpy(np.int64)
                      + m["f_hops"].to_numpy(np.int64)),
             "done": m["f_done"].to_numpy(np.int64),
             "status": m["f_status"].astype("string")})

    def _skey(col: np.ndarray) -> np.ndarray:
        return col % n_shards

    # round 0: every non-terminal walker advances one hop; terminals
    # are already-done state rows
    def seed(batch: pa.Table) -> pd.DataFrame:
        u = batch.column("doc_id").to_numpy()
        term = u % 16 == 0
        nodes = pd.DataFrame(
            {"role": 0, "key": u, "src": -1, "hops": 0,
             "shard": _skey(u)})
        walk_src = u[~term]
        tgt = (13 * walk_src + 7) % n_nodes
        walkers = pd.DataFrame(
            {"role": 1, "key": tgt, "src": walk_src, "hops": 0,
             "shard": _skey(tgt)})
        return pd.concat([nodes, walkers], ignore_index=True).astype(
            {"role": "int64", "key": "int64", "src": "int64",
             "hops": "int64", "shard": "int64"})

    stepped = hash_exchange(
        ids.map_batches(seed, batch_format="pyarrow", batch_size=8192),
        "shard", n_shards, _one_step)

    def term_rows(batch: pa.Table) -> pd.DataFrame:
        u = batch.column("doc_id").to_numpy()
        u = u[u % 16 == 0]
        return pd.DataFrame(
            {"src": u, "cur": u, "hops": np.zeros(len(u), np.int64),
             "done": np.ones(len(u), np.int64),
             "status": pd.array(["resolved"] * len(u), dtype="string")}
        ).astype({"src": "int64", "cur": "int64"})

    f = stepped.union(
        ids.map_batches(term_rows, batch_format="pyarrow",
                        batch_size=8192))

    n_rounds = int(np.log2(REDIRECT_HOP_CAP))  # doubling: 1 -> 2 -> 4 -> 8
    for _ in range(n_rounds):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {c: pd.Series([], dtype="int64")
                     for c in ("role", "key", "src", "cur", "hops",
                               "f_src", "f_cur", "f_hops", "f_done",
                               "shard")}
                ).assign(f_status=pd.Series([], dtype="string"))
            lookup = pd.DataFrame(
                {"role": 0, "key": df["src"], "src": -1, "cur": -1,
                 "hops": 0, "f_src": df["src"], "f_cur": df["cur"],
                 "f_hops": df["hops"], "f_done": df["done"],
                 "f_status": df["status"].astype("string")})
            act = df[df["done"] == 0]
            walkers = pd.DataFrame(
                {"role": 1, "key": act["cur"], "src": act["src"],
                 "cur": act["cur"], "hops": act["hops"],
                 "f_src": -1, "f_cur": -1, "f_hops": 0, "f_done": 0,
                 "f_status": pd.array([""] * len(act), dtype="string")})
            out = pd.concat([lookup, walkers], ignore_index=True)
            out["shard"] = out["key"].to_numpy(np.int64) % n_shards
            for c in ("role", "key", "src", "cur", "hops", "f_src",
                      "f_cur", "f_hops", "f_done", "shard"):
                out[c] = out[c].astype("int64")
            return out

        composed = hash_exchange(
            f.map_batches(tag, batch_format="pandas", batch_size=8192),
            "shard", n_shards, _compose)
        done_rows = f.map_batches(
            lambda df: df[df["done"] == 1],
            batch_format="pandas", batch_size=8192)
        f = done_rows.union(composed)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "final_id": pd.Series([], dtype="int64"),
                 "hops": pd.Series([], dtype="int64"),
                 "status": pd.Series([], dtype="string")})
        status = df["status"].astype("string").fillna("")
        out = pd.DataFrame(
            {"doc_id": df["src"].to_numpy(np.int64),
             "final_id": df["cur"].to_numpy(np.int64),
             "hops": df["hops"].to_numpy(np.int64),
             "status": np.where(df["done"].to_numpy(np.int64) == 1,
                                status, "unresolved")})
        return out.astype({"status": "string"})

    return f.map_batches(finish, batch_format="pandas", batch_size=8192)


# ------------------------------------------------------- head metadata ----


def html_meta_extract(sf_dir: str) -> "rd.Dataset":
    """Head-metadata extraction: per document a deterministic page head
    (``functions/html_extract.meta_page_for`` — og:*/stylesheet decoys,
    an ``&amp;`` entity, a robots noindex every 7th doc) is parsed for
    the four fields an indexing tier keys on: title, meta description,
    canonical link, noindex flag.  Stateless task map, no shuffle."""
    docs = _docs(sf_dir, ["doc_id", "lang", "source"])

    def parse(batch: pa.Table) -> pa.Table:
        from tensorflow_ocr_ray.functions.html_extract import (
            extract_meta,
            meta_page_for,
        )

        ids = batch.column("doc_id").to_pylist()
        metas = [
            extract_meta(meta_page_for(int(d), la, s))
            for d, la, s in zip(ids, batch.column("lang").to_pylist(),
                                batch.column("source").to_pylist())
        ]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "title": pa.array([m["title"] for m in metas]),
             "description": pa.array([m["description"] for m in metas]),
             "canonical": pa.array([m["canonical"] for m in metas]),
             "noindex": pa.array([m["noindex"] for m in metas],
                                 type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow", batch_size=2048)


def anchor_text_index(sf_dir: str) -> pd.DataFrame:
    """Anchor-text index: per (target host, anchor text) the link count
    across the corpus — the relevance signal a link index aggregates
    per TARGET page (anchor text describes the target, not the source).
    Pages are the ``html_link_graph`` fixtures; the anchored extractor
    must pair each absolute href with its tag-stripped, unescaped
    anchor text and skip the relative/mailto/js decoys.

    Map-side Counter partials over a bounded (host x anchor) grid,
    driver merge — the benford convention; at web scale the same
    partials route a host-hash exchange instead."""
    docs = _docs(sf_dir, ["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        from tensorflow_ocr_ray.functions.html_extract import (
            extract_outlinks_anchored,
            link_page_for,
        )

        c: Counter = Counter()
        for did in batch.column("doc_id").to_pylist():
            c.update(extract_outlinks_anchored(link_page_for(int(did))))
        return pa.table(
            {"host": pa.array([k[0] for k in c], type=pa.string()),
             "anchor": pa.array([k[1] for k in c], type=pa.string()),
             "n": pa.array(list(c.values()), type=pa.int64())})

    grid = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
        .groupby(["host", "anchor"], as_index=False)["n"].sum()
    )
    return grid.astype({"n": "int64"})


# ----------------------------------------------------------- robots -------


def robots_gate(sf_dir: str) -> "rd.Dataset":
    """robots.txt gating: each document is a fetch of path
    ``/q{doc_id%7}/[pub/]x{doc_id}`` on host ``doc_id%50``; host ``h``
    disallows prefix ``/q{h%7}/`` but (even hosts only) allow-overrides
    the longer prefix ``/q{h%7}/pub/`` — LONGEST MATCH WINS, the actual
    robots rule.  The gate string-matches real prefixes per row; the
    oracle re-derives the verdicts arithmetically.

    The rule table is host-bounded (a catalog), so it broadcasts via
    ``ray.put`` and each batch groups by host and prefix-matches
    vectorized per rule — at web scale the rules table rides a
    host-hash join instead; the per-row match is unchanged."""
    rules = {
        h: (f"/q{h % 7}/", f"/q{h % 7}/pub/" if h % 2 == 0 else None)
        for h in range(50)
    }
    rules_ref = ray.put(rules)

    def gate(batch: pa.Table) -> pa.Table:
        r = ray.get(rules_ref)
        d = batch.column("doc_id").to_numpy()
        host = d % 50
        paths = pd.Series(
            [f"/q{did % 7}/{'pub/' if did % 3 == 0 else ''}x{did}"
             for did in d])
        allowed = np.ones(len(d), dtype=np.int64)
        for h in np.unique(host):
            mask = host == h
            dis, allow = r[int(h)]
            hit = paths[mask].str.startswith(dis).to_numpy()
            ok = ~hit
            if allow is not None:
                ok |= paths[mask].str.startswith(allow).to_numpy()
            allowed[mask] = ok.astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(d, type=pa.int64()),
             "host_idx": pa.array(host, type=pa.int64()),
             "path": pa.array(paths.tolist(), type=pa.string()),
             "allowed": pa.array(allowed, type=pa.int64())})

    return _docs(sf_dir, ["doc_id"]).map_batches(
        gate, batch_format="pyarrow", batch_size=8192)


# ------------------------------------------------------------- WARC -------


def warc_record_parse(sf_dir: str) -> "rd.Dataset":
    """WARC-style record-stream ingestion: each document's blob holds
    ``1 + doc_id % 3`` length-prefixed records
    (``functions/warc.warc_stream_for``); the reader walks version
    line / headers / Content-Length / CRLF framing to find every
    payload boundary and emits (type, length, payload byte sum) per
    record.  Stateless task map — one record stream per row is the
    scale contract (a 100-TB corpus is many blobs, not one file)."""
    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        from tensorflow_ocr_ray.functions.warc import (
            parse_warc_stream,
            warc_stream_for,
        )

        ids, idxs, types, lens, sums = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            for i, (t, ln, s) in enumerate(
                    parse_warc_stream(warc_stream_for(int(did)))):
                ids.append(did)
                idxs.append(i)
                types.append(t)
                lens.append(ln)
                sums.append(s)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "rec_idx": pa.array(idxs, type=pa.int64()),
             "rec_type": pa.array(types, type=pa.string()),
             "content_length": pa.array(lens, type=pa.int64()),
             "payload_sum": pa.array(sums, type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow", batch_size=2048)


# ----------------------------------------------------- content types ------

_CT_NAMES = ["text/html", "application/pdf", "image/png", "image/tiff"]
_CT_MAGICS = [
    b"<!DOCTYPE html><html>",
    b"%PDF-1.4\n",
    b"\x89PNG\r\n\x1a\n",
    b"II*\x00\x08\x00\x00\x00",
]


def sniff_content_type(head: bytes) -> str:
    """Magic-byte sniff over the blob head — the detector side of the
    declared-vs-actual audit (PNG/TIFF magics match
    ``core/png.py`` / ``core/raster.py``'s container checks)."""
    if head.startswith(b"%PDF-"):
        return "application/pdf"
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if head.startswith(b"II*\x00") or head.startswith(b"MM\x00*"):
        return "image/tiff"
    low = head[:64].lstrip().lower()
    if low.startswith(b"<!doctype html") or low.startswith(b"<html"):
        return "text/html"
    return "unknown"


def content_type_audit(sf_dir: str) -> pd.DataFrame:
    """Declared-vs-sniffed content-type audit — the ingest screen that
    catches mislabeled crawl records before a parser chokes on them:
    each document DECLARES type ``doc_id % 4`` but its payload head
    carries the magic of type ``(doc_id + doc_id // 4) % 4`` (the
    fixture plants real disagreements); the audit sniffs the head and
    reports the (declared, sniffed) grid with mismatch flags.

    Bounded 4x4 grid: map-side Counter partials, driver merge."""
    docs = _docs(sf_dir, ["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            declared = _CT_NAMES[d % 4]
            sniffed = sniff_content_type(_CT_MAGICS[(d + d // 4) % 4])
            c[(declared, sniffed)] += 1
        return pa.table(
            {"declared": pa.array([k[0] for k in c], type=pa.string()),
             "sniffed": pa.array([k[1] for k in c], type=pa.string()),
             "n": pa.array(list(c.values()), type=pa.int64())})

    grid = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
        .groupby(["declared", "sniffed"], as_index=False)["n"].sum()
    )
    grid["is_mismatch"] = (
        grid["declared"] != grid["sniffed"]).astype("int64")
    return grid.astype({"n": "int64"})


# --------------------------------------------- per-host boilerplate -------


def host_boilerplate_strip(
    sf_dir: str, n_shards: int | None = None
) -> "rd.Dataset":
    """Cross-document boilerplate-LINE removal (the CCNet / RefinedWeb
    step the single-page DOM strip cannot do): a line is boilerplate
    iff it appears in >= 60% of its HOST's documents (and at least 2),
    discovered from frequency alone — nav/footer chrome shared across a
    site dies, each document's unique content survives.  Emits per doc
    ``(doc_id, host_idx, n_lines, n_boiler, kept_text)`` with kept
    lines rejoined in page order.

    Plan (two skinny exchanges, no driver-side lines):
    1. explode docs -> (doc, host, idx, line) rows, shard by
       md5(host, line);
    2. exchange A co-locates every copy of a (host, line) key: the
       shard counts distinct docs per key EXACTLY and marks each row
       against the broadcast per-host doc totals;
    3. exchange B re-keys marked rows by doc_id: each shard reassembles
       its documents' kept lines in idx order.

    Host doc totals are a bounded grid here (50 hosts -> driver merge +
    ``ray.put`` broadcast); at web scale hosts are unbounded — the
    totals then route a host-hash exchange and join exchange A by host
    instead of riding a broadcast, leaving the row plan unchanged.

    Reference analogue: the reference strips per-page chrome only
    (fixed regions in ``main/ocr.c``'s page loop); corpus-frequency
    boilerplate discovery is the web-scale generalization."""
    from tensorflow_ocr_ray.functions.html_extract import (
        N_BOILER_HOSTS,
        boiler_page_lines,
    )
    from tensorflow_ocr_ray.functions.textstats import _md5_prefix_batch

    n_docs = meta_rows(sf_dir, "documents")
    if n_shards is None:
        n_shards = adaptive_shards(n_docs * 5)

    docs = _docs(sf_dir, ["doc_id", "text"])

    # per-host doc totals: one cheap counting pass (bounded grid)
    def host_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter(
            int(d) % N_BOILER_HOSTS
            for d in batch.column("doc_id").to_pylist())
        return pa.table(
            {"h": pa.array(list(c.keys()), type=pa.int64()),
             "n": pa.array(list(c.values()), type=pa.int64())})

    totals = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(host_partial, batch_format="pyarrow",
                     batch_size=8192)
        .to_pandas().groupby("h")["n"].sum().to_dict()
    )
    nd_ref = ray.put(totals)

    def explode(batch: pa.Table) -> pd.DataFrame:
        doc, host, idx, line = [], [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            d = int(did)
            for i, ln in enumerate(boiler_page_lines(d, t or "")):
                doc.append(d)
                host.append(d % N_BOILER_HOSTS)
                idx.append(i)
                line.append(ln)
        df = pd.DataFrame(
            {"doc_id": np.asarray(doc, np.int64),
             "h": np.asarray(host, np.int64),
             "idx": np.asarray(idx, np.int64),
             "line": pd.Series(line, dtype="string")})
        keys = ["%d\x1f%s" % (h, ln) for h, ln in zip(host, line)]
        df["shard"] = (
            _md5_prefix_batch(keys, 8).astype(np.uint64) % n_shards
        ).astype(np.int64)
        return df

    _MARKED_EMPTY = {
        "doc_id": "int64", "h": "int64", "idx": "int64",
        "line": "string", "boiler": "int64", "shard": "int64"}

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t)
                 for c, t in _MARKED_EMPTY.items()})
        nd = ray.get(nd_ref)
        c = df.groupby(["h", "line"])["doc_id"].transform("nunique")
        ndv = df["h"].map(nd).astype("int64")
        boiler = ((c >= 2) & (10 * c >= 6 * ndv)).astype("int64")
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64),
             "h": df["h"].to_numpy(np.int64),
             "idx": df["idx"].to_numpy(np.int64),
             "line": df["line"].astype("string"),
             "boiler": boiler.to_numpy(np.int64)})
        out["shard"] = (
            out["doc_id"].to_numpy(np.uint64) % np.uint64(n_shards)
        ).astype(np.int64)
        return out

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "host_idx": pd.Series([], dtype="int64"),
                 "n_lines": pd.Series([], dtype="int64"),
                 "n_boiler": pd.Series([], dtype="int64"),
                 "kept_text": pd.Series([], dtype="string")})
        df = df.sort_values(["doc_id", "idx"], kind="mergesort")
        agg = df.groupby("doc_id").agg(
            host_idx=("h", "first"),
            n_lines=("idx", "count"),
            n_boiler=("boiler", "sum"))
        kept = df[df["boiler"] == 0]
        kt = kept.groupby("doc_id")["line"].agg(
            lambda s: "\n".join(s.tolist()))
        agg["kept_text"] = kt.reindex(agg.index).fillna("").astype("string")
        return agg.reset_index().astype(
            {"n_lines": "int64", "n_boiler": "int64"})

    rows = docs.map_batches(explode, batch_format="pyarrow",
                            batch_size=4096)
    marked = hash_exchange(rows, "shard", n_shards, mark)
    return hash_exchange(marked, "shard", n_shards, assemble)


# ------------------------------------------------ structured data ---------


def jsonld_extract(sf_dir: str) -> "rd.Dataset":
    """Schema.org structured-data extraction — the typed-record feed a
    shopping/knowledge index builds from markup: every document's page
    carries one valid JSON-LD Product block (sku/price arithmetic on
    ``doc_id``), a plain-JS decoy, a MALFORMED ld+json block on 1/7 of
    docs (skipped without error — crawl reality) and a second Article
    block on 1/5.  Emits one typed row per VALID block with its index
    among parsed blocks; absent numeric fields surface as -1.

    Scale: one stateless task map over a 2-column projection — no
    shuffle; the JSON parse is the per-record cost, exactly like the
    media decode stages it sits beside."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_jsonld,
        jsonld_page_for,
    )

    docs = _docs(sf_dir, ["doc_id", "lang"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, bidx, typ, sku, price, name = [], [], [], [], [], []
        for did, lang in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("lang").to_pylist(),
        ):
            d = int(did)
            for i, obj in enumerate(
                extract_jsonld(jsonld_page_for(d, lang))
            ):
                doc.append(d)
                bidx.append(i)
                typ.append(str(obj.get("@type", "")))
                sku.append(int(obj.get("sku", -1)))
                price.append(int(obj.get("priceCents", -1)))
                name.append(str(obj.get("name", "")))
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "block_idx": pa.array(bidx, type=pa.int64()),
             "item_type": pa.array(typ, type=pa.string()),
             "sku": pa.array(sku, type=pa.int64()),
             "price_cents": pa.array(price, type=pa.int64()),
             "name": pa.array(name, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=2048)


# -------------------------------------------------- heading outline -------


def heading_outline(sf_dir: str) -> "rd.Dataset":
    """Document-structure extraction: the h1-h6 outline with full
    section paths — what a chunking or snippeting stage keys on (each
    chunk inherits its enclosing section path as retrieval context).
    The fixture page plants decoys (a commented-out h2, heading markup
    inside a script string) that a naive regex pass would pick up; the
    extractor strips comments/scripts first, then walks a level stack.

    Scale: one stateless task map, no shuffle — per-record parse cost
    only, same shape as :func:`jsonld_extract`."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_heading_outline,
        outline_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, seq, lvl, txt, path = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for s, l, t, p in extract_heading_outline(
                outline_page_for(d)
            ):
                doc.append(d)
                seq.append(s)
                lvl.append(l)
                txt.append(t)
                path.append(p)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "seq": pa.array(seq, type=pa.int64()),
             "level": pa.array(lvl, type=pa.int64()),
             "text": pa.array(txt, type=pa.string()),
             "section_path": pa.array(path, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=2048)


# ------------------------------------------------ charset transcode -------

import re as _re

_CHARSET_META = _re.compile(rb"""<meta\s+charset=["']?([A-Za-z0-9_-]+)""",
                            _re.I)
_META_PREFIX = _re.compile(r"^<meta\s[^>]*>")


def charset_payload_for(doc_id: int, text: str) -> bytes:
    """Crawl-byte fixture: the document's text encoded in the charset
    ``doc_id % 4`` selects — plain UTF-8 (no marker), UTF-8 with BOM,
    UTF-16-LE with BOM, Latin-1 declared only by an HTML meta tag.  The
    two non-UTF-8 variants prepend a non-ASCII char so a wrong decode
    cannot silently round-trip."""
    c = doc_id % 4
    if c == 0:
        return text.encode("utf-8")
    if c == 1:
        return b"\xef\xbb\xbf" + text.encode("utf-8")
    if c == 2:
        return b"\xff\xfe" + ("é " + text).encode("utf-16-le")
    return ('<meta charset="iso-8859-1">' + "é " + text).encode(
        "latin-1")


def sniff_and_decode(payload: bytes) -> tuple[str, str]:
    """(detected_charset, decoded_text): BOM first, then an HTML meta
    charset declaration in the head bytes, else UTF-8.  A leading meta
    tag is not content — it is stripped after decode."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", payload[3:].decode("utf-8")
    if payload.startswith(b"\xff\xfe"):
        return "utf-16-le", payload[2:].decode("utf-16-le")
    m = _CHARSET_META.search(payload[:1024])
    if m:
        enc = m.group(1).decode("ascii").lower()
        return enc, _META_PREFIX.sub("", payload.decode(enc))
    return "utf-8", payload.decode("utf-8")


def charset_transcode(sf_dir: str) -> "rd.Dataset":
    """Charset normalization — the decode step between raw crawl bytes
    and every text operator downstream: sniff (BOM, then meta
    declaration, else UTF-8), decode, emit UTF-8 text + the detected
    label.  A wrong sniff breaks the hash because the fixture plants a
    non-ASCII char in the non-UTF-8 variants.

    Scale: stateless task map over a 2-column projection; the payload
    here is synthesized from ``text`` (the ``media_*`` convention) where
    a deployment reads blob bytes."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, cs, txt = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            d = int(did)
            charset, decoded = sniff_and_decode(
                charset_payload_for(d, t or ""))
            doc.append(d)
            cs.append(charset)
            txt.append(decoded)
        n = [len(t) for t in txt]
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "charset": pa.array(cs, type=pa.string()),
             "text": pa.array(txt, type=pa.string()),
             "n_chars": pa.array(n, type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=2048)


# --------------------------------------------------- nested lists ---------


def html_list_extract(sf_dir: str) -> "rd.Dataset":
    """Nested-list extraction — the structured-content sibling of
    :func:`~tensorflow_ocr_ray.pipelines.extract.html_table_extract`:
    each document's page carries a main ``<ul>`` with a nested ``<ol>``
    (``functions/html_extract.list_page_for``) plus chrome/comment/
    script decoys; the extractor drops boilerplate subtrees first, then
    walks a depth stack emitting (seq, depth, is_ordered, item_text)
    typed rows.

    Scale: one stateless task map over a 1-column projection — no
    shuffle, the jsonld/heading plan shape."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_lists,
        list_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, seq, dep, ordd, txt = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for s, depth, is_ord, t in extract_lists(list_page_for(d)):
                doc.append(d)
                seq.append(s)
                dep.append(depth)
                ordd.append(is_ord)
                txt.append(t)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "seq": pa.array(seq, type=pa.int64()),
             "depth": pa.array(dep, type=pa.int64()),
             "is_ordered": pa.array(ordd, type=pa.int64()),
             "item_text": pa.array(txt, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=2048)


# ------------------------------------------------- figure captions --------


def figure_caption_extract(sf_dir: str) -> "rd.Dataset":
    """Figure↔caption join from markup — the caption-pairing step a
    multimodal corpus needs before captioning/contrastive training:
    every ``<figure>`` holding an ``<img>`` emits (media_ref, alt,
    caption); loose images and commented-out figures are skipped
    (``functions/html_extract.figure_page_for`` plants both).  In the
    interleaved north-star table this text becomes the training pair of
    the media span whose ``media_ref`` it carries — the join key is
    extracted here.

    Scale: one stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_figures,
        figure_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, fidx, ref, alt, cap = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for i, (r, a, c) in enumerate(
                extract_figures(figure_page_for(d))
            ):
                doc.append(d)
                fidx.append(i)
                ref.append(r)
                alt.append(a)
                cap.append(c)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "fig_idx": pa.array(fidx, type=pa.int64()),
             "media_ref": pa.array(ref, type=pa.string()),
             "alt": pa.array(alt, type=pa.string()),
             "caption": pa.array(cap, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=2048)


# -------------------------------------------------------- sitemaps --------


def sitemap_parse(sf_dir: str) -> "rd.Dataset":
    """Sitemap ingestion — the crawl-frontier discovery feed: each
    document's sitemap XML (``functions/feeds.sitemap_for`` — optional
    lastmod/priority fields, a commented-out decoy entry) parses to
    typed (loc, lastmod, priority_pct) rows; priority crosses as an
    exact integer, absent fields as ''/-1.

    Scale: one stateless task map, no shuffle — the WARC-parse shape."""
    from tensorflow_ocr_ray.functions.feeds import parse_sitemap, sitemap_for

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, uidx, loc, lm, pr = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for i, (u, m, p) in enumerate(parse_sitemap(sitemap_for(d))):
                doc.append(d)
                uidx.append(i)
                loc.append(u)
                lm.append(m)
                pr.append(p)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "url_idx": pa.array(uidx, type=pa.int64()),
             "loc": pa.array(loc, type=pa.string()),
             "lastmod": pa.array(lm, type=pa.string()),
             "priority_pct": pa.array(pr, type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=2048)


# ------------------------------------------------------------- RSS --------


def rss_feed_parse(sf_dir: str) -> "rd.Dataset":
    """RSS 2.0 item extraction — the feed-discovery on-ramp: each
    document's feed (``functions/feeds.rss_for`` — CDATA vs
    entity-escaped titles that must decode identically, a truncated
    trailing item on every 7th doc that must be skipped) parses to
    typed (title, link, guid, pub_day) rows.

    Scale: one stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.feeds import parse_rss, rss_for

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, iidx, tit, lnk, gid, day = [], [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for i, (t, l, g, p) in enumerate(parse_rss(rss_for(d))):
                doc.append(d)
                iidx.append(i)
                tit.append(t)
                lnk.append(l)
                gid.append(g)
                day.append(p)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "item_idx": pa.array(iidx, type=pa.int64()),
             "title": pa.array(tit, type=pa.string()),
             "link": pa.array(lnk, type=pa.string()),
             "guid": pa.array(gid, type=pa.string()),
             "pub_day": pa.array(day, type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=2048)


# ---------------------------------------------------- pagination ----------

PAGINATION_HOP_CAP = 8


def pagination_chain(
    sf_dir: str, n_shards: int | None = None
) -> "rd.Dataset":
    """Paginated-article reassembly — multi-page articles linked by
    ``rel="next"`` become one logical document: per page the operator
    emits its chain head, the chain length and its 0-based position
    (the order key a downstream concat stitches pages with — the same
    ordered-reassembly invariant as the flagship's span stitch).

    Plan (no arithmetic shortcuts — the engine only sees parsed
    pointers): (1) parse each page's next pointer
    (``functions/html_extract.extract_next_doc``; prev/canonical/
    commented decoys must not match); (2) one validation exchange drops
    dangling pointers (a next to a page not in the corpus terminates
    the chain — crawl reality); (3) POINTER DOUBLING to each page's
    chain TAIL carrying exact hop distance — ``log2(cap)`` union-tag
    exchange rounds, the :func:`redirect_resolution` machinery; (4) ONE
    tail-keyed exchange groups each chain to compute length / head /
    position locally.  The driver never holds node-sized state."""
    ids = _docs(sf_dir, ["doc_id"])
    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents") * 2)

    # ---- stage 1+2: parse next pointers, validate targets exist ----
    def seed(batch: pa.Table) -> pd.DataFrame:
        from tensorflow_ocr_ray.functions.html_extract import (
            extract_next_doc,
            pagination_page_for,
        )

        u = batch.column("doc_id").to_numpy()
        nxt = np.fromiter(
            (extract_next_doc(pagination_page_for(int(d))) for d in u),
            np.int64, len(u))
        has = nxt >= 0
        nodes = pd.DataFrame(
            {"role": 0, "key": u, "src": -1, "shard": u % n_shards})
        walkers = pd.DataFrame(
            {"role": 1, "key": nxt[has], "src": u[has],
             "shard": nxt[has] % n_shards})
        finals = pd.DataFrame(
            {"role": 2, "key": u[~has], "src": u[~has],
             "shard": u[~has] % n_shards})
        return pd.concat([nodes, walkers, finals], ignore_index=True
                         ).astype({"role": "int64", "key": "int64",
                                   "src": "int64", "shard": "int64"})

    def validate(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "cur": "int64", "hops": "int64",
                "done": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        nodes = df.loc[df["role"] == 0, "key"].to_numpy(np.int64)
        w = df[df["role"] == 1]
        fin = df[df["role"] == 2]
        exists = np.isin(w["key"].to_numpy(np.int64), nodes)
        out = pd.DataFrame(
            {"src": np.concatenate([w["src"].to_numpy(np.int64),
                                    fin["src"].to_numpy(np.int64)]),
             "cur": np.concatenate([
                 np.where(exists, w["key"].to_numpy(np.int64),
                          w["src"].to_numpy(np.int64)),
                 fin["key"].to_numpy(np.int64)]),
             "hops": np.concatenate([
                 exists.astype(np.int64),
                 np.zeros(len(fin), np.int64)]),
             "done": np.concatenate([
                 (~exists).astype(np.int64),
                 np.ones(len(fin), np.int64)])})
        return out.astype(cols)

    f = hash_exchange(
        ids.map_batches(seed, batch_format="pyarrow", batch_size=8192),
        "shard", n_shards, validate)

    # ---- stage 3: doubling rounds (f composes with itself) ----
    def _compose(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "cur": "int64", "hops": "int64",
                "done": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        lk = df.loc[df["role"] == 0,
                    ["f_src", "f_cur", "f_hops", "f_done"]]
        w = df.loc[df["role"] == 1, ["key", "src", "hops"]]
        if not len(w):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        m = w.merge(lk, left_on="key", right_on="f_src", how="left")
        miss = m["f_src"].isna()
        return pd.DataFrame(
            {"src": m["src"].to_numpy(np.int64),
             "cur": np.where(miss, m["key"].to_numpy(np.int64),
                             m["f_cur"].fillna(-1).to_numpy(np.int64)),
             "hops": (m["hops"].to_numpy(np.int64)
                      + m["f_hops"].fillna(0).to_numpy(np.int64)),
             "done": np.where(miss, 1,
                              m["f_done"].fillna(1).to_numpy(np.int64))}
        ).astype(cols)

    n_rounds = int(np.log2(PAGINATION_HOP_CAP))
    for _ in range(n_rounds):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            cols = ("role", "key", "src", "hops",
                    "f_src", "f_cur", "f_hops", "f_done", "shard")
            if not len(df):
                return pd.DataFrame(
                    {c: pd.Series([], dtype="int64") for c in cols})
            lookup = pd.DataFrame(
                {"role": 0, "key": df["src"], "src": -1, "hops": 0,
                 "f_src": df["src"], "f_cur": df["cur"],
                 "f_hops": df["hops"], "f_done": df["done"]})
            act = df[df["done"] == 0]
            walkers = pd.DataFrame(
                {"role": 1, "key": act["cur"], "src": act["src"],
                 "hops": act["hops"], "f_src": -1, "f_cur": -1,
                 "f_hops": 0, "f_done": 0})
            out = pd.concat([lookup, walkers], ignore_index=True)
            out["shard"] = out["key"].to_numpy(np.int64) % n_shards
            return out.astype({c: "int64" for c in cols})

        composed = hash_exchange(
            f.map_batches(tag, batch_format="pandas", batch_size=8192),
            "shard", n_shards, _compose)
        done_rows = f.map_batches(
            lambda df: df[df["done"] == 1],
            batch_format="pandas", batch_size=8192)
        f = done_rows.union(composed)

    # ---- stage 4: one tail-keyed exchange computes len/head/pos ----
    def to_tail_rows(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("src", "tail", "dist", "shard")})
        if (df["done"].to_numpy(np.int64) == 0).any():
            raise ValueError(
                "pagination chain longer than PAGINATION_HOP_CAP=%d"
                % PAGINATION_HOP_CAP)
        return pd.DataFrame(
            {"src": df["src"].to_numpy(np.int64),
             "tail": df["cur"].to_numpy(np.int64),
             "dist": df["hops"].to_numpy(np.int64),
             "shard": df["cur"].to_numpy(np.int64) % n_shards})

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "chain_head": "int64",
                "chain_len": "int64", "pos": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        g = df.groupby("tail")["dist"]
        clen = g.transform("max").to_numpy(np.int64) + 1
        dist = df["dist"].to_numpy(np.int64)
        # the head is the member whose distance to the tail is maximal;
        # map it back onto every member of the same chain
        heads = (df.loc[df["dist"].to_numpy(np.int64) == clen - 1]
                 .set_index("tail")["src"])
        return pd.DataFrame(
            {"doc_id": df["src"].to_numpy(np.int64),
             "chain_head": df["tail"].map(heads).to_numpy(np.int64),
             "chain_len": clen,
             "pos": clen - 1 - dist}).astype(cols)

    return hash_exchange(
        f.map_batches(to_tail_rows, batch_format="pandas",
                      batch_size=8192),
        "shard", n_shards, assemble)


# ------------------------------------------------ markdown rendering ------


def html_markdown_render(sf_dir: str) -> "rd.Dataset":
    """HTML→Markdown conversion — the readable-text rendering an
    LLM-ingest pipeline often prefers over plain stripping (structure
    survives as ``#`` headings, ``- `` lists, ``**bold**`` and
    ``[text](href)`` links).  The fixture page
    (``functions/html_extract.md_page_for``) plants script/comment
    decoys; the whole rendered document is hash-checked against a
    DuckDB oracle that rebuilds the exact Markdown string.

    Scale: one stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        html_to_markdown,
        md_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        md = [html_to_markdown(md_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "markdown": pa.array(md, type=pa.string()),
             "n_lines": pa.array(
                 [m.count("\n") + 1 for m in md], type=pa.int64())})

    return docs.map_batches(render, batch_format="pyarrow",
                            batch_size=2048)


# -------------------------------------------- sentence segmentation -------


def sentence_split(sf_dir: str) -> "rd.Dataset":
    """Abbreviation-aware sentence segmentation — the curation step
    between extraction and chunking: the fixture text
    (``functions/textstats.sentences_for``) plants ``No. 4``, ``3.5``
    and ``e.g.`` decoys a naive period-split breaks on; the splitter
    cuts only at terminator + whitespace + uppercase.  Emits one typed
    row per sentence with its index and token count.

    Scale: one stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.textstats import (
        sentences_for,
        split_sentences,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def split(batch: pa.Table) -> pa.Table:
        doc, sidx, ntok, sent = [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for i, s in enumerate(split_sentences(sentences_for(d))):
                doc.append(d)
                sidx.append(i)
                ntok.append(len(s.split()))
                sent.append(s)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "sent_idx": pa.array(sidx, type=pa.int64()),
             "n_tokens": pa.array(ntok, type=pa.int64()),
             "sentence": pa.array(sent, type=pa.string())})

    return docs.map_batches(split, batch_format="pyarrow",
                            batch_size=2048)


# ---------------------------------------------- URL path templates --------


def url_template_mine(sf_dir: str, n_shards: int | None = None) -> "rd.Dataset":
    """URL-pattern mining — the crawl-scheduler/template-page signal:
    every URL's all-digit path segments generalize to ``{n}``
    (``functions/urlnorm.path_template``) and the corpus counts (host,
    template) pairs.  Three fixture path shapes per doc
    (``template_urls_for``) must collapse to three templates.

    Plan: per-batch (host, template)->n pre-reduce map-side, ONE
    template-hash exchange for exact counts — template keyspace is
    unbounded at web scale (the url_canonicalize plan)."""
    from tensorflow_ocr_ray.functions.textstats import _md5_prefix_batch
    from tensorflow_ocr_ray.functions.urlnorm import (
        path_template,
        template_urls_for,
    )

    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents") * 2)

    def partial(batch: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for did in batch.column("doc_id").to_pylist():
            for raw in template_urls_for(int(did)):
                ht = path_template(raw)
                if ht is not None:
                    c[ht] += 1
        if not c:
            return pd.DataFrame(
                {"host": pd.Series([], dtype="string"),
                 "template": pd.Series([], dtype="string"),
                 "n": pd.Series([], dtype="int64"),
                 "shard": pd.Series([], dtype="int64")})
        keys = ["%s|%s" % ht for ht in c]
        out = pd.DataFrame(
            {"host": [h for h, _ in c],
             "template": [t for _, t in c],
             "n": np.fromiter(c.values(), np.int64, len(c))})
        out["shard"] = (
            _md5_prefix_batch(keys, 8).astype(np.uint64) % n_shards
        ).astype(np.int64)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"host": pd.Series([], dtype="string"),
                 "template": pd.Series([], dtype="string"),
                 "n_urls": pd.Series([], dtype="int64")})
        g = df.groupby(["host", "template"], as_index=False)["n"].sum()
        return g.rename(columns={"n": "n_urls"}).astype({"n_urls": "int64"})

    rows = _docs(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    return hash_exchange(rows, "shard", n_shards, combine)


# ------------------------------------------------ DOM structure audit -----


def dom_structure_stats(sf_dir: str) -> "rd.Dataset":
    """DOM-shape audit — the structural quality signal (template pages
    run deep and tag-heavy, text pages shallow): a tolerant tag-stack
    walk (``functions/html_extract.dom_stats``) emits max depth, tag
    and void-element counts per page; the fixture plants misnested
    tags, self-closing voids and script/comment decoys.

    Scale: one stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        dom_page_for,
        dom_stats,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        stats = [dom_stats(dom_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "max_depth": pa.array([s[0] for s in stats], type=pa.int64()),
             "n_tags": pa.array([s[1] for s in stats], type=pa.int64()),
             "n_void": pa.array([s[2] for s in stats], type=pa.int64())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=2048)


# --------------------------------------------- language segmentation ------


def language_segments(sf_dir: str) -> "rd.Dataset":
    """Paragraph-level language segmentation — the router a
    per-language curation pass needs on mixed-language pages: each
    fixture text carries the document's own words plus a planted
    paragraph in a second language (``functions/textstats.
    mixed_lang_text_for``); paragraphs are language-identified with
    the shared ``lang_id`` heuristic and adjacent same-language runs
    merge.  The oracle reuses the generated langid SQL for the
    document paragraph and the planted constant for the second — the
    merge case (both predict the same language) is exercised wherever
    the heuristic agrees.

    Scale: one stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.textstats import (
        language_segments_of,
        mixed_lang_text_for,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])

    def segment(batch: pa.Table) -> pa.Table:
        doc, sidx, lang, npar = [], [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            d = int(did)
            for i, (lg, n) in enumerate(
                language_segments_of(mixed_lang_text_for(d, t or ""))
            ):
                doc.append(d)
                sidx.append(i)
                lang.append(lg)
                npar.append(n)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "seg_idx": pa.array(sidx, type=pa.int64()),
             "pred_lang": pa.array(lang, type=pa.string()),
             "n_paras": pa.array(npar, type=pa.int64())})

    return docs.map_batches(segment, batch_format="pyarrow",
                            batch_size=2048)


# ------------------------------------------------- crawl frontier ---------


def crawl_frontier_dedup(
    sf_dir: str, n_shards: int | None = None
) -> "rd.Dataset":
    """Crawl-frontier merge — sitemap discoveries and extracted
    outlinks union into ONE deduplicated, robots-gated frontier with
    per-URL source attribution and hit counts.  The fixture
    (``functions/urlnorm.frontier_urls_for``) plants every hazard the
    op exists for: a messy re-discovery only canonicalization collapses
    (upper-case scheme/host, default port, dot-segment, fragment), a
    ``/about`` URL shared across every third document (cross-document
    dedup), and ``/u/`` paths a robots rule drops on odd-digit hosts.

    Plan: per-batch canonicalize + (url -> source-mask, count)
    pre-reduce map-side, ONE url-hash exchange ORs masks / sums hits
    exactly and applies the BROADCAST robots rule table (host-bounded
    catalog — ``ray.put`` once, read per shard; at web scale an
    unbounded rule table rides a host-hash join instead)."""
    from tensorflow_ocr_ray.functions.textstats import _md5_prefix_batch
    from tensorflow_ocr_ray.functions.urlnorm import (
        canonicalize_url,
        frontier_urls_for,
    )

    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents") * 2)

    # robots catalog: odd-digit hosts disallow the /u/ prefix
    rules = {
        "site%d.example.com" % k: "/u/" for k in range(7) if k % 2 == 1
    }
    rules_ref = ray.put(rules)

    def partial(batch: pa.Table) -> pd.DataFrame:
        agg: dict[str, list[int]] = {}
        for did in batch.column("doc_id").to_pylist():
            for raw, source in frontier_urls_for(int(did)):
                canon = canonicalize_url(raw)
                if canon is None:
                    continue
                st = agg.setdefault(canon, [0, 0, 0])
                if source == "sitemap":
                    st[0] = 1
                else:
                    st[1] = 1
                st[2] += 1
        if not agg:
            return pd.DataFrame(
                {"url": pd.Series([], dtype="string"),
                 "is_s": pd.Series([], dtype="int64"),
                 "is_l": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "shard": pd.Series([], dtype="int64")})
        urls = list(agg)
        out = pd.DataFrame(
            {"url": urls,
             "is_s": [agg[u][0] for u in urls],
             "is_l": [agg[u][1] for u in urls],
             "n": [agg[u][2] for u in urls]})
        out["shard"] = (
            _md5_prefix_batch(urls, 8).astype(np.uint64) % n_shards
        ).astype(np.int64)
        return out.astype({"is_s": "int64", "is_l": "int64",
                           "n": "int64", "shard": "int64"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"url": "string", "from_sitemap": "int64",
                "from_link": "int64", "n_hits": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        g = (df.groupby("url", as_index=False)
             .agg(from_sitemap=("is_s", "max"), from_link=("is_l", "max"),
                  n_hits=("n", "sum")))
        r = ray.get(rules_ref)
        host_path = g["url"].str.extract(r"^https?://([^/]+)(/.*)$")
        dis = host_path[0].map(r)
        keep = dis.isna() | ~pd.Series(
            [p.startswith(d) if isinstance(d, str) else False
             for p, d in zip(host_path[1], dis)])
        return g[keep].reset_index(drop=True).astype(
            {"from_sitemap": "int64", "from_link": "int64",
             "n_hits": "int64"})

    rows = _docs(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    return hash_exchange(rows, "shard", n_shards, combine)


# -------------------------------------------------- license markers -------


def license_detect(sf_dir: str) -> "rd.Dataset":
    """License detection — the corpus-governance gate a training-data
    pipeline filters on: a machine-readable ``rel="license"`` link wins
    over an in-text anchor mention (evidence tiers ``rel-link`` >
    ``anchor`` > ``none``); a commented-out decoy link must never
    match (``functions/html_extract.license_page_for``).

    Scale: one stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        detect_license,
        license_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def detect(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [detect_license(license_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "license": pa.array([r[0] for r in res], type=pa.string()),
             "evidence": pa.array([r[1] for r in res],
                                  type=pa.string())})

    return docs.map_batches(detect, batch_format="pyarrow",
                            batch_size=4096)


# --------------------------------------------------- mojibake audit -------


def mojibake_audit(sf_dir: str) -> "rd.Dataset":
    """Encoding-damage audit — the double-encode (UTF-8 read as
    Latin-1) quarantine signal: classic signatures (Ã©, â€™, â€“) are
    counted per document; a LEGIT non-ASCII character must not be
    flagged (``functions/textstats.mojibake_text_for`` plants both
    cases).

    Scale: one stateless task map over a 2-column projection."""
    from tensorflow_ocr_ray.functions.textstats import (
        mojibake_count,
        mojibake_text_for,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])

    def audit(batch: pa.Table) -> pa.Table:
        doc, n, verdict = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            d = int(did)
            c = mojibake_count(mojibake_text_for(d, t or ""))
            doc.append(d)
            n.append(c)
            verdict.append("mojibake" if c else "clean")
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "n_mojibake": pa.array(n, type=pa.int64()),
             "verdict": pa.array(verdict, type=pa.string())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ code-block extraction ----


def code_block_extract(sf_dir: str) -> "rd.Dataset":
    """Fenced code-block extraction — the LLM-training-data op that
    pulls ``<pre><code class="language-*">`` blocks out verbatim
    (newlines preserved, entities unescaped) while skipping inline
    ``<code>`` typography, bare ``<pre>``, script-string and
    commented-out decoys (``functions/html_extract.code_page_for``).

    Scale: stateless task flat-map, no shuffle; code text never leaves
    the block it was parsed in."""
    from tensorflow_ocr_ray.functions.html_extract import (
        code_page_for,
        extract_code_blocks,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, idx, lang, nl, code = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for i, (la, c) in enumerate(extract_code_blocks(
                    code_page_for(d))):
                doc.append(d)
                idx.append(i)
                lang.append(la)
                nl.append(c.count("\n") + 1 if c else 0)
                code.append(c)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "block_idx": pa.array(idx, type=pa.int64()),
             "language": pa.array(lang, type=pa.string()),
             "n_lines": pa.array(nl, type=pa.int64()),
             "code": pa.array(code, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ hreflang clusters --------


def hreflang_clusters(sf_dir: str, n_shards: int | None = None) -> pd.DataFrame:
    """Hreflang alternate-cluster audit — groups pages into language
    clusters from their ``rel="alternate" hreflang`` link sets and
    checks RECIPROCITY (every member must link every other member both
    ways; ``functions/html_extract.hreflang_page_for`` plants a broken
    back-link in every fifth cluster).  RSS-alternate and canonical
    links are decoys the parser must skip.

    Plan: per-doc non-self edges ``(cluster, src, dst)`` keyed by the
    cluster id mined from the alternate URLS (the engine never sees the
    membership arithmetic), ONE cluster-hash exchange, then a fully
    vectorized per-shard audit: membership semi-join to drop edges to
    absent members, and reciprocity as ``n_edges == n·(n−1)``.
    Clusters are hreflang sets — bounded at tens of members — so no
    skew salting is needed."""
    from tensorflow_ocr_ray.functions.html_extract import (
        _HREFLANG_LANGS,
        extract_hreflang,
        hreflang_page_for,
    )

    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents"))
    lang_idx = {la: i for i, la in enumerate(_HREFLANG_LANGS)}

    def partial(batch: pa.Table) -> pd.DataFrame:
        g_l, src_l, dst_l = [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            alts = extract_hreflang(hreflang_page_for(d))
            # src member index = which language THIS page is.  A crawler
            # knows the fetched page's own URL; here that fetch context
            # is the doc's member slot (the broken page can't recover it
            # from its alternate set — that's the point of the audit).
            mem = d % len(_HREFLANG_LANGS)
            for la, href in alts:
                m = lang_idx.get(la)
                if m is None or m == mem:
                    continue
                g = int(href.rsplit("/", 1)[-1])
                g_l.append(g)
                src_l.append(mem)
                dst_l.append(m)
        out = pd.DataFrame(
            {"g": pd.Series(g_l, dtype="int64"),
             "src": pd.Series(src_l, dtype="int64"),
             "dst": pd.Series(dst_l, dtype="int64")})
        out["shard"] = (out["g"] % n_shards).astype("int64")
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"cluster_id": "int64", "n_members": "int64",
                "n_edges": "int64", "reciprocal": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        edges = df[["g", "src", "dst"]].drop_duplicates()
        members = edges[["g", "src"]].drop_duplicates()
        n_mem = members.groupby("g")["src"].nunique()
        present = edges.merge(
            members.rename(columns={"src": "dst"}), on=["g", "dst"])
        n_edges = present.groupby("g").size()
        out = pd.DataFrame({"n_members": n_mem}).join(
            n_edges.rename("n_edges")).fillna(0).reset_index()
        out["n_edges"] = out["n_edges"].astype("int64")
        out["reciprocal"] = (
            out["n_edges"] == out["n_members"] * (out["n_members"] - 1)
        ).astype("int64")
        return out.rename(columns={"g": "cluster_id"}).astype(
            {"cluster_id": "int64", "n_members": "int64"})[list(cols)]

    rows = _docs(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    out = hash_exchange(rows, "shard", n_shards, combine).to_pandas()
    return out.sort_values("cluster_id").reset_index(drop=True)


# ------------------------------------------------ microdata ----------------


def microdata_extract(sf_dir: str) -> "rd.Dataset":
    """Schema.org MICRODATA extraction (the attribute-based sibling of
    ``jsonld_extract``): itemscope/itemtype/itemprop walked with real
    scoping — a nested item's props belong to the nested item, so the
    planted Brand name never leaks into its parent Product
    (``functions/html_extract.microdata_page_for``).

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_microdata,
        microdata_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, typ, name, sku, price, wc = [], [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for item in extract_microdata(microdata_page_for(d)):
                doc.append(d)
                typ.append(item["type"])
                name.append(item.get("name") or item.get("headline", ""))
                sku.append(item.get("sku", ""))
                price.append(int(item["price"]) if "price" in item else -1)
                wc.append(int(item["wordCount"])
                          if "wordCount" in item else -1)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "item_type": pa.array(typ, type=pa.string()),
             "name": pa.array(name, type=pa.string()),
             "sku": pa.array(sku, type=pa.string()),
             "price_cents": pa.array(price, type=pa.int64()),
             "word_count": pa.array(wc, type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ AMP reciprocity ----------


def amp_canonical_pairs(sf_dir: str, n_shards: int | None = None) -> pd.DataFrame:
    """AMP ⇄ canonical reciprocity audit: canonical pages advertise an
    AMP twin (``rel="amphtml"``), AMP pages must point back
    (``rel="canonical"``); every seventh pair's back-link is planted
    broken (``functions/html_extract.amp_page_for``), which strands the
    canonical side unpaired AND creates a phantom key with only an AMP
    side — both surfaced.

    Plan: each page parses to one ``(pair_key, side)`` edge; ONE
    key-hash exchange co-locates the two sides; per-key max/max/and is
    the audit.  The reciprocal-link-audit shape — same as a
    bidirectional sitemap or alternate check at corpus scale."""
    from tensorflow_ocr_ray.functions.html_extract import (
        amp_page_for,
        extract_amp_edge,
    )

    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents"))

    def partial(batch: pa.Table) -> pd.DataFrame:
        key, canon, amp = [], [], []
        for did in batch.column("doc_id").to_pylist():
            edge = extract_amp_edge(amp_page_for(int(did)))
            if edge is None:
                continue
            role, k = edge
            key.append(k)
            canon.append(int(role == "canon"))
            amp.append(int(role == "amp"))
        out = pd.DataFrame(
            {"pair_key": pd.Series(key, dtype="int64"),
             "c": pd.Series(canon, dtype="int64"),
             "a": pd.Series(amp, dtype="int64")})
        out["shard"] = (out["pair_key"] % n_shards).astype("int64")
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"pair_key": "int64", "has_canonical": "int64",
                "has_amp": "int64", "consistent": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        g = df.groupby("pair_key", as_index=False).agg(
            has_canonical=("c", "max"), has_amp=("a", "max"))
        g["consistent"] = (g["has_canonical"] & g["has_amp"]).astype("int64")
        return g.astype(cols)[list(cols)]

    rows = _docs(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    out = hash_exchange(rows, "shard", n_shards, combine).to_pandas()
    return out.sort_values("pair_key").reset_index(drop=True)


# ------------------------------------------------ link-rel audit -----------


def link_rel_audit(sf_dir: str) -> pd.DataFrame:
    """Per-host link-governance grid: counts of follow / nofollow /
    sponsored / ugc outlinks (rel is a TOKEN LIST — ``nofollow ugc``
    counts in both; a rel'd relative nav link is never an outlink).
    The SEO-governance signal a link-graph weighting pass consumes.

    Scale: map-side Counter partials over the bounded (host × 3-bit
    flag) grid, driver merge — the benford convention; host keyspace
    at web scale routes the same partials through a host-hash exchange
    instead."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_rel_links,
        rel_link_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for did in batch.column("doc_id").to_pylist():
            for host, nf, sp, ugc in extract_rel_links(
                    rel_link_page_for(int(did))):
                c[(host, nf, sp, ugc)] += 1
        ks = list(c)
        return pa.table(
            {"host": pa.array([k[0] for k in ks], type=pa.string()),
             "nf": pa.array([k[1] for k in ks], type=pa.int64()),
             "sp": pa.array([k[2] for k in ks], type=pa.int64()),
             "ugc": pa.array([k[3] for k in ks], type=pa.int64()),
             "n": pa.array([c[k] for k in ks], type=pa.int64())})

    grid = docs.map_batches(
        partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    if not len(grid):
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64" if c != "host" else "string")
             for c in ("host", "n_links", "n_follow", "n_nofollow",
                       "n_sponsored", "n_ugc")})
    g = grid.groupby("host").apply(
        lambda d: pd.Series(
            {"n_links": d["n"].sum(),
             "n_follow": d.loc[(d.nf == 0) & (d.sp == 0) & (d.ugc == 0),
                               "n"].sum(),
             "n_nofollow": d.loc[d.nf == 1, "n"].sum(),
             "n_sponsored": d.loc[d.sp == 1, "n"].sum(),
             "n_ugc": d.loc[d.ugc == 1, "n"].sum()}),
        include_groups=False)
    return (g.astype("int64").reset_index()
            .sort_values("host").reset_index(drop=True))


# ------------------------------------------------ breadcrumbs --------------


def breadcrumb_extract(sf_dir: str) -> "rd.Dataset":
    """Breadcrumb-trail extraction — the site-hierarchy signal
    (section path per page) a curation pass stratifies on: the nav
    whose class says breadcrumb parses to an ordered ``' > '`` path;
    a class-less pagination nav with identical li markup is the decoy
    (``functions/html_extract.breadcrumb_page_for``).

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        breadcrumb_page_for,
        extract_breadcrumb,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [extract_breadcrumb(breadcrumb_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "depth": pa.array([r[0] for r in res], type=pa.int64()),
             "path": pa.array([r[1] for r in res], type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ OpenGraph audit ----------


def og_card_audit(sf_dir: str) -> "rd.Dataset":
    """OpenGraph-card consistency audit: og:title vs <title> (the CMS
    cache-drift check — every sixth doc's og:title is planted stale)
    and og:image presence; the twitter:title decoy is never consulted
    (``functions/html_extract.og_page_for``).

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_og_card,
        og_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [audit_og_card(og_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "title_match": pa.array([r[0] for r in res],
                                     type=pa.int64()),
             "has_image": pa.array([r[1] for r in res],
                                   type=pa.int64())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ extractor agreement ------


def extractor_agreement(sf_dir: str) -> "rd.Dataset":
    """Extraction-quality cross-check: the length-gated readability
    extractor vs the density-only extractor on the SAME page; every
    fourth doc carries a planted short content paragraph only the
    density extractor keeps (``agreement_page_for``).  Disagreement
    rate is the quality telemetry a 100-TB extraction run monitors
    per partition — two independent heuristics diverging flags drift
    without any labeled truth.

    Scale: stateless task map running both extractors per row."""
    from tensorflow_ocr_ray.functions.html_extract import (
        agreement_page_for,
        extract_main_content,
        extract_main_content_density,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])

    def audit(batch: pa.Table) -> pa.Table:
        doc, agree, nb_a, nb_b = [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            d = int(did)
            page = agreement_page_for(d, t or "")
            a = extract_main_content(page)
            b = extract_main_content_density(page)
            doc.append(d)
            agree.append(int(a == b))
            nb_a.append(a.count("\n") + 1 if a else 0)
            nb_b.append(b.count("\n") + 1 if b else 0)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "agree": pa.array(agree, type=pa.int64()),
             "n_blocks_a": pa.array(nb_a, type=pa.int64()),
             "n_blocks_b": pa.array(nb_b, type=pa.int64())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=2048)


# ------------------------------------------------ PLD rollup ---------------


def domain_pld_rollup(sf_dir: str) -> pd.DataFrame:
    """Registrable-domain (public-suffix) rollup: full crawl hosts fold
    to their PLD by LONGEST-suffix match (``a.d3.co.uk`` → ``d3.co.uk``
    via the two-label suffix, never ``co.uk`` via the bare ``uk``
    entry) and aggregate distinct-host and URL counts — the
    per-publisher attribution every corpus-governance report keys on.

    Scale: map-side (pld, host) Counter partials over the bounded
    fixture grid, driver merge; a real crawl's PLD keyspace routes the
    same partials through a pld-hash exchange (the benford
    convention)."""
    from tensorflow_ocr_ray.functions.urlnorm import (
        pld_hosts_for,
        registrable_domain,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for did in batch.column("doc_id").to_pylist():
            for host in pld_hosts_for(int(did)):
                pld = registrable_domain(host)
                if pld is not None:
                    c[(pld, host)] += 1
        ks = list(c)
        return pa.table(
            {"pld": pa.array([k[0] for k in ks], type=pa.string()),
             "host": pa.array([k[1] for k in ks], type=pa.string()),
             "n": pa.array([c[k] for k in ks], type=pa.int64())})

    grid = docs.map_batches(
        partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    if not len(grid):
        return pd.DataFrame(
            {"pld": pd.Series([], dtype="string"),
             "n_hosts": pd.Series([], dtype="int64"),
             "n_urls": pd.Series([], dtype="int64")})
    g = grid.groupby("pld").agg(
        n_hosts=("host", "nunique"), n_urls=("n", "sum")).reset_index()
    return (g.astype({"n_hosts": "int64", "n_urls": "int64"})
            .sort_values("pld").reset_index(drop=True))


# ------------------------------------------------ recrawl delta ------------


def recrawl_diff(sf_dir: str, n_shards: int | None = None) -> pd.DataFrame:
    """Crawl-delta classification between two snapshots — the
    incremental-recrawl primitive: per URL ``unchanged`` / ``changed``
    (same URL, different content hash) / ``new`` (current only) /
    ``gone`` (previous only), from the planted change pattern in
    ``functions/urlnorm.crawl_snapshot_for``.

    Plan: both snapshots emit skinny ``(url, hash, side)`` rows; ONE
    url-hash exchange co-locates a URL's two observations; the
    per-shard pivot is vectorized.  At real scale the two sides are
    two partitioned crawl manifests read with column pruning — the
    exchange is the only data movement either way."""
    from tensorflow_ocr_ray.functions.textstats import _md5_prefix_batch
    from tensorflow_ocr_ray.functions.urlnorm import crawl_snapshot_for

    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents"))

    def partial(batch: pa.Table) -> pd.DataFrame:
        url_l, h_l, side_l = [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for t in (0, 1):
                for url, h in crawl_snapshot_for(d, t):
                    url_l.append(url)
                    h_l.append(h)
                    side_l.append(t)
        out = pd.DataFrame(
            {"url": pd.Series(url_l, dtype="string"),
             "h": pd.Series(h_l, dtype="int64"),
             "side": pd.Series(side_l, dtype="int64")})
        out["shard"] = (
            _md5_prefix_batch(url_l, 8).astype(np.uint64) % n_shards
        ).astype(np.int64) if url_l else pd.Series([], dtype="int64")
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"url": "string", "h_prev": "int64", "h_curr": "int64",
                "status": "string"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        prev = df[df.side == 0].set_index("url")["h"]
        curr = df[df.side == 1].set_index("url")["h"]
        merged = pd.DataFrame({"h_prev": prev, "h_curr": curr})
        merged = merged.fillna(-1).astype("int64").reset_index()
        has_p = merged.h_prev >= 0
        has_c = merged.h_curr >= 0
        merged["status"] = np.select(
            [~has_p, ~has_c, merged.h_prev == merged.h_curr],
            ["new", "gone", "unchanged"], default="changed")
        return merged.astype(cols)[list(cols)]

    rows = _docs(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    out = hash_exchange(rows, "shard", n_shards, combine).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


# ------------------------------------------------ PDF Info metadata --------


def pdf_info_extract(sf_dir: str) -> "rd.Dataset":
    """PDF document-information extraction (trailer ``/Info`` dict):
    title with ESCAPED parens, author that is hex-encoded every third
    doc, creation year from the ``D:YYYY...`` date — and a ``/Title``
    planted inside the content stream that must never win
    (``functions/pdfmeta``).  The metadata sidecar of
    ``pdf_layout_text``'s content-stream parse.

    Scale: stateless task map; only the trailer + one object are
    touched per payload."""
    from tensorflow_ocr_ray.functions.pdfmeta import (
        extract_pdf_info,
        pdf_with_info_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        infos = [extract_pdf_info(pdf_with_info_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "title": pa.array([i["title"] for i in infos],
                               type=pa.string()),
             "author": pa.array([i["author"] for i in infos],
                                type=pa.string()),
             "created_year": pa.array([i["created_year"] for i in infos],
                                      type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ meta refresh -------------


def meta_refresh_extract(sf_dir: str) -> "rd.Dataset":
    """Client-side redirect extraction: ``<meta http-equiv="refresh">``
    with a url target parses to a redirect edge (the input the
    ``redirect_resolution`` pointer-doubling consumes); bare-delay
    refreshes (same-page reload) and the ``name="refresh"`` decoy are
    not edges (``functions/html_extract.refresh_page_for``).

    Scale: stateless task map emitting only edge rows."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_meta_refresh,
        refresh_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, delay, target = [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            edge = extract_meta_refresh(refresh_page_for(d))
            if edge is None:
                continue
            doc.append(d)
            delay.append(edge[0])
            target.append(edge[1])
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "delay_s": pa.array(delay, type=pa.int64()),
             "target": pa.array(target, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ robots sitemaps ----------


def robots_sitemap_discovery(sf_dir: str) -> pd.DataFrame:
    """Sitemap discovery from robots.txt: the crawl's host set (mined
    from the corpus) fetches each host's robots file and parses its
    ``Sitemap:`` lines — key case-insensitive, commented-out decoys
    never match (``functions/feeds.robots_txt_for``).

    Scale: the host set is a bounded map-side distinct (the grid
    convention); parsing fans back out as a task map over hosts — at
    web scale both stages key by host hash and nothing ever
    materializes beyond the host list."""
    from tensorflow_ocr_ray.functions.feeds import (
        parse_robots_sitemaps,
        robots_txt_for,
    )

    def host_partial(batch: pa.Table) -> pa.Table:
        hosts = sorted({int(d) % 50
                        for d in batch.column("doc_id").to_pylist()})
        return pa.table({"host_idx": pa.array(hosts, type=pa.int64())})

    hosts = sorted(
        _docs(sf_dir, ["doc_id"])
        .map_batches(host_partial, batch_format="pyarrow",
                     batch_size=8192)
        .to_pandas()["host_idx"].unique().tolist())

    host_ds = rd.from_items([{"host_idx": h} for h in hosts])

    def parse(batch: pa.Table) -> pa.Table:
        hi, si, url = [], [], []
        for h in batch.column("host_idx").to_pylist():
            for j, u in enumerate(parse_robots_sitemaps(
                    robots_txt_for(int(h)))):
                hi.append(int(h))
                si.append(j)
                url.append(u)
        return pa.table(
            {"host_idx": pa.array(hi, type=pa.int64()),
             "sm_idx": pa.array(si, type=pa.int64()),
             "sitemap_url": pa.array(url, type=pa.string())})

    out = host_ds.map_batches(parse, batch_format="pyarrow",
                              batch_size=64).to_pandas()
    return out.sort_values(["host_idx", "sm_idx"]).reset_index(drop=True)


# ------------------------------------------------ HTTP response parse ------


def http_response_parse(sf_dir: str) -> "rd.Dataset":
    """Raw HTTP response-head parsing per fetch: status code, mime
    token (cut before ``;`` params, header-name case-insensitive) and
    redirect Location — the ``X-Decoy-Location`` header never matches
    (``functions/warc.http_response_for``).  The fetch-log layer under
    ``content_type_audit``'s magic-byte sniff.

    Scale: stateless task map."""
    from tensorflow_ocr_ray.functions.warc import (
        http_response_for,
        parse_http_response,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [parse_http_response(http_response_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "status": pa.array([r[0] for r in res], type=pa.int64()),
             "content_type": pa.array([r[1] for r in res],
                                      type=pa.string()),
             "location": pa.array([r[2] for r in res],
                                  type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ section chunks -----------


def section_chunks(sf_dir: str) -> "rd.Dataset":
    """Section-aware chunking — the RAG shape: each heading's body text
    paired with its full section breadcrumb (``H1 > S > T``), so a
    retrieval chunk carries its place in the document outline.  Same
    decoys as ``heading_outline`` (commented-out and script-string
    headings never split a chunk).

    Scale: stateless task map; chunk text never crosses a block."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_section_chunks,
        outline_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, seq, lvl, path, body = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for s, le, p, b in extract_section_chunks(
                    outline_page_for(d)):
                doc.append(d)
                seq.append(s)
                lvl.append(le)
                path.append(p)
                body.append(b)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "seq": pa.array(seq, type=pa.int64()),
             "level": pa.array(lvl, type=pa.int64()),
             "section_path": pa.array(path, type=pa.string()),
             "body": pa.array(body, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ video embeds -------------


def video_embed_extract(sf_dir: str) -> "rd.Dataset":
    """Video-embed harvest: recognized-provider iframes (videotube /
    vidmeo URL patterns) and self-hosted ``<video><source>`` mp4s, in
    document order; the ad iframe (unknown host) and a commented-out
    embed are the decoys every row must skip
    (``functions/html_extract.embed_page_for``).

    Scale: stateless task map, no shuffle — provider classification is
    a per-string match against a broadcast pattern table."""
    from tensorflow_ocr_ray.functions.html_extract import (
        embed_page_for,
        extract_video_embeds,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, seq, prov, vid = [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for s, p, v in extract_video_embeds(embed_page_for(d)):
                doc.append(d)
                seq.append(s)
                prov.append(p)
                vid.append(v)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "seq": pa.array(seq, type=pa.int64()),
             "provider": pa.array(prov, type=pa.string()),
             "video_id": pa.array(vid, type=pa.int64())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ canonical consistency ----


def canonical_conflict_audit(sf_dir: str) -> "rd.Dataset":
    """rel=canonical vs og:url consistency: every 7th doc is missing
    its canonical, every 5th doc's og:url drifted to a stale tracking
    variant; agreement requires both present and byte-equal.  The
    rel=alternate link is the decoy
    (``functions/html_extract.canonical_page_for``).

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_canonical,
        canonical_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [audit_canonical(canonical_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "has_canonical": pa.array([r[0] for r in res],
                                       type=pa.int64()),
             "has_og_url": pa.array([r[1] for r in res],
                                    type=pa.int64()),
             "urls_agree": pa.array([r[2] for r in res],
                                    type=pa.int64())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ forms --------------------


def html_form_extract(sf_dir: str) -> "rd.Dataset":
    """Form inventory per page: count, POST count, input count, hidden
    inputs, and the login signature (any password-type input) — the
    gate a crawl pipeline uses to route login/paywall shells away from
    text extraction.  A commented-out password form is the decoy
    (``functions/html_extract.form_page_for``).

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        extract_forms,
        form_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [extract_forms(form_page_for(d)) for d in ids]
        cols = list(zip(*res)) if res else [[]] * 5
        names = ["n_forms", "n_post", "n_inputs", "has_login",
                 "n_hidden"]
        data = {"doc_id": pa.array(ids, type=pa.int64())}
        for nm, c in zip(names, cols):
            data[nm] = pa.array(list(c), type=pa.int64())
        return pa.table(data)

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ JS dependence ------------


def js_dependence_audit(sf_dir: str) -> "rd.Dataset":
    """Client-side-rendering detector: visible body text length vs
    script payload bytes; every 6th doc is a planted JS shell (empty
    app div + ``100+(doc_id%10)*17`` script bytes) that an HTML-only
    extractor would silently emit as blank — the audit that tells a
    crawl operator how much of the corpus needs a rendering fetch
    tier (``functions/html_extract.jsheavy_page_for``).

    Scale: stateless task map over (doc_id, text); no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_js_dependence,
        jsheavy_page_for,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        txt = batch.column("text").to_pylist()
        res = [audit_js_dependence(jsheavy_page_for(d, t))
               for d, t in zip(ids, txt)]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "body_text_len": pa.array([r[0] for r in res],
                                       type=pa.int64()),
             "script_bytes": pa.array([r[1] for r in res],
                                      type=pa.int64()),
             "js_dependent": pa.array([r[2] for r in res],
                                      type=pa.int64())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ WebVTT cues --------------


def vtt_cue_parse(sf_dir: str) -> "rd.Dataset":
    """Subtitle-track extraction: WebVTT cues to typed rows — ms-exact
    timestamp math, voice-tag speaker attribution; the NOTE and STYLE
    blocks are the decoys a naive blank-line split would emit as cues
    (``functions/feeds.vtt_for``).  The text side of video ingestion:
    at 100 TB the vtt payload rides a binary column next to the media
    span it subtitles.

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.feeds import parse_vtt, vtt_for

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, seq, st, en, spk, cue = [], [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for s, a, b, v, c in parse_vtt(vtt_for(d)):
                doc.append(d)
                seq.append(s)
                st.append(a)
                en.append(b)
                spk.append(v)
                cue.append(c)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "seq": pa.array(seq, type=pa.int64()),
             "start_ms": pa.array(st, type=pa.int64()),
             "end_ms": pa.array(en, type=pa.int64()),
             "speaker": pa.array(spk, type=pa.string()),
             "cue_text": pa.array(cue, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ cache-policy audit -------


def http_cache_audit(sf_dir: str) -> "rd.Dataset":
    """Recrawl-policy audit from response cache headers: max-age /
    no-store / ETag parsed into the four scheduler buckets (no-store,
    fresh, etag-only, unvalidated); the ``X-Cache-Decoy`` header never
    matches (``functions/warc.cache_head_for``).

    Scale: stateless task map over fetch-log rows, no shuffle."""
    from tensorflow_ocr_ray.functions.warc import (
        cache_head_for,
        parse_cache_head,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [parse_cache_head(cache_head_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "max_age": pa.array([r[0] for r in res], type=pa.int64()),
             "no_store": pa.array([r[1] for r in res],
                                  type=pa.int64()),
             "has_etag": pa.array([r[2] for r in res],
                                  type=pa.int64()),
             "policy": pa.array([r[3] for r in res],
                                type=pa.string())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ MIME multipart -----------


def email_mime_parse(sf_dir: str) -> "rd.Dataset":
    """Multipart-MIME framing + payload decode: boundary walk with
    preamble/epilogue dropped, base64 and quoted-printable parts
    decoded to text (the ``=3D`` escape is planted in every payload)
    — the mail/archive ingestion sibling of ``warc_record_parse``
    (``functions/warc.mime_for``).

    Scale: stateless task map over one message per row, no shuffle."""
    from tensorflow_ocr_ray.functions.warc import mime_for, parse_mime

    docs = _docs(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        doc, idx, ct, en, tx = [], [], [], [], []
        for did in batch.column("doc_id").to_pylist():
            d = int(did)
            for i, c, e, t in parse_mime(mime_for(d)):
                doc.append(d)
                idx.append(i)
                ct.append(c)
                en.append(e)
                tx.append(t)
        return pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()),
             "part_idx": pa.array(idx, type=pa.int64()),
             "content_type": pa.array(ct, type=pa.string()),
             "encoding": pa.array(en, type=pa.string()),
             "text": pa.array(tx, type=pa.string())})

    return docs.map_batches(parse, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ TOC anchor audit ---------


def toc_anchor_audit(sf_dir: str) -> "rd.Dataset":
    """In-page anchor integrity: fragment links vs element ids, the
    broken-TOC audit (planted ``#missing`` every 3rd doc; the
    external-URL fragment is the decoy)
    (``functions/html_extract.toc_page_for``).

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_anchors,
        toc_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [audit_anchors(toc_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "n_anchors": pa.array([r[0] for r in res],
                                   type=pa.int64()),
             "n_targets": pa.array([r[1] for r in res],
                                   type=pa.int64()),
             "n_broken": pa.array([r[2] for r in res],
                                  type=pa.int64())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=4096)


# ------------------------------------------------ image alt audit ----------


def image_alt_audit(sf_dir: str) -> "rd.Dataset":
    """Alt-text coverage per page — the caption-mining yield signal:
    missing vs empty (decorative) vs real alt attributes, coverage in
    milli-units; the commented-out img is the decoy
    (``functions/html_extract.img_page_for``).

    Scale: stateless task map, no shuffle."""
    from tensorflow_ocr_ray.functions.html_extract import (
        audit_img_alt,
        img_page_for,
    )

    docs = _docs(sf_dir, ["doc_id"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        res = [audit_img_alt(img_page_for(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "n_images": pa.array([r[0] for r in res],
                                  type=pa.int64()),
             "n_missing": pa.array([r[1] for r in res],
                                   type=pa.int64()),
             "n_empty": pa.array([r[2] for r in res],
                                 type=pa.int64()),
             "coverage_milli": pa.array([r[3] for r in res],
                                        type=pa.int64())})

    return docs.map_batches(audit, batch_format="pyarrow",
                            batch_size=4096)


def crawl_politeness_schedule(
    sf_dir: str, n_shards: int | None = None
) -> "rd.Dataset":
    """Politeness-aware fetch schedule over the canonical frontier —
    the crawl planner's ordering step: every host contributes at most
    ONE url per round, rounds interleave all hosts, and the global
    fetch slot is the position in the (host_rank, host, url) order.
    A crawler honoring per-host delay can then stream slots in order
    without ever fetching a host twice back-to-back (while more than
    one host remains in the round).

    Two exchanges, nothing corpus-sized on the driver:

    1. HOST exchange: distinct canonical urls co-locate per host; the
       shard sorts each host's urls and emits host_rank (1-based).
    2. The rank HISTOGRAM (rank -> count, bounded by the deepest
       host's queue length — count-of-counts, the key_skew_audit
       grid) merges on the driver into exclusive prefix offsets,
       broadcast once.
    3. RANK exchange: rows co-locate per host_rank; each rank group
       sorts by (host, url) and numbers itself from offset[rank] —
       the distributed row_number reassembly (revenue_gini pattern).
       rank=1 is the fattest group (one row per host); a corpus where
       n_hosts exceeds one task's memory sub-splits rank 1 by host
       range with per-range sub-offsets (same pattern, one level
       deeper) — documented seam, not needed at fixture scale."""
    from tensorflow_ocr_ray.functions.textstats import _md5_prefix_batch
    from tensorflow_ocr_ray.functions.urlnorm import (
        canonicalize_url,
        raw_urls_for,
    )

    if n_shards is None:
        n_shards = adaptive_shards(meta_rows(sf_dir, "documents") * 2)

    def urls(batch: pa.Table) -> pd.DataFrame:
        seen = set()
        for did in batch.column("doc_id").to_pylist():
            for raw in raw_urls_for(int(did)):
                canon = canonicalize_url(raw)
                if canon is not None:
                    seen.add(canon)
        out = sorted(seen)
        hosts = [u.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0]
                 for u in out]
        df = pd.DataFrame({"url": out, "host": hosts})
        df["shard"] = (
            _md5_prefix_batch(hosts, 8).astype(np.uint64) % n_shards
        ).astype(np.int64) if len(df) else pd.Series([], dtype="int64")
        return df

    def rank_in_host(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"url": "object", "host": "object", "host_rank": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        d = (df.drop_duplicates("url")
             .sort_values(["host", "url"]).reset_index(drop=True))
        d["host_rank"] = d.groupby("host").cumcount() + 1
        return d[list(cols)].astype({"host_rank": "int64"})

    ranked = hash_exchange(
        _docs(sf_dir, ["doc_id"]).map_batches(
            urls, batch_format="pyarrow", batch_size=4096),
        "shard", n_shards, rank_in_host)

    def rank_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("host_rank", as_index=False).size()
             .rename(columns={"size": "n"}))
        return g.astype("int64")

    hist = (ranked.map_batches(rank_hist, batch_format="pandas")
            .to_pandas())
    if not len(hist):
        return rd.from_pandas(pd.DataFrame(
            {"url": pd.Series([], dtype="object"),
             "host": pd.Series([], dtype="object"),
             "host_rank": pd.Series([], dtype="int64"),
             "slot": pd.Series([], dtype="int64")}))
    h = (hist.groupby("host_rank", as_index=False)["n"].sum()
         .sort_values("host_rank"))
    offs = dict(zip(h["host_rank"].tolist(),
                    (h["n"].cumsum() - h["n"]).tolist()))
    offs_ref = ray.put(offs)
    n2 = max(1, min(64, len(offs)))

    def add_rank_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["shard"] = df["host_rank"].to_numpy(np.int64) % n2
        return df

    def number_slots(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"url": "object", "host": "object",
                "host_rank": "int64", "slot": "int64"}
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in cols.items()})
        o = ray.get(offs_ref)
        d = df.sort_values(["host_rank", "host", "url"]).reset_index(
            drop=True)
        base = d["host_rank"].map(o).to_numpy(np.int64)
        local = d.groupby("host_rank").cumcount().to_numpy()
        d["slot"] = base + local + 1
        return d[list(cols)].astype({"host_rank": "int64",
                                     "slot": "int64"})

    return hash_exchange(
        ranked.map_batches(add_rank_shard, batch_format="pandas"),
        "shard", n2, number_slots)
