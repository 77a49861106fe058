"""Iterative graph computation on Ray Data — distributed PageRank.

The engine's iterative-algorithm exemplar (next to the streaming Lloyd
pass in ``pipelines/similarity.py``): rank state lives in the OBJECT
STORE as a sharded Dataset, never on the driver; each power iteration
is one vectorized flat-map (emit per-edge contributions) followed by
one ``hash_exchange`` routed by ``dst % n_shards`` (sum + damp per
shard).  The driver only orchestrates the loop — per-iteration data
volume on the driver is zero.

Graph: deterministic synthetic links over the documents table (doc_ids
are 0..N-1) — vertex ``v`` has out-degree ``1 + v % 3`` with targets
``(v*7 + j) % N`` — so in-degrees vary and the stationary ranks are
non-uniform (a uniform-degree graph would converge to a constant and
test nothing).

EXACT integer math so the unrolled DuckDB oracle hash-matches:
ranks are integer units starting at ``SCALE`` per vertex; an iteration
computes ``r'(v) = SCALE*15//100 + 85 * sum(r(u) // outdeg(u)) // 100``
with int64 floor division on both sides (all values positive, so
numpy's floor and DuckDB's ``//`` agree).  A zero-contribution self
row per vertex keeps sink-less vertices present.  Overflow headroom:
``85 * N * SCALE`` must fit int64 — at 10^12 vertices drop SCALE to
10^6 (the oracle constant generates from the same Python constant).

At 100 TB scale: contributions are a skinny (dst, c, shard) projection
(~24 B/row before Arrow encoding), the exchange's store+spill
high-water is that projection once per iteration, and n_shards scales
with the cluster; a real deployment swaps the arithmetic edge
generator for an edges table sharded the same way (join src-sharded
ranks to src-sharded edges — one extra co-partitioned zip, no design
change)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from tensorflow_ocr_ray.stages.exchange import hash_exchange

SCALE = 1_000_000_000_000
BASE = SCALE * 15 // 100
DAMP_NUM, DAMP_DEN = 85, 100
MULT = 7
MAX_OUTDEG = 3


def _eff_shards(n_shards: int, n: int) -> int:
    """Shard count scaled to graph size: exchange results are
    shard-count invariant (tested), but every exchange pays a fixed
    per-shard task cost — at sf-test sizes 32 shards of ~16 vertices
    each is pure overhead.  ~256 vertices per shard floor, cluster
    n_shards cap."""
    return max(1, min(n_shards, n // 256))


def _int64_frame(v, r):
    return pd.DataFrame(
        {"v": np.asarray(v, np.int64), "r": np.asarray(r, np.int64)}
    )


def link_pagerank(
    sf_dir: str, iters: int = 5, n_shards: int = 32
) -> "rd.Dataset":
    """(doc_id, rank_units) after ``iters`` exact-integer power
    iterations over the synthetic link graph."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()

    ranks = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda df: _int64_frame(df["doc_id"], np.full(len(df), SCALE)),
        batch_format="pandas",
    )

    def contribs(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        r = df["r"].to_numpy(np.int64)
        outdeg = 1 + v % MAX_OUTDEG
        c = r // outdeg
        dst_parts = [v]  # self row keeps every vertex present
        c_parts = [np.zeros(len(v), np.int64)]
        for j in range(1, MAX_OUTDEG + 1):
            m = outdeg >= j
            dst_parts.append((v[m] * MULT + j) % n)
            c_parts.append(c[m])
        dst = np.concatenate(dst_parts)
        val = np.concatenate(c_parts)
        return pd.DataFrame(
            {"v": dst, "c": val, "shard": (dst % n_shards).astype(np.int64)}
        )

    def damp_sum(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _int64_frame([], [])
        s = df.groupby("v", sort=False)["c"].sum()
        return _int64_frame(
            s.index,
            BASE + (DAMP_NUM * s.to_numpy(np.int64)) // DAMP_DEN,
        )

    for _ in range(iters):
        flat = ranks.map_batches(contribs, batch_format="pandas")
        ranks = hash_exchange(flat, "shard", n_shards, damp_sum)

    return ranks.map_batches(
        lambda df: df.rename(columns={"v": "doc_id", "r": "rank_units"}),
        batch_format="pandas",
    )


PPR_SEED_MOD = 97


def personalized_pagerank(
    sf_dir: str, iters: int = 5, n_shards: int = 32,
    seed_mod: int = PPR_SEED_MOD,
) -> "rd.Dataset":
    """Personalized PageRank — restart mass concentrated on the seed
    set ``doc_id % seed_mod == 0`` instead of spread uniformly (the
    random-walk-with-restart relevance score behind "similar pages to
    THIS page" / seed-expansion crawl prioritization).

    Identical distributed shape to :func:`link_pagerank` (skinny
    contribution flat-map + one routed exchange per iteration, zero
    driver state); the only changes are the initial vector (SCALE on
    seeds, 0 elsewhere) and the per-vertex restart term
    ``BASE * [v is seed]`` replacing the uniform BASE.  Non-seed
    vertices unreachable from the seed set converge to exactly 0 —
    integer math keeps that exact (no epsilon floor), which the oracle
    reproduces.  Same int64 headroom analysis as link_pagerank."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()

    def init(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        return _int64_frame(v, np.where(v % seed_mod == 0, SCALE, 0))

    ranks = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(init, batch_format="pandas")

    def contribs(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        r = df["r"].to_numpy(np.int64)
        outdeg = 1 + v % MAX_OUTDEG
        c = r // outdeg
        dst_parts = [v]  # self row keeps every vertex present
        c_parts = [np.zeros(len(v), np.int64)]
        for j in range(1, MAX_OUTDEG + 1):
            m = outdeg >= j
            dst_parts.append((v[m] * MULT + j) % n)
            c_parts.append(c[m])
        dst = np.concatenate(dst_parts)
        val = np.concatenate(c_parts)
        return pd.DataFrame(
            {"v": dst, "c": val,
             "shard": (dst % n_shards).astype(np.int64)}
        )

    def damp_sum(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _int64_frame([], [])
        s = df.groupby("v", sort=False)["c"].sum()
        v = s.index.to_numpy(np.int64)
        restart = np.where(v % seed_mod == 0, BASE, 0)
        return _int64_frame(
            v,
            restart + (DAMP_NUM * s.to_numpy(np.int64)) // DAMP_DEN,
        )

    for _ in range(iters):
        flat = ranks.map_batches(contribs, batch_format="pandas")
        ranks = hash_exchange(flat, "shard", n_shards, damp_sum)

    return ranks.map_batches(
        lambda df: df.rename(columns={"v": "doc_id", "r": "rank_units"}),
        batch_format="pandas",
    )


def personalized_pagerank_oracle_sql(
    iters: int = 5, seed_mod: int = PPR_SEED_MOD
) -> str:
    """Unrolled exact-integer PPR oracle: link_pagerank's CTE chain
    with the seeded initial vector and the CASE restart term."""
    parts = [
        "meta AS (SELECT count(*) AS n FROM documents)",
        f"pr0 AS (SELECT doc_id AS v, CAST(CASE WHEN doc_id % {seed_mod}"
        f" = 0 THEN {SCALE} ELSE 0 END AS BIGINT) AS r FROM documents)",
    ]
    for i in range(1, iters + 1):
        arms = [
            f"SELECT (u.v * {MULT} + {j}) % m.n AS dst, "
            f"u.r // (1 + u.v % {MAX_OUTDEG}) AS c "
            f"FROM pr{i - 1} u, meta m WHERE 1 + u.v % {MAX_OUTDEG} >= {j}"
            for j in range(1, MAX_OUTDEG + 1)
        ]
        arms.append(
            f"SELECT u.v AS dst, CAST(0 AS BIGINT) AS c FROM pr{i - 1} u"
        )
        union = " UNION ALL ".join(arms)
        parts.append(
            f"pr{i} AS (SELECT dst AS v, CAST("
            f"CASE WHEN dst % {seed_mod} = 0 THEN {BASE} ELSE 0 END + "
            f"({DAMP_NUM} * CAST(sum(c) AS BIGINT)) // {DAMP_DEN} "
            f"AS BIGINT) AS r FROM ({union}) GROUP BY dst)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT v AS doc_id, r AS rank_units FROM pr{iters}"
    )


def graph_components(sf_dir: str, n_shards: int = 32) -> "rd.Dataset":
    """Distributed connected components (stages/cc.py — iterated
    min-label propagation, two hash_exchanges per round) as a
    first-class query, over a synthetic graph with a CLOSED-FORM
    component structure the oracle reproduces arithmetically:

    - star edges: every vertex links to its star center ``v - v % 7``
      (centers get a harmless self-edge, keeping every vertex in the
      edge set whatever N is);
    - bridge edges: centers with ``c % 21 == 7`` link to the previous
      center, merging star pairs — so components have sizes 7 and 14
      and diameter ≤ 3, and the min label is
      ``c - 7 if c % 21 == 7 else c``.

    The LP path is the same code the dedup clustering finalizers run;
    here its fixpoint is hash-checked against the closed form."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        c = v - v % 7
        is_bridge = (v % 7 == 0) & (v % 21 == 7) & (v >= 7)
        src = np.concatenate([v, v[is_bridge]])
        dst = np.concatenate([c, v[is_bridge] - 7])
        return pd.DataFrame({"src": src, "dst": dst})

    # consumed exactly once — cc.py materializes its own half-row table
    edge_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(edges, batch_format="pandas")
    from tensorflow_ocr_ray.stages.cc import connected_components

    return connected_components(
        edge_ds, src="src", dst="dst",
        n_shards=min(n_shards, max(1, n // 16)),
    )


COMPONENTS_ORACLE_SQL = """
    SELECT doc_id AS node,
           CAST(CASE WHEN (doc_id - doc_id % 7) % 21 = 7
                THEN doc_id - doc_id % 7 - 7
                ELSE doc_id - doc_id % 7 END AS BIGINT) AS label
    FROM documents
"""


def pagerank_oracle_sql(iters: int = 5) -> str:
    """The unrolled exact-integer oracle (same constants, same floor
    divisions, one CTE per iteration)."""
    parts = [
        "meta AS (SELECT count(*) AS n FROM documents)",
        f"pr0 AS (SELECT doc_id AS v, CAST({SCALE} AS BIGINT) AS r "
        "FROM documents)",
    ]
    for i in range(1, iters + 1):
        arms = [
            f"SELECT (u.v * {MULT} + {j}) % m.n AS dst, "
            f"u.r // (1 + u.v % {MAX_OUTDEG}) AS c "
            f"FROM pr{i - 1} u, meta m WHERE 1 + u.v % {MAX_OUTDEG} >= {j}"
            for j in range(1, MAX_OUTDEG + 1)
        ]
        arms.append(
            f"SELECT u.v AS dst, CAST(0 AS BIGINT) AS c FROM pr{i - 1} u"
        )
        union = " UNION ALL ".join(arms)
        parts.append(
            f"pr{i} AS (SELECT dst AS v, CAST({BASE} + "
            f"({DAMP_NUM} * CAST(sum(c) AS BIGINT)) // {DAMP_DEN} "
            f"AS BIGINT) AS r FROM ({union}) GROUP BY dst)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT v AS doc_id, r AS rank_units FROM pr{iters}"
    )


SEED_MOD = 97
BFS_ITERS = 6


def graph_bfs_depth(
    sf_dir: str, iters: int = BFS_ITERS, n_shards: int = 32
) -> "rd.Dataset":
    """Multi-source BFS over the synthetic link graph — (doc_id,
    depth) = shortest hop count from the seed set ``doc_id % 97 == 0``
    for every vertex reachable within ``iters`` hops (the recursive
    traversal / shortest-path family, next to link_pagerank's power
    iteration and graph_components' label propagation).

    FRONTIER-ONLY expansion: a BFS level is final the round it is
    discovered, so round ``i`` emits neighbor messages only from rows
    with ``d == i - 1`` (the last round's discoveries); every state
    row additionally re-emits itself so the per-shard min keeps the
    visited set.  Message volume per round is therefore
    |state| + outdeg x |frontier|, not outdeg x |state| — on a 10^12
    vertex graph the frontier term, which dominates early rounds,
    never re-expands settled vertices.  The re-exchanged self rows are
    the co-partitioning cost of expressing the merge through one
    ``hash_exchange``; a long-lived sharded-actor state (shard i holds
    its slice, receives only messages) would drop that term with no
    change to the arithmetic.

    Depth arithmetic is pure int64, so the DuckDB oracle — a
    WITH RECURSIVE over the same arithmetic edge generator, UNION
    dedup on (v, d), ``min(d)`` per vertex — hash-matches exactly."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    n_shards = _eff_shards(n_shards, n)

    def _state_frame(v, d):
        return pd.DataFrame(
            {"v": np.asarray(v, np.int64), "d": np.asarray(d, np.int64)}
        )

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        v = v[v % SEED_MOD == 0]
        return _state_frame(v, np.zeros(len(v), np.int64))

    state = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(seed, batch_format="pandas")

    def expand(df: pd.DataFrame, frontier_d: int) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        f = v[d == frontier_d]  # last round's discoveries
        outdeg = 1 + f % MAX_OUTDEG
        dst_parts, d_parts = [v], [d]  # self rows carry the visited set
        for j in range(1, MAX_OUTDEG + 1):
            m = outdeg >= j
            dst_parts.append((f[m] * MULT + j) % n)
            d_parts.append(np.full(int(m.sum()), frontier_d + 1, np.int64))
        out = _state_frame(
            np.concatenate(dst_parts), np.concatenate(d_parts)
        )
        out["shard"] = out["v"] % n_shards
        return out

    def min_merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _state_frame([], [])
        s = df.groupby("v", sort=False)["d"].min()
        return _state_frame(s.index, s.to_numpy(np.int64))

    for i in range(1, iters + 1):
        msgs = state.map_batches(
            lambda df, fd=i - 1: expand(df, fd), batch_format="pandas"
        )
        state = hash_exchange(msgs, "shard", n_shards, min_merge)

    return state.map_batches(
        lambda df: df.rename(columns={"v": "doc_id", "d": "depth"}),
        batch_format="pandas",
    )


def bfs_oracle_sql(iters: int = BFS_ITERS) -> str:
    """WITH RECURSIVE oracle: UNION-dedup on (v, d) bounds the
    recursion at ``d < iters``; min(d) per vertex is the BFS depth."""
    return f"""
        WITH RECURSIVE bfs(v, d) AS (
            SELECT doc_id, CAST(0 AS BIGINT)
            FROM documents WHERE doc_id % {SEED_MOD} = 0
            UNION
            SELECT (b.v * {MULT} + j.j) % m.n, b.d + 1
            FROM bfs b,
                 (SELECT count(*) AS n FROM documents) m,
                 (SELECT unnest(range(1, {MAX_OUTDEG + 1})) AS j) j
            WHERE 1 + b.v % {MAX_OUTDEG} >= j.j AND b.d < {iters}
        )
        SELECT v AS doc_id, CAST(min(d) AS BIGINT) AS depth
        FROM bfs GROUP BY v
    """


TRI_HASH_MULT = 1_000_003


def _pair_shard(a: np.ndarray, b: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard key for an (a, b) pair — uint64 wrap then modulo, so huge
    vertex ids can't go negative under int64 overflow."""
    h = a.astype(np.uint64) * np.uint64(TRI_HASH_MULT) + b.astype(np.uint64)
    return (h % np.uint64(n_shards)).astype(np.int64)


def triangle_count(sf_dir: str, n_shards: int = 32) -> "rd.Dataset":
    """Per-vertex triangle participation over the (undirected) synthetic
    link graph — (doc_id, n_triangles) for every vertex in >= 1
    triangle.  The classic degree-ordered node-iterator, fully
    distributed:

    1. canonicalize arithmetic edges to a < b, pair-hash exchange,
       per-shard dedup -> unique undirected edges;
    2. endpoint rows, vertex-hash exchange -> (v, deg);
    3. two tagged-union exchanges attach deg(a) then deg(b) to each
       edge (the co-partitioned-join pattern — no broadcast of the
       O(N) degree table);
    4. orient each edge from its (deg, id)-smaller endpoint, so a
       vertex's oriented out-degree is bounded by O(sqrt(|E|))
       (arboricity bound) — the wedge fan-out sum(outdeg^2) stays
       near-linear even on power-law graphs;
    5. src-hash exchange, per-shard vectorized all-pairs wedge
       emission (concatenated-ranges trick, no Python loop over
       groups), pair-hash exchange tagged-union with the edge set:
       a wedge (u; v, w) whose (v, w) is an edge closes triangle
       (u, v, w) -> emit three (vertex, 1) rows;
    6. vertex-hash exchange, sum -> per-vertex counts.

    Every triangle is found exactly once (its (deg,id)-smallest vertex
    is the only u emitting that wedge).  Pure int64 counting, so the
    three-way self-join DuckDB oracle hash-matches exactly."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    n_shards = _eff_shards(n_shards, n)

    def _ab_frame(a, b, **extra):
        d = {"a": np.asarray(a, np.int64), "b": np.asarray(b, np.int64)}
        d.update(extra)
        return pd.DataFrame(d)

    def gen_edges(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        outdeg = 1 + v % MAX_OUTDEG
        src_parts, dst_parts = [], []
        for j in range(1, MAX_OUTDEG + 1):
            m = outdeg >= j
            src_parts.append(v[m])
            dst_parts.append((v[m] * MULT + j) % n)
        s = np.concatenate(src_parts)
        d = np.concatenate(dst_parts)
        keep = s != d
        s, d = s[keep], d[keep]
        a, b = np.minimum(s, d), np.maximum(s, d)
        return _ab_frame(a, b, shard=_pair_shard(a, b, n_shards))

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _ab_frame([], [])
        g = df.drop_duplicates(["a", "b"])
        return _ab_frame(g["a"], g["b"])

    raw = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(gen_edges, batch_format="pandas")
    edges = hash_exchange(raw, "shard", n_shards, dedup)

    # --- degrees -------------------------------------------------------
    def endpoint_rows(df: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate(
            [df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)]
        )
        return pd.DataFrame({"v": v, "shard": v % n_shards})

    def count_deg(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"v": pd.Series([], dtype="int64"),
                                 "deg": pd.Series([], dtype="int64")})
        s = df.groupby("v", sort=False).size()
        return pd.DataFrame(
            {"v": s.index.to_numpy(np.int64),
             "deg": s.to_numpy(np.int64)}
        )

    degrees = hash_exchange(
        edges.map_batches(endpoint_rows, batch_format="pandas"),
        "shard", n_shards, count_deg,
    )

    # --- attach deg(a), then deg(b) (tagged-union co-partitioned join)
    def tag_edges_by(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["shard"] = out[col].to_numpy(np.int64) % n_shards
            return out
        return f

    def tag_degrees(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": df["v"].astype("int64"),
             "deg": df["deg"].astype("int64"),
             "shard": df["v"].to_numpy(np.int64) % n_shards}
        )

    def join_deg(key, out_col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            is_deg = df["a"].isna() if "a" in df else pd.Series(
                [], dtype=bool)
            lut = df[is_deg]
            e = df[~is_deg].copy()
            if not len(e):
                cols = [c for c in df.columns
                        if c not in ("v", "deg", "shard")] + [out_col]
                return pd.DataFrame(
                    {c: pd.Series([], dtype="int64") for c in cols}
                )
            m = pd.Series(
                lut["deg"].to_numpy(np.int64),
                index=lut["v"].to_numpy(np.int64),
            )
            e[out_col] = m.reindex(
                e[key].to_numpy(np.int64)
            ).to_numpy(np.int64)
            return e.drop(columns=["v", "deg", "shard"]).astype("int64")
        return f

    e_a = hash_exchange(
        edges.map_batches(tag_edges_by("a"), batch_format="pandas").union(
            degrees.map_batches(tag_degrees, batch_format="pandas")
        ),
        "shard", n_shards, join_deg("a", "deg_a"),
    )
    e_ab = hash_exchange(
        e_a.map_batches(tag_edges_by("b"), batch_format="pandas").union(
            degrees.map_batches(tag_degrees, batch_format="pandas")
        ),
        "shard", n_shards, join_deg("b", "deg_b"),
    )

    # --- orient + wedge emission --------------------------------------
    def orient(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("src", "dst", "shard")}
            )
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        da = df["deg_a"].to_numpy(np.int64)
        db = df["deg_b"].to_numpy(np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pd.DataFrame(
            {"src": src, "dst": dst, "shard": src % n_shards}
        )

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _ab_frame([], [], u=pd.Series([], dtype="int64"),
                             shard=pd.Series([], dtype="int64"))
        df = df.sort_values(["src", "dst"])
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        # group sizes per src (contiguous after sort)
        change = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        k = np.diff(np.r_[change, len(src)])
        starts = np.repeat(change, k)           # group start per row
        local = np.arange(len(src)) - starts
        kk = np.repeat(k, k)                    # group size per row
        reps = kk - 1 - local                   # pairs led by this row
        first = np.repeat(np.arange(len(src)), reps)
        off = np.cumsum(reps) - reps
        second = (np.arange(int(reps.sum())) - np.repeat(off, reps)
                  + np.repeat(np.arange(len(src)) + 1, reps))
        w1, w2 = dst[first], dst[second]
        u = src[first]
        a, b = np.minimum(w1, w2), np.maximum(w1, w2)
        return _ab_frame(a, b, u=u, shard=_pair_shard(a, b, n_shards))

    oriented = hash_exchange(
        e_ab.map_batches(orient, batch_format="pandas"),
        "shard", n_shards, lambda df: df.drop(columns=["shard"])
        if len(df) else pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("src", "dst")}
        ),
    )

    wedge_ds = oriented.map_batches(
        lambda df: wedges(df), batch_format="pandas"
    )

    def tag_edge_set(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return _ab_frame(
            a, b, u=np.full(len(a), -1, np.int64),
            shard=_pair_shard(a, b, n_shards),
        )

    def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"v": pd.Series([], dtype="int64"),
                 "shard": pd.Series([], dtype="int64")}
            )
        is_edge = df["u"].to_numpy(np.int64) == -1
        eset = df[is_edge]
        w = df[~is_edge]
        if not len(w) or not len(eset):
            return pd.DataFrame(
                {"v": pd.Series([], dtype="int64"),
                 "shard": pd.Series([], dtype="int64")}
            )
        hit = w.merge(eset[["a", "b"]], on=["a", "b"], how="inner")
        v = np.concatenate(
            [hit["u"].to_numpy(np.int64),
             hit["a"].to_numpy(np.int64),
             hit["b"].to_numpy(np.int64)]
        )
        return pd.DataFrame({"v": v, "shard": v % n_shards})

    tri_vertices = hash_exchange(
        wedge_ds.union(
            edges.map_batches(tag_edge_set, batch_format="pandas")
        ),
        "shard", n_shards, close_wedges,
    )

    def count_tri(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_triangles": pd.Series([], dtype="int64")}
            )
        s = df.groupby("v", sort=False).size()
        return pd.DataFrame(
            {"doc_id": s.index.to_numpy(np.int64),
             "n_triangles": s.to_numpy(np.int64)}
        )

    return hash_exchange(tri_vertices, "shard", n_shards, count_tri)


TRIANGLE_ORACLE_SQL = f"""
    WITH meta AS (SELECT count(*) AS n FROM documents),
    e0 AS (
        SELECT doc_id AS src,
               (doc_id * {MULT} + j.j) % m.n AS dst
        FROM documents, meta m,
             (SELECT unnest(range(1, {MAX_OUTDEG + 1})) AS j) j
        WHERE 1 + doc_id % {MAX_OUTDEG} >= j.j
    ),
    eu AS (
        SELECT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e0 WHERE src <> dst GROUP BY 1, 2
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM eu e1
        JOIN eu e2 ON e2.a = e1.b
        JOIN eu e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([x, y, z]) AS v FROM tri) GROUP BY 1
"""


KCORE_K = 3
KCORE_MAX_ROUNDS = 16


def kcore_membership(
    sf_dir: str, k: int = KCORE_K, n_shards: int = 32,
    max_rounds: int = KCORE_MAX_ROUNDS,
) -> "rd.Dataset":
    """Vertices of the k-core of the undirected link graph — the
    iterative-peeling member of the graph family (pagerank: power
    iteration; components: label propagation; bfs: frontier expansion;
    triangles: one-shot join).  Each round drops vertices whose degree
    among SURVIVORS is < k, until a fixpoint.

    Round = three co-partitioned exchanges on the static undirected
    edge set: filter edges by alive(a) (tagged union on the a key),
    by alive(b) (b key), then count surviving-endpoint degrees (v key)
    and keep deg >= k.  The driver reads only the alive COUNT per
    round (convergence test).  Re-exchanging the static edge set every
    round is the cost of expressing peeling through stateless
    exchanges; a deployment would pin edge shards in long-lived actors
    and ship only the alive deltas.  Converges in <= max_rounds
    (asserted), so the oracle — the same peel unrolled max_rounds
    times, idempotent after convergence — matches exactly."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    n_shards = _eff_shards(n_shards, n)

    def gen_edges(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        outdeg = 1 + v % MAX_OUTDEG
        src_parts, dst_parts = [], []
        for j in range(1, MAX_OUTDEG + 1):
            m = outdeg >= j
            src_parts.append(v[m])
            dst_parts.append((v[m] * MULT + j) % n)
        s = np.concatenate(src_parts)
        d = np.concatenate(dst_parts)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        b = np.maximum(s[keep], d[keep])
        return pd.DataFrame(
            {"a": a, "b": b, "shard": _pair_shard(a, b, n_shards)}
        )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["a", "b"]) if len(df) else df
        return pd.DataFrame(
            {"a": g.get("a", pd.Series([], dtype="int64")).to_numpy(
                np.int64),
             "b": g.get("b", pd.Series([], dtype="int64")).to_numpy(
                np.int64)}
        )

    edges = hash_exchange(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).map_batches(gen_edges, batch_format="pandas"),
        "shard", n_shards, dedup,
    )

    def _v_frame(v):
        return pd.DataFrame({"v": np.asarray(v, np.int64)})

    alive = edges.map_batches(
        lambda df: _v_frame(
            np.unique(np.concatenate(
                [df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)]
            ))
        ),
        batch_format="pandas",
    )
    # the initial alive set is per-block-deduped only, so its count
    # includes cross-block duplicates — start the convergence test at a
    # sentinel so the first (incomparable) count can never stop the loop
    n_alive = -1

    def tag_alive(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        return pd.DataFrame(
            {"a": v, "b": np.full(len(v), -1, np.int64),
             "shard": v % n_shards}
        )

    def key_edges(key):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["shard"] = out[key].to_numpy(np.int64) % n_shards
            return out
        return f

    def filter_by(key):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {"a": pd.Series([], dtype="int64"),
                     "b": pd.Series([], dtype="int64")}
                )
            is_alive = df["b"].to_numpy(np.int64) == -1
            ok = set(df["a"].to_numpy(np.int64)[is_alive].tolist())
            e = df[~is_alive]
            keep = e[key].isin(ok)
            e = e[keep]
            return pd.DataFrame(
                {"a": e["a"].to_numpy(np.int64),
                 "b": e["b"].to_numpy(np.int64)}
            )
        return f

    def degree_keep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _v_frame([])
        s = df.groupby("v", sort=False).size()
        return _v_frame(s.index.to_numpy(np.int64)[s.to_numpy() >= k])

    rounds = 0
    while True:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"k-core did not converge in {max_rounds} rounds — "
                "raise max_rounds (and regenerate the oracle)"
            )
        ea = hash_exchange(
            edges.map_batches(key_edges("a"), batch_format="pandas")
            .union(alive.map_batches(tag_alive, batch_format="pandas")),
            "shard", n_shards, filter_by("a"),
        )
        eab = hash_exchange(
            ea.map_batches(key_edges("b"), batch_format="pandas")
            .union(alive.map_batches(tag_alive, batch_format="pandas")),
            "shard", n_shards, filter_by("b"),
        )
        endpoints = eab.map_batches(
            lambda df: pd.DataFrame(
                {"v": (vv := np.concatenate(
                    [df["a"].to_numpy(np.int64),
                     df["b"].to_numpy(np.int64)])),
                 "shard": vv % n_shards}
            ),
            batch_format="pandas",
        )
        alive = hash_exchange(endpoints, "shard", n_shards, degree_keep)
        n_next = alive.count()
        if n_next == n_alive:
            break
        n_alive = n_next

    return alive.map_batches(
        lambda df: df.rename(columns={"v": "doc_id"}),
        batch_format="pandas",
    )


def kcore_oracle_sql(
    k: int = KCORE_K, rounds: int = KCORE_MAX_ROUNDS
) -> str:
    """The peel unrolled ``rounds`` times — idempotent once converged,
    and the engine asserts convergence within ``rounds``."""
    parts = [
        "meta AS (SELECT count(*) AS n FROM documents)",
        f"""e0 AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM (
              SELECT doc_id AS src,
                     (doc_id * {MULT} + j.j) % m.n AS dst
              FROM documents, meta m,
                   (SELECT unnest(range(1, {MAX_OUTDEG + 1})) AS j) j
              WHERE 1 + doc_id % {MAX_OUTDEG} >= j.j
            ) WHERE src <> dst
        )""",
        "v0 AS MATERIALIZED (SELECT a AS v FROM e0 UNION SELECT b FROM e0)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""e{i} AS MATERIALIZED (
                SELECT e.a, e.b FROM e0 e
                JOIN v{i - 1} va ON va.v = e.a
                JOIN v{i - 1} vb ON vb.v = e.b
            )"""
        )
        parts.append(
            f"""v{i} AS MATERIALIZED (
                SELECT v FROM (
                  SELECT a AS v FROM e{i}
                  UNION ALL SELECT b FROM e{i}
                ) GROUP BY v HAVING count(*) >= {k}
            )"""
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT v AS doc_id FROM v{rounds}"
    )


SP_ROUNDS = 6
SP_WMOD = 5


def shortest_path_weighted(
    sf_dir: str, rounds: int = SP_ROUNDS, n_shards: int = 32
) -> "rd.Dataset":
    """Weighted single-source-set shortest paths over the link graph —
    (doc_id, dist) = min path WEIGHT from the seed set
    ``doc_id % 97 == 0`` within ``rounds`` relaxations, edge weight
    ``1 + (src + dst) % 5``: the min-plus (tropical semiring) member
    of the iterative family, distinct from BFS's hop metric.

    Bellman-Ford relaxation: each round every settled vertex re-emits
    itself (carrying state through the exchange) and relaxes its out
    edges with dist + w; one dst-hash exchange takes the per-vertex
    min.  Unlike BFS, a vertex's distance can IMPROVE after discovery
    (a longer-hop but lighter path), so expansion cannot be
    frontier-only without a change-tracking delta — the full
    relaxation is the textbook form and the oracle unrolls it
    verbatim (min-plus rounds are idempotent once converged but we
    fix the round count on both sides, so convergence is not even
    required for the hash match)."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    n_shards = _eff_shards(n_shards, n)

    def _frame(v, d):
        return pd.DataFrame(
            {"v": np.asarray(v, np.int64), "d": np.asarray(d, np.int64)}
        )

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        v = v[v % SEED_MOD == 0]
        return _frame(v, np.zeros(len(v), np.int64))

    state = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(seed, batch_format="pandas")

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        outdeg = 1 + v % MAX_OUTDEG
        dst_parts, d_parts = [v], [d]  # self rows carry state
        for j in range(1, MAX_OUTDEG + 1):
            m = outdeg >= j
            dst = (v[m] * MULT + j) % n
            w = 1 + (v[m] + dst) % SP_WMOD
            dst_parts.append(dst)
            d_parts.append(d[m] + w)
        out = _frame(np.concatenate(dst_parts), np.concatenate(d_parts))
        out["shard"] = out["v"] % n_shards
        return out

    def min_merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _frame([], [])
        s = df.groupby("v", sort=False)["d"].min()
        return _frame(s.index, s.to_numpy(np.int64))

    for _ in range(rounds):
        state = hash_exchange(
            state.map_batches(relax, batch_format="pandas"),
            "shard", n_shards, min_merge,
        )

    return state.map_batches(
        lambda df: df.rename(columns={"v": "doc_id", "d": "dist"}),
        batch_format="pandas",
    )


def shortest_path_oracle_sql(rounds: int = SP_ROUNDS) -> str:
    """Unrolled min-plus relaxation, one MATERIALIZED CTE per round
    (each d_i is referenced by every relaxation arm — materialization
    keeps the unroll linear, the kcore lesson)."""
    parts = [
        "meta AS (SELECT count(*) AS n FROM documents)",
        f"d0 AS MATERIALIZED (SELECT doc_id AS v, "
        f"CAST(0 AS BIGINT) AS d FROM documents "
        f"WHERE doc_id % {SEED_MOD} = 0)",
    ]
    for i in range(1, rounds + 1):
        arms = [f"SELECT v, d FROM d{i - 1}"]
        for j in range(1, MAX_OUTDEG + 1):
            arms.append(
                f"SELECT (u.v * {MULT} + {j}) % m.n AS v, "
                f"u.d + 1 + (u.v + (u.v * {MULT} + {j}) % m.n) "
                f"% {SP_WMOD} AS d "
                f"FROM d{i - 1} u, meta m "
                f"WHERE 1 + u.v % {MAX_OUTDEG} >= {j}"
            )
        union = " UNION ALL ".join(arms)
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT v, CAST(min(d) AS BIGINT) "
            f"AS d FROM ({union}) GROUP BY v)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT v AS doc_id, d AS dist FROM d{rounds}"
    )


def graph_degree_stats(sf_dir: str, n_shards: int = 32) -> pd.DataFrame:
    """Degree distribution of the undirected star+bridge graph (the
    graph_components topology) — the first diagnostic any graph
    pipeline prints before choosing a partitioning strategy (skewed
    degrees are where vertex-cut vs edge-cut matters).  Self-loops
    excluded; isolated vertices counted at degree 0 via marker rows.

    One vertex-hash exchange (both endpoint directions + markers);
    each shard counts DISTINCT neighbors per vertex — exact because a
    vertex's rows co-shard — and pre-reduces to its local degree
    histogram, so the driver combines |shards| x |degrees| skinny
    rows (degrees are bounded by star size + bridges, not corpus
    size).  Oracle: derive the same closed-form edge list in SQL and
    GROUP BY twice."""
    import pyarrow.dataset as pads

    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        c = v - v % 7
        leaf = v % 7 != 0
        is_bridge = (v % 7 == 0) & (v % 21 == 7) & (v >= 7)
        a = np.concatenate([v[leaf], c[leaf], v[is_bridge],
                            v[is_bridge] - 7, v])
        b = np.concatenate([c[leaf], v[leaf], v[is_bridge] - 7,
                            v[is_bridge], np.full(len(v), -1,
                                                  np.int64)])
        return pd.DataFrame(
            {"v": a, "nb": b, "shard": a % n_shards})

    def shard_hist(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"degree": pd.Series([], dtype="int64"),
                 "n_vertices": pd.Series([], dtype="int64")})
        real = df[df["nb"] >= 0].drop_duplicates(["v", "nb"])
        deg = real.groupby("v")["nb"].size()
        allv = pd.Index(df["v"].unique())
        deg = deg.reindex(allv, fill_value=0)
        h = deg.value_counts().sort_index()
        return pd.DataFrame(
            {"degree": h.index.to_numpy(np.int64),
             "n_vertices": h.to_numpy(np.int64)})

    parts = hash_exchange(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"])
        .map_batches(endpoints, batch_format="pandas",
                     batch_size=65536),
        "shard", n_shards, shard_hist,
    ).to_pandas()
    return (
        parts.groupby("degree", as_index=False)["n_vertices"].sum()
        .astype("int64")
        .sort_values("degree").reset_index(drop=True)
    )


def graph_modularity(sf_dir: str, n_shards: int = 32) -> pd.DataFrame:
    """Newman modularity of the TRUE community partition (component
    labels) of the star+bridge graph — the partition-quality metric a
    community-detection pass is scored by.  Exact integers throughout:
    with every edge intra-community (stars and bridges never cross
    components by construction), Q = sum_c (e_c/m - (d_c/2m)^2)
    becomes the per-community numerator 4*m*e_c - d_c^2 over the
    common denominator 4*m^2 (headroom to m ~ 1.5e9; past that
    pre-divide or go HUGEINT like ab_test_stats).

    One streaming pass derives edges + closed-form labels per batch
    and pre-reduces (label, e_c) partials; one label-hash exchange
    makes per-community counts exact; m tree-combines alongside.
    Rows: one per community (label, n_edges, degree_sum,
    q_contrib_num) plus the label=-1 summary carrying (m, 2m, Q_ppm)
    — the hll summary-row convention.  Oracle: same closed-form edge
    list and label CASE, GROUP BY + window total, hash-matched."""
    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def edge_partials(df: pd.DataFrame) -> pd.DataFrame:
        v = df["doc_id"].to_numpy(np.int64)
        c = v - v % 7
        member = v % 7 != 0
        is_bridge = (v % 21 == 7) & (v >= 7)
        # an edge's community label == its center's component label
        def label_of(x):
            base = x - x % 7
            return np.where(base % 21 == 7, base - 7, base)
        lab = np.concatenate([label_of(c[member]),
                              label_of(v[is_bridge])])
        g = (pd.DataFrame({"label": lab}).groupby("label")
             .size().rename("e").reset_index())
        g["shard"] = g["label"].to_numpy(np.int64) % n_shards
        return g.astype("int64")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["label", "e"]
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        return (df.groupby("label", as_index=False)["e"].sum()
                .astype("int64"))

    per = hash_exchange(
        docs.map_batches(edge_partials, batch_format="pandas",
                         batch_size=65536),
        "shard", n_shards, combine).to_pandas()
    if "label" not in per.columns or not len(per):
        # empty/degenerate corpus: no edge partials at all
        per = pd.DataFrame({"label": pd.Series([], dtype="int64"),
                            "e": pd.Series([], dtype="int64")})
    per = per.groupby("label", as_index=False)["e"].sum()
    m = int(per["e"].sum())
    if m == 0:      # zero edges -> Q undefined; typed summary row
        return pd.DataFrame(
            {"label": [-1], "n_edges": [0], "degree_sum": [0],
             "q_contrib_num": [0]}).astype("int64")
    e = per["e"].to_numpy(np.int64)
    d = 2 * e                      # all edges intra => d_c = 2*e_c
    qnum = 4 * m * e - d * d
    q_ppm = int(qnum.sum()) * 1_000_000 // (4 * m * m)
    out = pd.DataFrame(
        {"label": per["label"].to_numpy(np.int64), "n_edges": e,
         "degree_sum": d, "q_contrib_num": qnum})
    out = pd.concat(
        [out, pd.DataFrame({"label": [-1], "n_edges": [m],
                            "degree_sum": [2 * m],
                            "q_contrib_num": [q_ppm]})],
        ignore_index=True)
    return (out.astype("int64").sort_values("label")
            .reset_index(drop=True))
