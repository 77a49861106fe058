"""Distributed sketches: KMV cardinality and two-pass heavy hitters.

The classic streaming distinct-count estimator (Bar-Yossef et al. 2002):
hash every key to (0,1], keep the k smallest distinct hashes; with
``h_k`` the k-th smallest, ``|D| ≈ (k-1) / h_k``.  Mergeable — the union
of two bottom-k sets re-trimmed to k is the bottom-k of the union — so
it runs as map-side partial sketches + one tiny reduce, moving k values
per batch instead of the key set.

Unlike HLL this choice is fully DETERMINISTIC given the hash function;
with md5-derived hashes (DuckDB-computable) the estimate is
bit-reproducible in SQL, so the driver gets a HARD oracle for an
approximate operator.

Second sketch family: TWO-PASS EXACT HEAVY HITTERS
(:func:`heavy_hitter_trigrams`) — the shuffle-free alternative to the
iceberg-by-shard plan ``curation.frequent_trigrams`` uses.  Pass 1
keeps only each block's LOCALLY heavy keys (count_b * m > total_b); by
pigeonhole any globally heavy key (count * m > total) is locally heavy
in at least one block, so the union of local candidates is a provable
superset, bounded by m rows per block.  Pass 2 broadcasts the
candidate set and recounts EXACTLY, so the output is the exact iceberg
set whatever the block layout — the sketch only bounds the candidate
volume, never the answer (the classic 2-round MPC heavy-hitters shape;
cf. Misra–Gries for the single-pass bounded-memory variant, which this
degenerates to if block vocabularies ever exceed worker heaps).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

_SCALE = float(1 << 64)  # hash / 2^64 ∈ (0,1]


def _kmv_hashes(values) -> np.ndarray:
    """Distinct md5-low-64 hashes of the values (unsigned, as float64
    fractions of 2^64 — exact: 64-bit ints round deterministically)."""
    hs = {
        int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
        )
        for v in values
    }
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def kmv_estimate(bottom_k: np.ndarray, k: int) -> float:
    """(k-1) / h_k on the sorted bottom-k fraction array; exact count
    when fewer than k distinct hashes exist."""
    if len(bottom_k) < k:
        return float(len(bottom_k))
    hk = float(bottom_k[k - 1]) / _SCALE
    return (k - 1) / hk


def approx_distinct(
    ds: "rd.Dataset", column: str, k: int = 256
) -> tuple[float, int]:
    """(estimate, n_partials) for one column of a Dataset."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.sort(_kmv_hashes(df[column]))[:k]
        return pd.DataFrame({"h": hs.astype("uint64")})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    merged = np.sort(pd.unique(parts["h"].to_numpy()))[:k]
    return kmv_estimate(merged.astype(np.uint64), k), len(parts)


def approx_distinct_users(sf_dir: str, k: int = 256) -> pd.DataFrame:
    """KMV distinct-user estimate per event_type (plus the corpus-wide
    row).  Map-side bottom-k per (event_type, batch) → merge per type.
    The result column carries the raw double estimate — bit-identical to
    the SQL oracle's, which recomputes the same md5 bottom-k."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in df.groupby("event_type"):
            hs = np.sort(_kmv_hashes(grp["user_id"]))[:k]
            out.append(pd.DataFrame({"event_type": et,
                                     "h": hs.astype("uint64")}))
        hs = np.sort(_kmv_hashes(df["user_id"]))[:k]
        out.append(pd.DataFrame({"event_type": "__all__",
                                 "h": hs.astype("uint64")}))
        return pd.concat(out, ignore_index=True)

    parts = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
    )
    rows = []
    for et, grp in parts.groupby("event_type"):
        merged = np.sort(pd.unique(grp["h"].to_numpy()))[:k]
        rows.append(
            {"event_type": et,
             "approx_users": kmv_estimate(merged.astype(np.uint64), k)}
        )
    return (
        pd.DataFrame(rows, columns=["event_type", "approx_users"])
        .sort_values("event_type")
        .reset_index(drop=True)
    )


# ----------------------------------------------------- heavy hitters

HH_DIVISOR = 1000  # heavy = count * HH_DIVISOR > corpus trigram total
_CP_BITS = 21  # unicode max 0x10FFFF < 2^21: a trigram packs in 63 bits
_CP_MASK = (1 << _CP_BITS) - 1


def _tri_keys(text: str) -> np.ndarray:
    """Char trigrams of one text as packed int64 keys (3 x 21-bit
    codepoints) — vectorized via the utf-32 view, character-exact with
    SQL ``substr(text, i, 3)``."""
    codes = np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    if len(codes) < 3:
        return np.empty(0, dtype=np.int64)
    return (codes[:-2] << (2 * _CP_BITS)) | (codes[1:-1] << _CP_BITS) \
        | codes[2:]


def _tri_str(key: int) -> str:
    return (
        chr((key >> (2 * _CP_BITS)) & _CP_MASK)
        + chr((key >> _CP_BITS) & _CP_MASK)
        + chr(key & _CP_MASK)
    )


def heavy_hitter_trigrams(
    sf_dir: str, m: int = HH_DIVISOR, n_shards: int = 8
) -> "rd.Dataset":
    """Exact char-trigram heavy hitters (count * m > corpus total) via
    the two-pass broadcast-candidate plan (module docstring): no
    shuffle ever touches the full gram space — pass 1 moves < m rows
    per block to the driver, pass 2 moves |candidates| x n_blocks
    pre-reduced rows through one tiny exchange."""
    import ray

    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def local_heavy(df: pd.DataFrame) -> pd.DataFrame:
        parts = [_tri_keys(t) for t in df["text"]]
        keys = (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.int64))
        total = len(keys)
        uk, cnt = np.unique(keys, return_counts=True)
        heavy = uk[cnt * m > total]
        return pd.DataFrame(
            {
                "key": np.concatenate([heavy, [np.int64(-1)]]),
                "val": np.concatenate(
                    [np.zeros(len(heavy), dtype=np.int64),
                     [np.int64(total)]]
                ),
            }
        )

    p1 = docs.map_batches(
        local_heavy, batch_format="pandas", batch_size=4096
    ).to_pandas()  # bounded: < m candidate rows + 1 total row per block
    total = int(p1.loc[p1["key"] == -1, "val"].sum())
    cand = np.unique(p1.loc[p1["key"] != -1, "key"].to_numpy(np.int64))
    cand_ref = ray.put(cand)

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cand_ref)
        parts = [_tri_keys(t) for t in df["text"]]
        keys = (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.int64))
        if len(c) and len(keys):
            idx = np.searchsorted(c, keys)
            idx[idx == len(c)] = 0
            keys = keys[c[idx] == keys]
        else:
            keys = keys[:0]
        uk, cnt = np.unique(keys, return_counts=True)
        return pd.DataFrame(
            {"key": uk, "val": cnt.astype(np.int64),
             "shard": (uk % n_shards).astype(np.int64)}
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"tri": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64")}
            )
        g = df.groupby("key")["val"].sum()
        g = g[g.to_numpy() * m > total]
        return pd.DataFrame(
            {
                "tri": [_tri_str(int(k)) for k in g.index],
                "cnt": g.to_numpy().astype(np.int64),
            }
        )

    partials = docs.map_batches(
        recount, batch_format="pandas", batch_size=4096
    )
    return hash_exchange(partials, "shard", n_shards, finish)


def heavy_hitter_sql(m: int = HH_DIVISOR) -> str:
    """The exact-iceberg oracle over the same substr trigram space."""
    return f"""
        WITH g AS (
          SELECT substr(text, i, 3) AS tri
          FROM (
            SELECT text, unnest(range(1, len(text) - 1)) AS i
            FROM documents
          )
        ),
        t AS (SELECT count(*) AS total FROM g)
        SELECT tri, CAST(count(*) AS BIGINT) AS cnt
        FROM g, t
        GROUP BY tri, t.total
        HAVING count(*) * {m} > t.total
    """


# Count-Min Sketch params: d arithmetic hash rows over w buckets.
# h_i(u) = ((A_i*u + B_i) % P) % w — pure int64 arithmetic (P prime,
# A_i*u bounded ~1e12*5e5 << 2^63) so DuckDB can re-derive the SKETCH
# ITSELF, not just the answers it approximates.
CMS_P = 1_000_003
CMS_W = 256
CMS_A = (131071, 524287, 8191, 262139)
CMS_B = (12345, 54321, 2468, 13579)


def cms_heavy_hitters(
    sf_dir: str, topn: int = 10, n_shards: int = 32
) -> pd.DataFrame:
    """Count-Min Sketch audit — the third sketch family (after KMV
    distinct and 2-pass exact heavy hitters): estimate per-user event
    counts from a d x w counter grid and report, for the true top-n
    users, the exact count next to the CMS estimate (est >= exact
    always; the gap IS the sketch's collision error on this corpus).

    The counter grid is corpus-size-independent (d*w = 1024 int64s):
    per-batch partials histogram each row's d buckets and tree-combine
    — a sketch build is a BOUNDED-KEY aggregate, the whole point of
    CMS at 100 TB.  The exact top-n rides the usual count-exchange +
    per-shard head-superset.  Every quantity is an integer and the
    hash is plain arithmetic, so the DuckDB oracle re-derives grid,
    top-n and estimates verbatim."""
    import ray

    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id"])

    d = len(CMS_A)

    def grid_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        frames = []
        for i in range(d):
            b = ((CMS_A[i] * u + CMS_B[i]) % CMS_P) % CMS_W
            g = pd.DataFrame({"row": i, "bucket": b}).groupby(
                ["row", "bucket"], as_index=False).agg(n=("row", "size"))
            frames.append(g)
        return pd.concat(frames, ignore_index=True).astype("int64")

    grid = (
        events.map_batches(grid_partial, batch_format="pandas",
                           batch_size=65536)
        .repartition(8)
        .map_batches(
            lambda df: df.groupby(["row", "bucket"],
                                  as_index=False)["n"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["row", "bucket"], as_index=False)["n"].sum()
    )
    cms = np.zeros((d, CMS_W), dtype=np.int64)
    cms[grid["row"].to_numpy(np.int64),
        grid["bucket"].to_numpy(np.int64)] = grid["n"].to_numpy(np.int64)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).size()
        return pd.DataFrame(
            {"user_id": g["user_id"].astype("int64"),
             "n": g["size"].astype("int64"),
             "shard": g["user_id"].astype("int64") % n_shards})

    def shard_top(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")})
        g = df.groupby("user_id", as_index=False)["n"].sum()
        return g.sort_values(["n", "user_id"],
                             ascending=[False, True]).head(topn)

    tops = hash_exchange(
        events.map_batches(count_partial, batch_format="pandas",
                           batch_size=65536),
        "shard", n_shards, shard_top,
    ).to_pandas()
    tops = (
        tops.sort_values(["n", "user_id"], ascending=[False, True])
        .head(topn).reset_index(drop=True)
    )

    u = tops["user_id"].to_numpy(np.int64)
    ests = np.min(
        np.stack([
            cms[i, ((CMS_A[i] * u + CMS_B[i]) % CMS_P) % CMS_W]
            for i in range(d)
        ]),
        axis=0,
    )
    return pd.DataFrame(
        {"user_id": u, "n_exact": tops["n"].to_numpy(np.int64),
         "n_est": ests}
    ).astype("int64")


# ------------------------------------------------------- HyperLogLog

HLL_M = 256           # registers (2^8 buckets): std err 1.04/sqrt(m)
HLL_WBITS = 25        # bits kept for the rank pattern
HLL_K = 40            # fixed-point exponent for the integer estimate
# alpha_256 = 0.7213 / (1 + 1.079/256) (Flajolet et al. 2007), e6
HLL_ALPHA_E6 = round(0.7213 / (1 + 1.079 / HLL_M) * 1_000_000)


def _hll_h60(values) -> np.ndarray:
    """md5-high-60 hash (first 15 hex chars) — the KMV convention
    trimmed to 60 bits so it stays a positive BIGINT for DuckDB's
    signed bit ops (``('0x' || substr(md5(v), 1, 15))::BIGINT``)."""
    return np.fromiter(
        (int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:15], 16)
         for v in values),
        dtype=np.int64, count=len(values))


def hll_lc_lut() -> list[int]:
    """Linear-counting corrections, one per possible empty-bucket
    count V=1..m: round(m * ln(m / V)).  Shared by the engine and the
    generated oracle as an injected VALUES table (the audioop-LUT
    precedent: a 256-entry spec table as parameters keeps ln() out of
    the cross-engine math entirely)."""
    import math
    return [round(HLL_M * math.log(HLL_M / v))
            for v in range(1, HLL_M + 1)]


def hll_distinct(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-count sketch over the orders->customer key
    — the third cardinality family next to KMV
    (:func:`approx_distinct_users`, bottom-k) and the exact exchange
    count: CONSTANT state (256 registers) at any corpus size, where
    KMV keeps k hashes and the exact count keys the whole space.

    Same design rule as the CMS grid: every piece is DuckDB-
    re-derivable.  Hash = md5-high-60 (the KMV convention trimmed to a
    positive BIGINT; an LCG ``(A*u+B) % P`` was measured at 42% error
    at sf0.1 — its linear structure leaks into the trailing-zero
    observable); bucket ``h % m``, pattern ``w = (h // m) % 2^25``,
    rank = trailing zeros of ``w`` + 1 (``w = 0`` caps at WBITS+1).
    Register build is a bounded-key aggregate: per-batch (bucket, max
    rank) partials — <= m rows per batch — merge by max; nothing
    corpus-sized moves.  The raw estimate avoids the float harmonic
    mean with the fixed-point identity

        E = alpha*m^2 / sum_j 2^-M_j
          = (ALPHA_E6 * m^2 * 2^K) // (10^6 * sum_j 2^(K-M_j))

    (arbitrary-precision Python / HUGEINT SQL — the ab_test_stats
    headroom rule).  Small-range correction: when E <= 2.5m and some
    buckets are empty, linear counting ``round(m*ln(m/V))`` applies —
    via the shared :func:`hll_lc_lut` table so no transcendental is
    evaluated independently on either side.  Measured error vs exact:
    +0.6% / -1.2% / +6.1% at sf0.001/0.01/0.1 (raw m=64 was 13-21%).
    The exact count rides one key-hash exchange (disjoint key ranges
    -> per-shard nunique sums exactly) so the output carries sketch vs
    truth side by side.  Rows: m (bucket, register) rows + bucket -1
    (raw fixed-point estimate) + bucket -2 (corrected estimate) +
    bucket -3 (exact), all hash-checked."""
    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey"])

    def reg_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(df["o_custkey"].to_numpy(np.int64))
        h = _hll_h60(u)
        bucket = h % HLL_M
        w = (h // HLL_M) % (1 << HLL_WBITS)
        low = w & -w
        rho = np.where(w == 0, HLL_WBITS + 1,
                       np.log2(np.maximum(low, 1)).astype(np.int64) + 1)
        g = (pd.DataFrame({"bucket": bucket, "register": rho})
             .groupby("bucket", as_index=False)["register"].max())
        return g.astype("int64")

    parts = ds.map_batches(reg_partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    empty_corpus = "bucket" not in parts.columns  # no partials at all
    if empty_corpus:
        parts = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                              "register": pd.Series([], dtype="int64")})
    regs = parts.groupby("bucket", as_index=False)["register"].max()
    full = pd.DataFrame({"bucket": np.arange(HLL_M, dtype=np.int64)})
    regs = full.merge(regs, on="bucket", how="left").fillna(0)
    m_j = [int(r) for r in regs["register"]]
    s = sum(1 << (HLL_K - r) for r in m_j)   # Python big ints
    est = (HLL_ALPHA_E6 * HLL_M * HLL_M * (1 << HLL_K)) // (1_000_000 * s)
    v_empty = sum(1 for r in m_j if r == 0)
    if 2 * est <= 5 * HLL_M and v_empty > 0:
        corrected = hll_lc_lut()[v_empty - 1]
    else:
        corrected = est

    n_shards = 32

    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({"key": u, "shard": u % n_shards}).astype(
            "int64")

    def nunique(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [df["key"].nunique()]}).astype("int64")

    if empty_corpus:
        exact = 0
    else:
        exact = int(hash_exchange(
            ds.map_batches(key_partial, batch_format="pandas",
                           batch_size=65536),
            "shard", n_shards, nunique,
        ).to_pandas()["n"].sum())

    out = pd.concat(
        [regs, pd.DataFrame({"bucket": [-1, -2, -3],
                             "register": [est, corrected, exact]})],
        ignore_index=True)
    return (out.astype("int64").sort_values("bucket")
            .reset_index(drop=True))


# ------------------------------------------------------- Bloom filter

BF_M = 16384                     # bits (256 int64 words)
BF_D = 3                         # hash functions
BF_A = (2654435761, 2246822519, 3266489917)
BF_B = (1013904223, 374761393, 668265263)
BF_P = 2147483647                # 2^31 - 1


def bloom_fpr_audit(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter false-positive audit — the FOURTH sketch family
    (membership, next to KMV/HLL cardinality and CMS frequency), and
    the sizing check a pipeline runs before trusting a bloom semi-join
    (the repo uses one inside the MinHash verifier): insert half the
    customer keys (even), probe the other half (odd — guaranteed
    non-members, so every positive is a FALSE positive), and report
    the measured FPR next to the filter's load.

    Everything is DuckDB-re-derivable: arithmetic double-hashing
    ``h_i = ((A_i*u + B_i) % P) % m`` (the CMS constants convention),
    the bitmap built as 63-bit int64 words (DuckDB range-checks
    ``1 << 63``; per-batch partial bitmaps OR-combine — constant
    state at any corpus size), probes checked word-wise.  At sf0.1 the fixed 16 Kbit
    filter saturates (~74% load, FPR ~40%) — exactly the failure mode
    the audit exists to surface before a 100-TB run."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey"])
    # 63-bit words: DuckDB range-checks 1 << 63, so bit 63 is unused
    n_words = BF_M // 63 + 1

    def bitmap_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(df["o_custkey"].to_numpy(np.int64))
        u = u[u % 2 == 0]
        words = np.zeros(n_words, np.int64)
        for a, b in zip(BF_A, BF_B):
            p = ((a * u + b) % BF_P) % BF_M
            np.bitwise_or.at(words, p // 63,
                             np.int64(1) << (p % 63).astype(np.int64))
        idx = np.nonzero(words)[0]
        return pd.DataFrame({"w": idx.astype(np.int64),
                             "bits": words[idx]})

    parts = (
        ds.map_batches(bitmap_partial, batch_format="pandas",
                       batch_size=65536)
        .to_pandas()
    )
    words = np.zeros(n_words, np.int64)
    np.bitwise_or.at(words, parts["w"].to_numpy(np.int64),
                     parts["bits"].to_numpy(np.int64))
    n_bits_set = int(np.unpackbits(words.view(np.uint8)).sum())

    def probe_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(df["o_custkey"].to_numpy(np.int64))
        u = u[u % 2 == 1]
        hit = np.ones(len(u), bool)
        for a, b in zip(BF_A, BF_B):
            p = ((a * u + b) % BF_P) % BF_M
            hit &= ((words[p // 63] >> (p % 63)) & 1) == 1
        # distinct probes may repeat across batches: carry ids
        return pd.DataFrame({"u": u[hit]})

    fp_df = ds.map_batches(probe_partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    # zero false positives leaves a column-less empty frame
    fp_ids = fp_df["u"].nunique() if "u" in fp_df.columns else 0

    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({"key": u, "shard": u % 16}).astype("int64")

    def nuniq(df: pd.DataFrame) -> pd.DataFrame:
        k = df["key"].drop_duplicates()
        return pd.DataFrame(
            {"n_ins": [int((k % 2 == 0).sum())],
             "n_probe": [int((k % 2 == 1).sum())]}).astype("int64")

    nn = hash_exchange(
        ds.map_batches(key_partial, batch_format="pandas",
                       batch_size=65536),
        "shard", 16, nuniq).to_pandas().sum()
    n_ins, n_probe = int(nn["n_ins"]), int(nn["n_probe"])

    return pd.DataFrame(
        {"n_inserted": [n_ins], "n_probes": [n_probe],
         "n_bits_set": [n_bits_set], "n_false_pos": [int(fp_ids)],
         "fpr_ppm": [int(fp_ids) * 1_000_000 // max(n_probe, 1)]}
    ).astype("int64")


def hll_set_ops(sf_dir: str, type_a: str = "click",
                type_b: str = "purchase",
                n_shards: int = 32) -> pd.DataFrame:
    """HLL SET OPERATIONS — the property that makes register sketches
    the scale tool for audience overlap: per-side sketches over the
    "user-day" key (``user_id@YYYY-MM-DD``) for two event types, union
    estimated from the register-wise MAX of the two sketches (exact
    mergeability — the union sketch IS the sketch of the union), and
    intersection by inclusion-exclusion ``|A| + |B| - |A u B|``.  At
    100 TB each side moves <= 2*256 bounded register partials per
    batch; the exact counterparts (for the audit columns) ride one
    key-hash exchange where disjoint key ranges make per-shard set ops
    exact.  All estimator math is the hll_distinct fixed-point /
    LUT path, so the DuckDB oracle hash-matches bit-for-bit.

    Rows: (stat, value) for est_/exact_ x a/b/union/inter."""
    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def keys_frame(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin([type_a, type_b])
        df = df[m]
        if not len(df):
            return pd.DataFrame(
                {"key": pd.Series([], dtype="object"),
                 "side": pd.Series([], dtype="int64")})
        key = (df["user_id"].astype("int64").astype(str) + "@"
               + df["ts"].dt.strftime("%Y-%m-%d"))
        return pd.DataFrame(
            {"key": key.to_numpy(object),
             "side": (df["event_type"] == type_b)
             .to_numpy().astype(np.int64)})

    def reg_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["side", "bucket", "register"]
        outs = []
        for side in (0, 1):
            u = pd.unique(df.loc[df["side"] == side, "key"].to_numpy())
            if not len(u):
                continue
            h = _hll_h60(u)
            bucket = h % HLL_M
            w = (h // HLL_M) % (1 << HLL_WBITS)
            low = w & -w
            rho = np.where(
                w == 0, HLL_WBITS + 1,
                np.log2(np.maximum(low, 1)).astype(np.int64) + 1)
            g = (pd.DataFrame({"bucket": bucket, "register": rho})
                 .groupby("bucket", as_index=False)["register"].max())
            g["side"] = side
            outs.append(g[cols])
        if not outs:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        return pd.concat(outs, ignore_index=True).astype("int64")

    keyed = ds.map_batches(keys_frame, batch_format="pandas",
                           batch_size=65536)
    parts = keyed.map_batches(reg_partial, batch_format="pandas",
                              batch_size=65536).to_pandas()
    if "bucket" not in parts.columns:
        parts = pd.DataFrame({c: pd.Series([], dtype="int64")
                              for c in ("side", "bucket", "register")})

    def estimate(regs_sparse: pd.Series) -> int:
        m_j = np.zeros(HLL_M, dtype=np.int64)
        m_j[regs_sparse.index.to_numpy(np.int64)] = \
            regs_sparse.to_numpy(np.int64)
        s = sum(1 << (HLL_K - int(r)) for r in m_j)  # Python big ints
        est = (HLL_ALPHA_E6 * HLL_M * HLL_M * (1 << HLL_K)) \
            // (1_000_000 * s)
        v_empty = int((m_j == 0).sum())
        if 2 * est <= 5 * HLL_M and v_empty > 0:
            return hll_lc_lut()[v_empty - 1]
        return int(est)

    per_side = parts.groupby(["side", "bucket"])["register"].max()
    reg_a = per_side.loc[0] if 0 in per_side.index.get_level_values(
        0) else pd.Series(dtype="int64")
    reg_b = per_side.loc[1] if 1 in per_side.index.get_level_values(
        0) else pd.Series(dtype="int64")
    reg_u = parts.groupby("bucket")["register"].max()
    est_a, est_b, est_u = estimate(reg_a), estimate(reg_b), \
        estimate(reg_u)

    # exact audit columns: one key-hash exchange, per-shard set ops
    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["key", "side"]).copy()
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(k).encode("utf-8")).digest()[:8], "big")
             for k in d["key"]),
            dtype=np.uint64, count=len(d))
        d["shard"] = (h % np.uint64(n_shards)).astype(np.int64)
        return d[["key", "side", "shard"]]

    def set_ops(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["n_a", "n_b", "n_union", "n_inter"]
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        a = set(g.loc[g["side"] == 0, "key"])
        b = set(g.loc[g["side"] == 1, "key"])
        return pd.DataFrame(
            {"n_a": [len(a)], "n_b": [len(b)],
             "n_union": [len(a | b)],
             "n_inter": [len(a & b)]}).astype("int64")

    ex = hash_exchange(
        keyed.map_batches(key_partial, batch_format="pandas",
                          batch_size=65536),
        "shard", n_shards, set_ops).to_pandas()
    ex_sum = ex.sum() if len(ex) else pd.Series(
        {c: 0 for c in ("n_a", "n_b", "n_union", "n_inter")})

    return pd.DataFrame(
        {"stat": ["est_a", "est_b", "est_union", "est_inter",
                  "exact_a", "exact_b", "exact_union", "exact_inter"],
         "value": np.asarray(
             [est_a, est_b, est_u, est_a + est_b - est_u,
              int(ex_sum["n_a"]), int(ex_sum["n_b"]),
              int(ex_sum["n_union"]), int(ex_sum["n_inter"])],
             dtype=np.int64)})
