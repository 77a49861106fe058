"""Deduplication pipelines over the ``documents`` table.

Five strategies, from exact to fuzzy — the core toolkit of a training-data
pipeline:

- exact:          hash-partition on text (groupby) → first doc per group
- char-jaccard:   character-set Jaccard pairs within (source) buckets —
                  semantics chosen to be SQL-oracle-checkable against
                  DuckDB's ``jaccard()``
- ngram-jaccard:  3-gram shingle Jaccard pairs within buckets
- minhash-LSH:    shingle → MinHash signature → banded LSH buckets →
                  groupby(bucket) candidate pairs → verified clusters
- simhash:        64-bit near-dup fingerprints (hamming-ball dedup)

All hashing is deterministic (crc/md5); no salted ``hash()`` anywhere.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Min

from tensorflow_ocr_ray.functions.textstats import (
    MinHasher,
    char_set_jaccard,
    char_shingles,
    jaccard_shingles,
    simhash_batch,
)


def _docs(sf_dir: str, columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: keep the smallest doc_id per identical text."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    df = (
        ds.groupby("text")
        .aggregate(Min("doc_id", alias_name="keeper_doc_id"),
                   Count(alias_name="copies"))
        .to_pandas()
    )
    df["keeper_doc_id"] = df["keeper_doc_id"].astype("int64")
    df["copies"] = df["copies"].astype("int64")
    return df[["text", "keeper_doc_id", "copies"]]


def _pairs_in_bucket(df: pd.DataFrame, set_fn, threshold: float) -> pd.DataFrame:
    """Quadratic pair scan within one bucket, with the per-doc set computed
    ONCE (set Jaccard per pair is then two set ops, not two re-parses)."""
    df = df.sort_values("doc_id")
    ids = df["doc_id"].tolist()
    sets = [set_fn(t) for t in df["text"]]
    rows = []
    for i in range(len(ids)):
        si = sets[i]
        for j in range(i + 1, len(ids)):
            sj = sets[j]
            if not si and not sj:
                s = 1.0
            else:
                union = len(si | sj)
                s = len(si & sj) / union if union else 0.0
            if s >= threshold:
                rows.append((ids[i], ids[j], round(s, 4)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "sim"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "sim": "float64"}
    )


def char_jaccard_pairs(sf_dir: str, threshold: float = 0.95) -> pd.DataFrame:
    """All same-source pairs with character-set Jaccard ≥ threshold.

    Bucketing by ``source`` bounds the quadratic comparison to per-bucket
    sizes (the classic blocked-pairs pattern); the per-bucket work runs in
    ``map_groups`` across the cluster.
    """
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    out = ds.groupby("source").map_groups(
        lambda df: _pairs_in_bucket(df, set, threshold),
        batch_format="pandas",
    )
    df = out.to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Same-source pairs with 3-gram shingle Jaccard ≥ threshold."""
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    out = ds.groupby("source").map_groups(
        lambda df: _pairs_in_bucket(df, char_shingles, threshold),
        batch_format="pandas",
    )
    return out.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def minhash_dedup(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.6,
) -> pd.DataFrame:
    """MinHash+LSH near-dup detection.

    Plan: signature per doc (actor stage, hasher built once) → flat_map to
    (band_key, doc_id, signature) → groupby(band_key) emits candidate
    pairs → exact-verify candidates with true shingle Jaccard → cluster by
    union-find → (doc_id, cluster_rep).  Verification re-reads texts via a
    broadcast map at this scale; at 100 TB it becomes a hash-join of the
    candidate-pair list against the corpus.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    n_shards = 64  # coarse shuffle key: O(shards) group calls, not O(bands)

    class Signatures:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for doc_id, text in zip(df["doc_id"], df["text"]):
                sig = self.mh.signature(text)
                for key in self.mh.band_keys(sig, bands=bands):
                    rows.append(
                        {"band_key": key, "band_shard": key % n_shards,
                         "doc_id": doc_id}
                    )
            return pd.DataFrame(
                rows, columns=["band_key", "band_shard", "doc_id"]
            )

    banded = ds.map_batches(
        Signatures, batch_format="pandas", batch_size=4096, concurrency=2
    )

    def shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """All same-band pairs within one shard (many bands per call —
        per-group scheduling overhead amortizes across the shard)."""
        rows_a: list[int] = []
        rows_b: list[int] = []
        for _, grp in df.groupby("band_key"):
            ids = sorted(grp["doc_id"].unique().tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    rows_a.append(ids[i])
                    rows_b.append(ids[j])
        return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b}).astype("int64")

    cand = (
        banded.groupby("band_shard")
        .map_groups(shard_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    # exact verification on the candidate set: shingle sets computed ONCE
    # per doc (recomputing per pair is quadratic in practice — a 500-doc
    # corpus here yields ~50k candidate pairs), then set-intersection per
    # pair.  At 100 TB this dict becomes a ray.put broadcast consumed by a
    # map_batches over the candidate-pair list.
    shingle_sets = {
        r["doc_id"]: char_shingles(r["text"])
        for b in _docs(sf_dir, ["doc_id", "text"]).iter_batches(
            batch_format="pandas"
        )
        for r in b.to_dict("records")
    }

    def _jac(a: int, b: int) -> float:
        sa, sb = shingle_sets[a], shingle_sets[b]
        if not sa and not sb:
            return 1.0
        union = len(sa | sb)
        return len(sa & sb) / union if union else 0.0

    verified = [
        (a, b)
        for a, b in zip(cand.get("doc_a", []), cand.get("doc_b", []))
        if _jac(a, b) >= verify_threshold
    ]
    # union-find clustering
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rbb = find(a), find(b)
        if ra != rbb:
            parent[max(ra, rbb)] = min(ra, rbb)
    rows = [
        {"doc_id": d, "cluster_rep": find(d)}
        for d in sorted(parent)
    ]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_rep"]).astype("int64")


def simhash_fingerprints(sf_dir: str) -> "rd.Dataset":
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pandas", batch_size=4096)
