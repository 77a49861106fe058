"""Distributed dedup pipelines vs single-process reference semantics.

The MinHash+LSH pipeline has no SQL oracle (LSH candidate generation is
probabilistic-by-construction, recall < 1 near the threshold), so parity
against a straightforward single-process implementation of the identical
algorithm is the correctness gate here.
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _reference_minhash(sf_dir: str, num_perm=64, bands=16, threshold=0.6):
    """Single-process re-derivation of candidates -> verified -> clusters."""
    from tensorflow_ocr_ray.functions.textstats import MinHasher, char_shingles

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    mh = MinHasher(num_perm=num_perm)
    buckets: dict[int, list[int]] = {}
    for did, text in zip(docs.doc_id, docs.text):
        sig = mh.signature(text)
        for key in mh.band_keys(sig, bands=bands):
            buckets.setdefault(key, []).append(int(did))
    pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    sh = {int(d): char_shingles(t) for d, t in zip(docs.doc_id, docs.text)}
    verified = []
    for a, b in sorted(pairs):
        sa, sb = sh[a], sh[b]
        union = len(sa | sb)
        s = (len(sa & sb) / union) if union else 1.0
        if s >= threshold:
            verified.append((a, b))
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = pd.DataFrame(
        [{"doc_id": d, "cluster_rep": find(d)} for d in sorted(parent)],
        columns=["doc_id", "cluster_rep"],
    ).astype("int64")
    return verified, clusters


def test_minhash_verified_pairs_matches_reference(ray_session):
    from tensorflow_ocr_ray.pipelines import dedup

    verified, _ = _reference_minhash(SF)
    got = dedup.minhash_verified_pairs(SF)
    assert set(zip(got.doc_a, got.doc_b)) == set(verified)


def test_minhash_dedup_clusters_match_reference(ray_session):
    from tensorflow_ocr_ray.pipelines import dedup

    _, clusters = _reference_minhash(SF)
    got = dedup.minhash_dedup(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), clusters.reset_index(drop=True)
    )


def test_char_shingle_crc_injective_on_corpus():
    """The ngram oracle rebuilds shingles as strings; the pipeline hashes
    them with crc32.  Equality of the two requires crc injectivity over
    the corpus shingle vocabulary — asserted here."""
    import re
    import zlib

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    ws = re.compile(r"\s+")
    seen: dict[int, str] = {}
    for t in docs.text:
        t = ws.sub(" ", t.strip().lower())
        for i in range(max(1, len(t) - 2)):
            s = t[i : i + 3] if len(t) >= 3 else t
            h = zlib.crc32(s.encode()) & 0xFFFFFFFF
            assert seen.setdefault(h, s) == s, f"crc collision: {s!r}"


def test_exact_dedup_keeps_min_doc_id(ray_session):
    from tensorflow_ocr_ray.pipelines import dedup

    df = dedup.dedup_exact(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ref = (
        docs.groupby("text")
        .agg(keeper_doc_id=("doc_id", "min"), copies=("doc_id", "size"))
        .reset_index()
    ).astype({"keeper_doc_id": "int64", "copies": "int64"})
    merged = df.sort_values("text").reset_index(drop=True)
    ref = ref.sort_values("text").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, ref[merged.columns.tolist()])


def test_dedup_keep_list_composition(ray_session):
    from tensorflow_ocr_ray.pipelines import dedup

    out = (
        dedup.dedup_keep_list(SF)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    assert len(out) == len(docs)
    keeper = docs.groupby("text")["doc_id"].transform("min")
    exact_dup = set(docs.loc[keeper.values != docs["doc_id"].values,
                             "doc_id"])
    clusters = dedup.minhash_dedup(SF)
    reps = dict(zip(clusters["doc_id"], clusters["cluster_rep"]))
    for doc_id, row in out.iterrows():
        if doc_id in exact_dup:
            assert row["reason"] == "exact_dup" and row["kept"] == 0
        elif reps.get(doc_id, doc_id) != doc_id:
            assert row["reason"] == "near_dup" and row["kept"] == 0
            assert row["canonical"] == reps[doc_id]
        else:
            assert row["reason"] == "kept" and row["kept"] == 1
            assert row["canonical"] == doc_id
    # every canonical doc must itself be kept
    canon = set(out["canonical"])
    assert all(out.loc[c, "kept"] == 1 for c in canon)


def test_dedup_incremental_verdicts(ray_session, tmp_path):
    """Crafted corpus with controlled prefix collisions across the 80%
    id split: every verdict class and its canonical pointer checked."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # max_id = 9 -> split = 10*4//5 = 8: docs 8, 9 are "the new batch"
    P = "X" * 32  # shared 32-char prefix key
    texts = {
        0: P + " existing one",
        1: P + " existing two (same key as 0)",
        2: "unrelated existing " + "a" * 30,
        3: "Y" * 32 + " existing key-Y",
        4: "unique-4 " + "b" * 40,
        5: "unique-5 " + "c" * 40,
        6: "unique-6 " + "d" * 40,
        7: "unique-7 " + "e" * 40,
        8: P + " NEW doc hits existing key",     # dup_existing -> 0
        9: "Z" * 32 + " brand new key",          # new
    }
    tbl = pa.table(
        {"doc_id": pa.array(sorted(texts), type=pa.int64()),
         "text": pa.array([texts[k] for k in sorted(texts)]),
         "lang": pa.array(["en"] * 10),
         "source": pa.array(["s"] * 10),
         "n_chars": pa.array([len(texts[k]) for k in sorted(texts)],
                             type=pa.int64())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    from tensorflow_ocr_ray.pipelines.dedup import dedup_incremental

    out = (
        dedup_incremental(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [8, 9]
    assert out.loc[8, "verdict"] == "dup_existing"
    assert out.loc[8, "canonical_doc_id"] == 0  # min existing id of key
    assert out.loc[9, "verdict"] == "new"
    assert out.loc[9, "canonical_doc_id"] == 9


def test_dedup_incremental_in_batch(ray_session, tmp_path):
    """Two new docs sharing a key unseen in the corpus: the earlier id
    keeps ('new'), the later is dup_in_batch pointing at it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    Q = "Q" * 32
    texts = {i: f"old-{i} " + chr(97 + i) * 40 for i in range(8)}
    texts[8] = Q + " first of pair"   # new batch (split = 10*4//5 = 8)
    texts[9] = Q + " second of pair"
    tbl = pa.table(
        {"doc_id": pa.array(sorted(texts), type=pa.int64()),
         "text": pa.array([texts[k] for k in sorted(texts)]),
         "lang": pa.array(["en"] * 10), "source": pa.array(["s"] * 10),
         "n_chars": pa.array([len(texts[k]) for k in sorted(texts)],
                             type=pa.int64())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    from tensorflow_ocr_ray.pipelines.dedup import dedup_incremental

    out = (
        dedup_incremental(str(tmp_path), n_shards=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [8, 9]
    assert out.loc[8, "verdict"] == "new"
    assert out.loc[8, "canonical_doc_id"] == 8
    assert out.loc[9, "verdict"] == "dup_in_batch"
    assert out.loc[9, "canonical_doc_id"] == 8


def test_levenshtein_block_matches_reference():
    """Batch DP kernel vs a per-pair python reference on random pairs
    incl. empty strings and full-length prefixes."""
    import random

    import numpy as np

    from tensorflow_ocr_ray.pipelines.dedup import (
        _levenshtein_block,
        _pack_prefix,
    )

    def ref(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(dp[j] + 1, dp[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, dp[j] = dp[j], cur
        return dp[n]

    rng = random.Random(7)
    A, B = [], []
    for _ in range(200):
        A.append("".join(rng.choice("abcx ")
                         for _ in range(rng.randint(0, 24))))
        B.append("".join(rng.choice("abcx ")
                         for _ in range(rng.randint(0, 24))))
    got = _levenshtein_block(_pack_prefix(A, 24), _pack_prefix(B, 24))
    exp = np.array([ref(a, b) for a, b in zip(A, B)])
    np.testing.assert_array_equal(got, exp)


def test_containment_prefix_plan_crafted_corpus(ray_session, tmp_path):
    """The rarest-prefix plan equals the exact plan on a NATURAL-shaped
    corpus (large vocabulary -> near-unique fingerprints, the regime the
    pruned plan exists for) with planted containment pairs, and its
    candidate volume premise holds: planted inner docs are found."""
    import random

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tensorflow_ocr_ray.pipelines.dedup import (
        doc_containment_pairs,
        doc_containment_pairs_prefix,
    )

    rng = random.Random(1234)
    vocab = [f"w{v:04d}" for v in range(5000)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(50, 120)))
        for _ in range(180)
    ]
    planted = []
    for i in range(8):
        inner = texts[i * 3]
        pad = " ".join(rng.choice(vocab) for _ in range(20))
        # outer extends inner: the kept-fingerprint budget (keep=64,
        # document order) must cover the quoted span, so it leads
        texts.append(f"{inner} {pad}")
        planted.append(i * 3)
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "crafted",
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")

    exact = doc_containment_pairs(str(tmp_path), n_shards=8).to_pandas()
    pruned = doc_containment_pairs_prefix(str(tmp_path), n_shards=8).to_pandas()

    def norm(d):
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(exact), norm(pruned))
    found_inner = set(pruned["doc_inner"].tolist())
    assert set(planted) <= found_inner, (planted, sorted(found_inner))


def test_dup_weight_assign_invariants(ray_session):
    import pandas as pd

    from tensorflow_ocr_ray.pipelines.dedup import dup_weight_assign

    sf = "/root/testdata/sf0.01"
    got = dup_weight_assign(sf).to_pandas()
    raw = pd.read_parquet(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
    assert len(got) == len(raw)
    m = got.merge(raw, on="doc_id")
    n = m.groupby("text")["doc_id"].transform("size")
    assert (m["cluster_n"] == n).all()
    assert (m["weight_milli"] == 1000 // n).all()
    # exactly one canonical per distinct text
    assert m.groupby("text")["is_canonical"].sum().eq(1).all()


def test_simhash_dup_pairs_banding_complete(ray_session):
    """The 4x16-band candidate generation finds EVERY Hamming<=3 pair
    (pigeonhole guarantee) — compared against all-pairs brute force
    over the same fingerprints; shard count does not change the answer."""
    import numpy as np
    import pandas as pd

    from tensorflow_ocr_ray.functions.textstats import simhash64
    from tensorflow_ocr_ray.pipelines.dedup import simhash_dup_pairs

    sf = "/root/testdata/sf0.001"
    got = (simhash_dup_pairs(sf).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    hs = np.array([simhash64(t) for t in docs["text"]],
                  dtype=np.int64).view(np.uint64)
    ids = docs["doc_id"].to_numpy(np.int64)
    ai, bi = np.triu_indices(len(ids), k=1)
    x = hs[ai] ^ hs[bi]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                        axis=1).sum(axis=1)
    keep = ham <= 3
    ref = pd.DataFrame({
        "doc_a": np.minimum(ids[ai[keep]], ids[bi[keep]]),
        "doc_b": np.maximum(ids[ai[keep]], ids[bi[keep]]),
        "hamming": ham[keep].astype(np.int64),
    }).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(got) == len(ref) > 0
    assert (got[["doc_a", "doc_b", "hamming"]].to_numpy()
            == ref.to_numpy()).all()

    alt = (simhash_dup_pairs(sf, n_shards=3).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert (alt[["doc_a", "doc_b", "hamming"]].to_numpy()
            == ref.to_numpy()).all()


def test_dedup_keep_longest_tie_and_partial_merge(ray_session):
    """Winner = max n_chars, tie -> min doc_id, exact across batch
    partials: verified against a sequential recompute at sf0.001."""
    import duckdb

    from tensorflow_ocr_ray.pipelines.dedup import (
        dedup_keep_longest,
        minhash_dedup,
    )

    sf = "/root/testdata/sf0.001"
    got = dedup_keep_longest(sf)
    clusters = minhash_dedup(sf)
    chars = dict(duckdb.sql(
        f"SELECT doc_id, n_chars FROM "
        f"read_parquet('{sf}/documents.parquet')").fetchall())
    exp = {}
    for doc, rep in zip(clusters["doc_id"], clusters["cluster_rep"]):
        n = chars[int(doc)]
        cur = exp.get(int(rep))
        cand = (int(n), int(doc))
        if cur is None:
            exp[int(rep)] = [cand, 1]
        else:
            best, cnt = cur
            if (-cand[0], cand[1]) < (-best[0], best[1]):
                cur[0] = cand
            cur[1] = cnt + 1
    exp_rows = sorted(
        (rep, v[0][1], v[1], v[0][0]) for rep, v in exp.items())
    assert list(map(tuple, got.itertuples(index=False))) == exp_rows
