"""BPE merge learning: distributed trainer == independent sequential
trainer (exact merge-list equality), incl. overlap and tiebreak
semantics on crafted corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tensorflow_ocr_ray.pipelines.tokenizer import (
    EOW,
    _apply_merge,
    bpe_learn_merges,
    bpe_reference,
)

SF = "/root/testdata/sf0.001"


def test_apply_merge_overlap():
    # "aaaa" + (a,a): greedy left-to-right -> (aa, aa); "aaa" -> (aa, a)
    assert _apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _apply_merge(["x", "y", "x"], "x", "y") == ["xy", "x"]


def test_bpe_corpus_parity(ray_session):
    from collections import Counter

    import duckdb

    got = bpe_learn_merges(SF, n_merges=10)
    texts = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchnumpy()["text"]
    wc = Counter()
    for t in texts:
        wc.update(t.split())
    ref = bpe_reference(dict(wc), 10)
    assert list(zip(got["left"], got["right"], got["count"])) == ref
    assert got["step"].tolist() == list(range(10))


def test_bpe_shard_invariance_and_tiebreak(ray_session, tmp_path):
    """Counts are exact through the exchange, so the merge list cannot
    depend on the fan-out; ties resolve lexicographically."""
    # ab and cd both occur 3x; (a,b) < (c,d) lexicographically
    docs = pa.table(
        {"doc_id": np.arange(6, dtype=np.int64),
         "text": ["ab cd", "ab cd", "ab cd", "zz", "zz", "zz"]}
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    a = bpe_learn_merges(str(tmp_path), n_merges=3, n_shards=2)
    b = bpe_learn_merges(str(tmp_path), n_merges=3, n_shards=16)
    assert a.equals(b)
    # z+z count 3, a+b count 3, c+d count 3 ... but b</w>, d</w>,
    # z</w> also 3: the lexicographically smallest pair of the 3-count
    # class wins first.
    first = (a["left"].iloc[0], a["right"].iloc[0])
    ref = bpe_reference({"ab": 3, "cd": 3, "zz": 3}, 3)
    assert first == (ref[0][0], ref[0][1])
    assert list(zip(a["left"], a["right"], a["count"])) == ref


def test_bpe_tokenize_count_parity(ray_session):
    """Actor-pool tokenization totals == sequentially-segmented totals
    under the same merge table."""
    from collections import Counter, defaultdict

    import duckdb

    from tensorflow_ocr_ray.pipelines.tokenizer import (
        bpe_tokenize_count,
    )

    got = bpe_tokenize_count(SF, n_merges=8, concurrency=2)
    rows = duckdb.sql(
        f"SELECT source, text FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    wc = Counter()
    for _, t in rows:
        wc.update(t.split())
    merges = bpe_reference(dict(wc), 8)
    memo = {}

    def ntok(w):
        if w not in memo:
            syms = list(w) + [EOW]
            for left, right, _ in merges:
                if len(syms) < 2:
                    break
                syms = _apply_merge(syms, left, right)
            memo[w] = len(syms)
        return memo[w]

    agg = defaultdict(lambda: [0, 0])
    for s, t in rows:
        agg[s][0] += 1
        agg[s][1] += sum(ntok(w) for w in t.split())
    exp = pd.DataFrame(
        [(s, a[0], a[1]) for s, a in sorted(agg.items())],
        columns=["source", "n_docs", "bpe_tokens"],
    ).astype({"n_docs": "int64", "bpe_tokens": "int64"})
    assert got.reset_index(drop=True).equals(exp)


def test_bpe_fertility_parity(ray_session):
    """Per-lang fertility == sequential segmentation under the same
    merge table, fertility_ppm exact integer tokens*1e6//words."""
    from collections import Counter, defaultdict

    import duckdb

    from tensorflow_ocr_ray.pipelines.tokenizer import (
        bpe_fertility_by_lang,
    )

    got = bpe_fertility_by_lang(SF, n_merges=8, concurrency=2)
    rows = duckdb.sql(
        f"SELECT lang, text FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    wc = Counter()
    for _, t in rows:
        wc.update(t.split())
    merges = bpe_reference(dict(wc), 8)
    memo = {}

    def ntok(w):
        if w not in memo:
            syms = list(w) + [EOW]
            for left, right, _ in merges:
                if len(syms) < 2:
                    break
                syms = _apply_merge(syms, left, right)
            memo[w] = len(syms)
        return memo[w]

    agg = defaultdict(lambda: [0, 0, 0])
    for lang, t in rows:
        ws = t.split()
        agg[lang][0] += 1
        agg[lang][1] += len(ws)
        agg[lang][2] += sum(ntok(w) for w in ws)
    exp = pd.DataFrame(
        [(s, a[0], a[1], a[2], a[2] * 1_000_000 // max(a[1], 1))
         for s, a in sorted(agg.items())],
        columns=["lang", "n_docs", "words", "bpe_tokens",
                 "fertility_ppm"],
    ).astype({"n_docs": "int64", "words": "int64",
              "bpe_tokens": "int64", "fertility_ppm": "int64"})
    assert got.reset_index(drop=True).equals(exp)
