"""Tokenizer training: distributed BPE merge learning.

The op every LLM data stack runs once per tokenizer revision: learn the
byte-pair-encoding merge table from a corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").  The
classic trainer is sequential; the distributed shape exploits that BPE
never needs the corpus after the first pass — it trains on the WORD
-> COUNT table:

1. ONE corpus pass: per-batch word Counters route a word-hash exchange
   (disjoint word ranges -> exact counts), producing the vocab Dataset
   of (word, n, segmentation).  Corpus-sized work ends here; the vocab
   grows ~Heaps-law (|V| ~ O(N^0.5)), orders of magnitude below corpus
   size — the partitioning assumption is |V| fits the cluster's store,
   NOT one task (it stays a sharded Dataset throughout).
2. Per merge step (the pagerank/kcore iterative-materialize pattern):
   per-batch adjacent-pair counts weighted by n tree-reduce to the
   driver's bounded (pair, count) table; the argmax pair (count desc,
   then lexicographic (left, right) — deterministic for any block
   layout because counts are EXACT) appends to the merge list; one
   map_batches applies the merge greedily left-to-right and the vocab
   re-materializes.

Greedy-apply semantics match the reference trainer: scan left to
right, merge non-overlapping occurrences ("aaa" + (a,a) -> (aa, a)).
Segmentations travel as unit-separator-joined strings (no nested
columns through the exchange).  Correctness is pinned by pytest parity
with an independent sequential trainer on the same corpus plus
crafted-corpus cases (overlap, tiebreak); the registry entry is
rows-only — k data-dependent re-segmentation rounds are not
SQL-expressible (the same boundary daily_holt's recursion sits at,
but with strings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from tensorflow_ocr_ray.stages.exchange import hash_exchange

SEP = "\x1f"          # unit separator: joins symbols of a segmentation
EOW = "</w>"          # end-of-word marker (classic BPE)


def _pair_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Adjacent-pair counts of one vocab batch, weighted by word
    count."""
    from collections import Counter

    c: Counter = Counter()
    for segs, n in zip(df["segs"], df["n"]):
        syms = segs.split(SEP)
        for a, b in zip(syms[:-1], syms[1:]):
            c[(a, b)] += int(n)
    if not c:
        return pd.DataFrame({"left": pd.Series([], dtype="object"),
                             "right": pd.Series([], dtype="object"),
                             "cnt": pd.Series([], dtype="int64")})
    items = list(c.items())
    return pd.DataFrame(
        {"left": [k[0] for k, _ in items],
         "right": [k[1] for k, _ in items],
         "cnt": np.fromiter((v for _, v in items), dtype=np.int64,
                            count=len(items))})


def _apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_learn_merges(sf_dir: str, n_merges: int = 12,
                     n_shards: int = 16) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges from the documents corpus (module
    docstring for the plan).  Returns (step, left, right, count): the
    merge table in training order."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df["text"]:
            c.update(t.split())
        words = list(c.keys())
        h = np.fromiter(
            (hash_word(w) for w in words), dtype=np.int64,
            count=len(words))
        return pd.DataFrame(
            {"word": words,
             "n": np.fromiter((c[w] for w in words), dtype=np.int64,
                              count=len(words)),
             "shard": h % n_shards})

    def hash_word(w: str) -> int:
        # stable, process-independent (no PYTHONHASHSEED dependence)
        import zlib

        return zlib.crc32(w.encode("utf-8"))

    def seed_vocab(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["word", "n", "segs"]
        if not len(df):
            out = pd.DataFrame({c: pd.Series([], dtype="object")
                                for c in cols})
            return out.astype({"n": "int64"})
        g = df.groupby("word", as_index=False)["n"].sum()
        g["segs"] = [SEP.join(list(w) + [EOW]) for w in g["word"]]
        return g.astype({"n": "int64"})

    vocab = hash_exchange(
        docs.map_batches(word_partial, batch_format="pandas",
                         batch_size=4096),
        "shard", n_shards, seed_vocab,
    ).materialize()

    merges = []
    for step in range(n_merges):
        pairs = (
            vocab.map_batches(_pair_counts, batch_format="pandas",
                              batch_size=65536)
            .to_pandas()
            .groupby(["left", "right"], as_index=False)["cnt"].sum()
        )
        if not len(pairs):
            break
        top = pairs.sort_values(
            ["cnt", "left", "right"],
            ascending=[False, True, True]).iloc[0]
        left, right, cnt = str(top["left"]), str(top["right"]), \
            int(top["cnt"])
        merges.append((step, left, right, cnt))

        def apply(df: pd.DataFrame, left=left, right=right
                  ) -> pd.DataFrame:
            token = left + SEP + right
            hit = df["segs"].str.contains(token, regex=False)
            if hit.any():
                df = df.copy()
                df.loc[hit, "segs"] = [
                    SEP.join(_apply_merge(s.split(SEP), left, right))
                    for s in df.loc[hit, "segs"]]
            return df

        vocab = vocab.map_batches(
            apply, batch_format="pandas", batch_size=65536
        ).materialize()

    return pd.DataFrame(
        merges, columns=["step", "left", "right", "count"]
    ).astype({"step": "int64", "count": "int64"})


def bpe_reference(word_counts: dict[str, int],
                  n_merges: int) -> list[tuple[str, str, int]]:
    """Independent sequential BPE trainer (test oracle): dict-and-loop
    implementation of the same (count desc, lexicographic) rule."""
    vocab = {w: list(w) + [EOW] for w in word_counts}
    out = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            n = word_counts[w]
            for a, b in zip(syms[:-1], syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(),
                   key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        out.append((l, r, c))
        for w in vocab:
            vocab[w] = _apply_merge(vocab[w], l, r)
    return out


class BpeTokenizeStage:
    """Actor-pool tokenization stage: the corpus-wide APPLY pass that
    follows :func:`bpe_learn_merges` — the single most expensive step
    of a 100-TB tokenizer rollout, so it gets the stateful-stage
    treatment: the merge table ships ONCE per actor (``__init__``),
    and a word -> token-count memo exploits Zipf (the same few word
    types dominate every batch; each type is segmented once per actor,
    not once per occurrence)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = merges
        self.memo: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        n = self.memo.get(word)
        if n is None:
            syms = list(word) + [EOW]
            for left, right in self.merges:
                if len(syms) < 2:
                    break
                syms = _apply_merge(syms, left, right)
            n = len(syms)
            self.memo[word] = n
        return n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        counts = np.fromiter(
            (sum(self._n_tokens(w) for w in t.split())
             for t in df["text"]),
            dtype=np.int64, count=len(df))
        return pd.DataFrame({"source": df["source"],
                             "n_docs": np.int64(1),
                             "bpe_tokens": counts}).groupby(
            "source", as_index=False).agg(
            n_docs=("n_docs", "sum"), bpe_tokens=("bpe_tokens", "sum"))


def bpe_tokenize_count(sf_dir: str, n_merges: int = 12,
                       concurrency: int = 4) -> pd.DataFrame:
    """Per-source BPE token counts under the corpus-trained merge
    table: learn merges (bounded vocab work), broadcast them into a
    :class:`BpeTokenizeStage` actor pool, stream the corpus through it
    once, tree-combine the bounded per-(batch, source) partials.
    Rows-only registry entry (BPE segmentation isn't SQL); pytest pins
    exact parity with sequentially-segmented totals."""
    merges_df = bpe_learn_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_df["left"], merges_df["right"]))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    parts = docs.map_batches(
        BpeTokenizeStage, batch_format="pandas", batch_size=2048,
        concurrency=concurrency,
        fn_constructor_args=(merges,),
    ).to_pandas()
    return (
        parts.groupby("source", as_index=False)
        .agg(n_docs=("n_docs", "sum"), bpe_tokens=("bpe_tokens", "sum"))
        .astype({"n_docs": "int64", "bpe_tokens": "int64"})
        .sort_values("source").reset_index(drop=True)
    )


class BpeFertilityStage(BpeTokenizeStage):
    """Per-language fertility partials: same memoized per-actor apply
    as :class:`BpeTokenizeStage`, additionally counting whitespace
    words so the driver can form tokens-per-word without a second
    corpus pass."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:  # type: ignore[override]
        toks = np.fromiter(
            (sum(self._n_tokens(w) for w in t.split())
             for t in df["text"]),
            dtype=np.int64, count=len(df))
        words = np.fromiter(
            (len(t.split()) for t in df["text"]),
            dtype=np.int64, count=len(df))
        return pd.DataFrame({"lang": df["lang"],
                             "n_docs": np.int64(1),
                             "words": words,
                             "bpe_tokens": toks}).groupby(
            "lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), words=("words", "sum"),
            bpe_tokens=("bpe_tokens", "sum"))


def bpe_fertility_by_lang(sf_dir: str, n_merges: int = 12,
                          concurrency: int = 4) -> pd.DataFrame:
    """Tokenizer fertility (BPE tokens per whitespace word) per
    language — the rollout health metric that decides whether a
    tokenizer under-serves a language (high fertility = more tokens
    per word = shorter effective context for that language's text).

    Same shape as bpe_tokenize_count: learn merges once (bounded
    vocab-only iterations), ship them per actor, one corpus pass of
    bounded per-(batch, lang) partials, driver combine over a
    |langs|-bounded grid.  fertility_ppm is exact integer
    tokens*10^6 // words.  Rows-only registry entry (BPE segmentation
    isn't SQL); pytest pins parity with a sequential segmenter."""
    merges_df = bpe_learn_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_df["left"], merges_df["right"]))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    parts = docs.map_batches(
        BpeFertilityStage, batch_format="pandas", batch_size=2048,
        concurrency=concurrency,
        fn_constructor_args=(merges,),
    ).to_pandas()
    g = (parts.groupby("lang", as_index=False)
         .agg(n_docs=("n_docs", "sum"), words=("words", "sum"),
              bpe_tokens=("bpe_tokens", "sum")))
    g["fertility_ppm"] = (
        g["bpe_tokens"] * 1_000_000 // np.maximum(g["words"], 1))
    return (g.astype({"n_docs": "int64", "words": "int64",
                      "bpe_tokens": "int64", "fertility_ppm": "int64"})
            .sort_values("lang").reset_index(drop=True))
