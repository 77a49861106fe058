"""Text analysis primitives for large-scale training-data pipelines.

All functions are deterministic (no salted hashes — crc32/md5 only) and
vectorized or per-batch; they run inside ``map_batches`` over the
``documents`` table.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")
_TOKEN = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z]+)?|[^\sA-Za-z0-9]")
_PUNCT = re.compile(r"[!-/:-@\[-`{-~]")

STOPWORDS = {
    "the", "and", "of", "a", "an", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "be", "or", "are", "was", "this",
}


def split_tokens(text: str) -> list[str]:
    """Whitespace token split matching DuckDB's
    ``string_split_regex(trim(x), '\\s+')`` (empty text → [''])."""
    return _WS.split(text.strip())


def bpe_ish_tokens(text: str) -> list[str]:
    """A BPE-ish regex tokenization (word pieces + punctuation singles)."""
    return _TOKEN.findall(text)


def token_count(text: str) -> int:
    return len(split_tokens(text))


def token_count_batch(texts) -> np.ndarray:
    """Vectorized ``token_count`` over a whole column: Arrow utf8 trim +
    RE2 regex split + list lengths — one kernel chain, no per-row Python
    (the ``df["text"].map(token_count)`` it replaces cost ~3 us/row of
    interpreter overhead in every hot curation pass).  Semantics match
    ``token_count`` on the corpus (pinned by a parity test): RE2's \s
    is ASCII-only where Python's is Unicode, and RE2 is also what the
    DuckDB oracle's string_split_regex uses — so on any text where they
    diverge, THIS is the oracle-faithful side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.string())
    trimmed = pc.utf8_trim_whitespace(texts)
    n = pc.list_value_length(
        pc.split_pattern_regex(trimmed, pattern=r"\s+")
    )
    return n.to_numpy(zero_copy_only=False).astype(np.int64)


def quality_features(text: str) -> dict:
    """Length/punct/stopword heuristic quality scoring.

    Ratios are raw IEEE doubles (int/int divisions) so the DuckDB oracle
    computes bit-identical values — no rounding-mode hazards."""
    n = len(text)
    toks = [t for t in split_tokens(text) if t]
    words = [t for t in toks if t.isalpha()]
    n_tok = len(toks)
    punct = len(_PUNCT.findall(text))
    stop = sum(1 for w in words if w.lower() in STOPWORDS)
    mean_len = (sum(len(t) for t in toks) / n_tok) if toks else 0.0
    upper = sum(1 for c in text if c.isupper())
    feats = {
        "n_chars": n,
        "n_tokens": n_tok,
        "mean_token_len": mean_len,
        "punct_ratio": punct / n if n else 0.0,
        "stopword_ratio": stop / len(words) if words else 0.0,
        "upper_ratio": upper / n if n else 0.0,
    }
    # crude quality score: length sweet spot, sane punctuation, some
    # stopwords (natural language), tokens of plausible length
    score = 1.0
    if n < 20 or n > 100_000:
        score *= 0.3
    if feats["punct_ratio"] > 0.2:
        score *= 0.5
    if not (0.01 <= feats["stopword_ratio"] <= 0.8):
        score *= 0.7
    if not (2.0 <= feats["mean_token_len"] <= 12.0):
        score *= 0.6
    feats["quality_score"] = score
    return feats


# ---------------- language id (n-gram heuristic) -------------------------

_LANG_MARKERS: dict[str, dict[str, float]] = {
    "en": {" the ": 3, " and ": 2, " of ": 2, " is ": 1, " to ": 1, "th": 0.5,
           " a ": 1, "ing ": 1},
    "de": {" der ": 3, " und ": 3, " die ": 3, " ist ": 2, "sch": 1, "ei": 0.3,
           " das ": 2, "ch": 0.5},
    "fr": {" le ": 3, " la ": 3, " et ": 2, " les ": 2, " est ": 2, "ou": 0.3,
           " des ": 2, "é": 1},
    "es": {" el ": 3, " la ": 2, " y ": 2, " los ": 2, " es ": 1, "ción": 2,
           " de ": 1, "ñ": 2},
    "yi": {"א": 2, "ײ": 2, "װ": 2, "ש": 1, "ס": 0.5, "ע": 1},
}


def lang_id(text: str) -> str:
    padded = f" {text.lower()} "
    best, best_score = "unknown", 0.0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(w * padded.count(m) for m, w in markers.items())
        if score > best_score:
            best, best_score = lang, score
    # script-level fallback
    if best_score == 0.0:
        if any("֐" <= c <= "׿" for c in text):
            return "yi"
        if any(c.isalpha() for c in text):
            return "en"
    return best


# ---------------- hashing / sketches -------------------------------------

def _crc(data: str) -> int:
    return zlib.crc32(data.encode("utf-8")) & 0xFFFFFFFF


def char_shingles(text: str, k: int = 3) -> set[int]:
    t = _WS.sub(" ", text.strip().lower())
    if len(t) < k:
        return {_crc(t)} if t else set()
    return {_crc(t[i : i + k]) for i in range(len(t) - k + 1)}


_MERSENNE = (1 << 61) - 1


class MinHasher:
    """n-permutation MinHash over char shingles; deterministic seed."""

    def __init__(self, num_perm: int = 64, seed: int = 7, k: int = 3):
        rng = np.random.Generator(np.random.PCG64(seed))
        # a < 2^30 keeps a*x + b < 2^63 for 32-bit shingle hashes, so the
        # whole permutation family evaluates in vectorized int64 (an
        # object-dtype fallback here was ~1000x slower)
        self.a = rng.integers(1, 1 << 30, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingles(text, self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        x = np.fromiter(sh, dtype=np.int64, count=len(sh))
        # (a*x + b) mod p, per permutation; min over shingles
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return np.min(vals, axis=1).astype(np.uint64)

    def band_keys(self, sig: np.ndarray, bands: int = 16) -> list[int]:
        rows = self.num_perm // bands
        keys = []
        for band in range(bands):
            chunk = sig[band * rows : (band + 1) * rows]
            keys.append(_crc(f"{band}:" + ",".join(map(str, chunk.tolist()))))
        return keys


def jaccard_shingles(a: str, b: str, k: int = 3) -> float:
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def char_set_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard — semantics of DuckDB's ``jaccard()``."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _md5_64(s: str) -> int:
    """First 8 md5 bytes, big-endian — SQL-reproducible:
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` in DuckDB."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _md5_32(s: str) -> int:
    """First 4 md5 bytes, big-endian (SQL: ``substr(md5(s), 1, 8)``)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big")


def _md5_prefix_batch(grams: list[str], nbytes: int) -> np.ndarray:
    """First ``nbytes`` md5 bytes of every gram as one big-endian uint
    array: per-gram digests concatenated once, ONE ``np.frombuffer`` for
    the int conversion (the per-gram ``int.from_bytes`` loop was the
    second-largest cost after the digests themselves)."""
    import hashlib

    dig = b"".join(
        hashlib.md5(g.encode("utf-8")).digest()[:nbytes] for g in grams
    )
    return np.frombuffer(dig, dtype={4: ">u4", 8: ">u8"}[nbytes])


def simhash64(text: str) -> int:
    """64-bit SimHash over word 2-grams.  Gram hashes are md5-derived so
    the DuckDB oracle recomputes the identical fingerprint.  The per-bit
    majority vote is one vectorized (grams x 64) reduction, not a Python
    loop per gram."""
    toks = [t for t in split_tokens(text.lower()) if t]
    grams = (
        [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if len(toks) > 1
        else toks
    )
    if not grams:
        return 0
    hs = _md5_prefix_batch(grams, 8).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    ones = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
    # majority: bit set iff ones > grams/2 (acc = 2*ones - n > 0)
    outbits = (2 * ones.astype(np.int64) - len(grams) > 0).astype(np.uint64)
    out = int((outbits << shifts).sum(dtype=np.uint64))
    return out - (1 << 64) if out >= (1 << 63) else out  # signed int64


def winnow_fingerprint(text: str, k: int = 5, window: int = 4, keep: int = 8) -> list[int]:
    """Winnowing document fingerprint: k-gram md5 hashes, per-window
    minima, first ``keep`` distinct values (document-order).  md5-based
    so the DuckDB oracle recomputes it exactly.  Window minima via one
    sliding-window reduction; order-preserving dedup via ``pd.unique``."""
    t = _WS.sub(" ", text.strip().lower())
    if len(t) < k:
        return [_md5_32(t)] if t else []
    grams = [t[i : i + k] for i in range(len(t) - k + 1)]
    hashes = _md5_prefix_batch(grams, 4)
    if len(hashes) >= window:
        mins = np.lib.stride_tricks.sliding_window_view(
            hashes, window
        ).min(axis=1)
    else:
        mins = hashes.min(keepdims=True)
    return [int(v) for v in pd.unique(mins)[:keep]]


# ---------------- batch-level wrappers ------------------------------------

def doc_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame()
    out["doc_id"] = df["doc_id"]
    out["n_chars"] = df["n_chars"]
    out["tokens"] = token_count_batch(df["text"])
    return out


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    feats = df["text"].map(quality_features)
    out = pd.DataFrame(list(feats))
    out.insert(0, "doc_id", df["doc_id"].values)
    return out


def langid_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "lang": df["lang"],
            "pred_lang": df["text"].map(lang_id),
        }
    )


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "simhash": df["text"].map(simhash64).astype("int64"),
        }
    )


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "fingerprint": df["text"].map(
                lambda t: ",".join(map(str, winnow_fingerprint(t)))
            ),
        }
    )


def normalize_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Text canonicalization for training corpora: NFC unicode
    normalization (SQL-checkable vs DuckDB nfc_normalize) + NFC length."""
    import unicodedata

    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "text_nfc": df["text"].map(
                lambda t: unicodedata.normalize("NFC", t)
            ),
            "n_chars_nfc": df["text"].map(
                lambda t: len(unicodedata.normalize("NFC", t))
            ).astype("int64"),
        }
    )


def langid_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID evaluation: the (labeled lang, predicted lang)
    confusion matrix with exact counts — (lang, pred_lang, n).  The
    eval-composition pattern: reuses langid_batch verbatim, per-batch
    count partials tree-combine under the bounded-key contract (grid
    <= |langs|^2 whatever the corpus size); the oracle wraps the
    generated _langid_sql re-derivation in one GROUP BY."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = langid_batch(df)
        g = p.groupby(["lang", "pred_lang"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=1024)
        .repartition(4)
        .map_batches(
            lambda df: df.groupby(["lang", "pred_lang"],
                                  as_index=False)["n"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["lang", "pred_lang"], as_index=False)["n"].sum()
    )
    return (
        parts.astype({"n": "int64"})
        .sort_values(["lang", "pred_lang"]).reset_index(drop=True)
    )


# ---------------- sentence segmentation -------------------------------------

# a terminator splits only when followed by whitespace + an uppercase
# letter (or end of text): "e.g. spares", "No. 4" and "3.5" never split
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+(?=[A-Z])")
_SENT_TERMS = ".!?"


def sentences_for(doc_id: int) -> str:
    """Deterministic punctuated fixture: ``doc_id%4+1`` sentences, each
    planted with three abbreviation decoys a naive period-split would
    break on — a leading ``No.`` (period before a digit), a decimal
    ``3.5`` and an inline ``e.g.`` (period before lowercase).  The
    terminator cycles . ! ? by sentence index."""
    n = doc_id % 4 + 1
    return " ".join(
        "No. %d item %d cost 3.5 units e.g. spares%s"
        % (doc_id, s, _SENT_TERMS[s % 3])
        for s in range(n)
    )


def split_sentences(text: str) -> list[str]:
    """Abbreviation-aware sentence segmentation: split at a terminator
    run only when the next non-space character is uppercase — the
    heuristic that keeps ``No. 4``, decimals and ``e.g.`` intact while
    still cutting real boundaries.  Terminators stay attached."""
    text = text.strip()
    if not text:
        return []
    return [s for s in _SENT_SPLIT.split(text) if s]


# ---------------- language segmentation -------------------------------------

# planted second paragraphs with unambiguous lang_id outcomes
_PLANTED_PARAS = (
    ("de", "der und die ist das schnell"),
    ("fr", "le la et les est des"),
    ("yi", "א ײ װ ש"),
)


def mixed_lang_text_for(doc_id: int, text: str) -> str:
    """Mixed-language fixture: the document's own text plus a planted
    paragraph in the language ``doc_id%3`` selects, separated by a
    blank line (the paragraph boundary the segmenter splits on)."""
    return (text or "") + "\n\n" + _PLANTED_PARAS[doc_id % 3][1]


def language_segments_of(text: str) -> list[tuple[str, int]]:
    """(pred_lang, n_paras) runs: paragraphs (blank-line split) are
    language-identified independently, then ADJACENT same-language
    paragraphs merge into one segment — the run structure a
    per-language curation pass routes on."""
    out: list[tuple[str, int]] = []
    for para in text.split("\n\n"):
        if not para.strip():
            continue
        lg = lang_id(para)
        if out and out[-1][0] == lg:
            out[-1] = (lg, out[-1][1] + 1)
        else:
            out.append((lg, 1))
    return out


# ---------------- mojibake audit ---------------------------------------------

# the classic double-encode signatures: UTF-8 bytes of é / ’ / — read
# back as Latin-1/cp1252
_MOJIBAKE_SIGS = ("Ã©", "â€™", "â€“")


def mojibake_text_for(doc_id: int, text: str) -> str:
    """Deterministic encoding-damage fixture: ``doc_id%4`` selects clean
    ASCII, a LEGIT non-ASCII char (must not be flagged), ``doc_id%3+1``
    double-encoded ``é`` signatures, or one double-encoded curly
    quote."""
    c = doc_id % 4
    if c == 0:
        return text or ""
    if c == 1:
        return "é " + (text or "")
    if c == 2:
        return "Ã© " * (doc_id % 3 + 1) + (text or "")
    return "â€™ " + (text or "")


def mojibake_count(text: str) -> int:
    """Occurrences of classic UTF-8-as-Latin-1 double-encode signatures
    — the encoding-damage signal a curation pass quarantines on.  A
    legit single non-ASCII char never matches (signatures are 2-3 char
    sequences that essentially cannot occur in intact text)."""
    return sum(text.count(s) for s in _MOJIBAKE_SIGS)


# ---------------- readability ------------------------------------------------

# pinned word list with its vowel-group (syllable-proxy) counts — the
# counts ARE the rule "maximal [aeiou]+ runs in lowercased text", so
# the parser and the arithmetic oracle agree by construction
_READ_WORDS = ("data", "pipeline", "measure", "a", "throughput",
               "line", "optimize", "readability")
_READ_SYL = (2, 4, 3, 1, 2, 2, 4, 4)
_VOWEL_RUN = re.compile(r"[aeiou]+")
_SENT_RUN = re.compile(r"[.!?]+")


def readable_text_for(doc_id: int) -> str:
    """Deterministic prose: ``doc_id%4+2`` sentences; sentence ``s``
    has ``3+(doc_id+s)%5`` words drawn from the pinned 8-word list at
    index ``(doc_id*7+s*3+w)%8``; first word capitalized, period
    terminator.  Every count a readability score needs (sentences,
    words, vowel-group syllables) is doc_id arithmetic."""
    sents = []
    for s in range(doc_id % 4 + 2):
        ws = [_READ_WORDS[(doc_id * 7 + s * 3 + w) % 8]
              for w in range(3 + (doc_id + s) % 5)]
        ws[0] = ws[0].capitalize()
        sents.append(" ".join(ws) + ".")
    return " ".join(sents)


def readability_counts(text: str) -> tuple[int, int, int, float]:
    """(sentences, words, syllables, flesch) — terminator RUNS count
    as one boundary, words are whitespace tokens, syllables are
    maximal vowel runs of the lowercased text, and the Flesch
    reading-ease double is the single place IEEE arithmetic enters
    (identical op order on the SQL side)."""
    sentences = len(_SENT_RUN.findall(text)) or 1
    words = len(text.split()) or 1
    syllables = len(_VOWEL_RUN.findall(text.lower()))
    flesch = (206.835 - 1.015 * (words / sentences)
              - 84.6 * (syllables / words))
    return sentences, words, syllables, flesch


# ---------------- pinned-weight quality scorer -------------------------------

_QL_STOPS = ("the", "a", "of", "to", "in", "and")
# integer milli-unit weights + threshold, pinned so verdict changes
# are schema changes, not drift
_QL_W_TOK = 2
_QL_W_STOP = 2
_QL_THRESHOLD = 5000


def quality_lr_features(text: str) -> tuple[int, int, int, int, int, int]:
    """(tok, mean_wlen_milli, stop_milli, distinct_milli, score, passed)
    — all-integer features over single-space text: mean word length
    exploits ``chars = sum(len) + (tok-1)``; score is the pinned
    linear form ``2*tok + mean_wlen + distinct - 2*stop``."""
    toks = text.split()
    tok = len(toks) or 1
    chars = len(text)
    mean_wlen = (chars - (tok - 1)) * 1000 // tok
    stop = sum(1 for t in toks if t in _QL_STOPS) * 1000 // tok
    distinct = len(set(toks)) * 1000 // tok
    score = (_QL_W_TOK * tok + mean_wlen + distinct
             - _QL_W_STOP * stop)
    return tok, mean_wlen, stop, distinct, score, int(
        score >= _QL_THRESHOLD)


# ---------------- locale-aware price normalization ---------------------------

_PRICE_RE = re.compile(
    r"([$€])\s?((?:\d{1,3}(?:[.,]\d{3})*|\d+)[.,]\d{2})")


def _group(n: int, sep: str) -> str:
    s = str(n)
    out = []
    while len(s) > 3:
        out.append(s[-3:])
        s = s[:-3]
    out.append(s)
    return sep.join(reversed(out))


def price_text_for(doc_id: int) -> str:
    """Sentence with ``doc_id%3+1`` planted prices: price ``k`` is
    ``(d*1000 + k*777) % 1000000 + 1`` cents, rendered US-style
    ``$1,234.56`` when ``(d+k)%2==0`` else EU-style ``€1.234,56`` —
    the two locale groupings a normalizer must not confuse.  A bare
    ``3.5`` decimal and a year ``1,999`` (no cents) are decoys."""
    parts = ["Catalog %d lists 3.5 units since 1,999" % doc_id]
    for k in range(doc_id % 3 + 1):
        v = (doc_id * 1000 + k * 777) % 1000000 + 1
        dollars, cents = v // 100, v % 100
        if (doc_id + k) % 2 == 0:
            parts.append("item %d at $%s.%02d"
                         % (k, _group(dollars, ","), cents))
        else:
            parts.append("item %d at €%s,%02d"
                         % (k, _group(dollars, "."), cents))
    return "; ".join(parts) + "."


def extract_prices(text: str) -> list[tuple[int, str, int]]:
    """(seq, currency, value_cents) per recognized price — the LAST
    separator is the decimal mark (always two digits in scope), every
    other separator is grouping; bare decimals and grouped years
    without a currency sign never match."""
    out = []
    for m in _PRICE_RE.finditer(text):
        cur = "USD" if m.group(1) == "$" else "EUR"
        num = m.group(2)
        whole, cents = num[:-3], num[-3:]
        assert cents[0] in ".,"
        value = int(whole.replace(",", "").replace(".", "")) * 100 \
            + int(cents[1:])
        out.append((len(out), cur, value))
    return out
