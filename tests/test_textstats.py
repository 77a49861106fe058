"""Text-analysis function unit tests (tokens, quality, langid, dedup hashes)."""

import numpy as np

from tensorflow_ocr_ray.functions.textstats import (
    MinHasher,
    char_set_jaccard,
    jaccard_shingles,
    lang_id,
    quality_features,
    simhash64,
    split_tokens,
    token_count,
    winnow_fingerprint,
)


def test_split_tokens_whitespace():
    assert split_tokens("  the quick\nbrown  fox ") == [
        "the", "quick", "brown", "fox",
    ]
    assert token_count("a b c") == 3
    # matches DuckDB len(string_split_regex(trim(''), '\s+')) == 1, which
    # the doc_tokens oracle relies on
    assert token_count("") == 1


def test_quality_features_keys_and_ranges():
    q = quality_features("The quick brown fox, it jumps over the lazy dog.")
    assert 0 <= q["stopword_ratio"] <= 1
    assert 0 <= q["punct_ratio"] <= 1
    assert q["n_chars"] > 0
    assert q["n_tokens"] == 10
    assert q["mean_token_len"] > 0


def test_lang_id_distinguishes():
    assert lang_id("the quick brown fox jumps over the lazy dog and it was") == "en"
    assert lang_id("el perro y el gato la casa de los niños que no es una") == "es"
    assert lang_id("der hund und die katze das haus ist nicht ein und der") == "de"
    assert lang_id("") == "unknown"


def test_jaccard_helpers():
    assert char_set_jaccard("abc", "abc") == 1.0
    assert char_set_jaccard("abc", "xyz") == 0.0
    assert jaccard_shingles("hello world", "hello world") == 1.0
    assert jaccard_shingles("hello world", "totally different") < 0.3


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("completely unrelated text about ray data pipelines")
    assert simhash64("") == 0
    assert a == simhash64("the quick brown fox jumps over the lazy dog")
    # hamming distance: near-dup < far pair
    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(a, b) < ham(a, c)
    # int64-representable (signed)
    assert -(1 << 63) <= a < (1 << 63)


def test_minhash_similarity_estimate():
    mh = MinHasher(num_perm=64)
    s1 = mh.signature("the quick brown fox jumps over the lazy dog")
    s2 = mh.signature("the quick brown fox jumps over the lazy dogs")
    s3 = mh.signature("entirely different words appear in this sentence")
    assert s1.shape == (64,)
    sim12 = float(np.mean(s1 == s2))
    sim13 = float(np.mean(s1 == s3))
    assert sim12 > 0.5 > sim13
    # identical text → identical band keys
    assert mh.band_keys(s1) == mh.band_keys(mh.signature(
        "the quick brown fox jumps over the lazy dog"))


def test_winnow_fingerprint_deterministic_and_shift_robust():
    f1 = winnow_fingerprint("the quick brown fox jumps over the lazy dog")
    f2 = winnow_fingerprint("the quick brown fox jumps over the lazy dog")
    assert f1 == f2 and len(f1) > 0
    assert winnow_fingerprint("") == []


def test_bpe_ish_tokens():
    from tensorflow_ocr_ray.functions.textstats import bpe_ish_tokens

    assert bpe_ish_tokens("don't stop, now!") == [
        "don't", "stop", ",", "now", "!",
    ]
    assert bpe_ish_tokens("") == []


def test_lang_id_yiddish_script():
    from tensorflow_ocr_ray.functions.textstats import lang_id

    assert lang_id("דער מאן האט ליב א שיין מיידל") == "yi"


def test_quality_score_penalizes_junk():
    from tensorflow_ocr_ray.functions.textstats import quality_features

    clean = quality_features(
        "The quick brown fox jumps over the lazy dog near the river bank."
    )
    junk = quality_features("@@@@ ---- !!!! #### $$$$ %%%%")
    assert clean["quality_score"] > junk["quality_score"]
