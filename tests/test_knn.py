"""Exact-NN font index semantics (reference: main/kd.c)."""

import numpy as np

from tensorflow_ocr_ray.config import EMPTY_TREE_VALUE, OCRFAILS, TUPLELENGTH
from tensorflow_ocr_ray.core.knn import BIGDIST, FontIndex, has_rtl


def _idx(rows, labels):
    return FontIndex(np.array(rows, dtype=np.float32), labels)


def _vec(v0, fill=0.0):
    v = np.full(TUPLELENGTH, fill, dtype=np.float32)
    v[0] = v0
    return v


def test_empty_index_returns_empty_tree_value():
    idx = FontIndex.empty()
    values, d2 = idx.ocr_values(_vec(0.5).reshape(1, -1), min_match=0.9)
    assert values == [EMPTY_TREE_VALUE]  # main/kd.c:238
    assert d2[0] == np.float32(BIGDIST)


def test_nearest_exact_and_threshold():
    idx = _idx([_vec(0.0), _vec(1.0)], ["a", "b"])
    probes = np.stack([_vec(0.1), _vec(0.9), _vec(5.0)])
    values, d2 = idx.ocr_values(probes, min_match=0.9)
    assert values[0] == "a"
    assert values[1] == "b"
    assert values[2] == OCRFAILS  # dist 4 > minMatch 0.9  (main/kd.c:245)
    # float32 accumulation, as the reference's C floats (main/kd.c:67-75)
    assert d2[0] == np.float32(np.float32(0.1) * np.float32(0.1))


def test_min_match_compared_squared():
    idx = _idx([_vec(0.0)], ["a"])
    # dist = 0.9 exactly: dist² ≤ minMatch² accepts (<=, not <)
    values, _ = idx.ocr_values(_vec(0.9).reshape(1, -1), min_match=0.9)
    assert values == ["a"]
    values, _ = idx.ocr_values(_vec(0.901).reshape(1, -1), min_match=0.9)
    assert values == [OCRFAILS]


def test_ignore_vertical_drops_dim26():
    # two entries that differ only in the last dim; probe matches entry 1
    # on dims 0..25 but entry 0 on dim 26
    a = _vec(0.0)
    b = _vec(0.5)
    a[-1] = 10.0
    idx = _idx([a, b], ["a", "b"])
    probe = _vec(0.0)
    probe[-1] = 10.0
    vals_full, _ = idx.ocr_values(probe.reshape(1, -1), min_match=100.0)
    assert vals_full == ["a"]
    probe2 = _vec(0.5)
    probe2[-1] = 10.0
    vals_iv, _ = idx.ocr_values(
        probe2.reshape(1, -1), min_match=100.0, ignore_vertical=True
    )
    assert vals_iv == ["b"]  # dim 26 mismatch ignored (main/kd.c:35-36)


def test_multichar_labels_supported():
    idx = _idx([_vec(0.0)], ["rn"])  # main/tmp.out rows end in rn/in
    values, _ = idx.ocr_values(_vec(0.0).reshape(1, -1), min_match=0.9)
    assert values == ["rn"]


def test_rtl_sniff():
    assert not has_rtl("abc")
    assert has_rtl("א")  # Hebrew alef → bidirectional 'R'
    idx = _idx([_vec(0.0)], ["א"])
    assert idx.rtl
    assert not _idx([_vec(0.0)], ["a"]).rtl


def test_state_roundtrip():
    idx = _idx([_vec(0.0), _vec(1.0)], ["a", "b"])
    again = FontIndex.from_state(idx.to_state())
    assert again.labels == idx.labels
    assert np.array_equal(again.tuples, idx.tuples)
