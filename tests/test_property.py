"""Property-based tests: for ANY fixture page/corpus the pipeline output
equals the analytic truth (computed from construction geometry)."""

from hypothesis import given, settings, strategies as st

from tensorflow_ocr_ray.config import FIXTURE_CONFIG
from tensorflow_ocr_ray.core.page import ocr_payload
from tensorflow_ocr_ray.fixtures import (
    page_spec_for_ref,
    payload_for_ref,
    truth_for_ref,
)
from tensorflow_ocr_ray.fonts import get_font_index


@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.integers(min_value=0, max_value=10**6))
def test_any_ref_ocr_matches_truth(ref_seed):
    """Every deterministically-generated page (random lines, indents,
    paragraph breaks, gray/bitonal encoding) OCRs to its analytic text."""
    ref = f"page-prop-{ref_seed}"
    idx = get_font_index()
    res = ocr_payload(payload_for_ref(ref), FIXTURE_CONFIG, idx,
                      collect_glyphs=False)
    assert res.text == truth_for_ref(ref), (
        f"ref {ref}: spec {page_spec_for_ref(ref)}"
    )


@settings(max_examples=10, deadline=None, derandomize=True)
@given(st.integers(min_value=0, max_value=10**6))
def test_flood_and_xycut_agree(ref_seed):
    """The two segmentation strategies agree on every fixture page."""
    ref = f"page-prop2-{ref_seed}"
    idx = get_font_index()
    payload = payload_for_ref(ref)
    a = ocr_payload(payload, FIXTURE_CONFIG, idx, collect_glyphs=False)
    b = ocr_payload(
        payload, FIXTURE_CONFIG.with_(use_flood=True), idx,
        collect_glyphs=False,
    )
    assert a.text == b.text


def test_halfup_integer_mean_formula():
    """floor((2*scale*sum + n) / (2n)) == decimal round-half-up of
    (sum/n) at that scale, for random non-negative integer sums — the
    formula both engines now use for every *_e4 average."""
    from decimal import Decimal, ROUND_HALF_UP
    import numpy as np

    rng = np.random.default_rng(11)
    for _ in range(500):
        n = int(rng.integers(1, 10_000))
        s = int(rng.integers(0, 10**12))
        scale = int(rng.choice([100, 10_000]))
        got = (2 * scale * s + n) // (2 * n)
        want = int(
            (Decimal(s) * scale / Decimal(n)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP)
        )
        assert got == want, (s, n, scale, got, want)
