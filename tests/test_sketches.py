"""KMV bottom-k distinct sketch: mergeability + accuracy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tensorflow_ocr_ray.pipelines.sketches import (
    _kmv_hashes,
    kmv_estimate,
)

SF = "/root/testdata/sf0.001"


def test_kmv_exact_below_k():
    hs = np.sort(_kmv_hashes(range(100)))
    assert kmv_estimate(hs[:256], 256) == 100.0


def test_kmv_estimate_accuracy():
    n = 20000
    hs = np.sort(_kmv_hashes(range(n)))[:256]
    est = kmv_estimate(hs, 256)
    assert abs(est - n) / n < 0.15  # ~1/sqrt(k) relative error


def test_kmv_merge_equals_global():
    """Bottom-k of unioned bottom-ks == bottom-k of the union (the
    property that makes the map-side partials correct)."""
    a = np.sort(_kmv_hashes(range(0, 6000)))[:256]
    b = np.sort(_kmv_hashes(range(3000, 9000)))[:256]
    merged = np.sort(pd.unique(np.concatenate([a, b])))[:256]
    direct = np.sort(_kmv_hashes(range(0, 9000)))[:256]
    assert (merged == direct).all()


def test_distributed_matches_single_process(ray_session):
    from tensorflow_ocr_ray.pipelines.sketches import approx_distinct_users

    got = approx_distinct_users(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    for _, row in got.iterrows():
        sub = (ev if row.event_type == "__all__"
               else ev[ev.event_type == row.event_type])
        hs = np.sort(_kmv_hashes(sub["user_id"].unique()))[:256]
        assert row.approx_users == kmv_estimate(hs, 256)
        true = sub["user_id"].nunique()
        assert abs(row.approx_users - true) / max(true, 1) < 0.2


# ------------------------------------------ two-pass heavy hitters


def test_tri_key_roundtrip_unicode():
    from tensorflow_ocr_ray.pipelines.sketches import _tri_keys, _tri_str

    s = "abcdé ↦𝄞x"
    keys = _tri_keys(s)
    assert len(keys) == len(s) - 2
    assert [_tri_str(int(k)) for k in keys] == [
        s[i:i + 3] for i in range(len(s) - 2)
    ]
    assert len(_tri_keys("ab")) == 0


def test_heavy_hitters_exact_vs_brute(ray_session):
    from collections import Counter

    from tensorflow_ocr_ray.pipelines.sketches import (
        HH_DIVISOR,
        heavy_hitter_trigrams,
    )

    got = (
        heavy_hitter_trigrams(SF)
        .to_pandas()
        .sort_values("tri")
        .reset_index(drop=True)
    )
    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for t in texts["text"]:
        c.update(t[i:i + 3] for i in range(len(t) - 2))
    total = sum(c.values())
    exp = sorted(
        (tri, n) for tri, n in c.items() if n * HH_DIVISOR > total
    )
    assert list(zip(got["tri"], got["cnt"])) == exp


def test_heavy_hitters_block_layout_invariant(ray_session):
    """The candidate superset depends on block layout; the OUTPUT must
    not — rerun with a tiny batch size (many more, smaller 'blocks')."""
    import ray.data as rd

    from tensorflow_ocr_ray.pipelines import sketches
    from tensorflow_ocr_ray.pipelines.sketches import heavy_hitter_trigrams

    a = heavy_hitter_trigrams(SF).to_pandas()

    orig = rd.read_parquet

    def small_blocks(*args, **kw):
        return orig(*args, **kw).repartition(13)

    sketches.rd.read_parquet, restore = small_blocks, orig
    try:
        b = heavy_hitter_trigrams(SF).to_pandas()
    finally:
        sketches.rd.read_parquet = restore
    pd.testing.assert_frame_equal(
        a.sort_values("tri").reset_index(drop=True),
        b.sort_values("tri").reset_index(drop=True),
    )


def test_hll_linear_counting_and_accuracy(ray_session):
    """sf0.001 (150 keys << 2.5m = 640) must take the linear-counting
    branch and land within the documented error; registers must be
    batch-layout invariant (max-merge is idempotent)."""
    from tensorflow_ocr_ray.pipelines.sketches import (
        HLL_M, hll_distinct, hll_lc_lut,
    )

    df = hll_distinct("/root/testdata/sf0.001")
    regs = df[df["bucket"] >= 0]
    assert len(regs) == HLL_M
    raw = int(df.loc[df["bucket"] == -1, "register"].iloc[0])
    corrected = int(df.loc[df["bucket"] == -2, "register"].iloc[0])
    exact = int(df.loc[df["bucket"] == -3, "register"].iloc[0])
    v_empty = int((regs["register"] == 0).sum())
    assert raw <= 5 * HLL_M // 2 and v_empty > 0  # LC branch taken
    assert corrected == hll_lc_lut()[v_empty - 1]
    assert abs(corrected - exact) * 100 <= 10 * exact  # within 10%


def test_hll_register_merge_order_invariance():
    """Registers from one pass over all keys == max-merge of any
    partition of the keys (the mergeability HLL is used for)."""
    import numpy as np

    from tensorflow_ocr_ray.pipelines.sketches import (
        HLL_M, HLL_WBITS, _hll_h60,
    )

    def registers(keys):
        h = _hll_h60(keys)
        b = h % HLL_M
        w = (h // HLL_M) % (1 << HLL_WBITS)
        low = w & -w
        rho = np.where(w == 0, HLL_WBITS + 1,
                       np.log2(np.maximum(low, 1)).astype(np.int64) + 1)
        r = np.zeros(HLL_M, np.int64)
        np.maximum.at(r, b, rho)
        return r

    keys = np.arange(1, 5001)
    whole = registers(keys)
    rng = np.random.default_rng(7)
    shuffled = rng.permutation(keys)
    merged = np.maximum.reduce(
        [registers(part) for part in np.array_split(shuffled, 7)])
    assert (whole == merged).all()


def test_hll_set_ops_estimates_track_exact(ray_session):
    """Union via register max + inclusion-exclusion intersection land
    within HLL error bounds of the exact set ops, and the exact side
    satisfies the lattice identities."""
    from tensorflow_ocr_ray.pipelines.sketches import hll_set_ops

    got = hll_set_ops("/root/testdata/sf0.01").set_index("stat")["value"]
    # exact identities
    assert got["exact_union"] + got["exact_inter"] == \
        got["exact_a"] + got["exact_b"]
    assert got["exact_union"] >= max(got["exact_a"], got["exact_b"])
    assert got["exact_inter"] <= min(got["exact_a"], got["exact_b"])
    # estimates within ~3 std errors (1.04/sqrt(256) ~ 6.5% per side;
    # intersection differences compound, allow 2x union error)
    for est, exact in (("est_a", "exact_a"), ("est_b", "exact_b"),
                       ("est_union", "exact_union")):
        assert abs(got[est] - got[exact]) <= 0.2 * got[exact] + 8
    assert abs(got["est_inter"] - got["exact_inter"]) <= \
        0.4 * got["exact_union"] + 16
