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
