"""Distributed cardinality sketch: K-Minimum-Values (KMV / bottom-k).

The classic streaming distinct-count estimator (Bar-Yossef et al. 2002):
hash every key to (0,1], keep the k smallest distinct hashes; with
``h_k`` the k-th smallest, ``|D| ≈ (k-1) / h_k``.  Mergeable — the union
of two bottom-k sets re-trimmed to k is the bottom-k of the union — so
it runs as map-side partial sketches + one tiny reduce, moving k values
per batch instead of the key set.

Unlike HLL this choice is fully DETERMINISTIC given the hash function;
with md5-derived hashes (DuckDB-computable) the estimate is
bit-reproducible in SQL, so the driver gets a HARD oracle for an
approximate operator.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

_SCALE = float(1 << 64)  # hash / 2^64 ∈ (0,1]


def _kmv_hashes(values) -> np.ndarray:
    """Distinct md5-low-64 hashes of the values (unsigned, as float64
    fractions of 2^64 — exact: 64-bit ints round deterministically)."""
    hs = {
        int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
        )
        for v in values
    }
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def kmv_estimate(bottom_k: np.ndarray, k: int) -> float:
    """(k-1) / h_k on the sorted bottom-k fraction array; exact count
    when fewer than k distinct hashes exist."""
    if len(bottom_k) < k:
        return float(len(bottom_k))
    hk = float(bottom_k[k - 1]) / _SCALE
    return (k - 1) / hk


def approx_distinct(
    ds: "rd.Dataset", column: str, k: int = 256
) -> tuple[float, int]:
    """(estimate, n_partials) for one column of a Dataset."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.sort(_kmv_hashes(df[column]))[:k]
        return pd.DataFrame({"h": hs.astype("uint64")})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    merged = np.sort(pd.unique(parts["h"].to_numpy()))[:k]
    return kmv_estimate(merged.astype(np.uint64), k), len(parts)


def approx_distinct_users(sf_dir: str, k: int = 256) -> pd.DataFrame:
    """KMV distinct-user estimate per event_type (plus the corpus-wide
    row).  Map-side bottom-k per (event_type, batch) → merge per type.
    The result column carries the raw double estimate — bit-identical to
    the SQL oracle's, which recomputes the same md5 bottom-k."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in df.groupby("event_type"):
            hs = np.sort(_kmv_hashes(grp["user_id"]))[:k]
            out.append(pd.DataFrame({"event_type": et,
                                     "h": hs.astype("uint64")}))
        hs = np.sort(_kmv_hashes(df["user_id"]))[:k]
        out.append(pd.DataFrame({"event_type": "__all__",
                                 "h": hs.astype("uint64")}))
        return pd.concat(out, ignore_index=True)

    parts = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
    )
    rows = []
    for et, grp in parts.groupby("event_type"):
        merged = np.sort(pd.unique(grp["h"].to_numpy()))[:k]
        rows.append(
            {"event_type": et,
             "approx_users": kmv_estimate(merged.astype(np.uint64), k)}
        )
    return (
        pd.DataFrame(rows, columns=["event_type", "approx_users"])
        .sort_values("event_type")
        .reset_index(drop=True)
    )
