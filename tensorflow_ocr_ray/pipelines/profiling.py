"""Table profiling: per-column count / nulls / min / max / sum in one
streaming pass — the schema-audit primitive a data engine runs before
ingesting an unknown 100-TB table.

Shape: pure map-side partials (one tiny row per column per block) with
a driver-side combine over a frame bounded by n_columns × n_blocks —
no shuffle, no full-column materialization anywhere.  Values normalize
to exact integers (corpus cents for doubles, epoch microseconds for
timestamps) so the DuckDB oracle compares hash-exact; string columns
use lexicographic min/max verbatim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

LINEITEM_COLS = {
    "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
    "l_linenumber": "int",
    "l_quantity": "cents", "l_extendedprice": "cents",
    "l_discount": "cents", "l_tax": "cents",
    "l_returnflag": "str", "l_linestatus": "str",
    "l_shipdate": "ts",
}


EVENTS_COLS = {
    "event_id": "int", "ts": "ts", "user_id": "int",
    "event_type": "str", "value": "cents", "props": "str",
}


def profile_events(sf_dir: str) -> pd.DataFrame:
    """The same one-pass audit over the events table — the operator is
    table-agnostic; this registers a second shape (JSON props profile
    as lexicographic string min/max)."""
    return profile_table(sf_dir, "events", EVENTS_COLS)


def profile_table(sf_dir: str, table: str = "lineitem",
                  cols: dict[str, str] | None = None) -> pd.DataFrame:
    """(col, n, nulls, min_repr, max_repr, sum_units) per column.

    ``sum_units``: raw sum for int columns, exact-cents sum for double
    columns (per-value ``round(x*100)`` then int64 sum — the repo's
    oracle cents convention), 0 for string/timestamp columns.
    """
    cols = cols or LINEITEM_COLS

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c, kind in cols.items():
            s = df[c]
            nulls = int(s.isna().sum())
            sv = s.dropna()
            imin = imax = None
            smin = smax = None
            units = 0
            if len(sv):
                if kind == "int":
                    imin, imax = int(sv.min()), int(sv.max())
                    units = int(sv.sum())
                elif kind == "cents":
                    cents = np.round(sv.to_numpy(np.float64) * 100
                                     ).astype(np.int64)
                    imin, imax = int(cents.min()), int(cents.max())
                    units = int(cents.sum())
                elif kind == "ts":
                    vals = sv.astype("datetime64[us]").astype("int64")
                    imin, imax = int(vals.min()), int(vals.max())
                else:
                    smin, smax = str(sv.min()), str(sv.max())
            rows.append((c, len(s), nulls, imin, imax, smin, smax,
                         units))
        return pd.DataFrame(
            rows, columns=["col", "n", "nulls", "imin", "imax",
                           "smin", "smax", "units"]
        )

    parts = rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=list(cols)
    ).map_batches(partial, batch_format="pandas",
                  batch_size=65536).to_pandas()  # n_cols x n_blocks

    out = []
    for c, kind in cols.items():
        p = parts[parts["col"] == c]
        n = int(p["n"].sum())
        nulls = int(p["nulls"].sum())
        if kind == "str":
            lo = p["smin"].dropna()
            hi = p["smax"].dropna()
            mn = str(lo.min()) if len(lo) else ""
            mx = str(hi.max()) if len(hi) else ""
        else:
            lo = p["imin"].dropna()
            hi = p["imax"].dropna()
            mn = str(int(lo.min())) if len(lo) else ""
            mx = str(int(hi.max())) if len(hi) else ""
        out.append((c, n, nulls, mn, mx, int(p["units"].sum())))
    return pd.DataFrame(
        out, columns=["col", "n", "nulls", "min_repr", "max_repr",
                      "sum_units"]
    ).astype({"n": "int64", "nulls": "int64", "sum_units": "int64"})


DOCUMENTS_COLS = {
    "doc_id": "int", "text": "str", "lang": "str",
    "source": "str", "n_chars": "int",
}


def profile_documents(sf_dir: str) -> pd.DataFrame:
    """Third registered shape — the corpus table itself (string-heavy:
    text/lang/source as lexicographic min/max)."""
    return profile_table(sf_dir, "documents", DOCUMENTS_COLS)
