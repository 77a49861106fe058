"""Property tests for the session's pure-numpy kernels — brute-force
parity on random inputs (no Ray needed)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=0, max_size=60))
def test_skyline_2d_matches_brute(points):
    from tensorflow_ocr_ray.pipelines.relational import _skyline_2d

    df = pd.DataFrame(points, columns=["cents", "day"]).astype("int64")
    df["o_orderkey"] = np.arange(len(df), dtype=np.int64)
    got = _skyline_2d(df)
    c = df["cents"].to_numpy()
    d = df["day"].to_numpy()
    keep = []
    for i in range(len(df)):
        dominated = ((c >= c[i]) & (d >= d[i])
                     & ((c > c[i]) | (d > d[i]))).any()
        if not dominated:
            keep.append(i)
    assert sorted(got["o_orderkey"]) == sorted(keep)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 9)),
                min_size=0, max_size=80))
def test_all_pairs_within_groups_matches_itertools(rows):
    """The concatenated-ranges all-pairs trick (as used in wedges /
    copurchase / edit-distance verify) against itertools.combinations
    per group."""
    from itertools import combinations

    df = pd.DataFrame(rows, columns=["g", "x"]).astype("int64")
    d = df.drop_duplicates(["g", "x"]).sort_values(["g", "x"])
    g = d["g"].to_numpy(np.int64)
    x = d["x"].to_numpy(np.int64)
    change = np.flatnonzero(np.r_[True, g[1:] != g[:-1]]) if len(g) else \
        np.array([], dtype=np.int64)
    k = np.diff(np.r_[change, len(g)]) if len(g) else np.array([], int)
    starts = np.repeat(change, k)
    local = np.arange(len(g)) - starts
    reps = np.repeat(k, k) - 1 - local
    first = np.repeat(np.arange(len(g)), reps)
    off = np.cumsum(reps) - reps
    second = (np.arange(int(reps.sum())) - np.repeat(off, reps)
              + np.repeat(np.arange(len(g)) + 1, reps)) if len(g) else \
        np.array([], dtype=np.int64)
    got = sorted(zip(x[first], x[second]))
    exp = []
    for gv, grp in d.groupby("g"):
        exp.extend(combinations(grp["x"].tolist(), 2))
    assert got == sorted(exp)
