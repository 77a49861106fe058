"""Distributed EXACT order-statistic selection — the q16 histogram-
refinement machinery, factored out for reuse over ANY Dataset.

``exact_group_quantiles(ds, group_col, value_col, qs)`` returns one row
per group with one column per requested quantile, each value DuckDB
``quantile_disc``-exact (the sorted value at index ceil(q*n) - 1),
computed WITHOUT ever materializing a group:

1. per-group count + min/max (one streaming aggregate, tree-combined);
2. each (group, q) target holds an interval known to contain its order
   statistic; every round one ``map_batches`` pass histograms the
   in-interval values (tiny: targets x n_bins reaches the driver) and
   the interval narrows to the bin containing the k-th value;
3. when a target's interval holds <= ``collect_limit`` values, one
   filtered pass collects just those and the exact rank is read off.

Refinement is comparison-exact: the histogram only CHOOSES the next
interval (padded one bin each side against float rounding of the
bin-index multiply); the below-rank is re-measured with comparisons
every pass, so the selected index can never shift.

Users: ``relational.q16_event_quantiles`` (p50/p90 per event type),
``relational.winsorized_mean_by_type`` (p05/p95 clamp bounds),
``relational.customer_rfm_segments`` (quintile boundaries over a
DERIVED per-customer aggregate dataset — the generalization this
factoring exists for)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


def exact_group_quantiles(
    ds,
    group_col: str,
    value_col: str,
    qs: tuple,
    n_bins: int = 1024,
    collect_limit: int = 65536,
    max_rounds: int = 6,
) -> pd.DataFrame:
    """One row per group: ``group_col`` plus one column per (q, label)
    in ``qs``.  ``ds`` is consumed in multiple streaming passes
    (aggregate, one histogram pass per refinement round, a final
    residual collect) — pass a cheap-to-recompute or pre-materialized
    upstream.  No task ever holds more than a batch (histogram) or
    ``collect_limit`` values (final collect), whatever the group skew."""

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, as_index=False).agg(
            n=(value_col, "size"),
            lo=(value_col, "min"),
            hi=(value_col, "max"),
        )
        return g.astype({"n": "int64"})

    def stat_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, as_index=False).agg(
            n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max")
        )
        return g.astype({"n": "int64"})

    stats = (
        ds.map_batches(stat_partial, batch_format="pandas",
                       batch_size=65536)
        .repartition(16)
        .map_batches(stat_merge, batch_format="pandas")
        .to_pandas()
        .groupby(group_col, as_index=False)
        .agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    )
    targets: list[dict] = []
    for _, row in stats.iterrows():
        n = int(row["n"])
        for q, col in qs:
            targets.append(
                {
                    "group": row[group_col],
                    "col": col,
                    "k": max(int(np.ceil(q * n)) - 1, 0),
                    "lo": float(row["lo"]),
                    "hi": float(row["hi"]),
                    "in_count": n,
                    "value": None,
                }
            )

    def hist_pass(tgt_list: list[dict]) -> tuple[np.ndarray, np.ndarray]:
        tref = ray.put(
            [(t["group"], t["lo"], t["hi"]) for t in tgt_list]
        )

        def counts(df: pd.DataFrame) -> pd.DataFrame:
            tl = ray.get(tref)
            out = np.zeros((len(tl), n_bins + 1), dtype=np.int64)
            below = np.zeros(len(tl), dtype=np.int64)
            for i, (grp, lo, hi) in enumerate(tl):
                v = df.loc[df[group_col] == grp, value_col].to_numpy()
                if len(v) == 0:
                    continue
                below[i] = int((v < lo).sum())
                if hi <= lo:
                    continue
                v = v[(v >= lo) & (v <= hi)]
                idx = np.clip(
                    ((v - lo) * (n_bins / (hi - lo))).astype(np.int64),
                    0, n_bins,
                )
                np.add.at(out[i], idx, 1)
            return pd.DataFrame(
                {"tgt": np.arange(len(tl)),
                 "below": below,
                 "bins": [out[i] for i in range(len(tl))]}
            )

        parts = ds.map_batches(
            counts, batch_format="pandas", batch_size=65536
        ).to_pandas()
        total = np.zeros((len(tgt_list), n_bins + 1), dtype=np.int64)
        below = np.zeros(len(tgt_list), dtype=np.int64)
        for tgt, nb, b in zip(parts["tgt"], parts["below"], parts["bins"]):
            total[int(tgt)] += np.asarray(b, dtype=np.int64)
            below[int(tgt)] += int(nb)
        return total, below

    for _ in range(max_rounds):
        live = [t for t in targets if t["value"] is None
                and t["in_count"] > collect_limit and t["hi"] > t["lo"]]
        if not live:
            break
        hists, belows = hist_pass(live)
        for t, h, nb in zip(live, hists, belows):
            want = t["k"] - int(nb)  # rank within [lo, hi]
            cum = np.cumsum(h)
            b = int(np.searchsorted(cum, want + 1))
            width = (t["hi"] - t["lo"]) / n_bins
            if b >= n_bins:  # overflow slot: the value IS hi exactly
                t["value"] = t["hi"]
                continue
            # pad one bin each side against bin-index rounding
            new_lo = max(t["lo"], t["lo"] + (b - 1) * width)
            new_hi = min(t["hi"], t["lo"] + (b + 2) * width)
            t["lo"], t["hi"] = new_lo, new_hi
            t["in_count"] = int(
                h[max(b - 1, 0) : min(b + 2, n_bins)].sum()
            ) + int(h[n_bins] if b + 2 > n_bins else 0)

    # a collapsed interval IS the answer (all-duplicates group: the
    # histogram can never shrink it, but min == max pins the value)
    for t in targets:
        if t["value"] is None and t["hi"] <= t["lo"]:
            t["value"] = t["lo"]

    live = [t for t in targets if t["value"] is None]
    if live:
        tref = ray.put(
            [(t["group"], t["lo"], t["hi"]) for t in live]
        )

        def residual(df: pd.DataFrame) -> pd.DataFrame:
            tl = ray.get(tref)
            frames = []
            for i, (grp, lo, hi) in enumerate(tl):
                v = df.loc[df[group_col] == grp, value_col].to_numpy()
                if len(v) == 0:
                    continue
                nb = int((v < lo).sum())
                keep = v[(v >= lo) & (v <= hi)]
                frames.append(pd.DataFrame(
                    {"tgt": i,
                     "below": [nb] + [0] * len(keep),
                     "value": np.concatenate(([np.nan], keep))}
                ))
            if not frames:
                return pd.DataFrame(
                    {"tgt": pd.Series([], dtype="int64"),
                     "below": pd.Series([], dtype="int64"),
                     "value": pd.Series([], dtype="float64")}
                )
            return pd.concat(frames, ignore_index=True)

        vals = ds.map_batches(
            residual, batch_format="pandas", batch_size=65536
        ).to_pandas()
        for i, t in enumerate(live):
            sel = vals[vals["tgt"] == i]
            nb = int(sel["below"].sum())
            v = np.sort(sel["value"].dropna().to_numpy())
            t["value"] = float(v[t["k"] - nb])

    rows: dict = {}
    for t in targets:
        rows.setdefault(t["group"], {})[t["col"]] = t["value"]
    cols = [col for _, col in qs]
    df = pd.DataFrame(
        [
            {group_col: k, **{c: v[c] for c in cols}}
            for k, v in rows.items()
        ]
    )
    return df.sort_values(group_col).reset_index(drop=True)
