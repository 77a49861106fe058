"""Window-operator edge semantics (beyond the DuckDB oracle checks)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_events_dir(tmp_path_factory):
    """Hand-built events: user 1 has a gap of EXACTLY 30min (same
    session, strict >), then 30min 1s (new session); user 2 one event."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        {"event_id": 0, "ts": base, "user_id": 1, "event_type": "a",
         "value": 1.0, "props": ""},
        {"event_id": 1, "ts": base + pd.Timedelta(minutes=30), "user_id": 1,
         "event_type": "a", "value": 2.0, "props": ""},
        {"event_id": 2, "ts": base + pd.Timedelta(minutes=60, seconds=1),
         "user_id": 1, "event_type": "a", "value": 4.0, "props": ""},
        {"event_id": 3, "ts": base + pd.Timedelta(minutes=45), "user_id": 2,
         "event_type": "b", "value": 8.0, "props": ""},
    ]
    d = tmp_path_factory.mktemp("tinyevents")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
    return str(d)


def test_sessionize_gap_boundary(ray_session, tiny_events_dir):
    from tensorflow_ocr_ray.pipelines.windows import sessionize

    df = (
        sessionize(tiny_events_dir, gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    u1 = df[df.user_id == 1]
    # exactly-30min gap stays in session 1; 30min1s gap opens session 2
    assert u1["session_seq"].tolist() == [1, 2]
    assert u1[u1.session_seq == 1]["events"].iloc[0] == 2
    assert u1[u1.session_seq == 1]["total_value_cents"].iloc[0] == 300
    assert len(df[df.user_id == 2]) == 1


def test_tumbling_bucket_edges(ray_session, tiny_events_dir):
    from tensorflow_ocr_ray.pipelines.windows import tumbling_windows

    df = (
        tumbling_windows(tiny_events_dir, width_minutes=60)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    u1 = df[df.user_id == 1]
    # events at :00 and :30 share the 00:00 bucket; :60:01 is in 01:00
    assert len(u1) == 2
    assert u1["events"].tolist() == [2, 1]


def test_hopping_windows_overlap(ray_session, tiny_events_dir):
    from tensorflow_ocr_ray.pipelines.windows import hopping_windows

    df = (
        hopping_windows(tiny_events_dir, width_minutes=60, hop_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    u2 = df[df.user_id == 2]
    # the :45 event belongs to windows starting 00:00 and 00:30
    starts = pd.to_datetime(u2["window_start"]).dt.strftime("%H:%M").tolist()
    assert starts == ["00:00", "00:30"]


def test_asof_no_order_before_event(ray_session, tiny_events_dir, tmp_path):
    from tensorflow_ocr_ray.pipelines.windows import asof_event_order
    import shutil

    # orders table: user 1 has one order AFTER event 0 but before event 1
    d = tmp_path / "asof"
    d.mkdir()
    shutil.copy(f"{tiny_events_dir}/events.parquet", d / "events.parquet")
    orders = pd.DataFrame(
        {
            "o_orderkey": [100],
            "o_custkey": [1],
            "o_orderstatus": ["O"],
            "o_totalprice": [1.0],
            "o_orderdate": [pd.Timestamp("2024-01-01 00:10:00")],
            "o_orderpriority": ["1-URGENT"],
        }
    )
    orders.to_parquet(d / "orders.parquet")
    df = (
        asof_event_order(str(d))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 0 (00:00) precedes every order -> dropped; events 1,2 match 100
    assert df["event_id"].tolist() == [1, 2]
    assert set(df["o_orderkey"]) == {100}


def test_windows_survive_hot_key_skew(ray_session, tmp_path):
    """One user owning 90% of all events (pathological key skew): the
    map-side partial pattern keeps every operator correct — the hot
    user's partials collapse per batch before any shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(31))
    n = 20000
    hot = int(0.9 * n)
    users = np.concatenate([
        np.zeros(hot, dtype=np.int64),
        rng.integers(1, 50, n - hot),
    ])
    ts = (np.datetime64("2024-01-01") +
          np.sort(rng.integers(0, 86_400_000, n)).astype("timedelta64[ms]"))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": users,
        "ts": ts.astype("datetime64[us]"),
        "value": rng.random(n).round(3),
    })
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))

    from tensorflow_ocr_ray.pipelines.windows import (
        sessionize, tumbling_windows,
    )

    tw = (
        tumbling_windows(str(d))
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    # reference combine in pandas, exact integer cents
    epoch = np.datetime64("1970-01-01T00:00:00")
    width = np.timedelta64(3600, "s")
    win = epoch + ((df["ts"].to_numpy() - epoch) // width) * width
    ref = (
        df.assign(
            window_start=win.astype("datetime64[us]"),
            cents=np.round(df["value"].to_numpy() * 100.0).astype("int64"),
        )
        .groupby(["user_id", "window_start"], as_index=False)
        .agg(events=("cents", "size"), total_value_cents=("cents", "sum"))
    )
    ref["events"] = ref["events"].astype("int64")
    ref["total_value_cents"] = ref["total_value_cents"].astype("int64")
    ref = ref.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(tw, ref)

    sz = sessionize(str(d)).to_pandas()
    assert (sz.groupby("user_id")["events"].sum()
            == df.groupby("user_id").size()).all()


@pytest.fixture(scope="module")
def funnel_events_dir(tmp_path_factory):
    """Crafted funnel corpus: user 1 completes view->click->purchase in
    order; user 2's click precedes its only view (stage stops at 1);
    user 3 views only; user 4 never enters the funnel (stage 0)."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: full ordered funnel (plus an early purchase that must
        # NOT count — it precedes the click)
        (0, base + 0 * m, 1, "purchase"),
        (1, base + 1 * m, 1, "view"),
        (2, base + 2 * m, 1, "click"),
        (3, base + 3 * m, 1, "purchase"),
        # user 2: click strictly BEFORE the first view -> unconverted
        (4, base + 0 * m, 2, "click"),
        (5, base + 1 * m, 2, "view"),
        # user 3: view only
        (6, base + 0 * m, 3, "view"),
        # user 4: no funnel event types at all
        (7, base + 0 * m, 4, "error"),
    ]
    tbl = pa.Table.from_pylist(
        [
            {"event_id": e, "ts": ts, "user_id": u, "event_type": t,
             "value": 1.0, "props": ""}
            for e, ts, u, t in rows
        ]
    )
    d = tmp_path_factory.mktemp("funnelevents")
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_event_funnel_strict_ordering(ray_session, funnel_events_dir):
    from tensorflow_ocr_ray.pipelines.windows import event_funnel

    out = (
        event_funnel(funnel_events_dir)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    base_us = pd.Timestamp("2024-01-01 00:00:00").value // 1000
    assert out.loc[1, "stage"] == 3
    assert out.loc[1, "t_view_us"] == base_us + 60_000_000
    assert out.loc[1, "t_click_us"] == base_us + 120_000_000
    # the minute-0 purchase is ignored; minute-3 one converts
    assert out.loc[1, "t_purchase_us"] == base_us + 180_000_000
    assert out.loc[2, "stage"] == 1          # click before view: no credit
    assert out.loc[2, "t_click_us"] == -1
    assert out.loc[3, "stage"] == 1
    assert out.loc[4, "stage"] == 0
    assert out.loc[4, "t_view_us"] == -1


def test_cohort_retention_offsets(ray_session, funnel_events_dir):
    from tensorflow_ocr_ray.pipelines.windows import cohort_retention

    # every crafted event is on 2024-01-01 -> one cohort, offset 0,
    # all four users active
    out = cohort_retention(funnel_events_dir).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    day = pd.Timestamp("2024-01-01").value // 1000 // 86_400_000_000
    assert row["cohort_day"] == day
    assert row["offset_day"] == 0
    assert row["active_users"] == 4


def test_cohort_retention_corpus_shape(ray_session):
    from tensorflow_ocr_ray.pipelines.windows import cohort_retention

    out = cohort_retention("/root/testdata/sf0.001").to_pandas()
    # offsets are non-negative and each (cohort, offset) appears once
    assert (out["offset_day"] >= 0).all()
    assert not out.duplicated(["cohort_day", "offset_day"]).any()
    # day-0 retention: every user is active on their own cohort day
    d0 = out[out["offset_day"] == 0]["active_users"].sum()
    assert d0 == out.groupby("cohort_day")["active_users"].max().sum()


def _write_events(tmp_path, n=4000, n_users=12, seed=7):
    """Synthetic events with a hot user owning ~half the stream and
    duplicate timestamps (ordering ties resolved by event_id only)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    uid = np.where(rng.random(n) < 0.5, 0,
                   rng.integers(1, n_users, n)).astype("int64")
    base = np.datetime64("2024-03-01T00:00:00", "us")
    # coarse seconds -> plenty of exact ts collisions
    ts = base + rng.integers(0, 30 * 86_400, n).astype(
        "timedelta64[s]"
    ).astype("timedelta64[us]")
    value = np.round(rng.uniform(-50, 50, n), 2)
    etype = rng.choice(["view", "click", "purchase"], n)
    t = pa.table(
        {"event_id": np.arange(n, dtype="int64"),
         "ts": ts, "user_id": uid,
         "event_type": etype, "value": value}
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    import pandas as pd

    return t.to_pandas()


def test_running_total_brute_equivalence(ray_session, tmp_path):
    """Distributed day-sharded prefix sum == sequential brute force on a
    skewed stream with timestamp ties (event_id is the only tiebreak)."""
    from tensorflow_ocr_ray.pipelines.windows import running_total

    df = _write_events(tmp_path)
    got = running_total(str(tmp_path)).to_pandas().sort_values(
        "rn"
    ).reset_index(drop=True)
    ref = df.copy()
    ref["cents"] = np.round(ref["value"] * 100).astype("int64")
    ref = ref.sort_values(["ts", "event_id"]).reset_index(drop=True)
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert (got["running_cents"].to_numpy()
            == ref["cents"].cumsum().to_numpy()).all()
    assert got["rn"].tolist() == list(range(1, len(ref) + 1))


def test_range_join_brute_equivalence(ray_session, tmp_path):
    """Sharded interval join == brute nested loop, including users with
    zero orders (LEFT semantics) and the hot user."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tensorflow_ocr_ray.pipelines.windows import range_join_orders

    ev = _write_events(tmp_path, n=1500)
    rng = np.random.default_rng(11)
    n_o = 300
    # users 0..5 only -> users 6+ have no orders at all
    ok = rng.integers(0, 6, n_o).astype("int64")
    od = (np.datetime64("2024-03-01T00:00:00", "us")
          + rng.integers(0, 30 * 86_400, n_o).astype(
              "timedelta64[s]").astype("timedelta64[us]"))
    pq.write_table(
        pa.table({"o_orderkey": np.arange(n_o, dtype="int64"),
                  "o_custkey": ok, "o_orderdate": od}),
        str(tmp_path / "orders.parquet"),
    )
    got = range_join_orders(str(tmp_path)).to_pandas().sort_values(
        "event_id"
    ).reset_index(drop=True)
    delta = np.timedelta64(7 * 86_400_000_000, "us")
    want = []
    for _, e in ev.sort_values("event_id").iterrows():
        m = (ok == e["user_id"]) & (od >= e["ts"] - delta) & (
            od <= e["ts"] + delta
        )
        want.append(int(m.sum()))
    assert got["n_orders_7d"].tolist() == want


def test_first_touch_tie_break(ray_session, tmp_path):
    """Two views at the SAME earliest in-window timestamp: attribution
    must pick the smaller event_id; purchases with no prior view get -1."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tensorflow_ocr_ray.pipelines.windows import (
        first_touch_attribution,
    )

    t0 = np.datetime64("2024-05-10T12:00:00", "us")
    rows = [
        # user 1: two views at identical ts, then a purchase
        (10, t0, 1, "view"), (11, t0, 1, "view"),
        (12, t0 + np.timedelta64(3600, "s"), 1, "purchase"),
        # user 2: view AFTER the purchase -> unattributed
        (20, t0 + np.timedelta64(7200, "s"), 2, "purchase"),
        (21, t0 + np.timedelta64(9000, "s"), 2, "view"),
        # user 3: view 31 days before -> outside the window
        (30, t0 - np.timedelta64(31 * 86_400, "s"), 3, "view"),
        (31, t0, 3, "purchase"),
    ]
    t = pa.table(
        {"event_id": np.array([r[0] for r in rows], dtype="int64"),
         "ts": np.array([r[1] for r in rows], dtype="datetime64[us]"),
         "user_id": np.array([r[2] for r in rows], dtype="int64"),
         "event_type": [r[3] for r in rows],
         "value": np.zeros(len(rows))}
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = first_touch_attribution(str(tmp_path)).to_pandas()
    out = out.set_index("event_id")
    assert out.loc[12, "touch_event_id"] == 10  # smaller id wins the tie
    assert out.loc[20, "touch_event_id"] == -1
    assert out.loc[31, "touch_event_id"] == -1


def test_user_journey_order(ray_session, tmp_path):
    """Journeys follow (ts, event_id) order exactly on a tie-heavy
    skewed stream."""
    from tensorflow_ocr_ray.pipelines.windows import user_journey

    df = _write_events(tmp_path, n=800)
    got = user_journey(str(tmp_path)).to_pandas().set_index("user_id")
    ref = df.sort_values(["ts", "event_id"]).groupby("user_id")
    for uid, g in ref:
        assert got.loc[uid, "journey"] == ">".join(g["event_type"])
        assert got.loc[uid, "n_events"] == len(g)


def test_event_lag_diff_brute(ray_session, tmp_path):
    """Sharded LAG == per-user sequential diff on a skewed tie-heavy
    stream; first event of each user is -1."""
    from tensorflow_ocr_ray.pipelines.windows import event_lag_diff

    df = _write_events(tmp_path, n=1200)
    got = event_lag_diff(str(tmp_path)).to_pandas().set_index("event_id")
    df = df.sort_values(["user_id", "ts", "event_id"])
    us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    uid = df["user_id"].to_numpy()
    for i, eid in enumerate(df["event_id"].to_numpy()):
        want = -1 if (i == 0 or uid[i] != uid[i - 1]) else us[i] - us[i - 1]
        assert got.loc[eid, "gap_us"] == want


def test_moving_window_sum_brute(ray_session, tmp_path):
    """Cumsum-window plan == explicit 3-row frame sums, exact cents."""
    from tensorflow_ocr_ray.pipelines.windows import moving_window_sum

    df = _write_events(tmp_path, n=1000)
    got = moving_window_sum(str(tmp_path)).to_pandas().set_index(
        "event_id")
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cents = np.round(g["value"].to_numpy() * 100.0).astype("int64")
        for i, eid in enumerate(g["event_id"].to_numpy()):
            lo = max(0, i - 2)
            assert got.loc[eid, "win_cents"] == cents[lo:i + 1].sum()
            assert got.loc[eid, "win_n"] == i + 1 - lo


def test_ntile_events_brute(ray_session, tmp_path):
    """Bucket-offset global rank + integer NTILE == pandas qcut-free
    explicit tiling per event_type (first n%k tiles one row bigger)."""
    from tensorflow_ocr_ray.pipelines.windows import ntile_events

    df = _write_events(tmp_path, n=1100)
    got = ntile_events(str(tmp_path)).to_pandas().set_index("event_id")
    for t, g in df.groupby("event_type"):
        cents = np.round(g["value"].to_numpy() * 100.0).astype("int64")
        order = np.lexsort((g["event_id"].to_numpy(), cents))
        eids = g["event_id"].to_numpy()[order]
        n, k = len(g), 4
        big, n_big = n // k + 1, n % k
        for r0, eid in enumerate(eids):
            rank = r0 + 1
            assert got.loc[eid, "rnk"] == rank
            cut = n_big * big
            if rank <= cut:
                want = (rank - 1) // big + 1
            else:
                want = n_big + (rank - cut - 1) // (n // k) + 1
            assert got.loc[eid, "tile"] == want


def test_median_value_cont_matches_quantile(ray_session, tmp_path):
    """Distributed index-select median == numpy percentile (linear
    interpolation) on odd AND even group sizes."""
    from tensorflow_ocr_ray.pipelines.windows import median_value_cont

    df = _write_events(tmp_path, n=1001)
    got = median_value_cont(str(tmp_path)).set_index("event_type")
    for t, g in df.groupby("event_type"):
        want = float(np.percentile(g["value"].to_numpy(), 50,
                                   method="linear"))
        assert abs(got.loc[t, "median_value"] - round(want, 4)) < 1e-12
        assert got.loc[t, "n"] == len(g)


def test_ntile_median_degenerate_all_equal(ray_session, tmp_path):
    """All values identical: one bucket owns every row — ranks must
    still be a permutation (tie order by event_id) and the interpolated
    median must equal the constant."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tensorflow_ocr_ray.pipelines.windows import (
        ntile_events, median_value_cont,
    )

    n = 1000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    t = pa.table(
        {"event_id": np.arange(n, dtype="int64"),
         "ts": np.full(n, base),
         "user_id": np.zeros(n, dtype="int64"),
         "event_type": ["view"] * n,
         "value": np.full(n, 7.25)}
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    nt = ntile_events(str(tmp_path)).to_pandas()
    assert sorted(nt["rnk"]) == list(range(1, n + 1))
    # equal values tie-break by event_id
    assert nt.sort_values("event_id")["rnk"].tolist() == list(
        range(1, n + 1))
    assert nt["tile"].value_counts().tolist() == [250] * 4
    med = median_value_cont(str(tmp_path))
    assert med["median_value"].iloc[0] == 7.25
    assert med["n"].iloc[0] == n


def test_user_mode_event_brute(ray_session, tmp_path):
    """Sharded mode == driver-side Counter argmax with lexicographic
    tie-break on the skewed stream."""
    from collections import Counter
    from tensorflow_ocr_ray.pipelines.windows import user_mode_event

    df = _write_events(tmp_path, n=900)
    got = user_mode_event(str(tmp_path)).to_pandas().set_index("user_id")
    for uid, g in df.groupby("user_id"):
        c = Counter(g["event_type"])
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got.loc[uid, "mode_type"] == want[0]
        assert got.loc[uid, "n"] == want[1]


def test_next_purchase_event_brute(ray_session, tmp_path):
    """Suffix-min plan == per-user sequential scan on the skewed
    tie-heavy stream (strictly-after semantics, -1 sentinels, exact
    microsecond gaps)."""
    from tensorflow_ocr_ray.pipelines.windows import next_purchase_event

    df = _write_events(tmp_path, n=1000)
    got = next_purchase_event(str(tmp_path)).to_pandas().set_index(
        "event_id")
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        for i in range(len(g)):
            nxt = next((j for j in range(i + 1, len(g))
                        if g["event_type"].iloc[j] == "purchase"), None)
            eid = g["event_id"].iloc[i]
            if nxt is None:
                assert got.loc[eid, "next_purchase_id"] == -1
                assert got.loc[eid, "gap_us"] == -1
            else:
                assert got.loc[eid, "next_purchase_id"] == \
                    g["event_id"].iloc[nxt]
                assert got.loc[eid, "gap_us"] == us[nxt] - us[i]


def test_range_window_peer_ties_and_boundary(ray_session, tmp_path):
    """RANGE frame semantics: (a) peers with the SAME ts are all in the
    frame even when positioned after the current row; (b) the 1-hour
    bound is inclusive (exactly-1h-old rows count)."""
    import duckdb

    from tensorflow_ocr_ray.pipelines.windows import range_window_sum

    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = [
        # user 1: three PEERS at t=0 (must all see win_cents=1+2+4)
        {"event_id": 0, "ts": base, "user_id": 1, "event_type": "a",
         "value": 0.01, "props": ""},
        {"event_id": 1, "ts": base, "user_id": 1, "event_type": "a",
         "value": 0.02, "props": ""},
        {"event_id": 2, "ts": base, "user_id": 1, "event_type": "a",
         "value": 0.04, "props": ""},
        # exactly 1h later: frame includes the t=0 peers (inclusive)
        {"event_id": 3, "ts": base + pd.Timedelta(hours=1), "user_id": 1,
         "event_type": "a", "value": 0.08, "props": ""},
        # 1h + 1us later: t=0 peers fall out, only event 3 remains
        {"event_id": 4,
         "ts": base + pd.Timedelta(hours=1, microseconds=1),
         "user_id": 1, "event_type": "a", "value": 0.16, "props": ""},
        # user 2: same instants — bands must not leak across users
        {"event_id": 5, "ts": base, "user_id": 2, "event_type": "b",
         "value": 1.00, "props": ""},
        {"event_id": 6, "ts": base + pd.Timedelta(minutes=59),
         "user_id": 2, "event_type": "b", "value": 2.00, "props": ""},
    ]
    d = tmp_path / "rangewin"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))

    got = (
        range_window_sum(str(d))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["win_cents"].tolist() == [7, 7, 7, 15, 24, 100, 300]
    assert got["win_n"].tolist() == [3, 3, 3, 4, 2, 1, 2]

    sql = """
        SELECT event_id, count(*) OVER w AS win_n,
               CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w
                    AS BIGINT) AS win_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)
        ORDER BY event_id
    """
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    exp = con.sql(sql).df()
    assert got["win_cents"].tolist() == exp["win_cents"].tolist()
    assert got["win_n"].tolist() == exp["win_n"].astype(int).tolist()


def test_late_event_audit_range_invariance(ray_session):
    """The prefix-max chaining must be exact for any range fan-out:
    n_ranges=1 (pure per-lane shards) == n_ranges=8."""
    from tensorflow_ocr_ray.pipelines.windows import late_event_audit

    a = late_event_audit("/root/testdata/sf0.001", n_ranges=1)
    b = late_event_audit("/root/testdata/sf0.001", n_ranges=8)
    assert a.equals(b)
    assert (a["n_late"] > 0).any()  # the audit is non-degenerate
