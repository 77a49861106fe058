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

    df = sessionize(tiny_events_dir, gap_minutes=30)
    u1 = df[df.user_id == 1]
    # exactly-30min gap stays in session 1; 30min1s gap opens session 2
    assert u1["session_seq"].tolist() == [1, 2]
    assert u1[u1.session_seq == 1]["events"].iloc[0] == 2
    assert u1[u1.session_seq == 1]["total_value"].iloc[0] == 3.0
    assert len(df[df.user_id == 2]) == 1


def test_tumbling_bucket_edges(ray_session, tiny_events_dir):
    from tensorflow_ocr_ray.pipelines.windows import tumbling_windows

    df = tumbling_windows(tiny_events_dir, width_minutes=60)
    u1 = df[df.user_id == 1]
    # events at :00 and :30 share the 00:00 bucket; :60:01 is in 01:00
    assert len(u1) == 2
    assert u1["events"].tolist() == [2, 1]


def test_hopping_windows_overlap(ray_session, tiny_events_dir):
    from tensorflow_ocr_ray.pipelines.windows import hopping_windows

    df = hopping_windows(tiny_events_dir, width_minutes=60, hop_minutes=30)
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
    df = asof_event_order(str(d))
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

    tw = tumbling_windows(str(d))
    # reference combine in pandas
    epoch = np.datetime64("1970-01-01T00:00:00")
    width = np.timedelta64(3600, "s")
    win = epoch + ((df["ts"].to_numpy() - epoch) // width) * width
    ref = (
        df.assign(window_start=win.astype("datetime64[us]"))
        .groupby(["user_id", "window_start"], as_index=False)
        .agg(events=("value", "size"), total_value=("value", "sum"))
    )
    ref["events"] = ref["events"].astype("int64")
    ref["total_value"] = ref["total_value"].round(2)
    ref = ref.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(tw, ref)

    sz = sessionize(str(d))
    assert (sz.groupby("user_id")["events"].sum()
            == df.groupby("user_id").size()).all()
