"""JSONL/CSV ingestion roundtrips: raw dump -> canonical parquet ->
JSONL export, schema-coerced, with missing-column ingestion errors."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def test_jsonl_roundtrip_documents(ray_session, tmp_path):
    from tensorflow_ocr_ray.sources.textio import (
        DOCUMENTS_SCHEMA, jsonl_to_parquet, parquet_to_jsonl,
    )

    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    raw = tmp_path / "raw"
    raw.mkdir()
    # two shards, extra column, string-typed ints (coercion must fix)
    half = len(src) // 2
    for i, part in enumerate((src.iloc[:half], src.iloc[half:])):
        with open(raw / f"shard{i}.jsonl", "w") as f:
            for _, r in part.iterrows():
                d = r.to_dict()
                d["extra_junk"] = "drop-me"
                f.write(json.dumps(d) + "\n")
    out = str(tmp_path / "pq")
    n = jsonl_to_parquet(str(raw), out, DOCUMENTS_SCHEMA)
    assert n == len(src)
    got = pd.read_parquet(out).sort_values("doc_id").reset_index(
        drop=True)
    assert list(got.columns) == list(DOCUMENTS_SCHEMA)
    assert got["doc_id"].tolist() == sorted(src["doc_id"].tolist())
    assert set(got["text"]) == set(src["text"])
    # export direction
    exp = str(tmp_path / "jsonl_out")
    parquet_to_jsonl(out, exp, columns=["doc_id", "lang"])
    rows = []
    for fn in os.listdir(exp):
        with open(os.path.join(exp, fn)) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == len(src)
    assert set(rows[0]) == {"doc_id", "lang"}


def test_csv_roundtrip_events(ray_session, tmp_path):
    from tensorflow_ocr_ray.sources.textio import (
        EVENTS_SCHEMA, csv_to_parquet,
    )

    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    raw = tmp_path / "raw.csv"
    src.to_csv(raw, index=False)
    out = str(tmp_path / "pq")
    n = csv_to_parquet(str(raw), out, EVENTS_SCHEMA)
    assert n == len(src)
    got = pd.read_parquet(out).sort_values("event_id").reset_index(
        drop=True)
    want = src.sort_values("event_id").reset_index(drop=True)
    assert (got["event_id"] == want["event_id"]).all()
    assert np.allclose(got["value"], want["value"])
    assert (got["ts"].astype("datetime64[us]")
            == want["ts"].astype("datetime64[us]")).all()


def test_jsonl_missing_column_raises(ray_session, tmp_path):
    from tensorflow_ocr_ray.sources.textio import (
        DOCUMENTS_SCHEMA, jsonl_to_parquet,
    )

    raw = tmp_path / "bad.jsonl"
    with open(raw, "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "x"}) + "\n")
    with pytest.raises(Exception, match="missing required columns"):
        jsonl_to_parquet(str(raw), str(tmp_path / "pq"),
                         DOCUMENTS_SCHEMA)
