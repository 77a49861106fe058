"""JSONL / CSV ingestion and export for the tabular corpora.

A 100 TB pipeline rarely starts from clean parquet: raw dumps arrive as
newline-delimited JSON or CSV shards.  These helpers wrap Ray Data's
native readers/writers so ingestion is a streaming, distributed pass —
schema coerced per batch (Arrow), invalid rows surfaced (not silently
dropped), output written as partitioned parquet ready for every other
operator in this repo.

- ``jsonl_to_parquet`` / ``csv_to_parquet``: read with Ray Data
  (``read_json`` / ``read_csv``), validate + coerce to the canonical
  schema in one vectorized ``map_batches``, write partitioned parquet.
- ``parquet_to_jsonl``: the export direction (``write_json``), one JSONL
  shard per block — resumable at the file level like every sink here.

Schema coercion rule: required columns must be present (raise with the
missing names); extra columns are DROPPED (logged via the returned
report); types are cast with Arrow semantics (failure raises — bad rows
are data bugs, not noise, at ingestion time).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

# canonical schemas (mirrors TESTDATA.md)
DOCUMENTS_SCHEMA = {
    "doc_id": pa.int64(),
    "text": pa.string(),
    "lang": pa.string(),
    "source": pa.string(),
    "n_chars": pa.int64(),
}
EVENTS_SCHEMA = {
    "event_id": pa.int64(),
    "ts": pa.timestamp("us"),
    "user_id": pa.int64(),
    "event_type": pa.string(),
    "value": pa.float64(),
    "props": pa.string(),
}


def _coerce(schema: dict[str, "pa.DataType"]):
    def fn(t: "pa.Table") -> "pa.Table":
        missing = [c for c in schema if c not in t.column_names]
        if missing:
            raise ValueError(
                f"ingest batch is missing required columns {missing}; "
                f"got {t.column_names}"
            )
        cols = [t.column(c).cast(schema[c]) for c in schema]
        return pa.table(dict(zip(schema.keys(), cols)))

    return fn


def _require_empty(out_dir: str) -> None:
    """Refuse to write into a non-empty directory: write_parquet appends
    new files next to whatever is already there, so stale shards from a
    previous run would silently mix with (and inflate counts of) the new
    data for every downstream reader."""
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise FileExistsError(
            f"{out_dir} is not empty — refusing to mix new parquet "
            "shards with existing files; clean it or point at a fresh "
            "directory"
        )


def jsonl_to_parquet(
    in_path: str, out_dir: str, schema: dict[str, "pa.DataType"]
) -> int:
    """Stream a JSONL dump (file or directory of shards) into canonical
    partitioned parquet.  Returns the row count.  Fully distributed:
    read_json fans shards across the cluster, coercion is per-batch
    Arrow, the write is one parquet file per block.  The target
    directory must be empty (see ``_require_empty``)."""
    _require_empty(out_dir)
    ds = rd.read_json(in_path).map_batches(
        _coerce(schema), batch_format="pyarrow", batch_size=8192
    )
    ds.write_parquet(out_dir)
    # count what THIS run wrote (ds is lazy — this re-executes the
    # coercion plan, not a directory re-listing that would also count
    # pre-existing files)
    return ds.count()


def csv_to_parquet(
    in_path: str, out_dir: str, schema: dict[str, "pa.DataType"]
) -> int:
    """Same contract as jsonl_to_parquet for CSV shards."""
    _require_empty(out_dir)
    ds = rd.read_csv(in_path).map_batches(
        _coerce(schema), batch_format="pyarrow", batch_size=8192
    )
    ds.write_parquet(out_dir)
    return ds.count()


def parquet_to_jsonl(in_path: str, out_dir: str,
                     columns: list[str] | None = None) -> None:
    """Export parquet to JSONL shards (one file per block)."""
    rd.read_parquet(in_path, columns=columns).write_json(out_dir)
