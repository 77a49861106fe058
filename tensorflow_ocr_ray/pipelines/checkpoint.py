"""Partition-granular checkpointed runner with per-partition lineage.

The reference's "checkpointing" was re-running Makefile glob ranges by hand
(main/Makefile:560-564).  Here: the corpus is processed as P partitions
(one input parquet file each — at 100 TB, one file/key-range per
partition); each partition writes its output under ``out/part=<id>/`` plus
a manifest JSON recording lineage + metrics.  A killed job resumes by
skipping partitions whose manifest says ``done`` and whose input
fingerprint still matches.

Manifest record (FIXTURES.md §6):
``partition_id status input_file input_fingerprint docs media_spans
docs_per_sec elapsed_sec ts``
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass

import pyarrow.compute as pc

import ray.data

from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents


def _fingerprint(path: str) -> str:
    # name + size + mtime: a same-size content rewrite still invalidates
    # the partition (hashing 100 TB of input per resume is not an option)
    st = os.stat(path)
    return hashlib.md5(
        f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]


@dataclass
class PartitionReport:
    partition_id: int
    status: str
    skipped: bool
    docs: int
    media_spans: int
    docs_per_sec: float


def _part_name(path: str) -> str:
    """Stable partition identity = sanitized input file basename, NOT the
    ordinal — new files appearing between runs (streaming ingest) must
    not shift existing partitions' manifests."""
    base = os.path.basename(path)
    if base.endswith(".parquet"):
        base = base[: -len(".parquet")]
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in base)


def _manifest_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{name}.json")


def _span_ok(s: dict) -> bool:
    from tensorflow_ocr_ray.fixtures import truth_for_ref

    if s["kind"] == "media":
        return s["text"] == truth_for_ref(s["media_ref"])
    if s["kind"] == "html":
        # extraction truth per partition: the strip must leave NO markup
        # and NO chrome (the full golden equality needs the corpus seed,
        # which a resumed job doesn't have — the e2e tests pin it)
        t = s["text"]
        return "<" not in t and "Example Library" not in t
    return True


def span_equal_rate_vs_truth(written: "ray.data.Dataset") -> float:
    """Fraction of documents whose output span sequence equals the
    analytic fixture truth (media spans) and is markup/chrome-free
    (html spans of the extraction pipeline) — only meaningful for
    synthetic-store corpora (fixture refs); real corpora have no oracle
    and skip this."""
    equal = total = 0
    for b in written.iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            total += 1
            equal += int(all(_span_ok(s) for s in row["spans"]))
    return equal / total if total else 1.0


def run_checkpointed(
    input_files: list[str],
    out_dir: str,
    pipeline_kwargs: dict | None = None,
    verify_against_truth: bool = False,
    force_partitions: set[int] | None = None,
    pipeline_fn=None,
) -> list[PartitionReport]:
    """Run (or resume) the OCR pipeline partition by partition.

    ``pipeline_fn`` swaps the per-partition Dataset transform (default
    :func:`ocr_documents`; pass ``pipelines.extract.extract_documents``
    for the combined web-extraction flagship — same signature, html
    spans stripped ahead of the scorer pool).

    Within a partition, Ray Data parallelizes across the cluster; across
    partitions we get restartability.  Each partition's output is its own
    parquet directory — never one giant file.  With
    ``verify_against_truth`` each manifest also records the partition's
    span-equality rate against the analytic fixture truth (per-partition
    accuracy metric; synthetic corpora only).

    ``force_partitions`` re-runs those partition ids even when their
    manifest says done (the "redo column" path of interactive training —
    the index changed, not the input)."""
    pipeline_kwargs = pipeline_kwargs or {}
    if pipeline_fn is None:
        pipeline_fn = ocr_documents
    force = force_partitions or set()
    # partition identity is the sanitized basename; two inputs mapping to
    # the same name would silently share one manifest + output dir
    by_name: dict[str, str] = {}
    for path in input_files:
        name = _part_name(path)
        if by_name.setdefault(name, path) != path:
            raise ValueError(
                f"partition name collision: {by_name[name]!r} and {path!r} "
                f"both map to part={name!r}; rename the inputs or pass "
                f"files with unique basenames"
            )
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    reports: list[PartitionReport] = []
    for pid, path in enumerate(sorted(input_files)):
        name = _part_name(path)
        mpath = _manifest_path(out_dir, name)
        fp = _fingerprint(path)
        if os.path.exists(mpath) and pid not in force:
            with open(mpath) as f:
                prev = json.load(f)
            if prev.get("status") == "done" and prev.get("input_fingerprint") == fp:
                reports.append(
                    PartitionReport(
                        pid, "done", True, prev["docs"], prev["media_spans"],
                        prev["docs_per_sec"],
                    )
                )
                continue
        t0 = time.time()
        ds = ray.data.read_parquet(path)
        out = pipeline_fn(ds, **pipeline_kwargs)
        part_dir = os.path.join(out_dir, f"part={name}")
        # a partial/stale run must not leave output files behind: the
        # partition dir is rebuilt atomically w.r.t. the manifest (manifest
        # only flips to "done" after a full successful write)
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
        out.write_parquet(part_dir)
        # lineage metrics from the written output (cheap re-read of counts)
        written = ray.data.read_parquet(part_dir)
        docs = written.count()
        media_spans = 0
        if docs:
            for b in written.iter_batches(batch_format="pyarrow"):
                flat = pc.list_flatten(b.column("spans").combine_chunks())
                media_spans += int(
                    pc.sum(
                        pc.equal(flat.field("kind"), "media")
                    ).as_py()
                    or 0
                )
        elapsed = time.time() - t0
        record = {
            "partition_id": pid,
            "partition_name": name,
            "status": "done",
            "input_file": path,
            "input_fingerprint": fp,
            "docs": docs,
            "media_spans": media_spans,
            "docs_per_sec": docs / elapsed if elapsed > 0 else 0.0,
            "elapsed_sec": round(elapsed, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        if verify_against_truth:
            record["span_equal_rate"] = round(
                span_equal_rate_vs_truth(written), 6
            )
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, mpath)  # atomic: crash-safe manifest update
        reports.append(
            PartitionReport(pid, "done", False, docs, media_spans,
                            record["docs_per_sec"])
        )
    return reports


def read_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifest")
    out = []
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out
