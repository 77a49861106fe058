"""Ray Data pipeline tests: span-sequence equality, both physical plans,
checkpoint/resume, and the glyph-stream stage."""

import os

import pyarrow as pa
import pytest

from tensorflow_ocr_ray.fixtures import (
    expected_documents,
    generate_documents,
    write_documents_parquet,
)

N_DOCS = 16
SEED = 42


def _span_seq(table: pa.Table) -> dict:
    """doc_id → [(kind, text, media_ref, offset), ...] for equality checks."""
    out = {}
    for row in table.to_pylist():
        out[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]
        ]
    return out


@pytest.fixture(scope="module")
def golden():
    docs = generate_documents(N_DOCS, seed=SEED)
    return docs, _span_seq(expected_documents(docs))


@pytest.mark.parametrize("mode", ["exploded", "fused"])
def test_span_sequence_equality(ray_session, golden, mode):
    """THE correctness gate: per-row (kind, text, media_ref, order) equality
    between the Ray pipeline and the independent analytic golden."""
    import ray.data as rd

    from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents

    docs, want = golden
    ds = rd.from_arrow(docs)
    out = ocr_documents(ds, mode=mode, concurrency=(1, 2), batch_size=8,
                        num_blocks=4 if mode == "exploded" else None)
    got = _span_seq(pa.Table.from_pandas(out.to_pandas()))
    assert got == want


def test_span_sequence_equality_exchange_reassembly(ray_session, golden):
    """The measured-alternative reassembly path (hash_exchange, Arrow
    batch_format) must produce the identical span sequences — it loses
    the sf0.1 bench to the pipelining groupby (see ocr_pipeline.py) but
    stays a correct, callable plan."""
    import ray.data as rd

    from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents

    docs, want = golden
    ds = rd.from_arrow(docs)
    out = ocr_documents(ds, mode="exploded", concurrency=(1, 2),
                        batch_size=8, num_blocks=4,
                        reassemble_via="exchange", reassemble_buckets=7)
    got = _span_seq(pa.Table.from_pandas(out.to_pandas()))
    assert got == want


def test_span_sequence_equality_streaming_reassembly(ray_session, golden):
    """The scaling-protocol reassembly path (streaming_exchange — routed
    while the scorer runs, no Sort barrier) must produce the identical
    span sequences; within-bucket arrival order is nondeterministic, so
    this also pins reassemble_group's internal (doc_id, offset) sort."""
    import ray.data as rd

    from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents

    docs, want = golden
    ds = rd.from_arrow(docs)
    out = ocr_documents(ds, mode="exploded", concurrency=(1, 2),
                        batch_size=8, num_blocks=4,
                        reassemble_via="streaming", reassemble_buckets=7)
    got = _span_seq(pa.Table.from_pandas(out.to_pandas()))
    assert got == want


def test_exploded_roundtrip_schema(ray_session, golden):
    import ray.data as rd

    from tensorflow_ocr_ray.pipelines.ocr_pipeline import (
        EXPLODED_SCHEMA,
        explode_documents,
    )

    docs, _ = golden
    flat = explode_documents(docs)
    assert flat.schema.equals(EXPLODED_SCHEMA)
    n_spans = sum(len(r["spans"]) for r in docs.to_pylist())
    assert flat.num_rows == n_spans


def test_glyph_stream_stage(ray_session, golden):
    import ray.data as rd

    from tensorflow_ocr_ray.pipelines.ocr_pipeline import explode_documents
    from tensorflow_ocr_ray.stages.ocr_stages import GlyphDumpStage

    docs, _ = golden
    spans = rd.from_arrow(explode_documents(docs))
    glyphs = spans.map_batches(
        GlyphDumpStage, batch_format="pyarrow", batch_size=8, concurrency=1
    )
    t = pa.Table.from_pandas(glyphs.to_pandas())
    assert t.num_rows > 0
    cols = set(t.column_names)
    assert {"doc_id", "span_idx", "line_idx", "glyph_idx", "features",
            "knn_label", "knn_dist2"} <= cols
    assert len(t.column("features")[0].as_py()) == 27


def test_checkpoint_run_and_resume(ray_session, tmp_path, golden):
    from tensorflow_ocr_ray.pipelines.checkpoint import (
        read_manifest,
        run_checkpointed,
    )

    docs, want = golden
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    files = write_documents_parquet(in_dir, N_DOCS, seed=SEED, num_files=4)
    kwargs = dict(mode="exploded", concurrency=(1, 2), batch_size=8)

    reports = run_checkpointed(files, out_dir, pipeline_kwargs=kwargs)
    assert len(reports) == 4
    assert all(r.status == "done" and not r.skipped for r in reports)

    # resume: all partitions skip, output unchanged
    reports2 = run_checkpointed(files, out_dir, pipeline_kwargs=kwargs)
    assert all(r.skipped for r in reports2)

    manifest = read_manifest(out_dir)
    assert len(manifest) == 4
    assert sum(m["docs"] for m in manifest) == N_DOCS
    assert all(m["input_fingerprint"] for m in manifest)

    # partitioned output reassembles the full golden corpus
    import ray.data as rd

    written = rd.read_parquet(out_dir)
    got = _span_seq(pa.Table.from_pandas(written.to_pandas()))
    assert got == want


def test_checkpoint_reruns_on_fingerprint_change(ray_session, tmp_path):
    from tensorflow_ocr_ray.pipelines.checkpoint import run_checkpointed

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    files = write_documents_parquet(in_dir, 4, seed=SEED, num_files=1)
    kwargs = dict(mode="fused", concurrency=1, batch_size=8)
    run_checkpointed(files, out_dir, pipeline_kwargs=kwargs)
    # grow the input file → fingerprint changes → partition re-runs
    write_documents_parquet(in_dir, 6, seed=SEED, num_files=1)
    reports = run_checkpointed(files, out_dir, pipeline_kwargs=kwargs)
    assert not reports[0].skipped
    assert reports[0].docs == 6


def test_skewed_span_counts(ray_session):
    """Skew plan: a 40-span document among 1-span documents — the explode +
    repartition spreads span rows evenly and reassembly restores every
    sequence (the exploded plan's reason to exist)."""
    import pyarrow as pa
    import ray.data as rd

    from tensorflow_ocr_ray.fixtures import (
        DOCUMENTS_SCHEMA,
        expected_documents,
        truth_for_ref,
    )
    from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents

    rows = []
    heavy_spans = [
        {"kind": "media", "text": "", "media_ref": f"page-skew-{s}",
         "offset": s}
        for s in range(40)
    ]
    rows.append({"doc_id": "doc-heavy", "spans": heavy_spans})
    for d in range(12):
        rows.append(
            {
                "doc_id": f"doc-small-{d:03d}",
                "spans": [
                    {"kind": "media", "text": "",
                     "media_ref": f"page-sk2-{d}", "offset": 0}
                ],
            }
        )
    docs = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
    out = ocr_documents(
        rd.from_arrow(docs), mode="exploded", concurrency=2, batch_size=8,
        num_blocks=8,
    )
    got = _span_seq(pa.Table.from_pandas(out.to_pandas()))
    want = _span_seq(expected_documents(docs))
    assert got == want
    assert len(got["doc-heavy"]) == 40


def test_zero_span_documents_survive(ray_session):
    """A document with an empty spans list must round-trip the exploded
    plan (sentinel row), not silently disappear."""
    import pyarrow as pa
    import ray.data as rd

    from tensorflow_ocr_ray.fixtures import DOCUMENTS_SCHEMA
    from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents

    docs = pa.Table.from_pylist(
        [
            {"doc_id": "doc-empty", "spans": []},
            {"doc_id": "doc-one", "spans": [
                {"kind": "text", "text": "hi", "media_ref": "", "offset": 0}
            ]},
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    out = ocr_documents(rd.from_arrow(docs), mode="exploded", concurrency=1,
                        batch_size=4)
    got = _span_seq(pa.Table.from_pandas(out.to_pandas()))
    assert got == {
        "doc-empty": [],
        "doc-one": [("text", "hi", "", 0)],
    }


def test_media_error_empty_mode(ray_session, tmp_path):
    """on_media_error='empty': a missing payload yields '' instead of
    failing the partition; 'raise' (default) propagates."""
    import pyarrow as pa

    from tensorflow_ocr_ray.stages.ocr_stages import OcrSpanStage

    batch = pa.table(
        {
            "doc_id": ["d"], "kind": ["media"], "text": [""],
            "media_ref": ["nope"], "offset": [0],
        }
    )
    stage = OcrSpanStage(
        media_spec={"kind": "dir", "path": str(tmp_path)},
        on_media_error="empty",
    )
    out = stage(batch)
    assert out.column("text").to_pylist() == [""]

    strict = OcrSpanStage(media_spec={"kind": "dir", "path": str(tmp_path)})
    with pytest.raises(FileNotFoundError):
        strict(batch)


def test_manifest_span_equal_rate(ray_session, tmp_path):
    from tensorflow_ocr_ray.pipelines.checkpoint import (
        read_manifest,
        run_checkpointed,
    )

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    files = write_documents_parquet(in_dir, 6, seed=SEED, num_files=2)
    run_checkpointed(
        files, out_dir,
        pipeline_kwargs=dict(mode="fused", concurrency=1, batch_size=8),
        verify_against_truth=True,
    )
    manifest = read_manifest(out_dir)
    assert len(manifest) == 2
    assert all(m["span_equal_rate"] == 1.0 for m in manifest)


def test_corrupt_compressed_payload_yields_empty_not_crash(ray_session):
    """A truncated/garbage G4 stream must not kill the partition when
    on_media_error='empty' (the 100 TB few-bad-objects rule) — and must
    raise cleanly when strict."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from tensorflow_ocr_ray.core.raster import encode_tiff
    from tensorflow_ocr_ray.fixtures import page_spec_for_ref, render_page
    from tensorflow_ocr_ray.stages.ocr_stages import OcrSpanStage
    from tensorflow_ocr_ray.state.media import DirMediaStore
    import tempfile

    img = render_page(page_spec_for_ref("page-42-000000-0"))
    good = encode_tiff(img, bilevel=True, compression="g4")
    corrupt = good[:60] + b"\xff" * 40  # valid header, garbage G4 body

    with tempfile.TemporaryDirectory() as d:
        DirMediaStore.put(d, "ok", good)
        DirMediaStore.put(d, "bad", corrupt)
        batch = pa.table(
            {
                "doc_id": ["d", "d"],
                "kind": ["media", "media"],
                "text": ["", ""],
                "media_ref": ["ok", "bad"],
                "offset": [0, 1],
            }
        )
        lenient = OcrSpanStage(media_spec={"kind": "dir", "path": d},
                               on_media_error="empty")
        out = lenient(batch)
        texts = out.column("text").to_pylist()
        assert len(texts[0]) > 0 and texts[1] == ""

        strict = OcrSpanStage(media_spec={"kind": "dir", "path": d})
        with _pytest.raises(Exception):
            strict(batch)


def test_exploded_plan_handles_span_count_skew(ray_session):
    """One 120-span document among 1-span documents (pathological span
    skew): the explode→repartition→reassemble round trip preserves every
    document's exact span sequence."""
    import pyarrow as pa

    from tensorflow_ocr_ray.fixtures import SPAN_SCHEMA
    from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents

    def doc(doc_id, n):
        return {
            "doc_id": doc_id,
            "spans": [
                {"kind": "text", "text": f"{doc_id}:{i}",
                 "media_ref": "", "offset": i}
                for i in range(n)
            ],
        }

    rows = [doc("hot", 120)] + [doc(f"d{i:03d}", 1) for i in range(40)]
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema([("doc_id", pa.string()), ("spans", SPAN_SCHEMA)]),
    )
    import ray.data as rd

    out = ocr_documents(
        rd.from_arrow(table), mode="exploded", concurrency=2,
        batch_size=8, num_blocks=16,
    ).take_all()
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["offset"])
                      for s in r["spans"]]
        for r in out
    }
    for r in rows:
        want = [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_lance_seam_contract(ray_session, tmp_path):
    """The Lance reader/writer seam (BASELINE.json input_hint names
    Lance tables; the lib is not in this container): a .lance path must
    either work (lance present) or raise the documented RuntimeError —
    never fall through to the parquet path silently."""
    import pyarrow as pa
    import ray.data as rd

    from tensorflow_ocr_ray.pipelines.ocr_pipeline import (
        read_documents,
        write_documents,
    )

    try:
        import lance  # noqa: F401

        has_lance = True
    except ImportError:
        has_lance = False

    ds = rd.from_arrow(pa.table({"doc_id": ["a"], "spans": [[]]}))
    if has_lance:  # pragma: no cover - not in this container
        write_documents(ds, str(tmp_path / "t.lance"))
        assert read_documents(str(tmp_path / "t.lance")).count() == 1
    else:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="Lance"):
            read_documents(str(tmp_path / "t.lance"))
        with _pytest.raises(RuntimeError, match="Lance"):
            write_documents(ds, str(tmp_path / "t.lance"))
        # and no stray output dir was created by the failed writer
        assert not (tmp_path / "t.lance").exists()
