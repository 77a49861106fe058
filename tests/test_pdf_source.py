"""PDF ingestion seam (S11): the conversion itself is external
(Ghostscript; absent here), but the Ray-side fan-out, media-store
layout and span construction are real — tested with a fake converter."""

from __future__ import annotations

import numpy as np
import pytest


def test_gs_seam_raises_with_command(tmp_path):
    """Scanned PDFs now decode in-process (core/pdfimage, see
    test_pdfimage.py); the Ghostscript seam remains only for
    vector-content PDFs — it must still surface the exact command."""
    from tensorflow_ocr_ray.sources.pdf import (
        ghostscript_available,
        pdf_to_tiff_pages,
    )

    if ghostscript_available():  # pragma: no cover - not in this container
        pytest.skip("gs present; seam exercised for real elsewhere")
    path = tmp_path / "vector.pdf"
    path.write_bytes(
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"
        b"trailer\n<< /Size 4 /Root 1 0 R >>\n"
    )
    with pytest.raises(NotImplementedError, match="tiffgray"):
        pdf_to_tiff_pages(str(path))


def test_pdf_documents_layout_and_ocr(ray_session, tmp_path):
    """Fake converter → documents rows → the REAL OCR pipeline."""
    from tensorflow_ocr_ray.core.raster import encode_tiff
    from tensorflow_ocr_ray.fixtures import page_spec_for_ref, render_page
    from tensorflow_ocr_ray.pipelines.ocr_pipeline import ocr_documents
    from tensorflow_ocr_ray.sources.pdf import pdf_documents

    def fake_converter(path):
        # 2 deterministic rendered pages per "pdf"
        return [
            encode_tiff(
                render_page(page_spec_for_ref(f"page-42-{i:06d}-0")),
                bilevel=True, compression="g4",
            )
            for i in range(2)
        ]

    pdfs = [str(tmp_path / "book1.pdf"), str(tmp_path / "book2.pdf")]
    media_root = str(tmp_path / "media")
    ds = pdf_documents(pdfs, media_root, converter=fake_converter)
    rows = ds.take_all()
    assert sorted(r["doc_id"] for r in rows) == ["book1", "book2"]
    assert all(
        [s["media_ref"] for s in r["spans"]]
        == [f"{r['doc_id']}-p0", f"{r['doc_id']}-p1"]
        for r in rows
    )

    out = ocr_documents(
        pdf_documents(pdfs, media_root, converter=fake_converter),
        mode="fused", concurrency=2, batch_size=2,
        media_spec={"kind": "dir", "path": media_root},
    )
    got = out.take_all()
    assert len(got) == 2
    for row in got:
        for s in row["spans"]:
            assert s["kind"] == "media" and len(s["text"]) > 0
