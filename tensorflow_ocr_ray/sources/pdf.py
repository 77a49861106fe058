"""PDF → page-TIFF ingestion adapter (reference S11).

The reference converts PDFs outside the engine with Ghostscript +
tiffsplit / pdftk (``main/Makefile:80-93``, ``main/nybc2tiff.pl:1-31``):

    gs -sDEVICE=tiffgray -r400x400 -o out.tif in.pdf ; tiffsplit out.tif

This module is the engine-side seam for that step: a Ray Data source
that fans PDF files out to per-document conversion tasks and yields
``(doc_id, spans)`` rows whose media payloads are the rasterized pages.
Ghostscript is an EXTERNAL tool — when it is absent (this container has
no ``gs``), conversion raises ``NotImplementedError`` with the exact
command the deployment must provide; everything around the seam (task
fan-out, span construction, store layout) is real and tested with a
fake converter.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile


def ghostscript_available() -> bool:
    return shutil.which("gs") is not None


def pdf_to_tiff_pages(pdf_path: str, dpi: int = 400) -> list[bytes]:
    """One PDF → list of single-page gray TIFF payloads (the reference's
    ``gs -sDEVICE=tiffgray -r400x400`` + ``tiffsplit`` pipeline,
    ``main/Makefile:80-93``).

    Scanned PDFs — the reference's actual inputs — are decoded entirely
    in-process by ``core/pdfimage`` (CCITT G4 / DCT / Flate page-image
    XObjects through the repo's own spec codecs).  Vector-content PDFs
    (no raster page image) rasterize in-process too when they stay in
    ``core/pdfvector``'s subset — text via Type3 bitmap fonts, rect
    fills, image XObjects/inline images; only outline-font or
    curve-path content still falls through to the Ghostscript seam.
    """
    from tensorflow_ocr_ray.core.pdfimage import pdf_page_images
    from tensorflow_ocr_ray.core.pdfvector import (
        UnsupportedVectorPdf,
        rasterize_vector_pages,
    )
    from tensorflow_ocr_ray.core.raster import encode_tiff

    with open(pdf_path, "rb") as f:
        payload = f.read()
    images = pdf_page_images(payload)  # [] for vector-only PDFs
    if images:
        return [encode_tiff(img, bilevel=False) for img in images]
    # vector content: the in-process subset rasterizer (text via Type3
    # bitmap fonts, rect fills, image XObjects — core/pdfvector) covers
    # the common text-PDF case; outline fonts / curve paths fall
    # through to the Ghostscript seam with the reason.
    try:
        pages_gray = rasterize_vector_pages(payload, dpi=dpi)
    except UnsupportedVectorPdf as exc:
        reason = str(exc)
        pages_gray = None
    if pages_gray is not None:
        return [encode_tiff(img, bilevel=False) for img in pages_gray]
    if not ghostscript_available():
        raise NotImplementedError(
            f"vector PDF outside the in-process subset ({reason}); "
            "rasterizing needs Ghostscript on PATH: "
            f"`gs -sDEVICE=tiffgray -r{dpi}x{dpi} -o page%03d.tif "
            f"{pdf_path}` (main/Makefile:80-93). This environment has no "
            "gs; deployments mount one or pre-convert."
        )
    with tempfile.TemporaryDirectory() as tmp:
        out_pattern = os.path.join(tmp, "page%03d.tif")
        subprocess.run(
            ["gs", "-dBATCH", "-dNOPAUSE", "-sDEVICE=tiffgray",
             f"-r{dpi}x{dpi}", f"-sOutputFile={out_pattern}", pdf_path],
            check=True, capture_output=True,
        )
        pages = []
        for name in sorted(os.listdir(tmp)):
            if name.endswith(".tif"):
                with open(os.path.join(tmp, name), "rb") as f:
                    pages.append(f.read())
        return pages


def pdf_documents(
    pdf_paths: list[str],
    media_root: str,
    converter=None,
) -> "object":
    """Ray Dataset of interleaved-document rows from PDFs.

    Each PDF becomes one document: page payloads land in a
    ``DirMediaStore`` under ``media_root`` keyed ``<stem>-p<idx>`` and the
    row's spans reference them in page order — ready for
    ``ocr_documents``.  ``converter`` defaults to :func:`pdf_to_tiff_pages`
    (Ghostscript); tests inject a deterministic fake.

    Conversion runs INSIDE the map tasks (one per PDF), so a million PDFs
    fan out across the cluster; only (path → spans) metadata flows
    through the task graph.
    """
    import ray.data as rd

    conv = converter or pdf_to_tiff_pages

    def convert_batch(batch):
        import pyarrow as pa

        from tensorflow_ocr_ray.state.media import DirMediaStore

        doc_ids, spans_col = [], []
        for path in batch.column("path").to_pylist():
            stem = os.path.splitext(os.path.basename(path))[0]
            pages = conv(path)
            spans = []
            for i, payload in enumerate(pages):
                ref = f"{stem}-p{i}"
                DirMediaStore.put(media_root, ref, payload)
                spans.append(
                    {"kind": "media", "text": "", "media_ref": ref,
                     "offset": i}
                )
            doc_ids.append(stem)
            spans_col.append(spans)
        from tensorflow_ocr_ray.fixtures import SPAN_SCHEMA

        return pa.table(
            {"doc_id": pa.array(doc_ids, type=pa.string()),
             "spans": pa.array(spans_col, type=SPAN_SCHEMA)}
        )

    import pyarrow as pa

    src = rd.from_arrow(pa.table({"path": pa.array(pdf_paths)}))
    return src.map_batches(convert_batch, batch_format="pyarrow",
                           batch_size=1)
