"""tensorflow_ocr_ray — a Ray-Data-native media-span OCR extraction engine.

A brand-new implementation (NOT a port) of the recognition semantics of the
reference engine ``1930s/tensorflow-ocr`` (read-only at /root/reference),
re-architected as ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches applied to tables of interleaved text+media documents
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.

Layout
------
- ``core/``      pure-numpy single-page OCR algorithms (binarize, shear,
                 segmentation, 27-dim features, exact NN, line/text assembly).
                 No Ray imports; unit-testable; shared by the Ray stages and
                 by the single-process oracle used in tests.
- ``stages/``    Ray Data actor-pool stages (decode+segment+classify, scorers).
- ``sources/``   readers/writers: documents table, font ``.data`` format,
                 training/template sidecars.
- ``functions/`` per-span text functions: postprocess regex chains, text
                 analysis (langid, quality, tokens, fingerprints).
- ``pipelines/`` end-to-end Dataset pipelines: the flagship OCR extraction
                 pipeline (fused + exploded modes), checkpoint/resume runner,
                 dedup, similarity search, relational query set.
- ``state/``     broadcast artifacts: media store, font index handles.
- ``models/``    numpy dense classifier (reference t5.py semantics) and a
                 LeNet-style CNN forward path over glyph windows.

Never calls ``ray.init``/``ray.shutdown`` at import or inside library code —
sessions are owned by the driver, bench.py, and the test fixture.
"""

from tensorflow_ocr_ray.config import OcrConfig, OCRFAILS

__all__ = ["OcrConfig", "OCRFAILS"]
__version__ = "0.1.0"
