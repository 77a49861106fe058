"""Training/template sidecars (S6/S7) and their glyph joins (J2/J3)."""

from tensorflow_ocr_ray.config import FIXTURE_CONFIG
from tensorflow_ocr_ray.core.page import ocr_page_image
from tensorflow_ocr_ray.fixtures import PageSpec, render_page
from tensorflow_ocr_ray.fonts import get_font_index
from tensorflow_ocr_ray.sources.training import (
    apply_template,
    apply_training,
    parquet_to_records,
    read_training_file,
    records_to_parquet,
    training_records,
    write_training_file,
)


def _page_glyphs():
    # one line whose glyph line-height contexts all exist in the font
    # index (writeTraining's <=0.001 gate keeps only EXACT matches;
    # glyphs in unusual line-height contexts are correctly excluded)
    spec = PageSpec(lines=["abc"], indents=[0], para_breaks=[False])
    idx = get_font_index()
    res = ocr_page_image(render_page(spec), FIXTURE_CONFIG, idx)
    return res.glyphs, idx


def test_training_records_select_exact_matches():
    glyphs, idx = _page_glyphs()
    recs = training_records(glyphs, idx, tol=0.001)
    # every fixture glyph matches its font entry exactly -> all selected
    assert len(recs) == len(glyphs)
    assert [r[4] for r in recs] == [g.label for g in glyphs]


def test_training_file_roundtrip(tmp_path):
    glyphs, idx = _page_glyphs()
    recs = training_records(glyphs, idx)
    path = str(tmp_path / "page.training")
    write_training_file(path, recs)
    back = read_training_file(path)
    assert back == recs
    with open(path, encoding="utf-8") as f:
        first = f.readline().split()
    assert len(first) == 5  # "left right top bottom label"


def test_apply_training_builds_fresh_index():
    glyphs, idx = _page_glyphs()
    recs = training_records(glyphs, idx)
    new_index = apply_training(recs, glyphs)
    assert 0 < len(new_index) <= len(recs)  # exact-dup tuples suppressed
    # the rebuilt index classifies the same glyphs identically
    import numpy as np

    feats = np.stack([g.features for g in glyphs])
    values, _ = new_index.ocr_values(feats, min_match=0.9)
    assert values == [g.label for g in glyphs]


def test_apply_training_ignores_unmatched_corners():
    glyphs, idx = _page_glyphs()
    recs = [(99999, 100000, 99999, 100000, "Q")]
    assert len(apply_training(recs, glyphs)) == 0


def test_apply_template_augments_existing_index():
    glyphs, idx = _page_glyphs()
    g = glyphs[0]
    recs = [(g.left, g.right, g.top, g.bottom, "CUSTOM")]
    bigger = apply_template(recs, glyphs, idx)
    assert len(bigger) == len(idx) + 1
    assert "CUSTOM" in bigger.labels


def test_records_parquet_roundtrip(tmp_path):
    glyphs, idx = _page_glyphs()
    recs = training_records(glyphs, idx)
    path = str(tmp_path / "recs.parquet")
    records_to_parquet(path, recs)
    assert parquet_to_records(path) == recs


def test_glyph_stream_bbox_feeds_training_records(ray_session):
    """The -T glyph stream carries bboxes so training-record generation
    can run distributed over the Dataset instead of per-page objects."""
    import pyarrow as pa
    import ray.data as rd

    from tensorflow_ocr_ray.fixtures import generate_documents
    from tensorflow_ocr_ray.pipelines.ocr_pipeline import explode_documents
    from tensorflow_ocr_ray.stages.ocr_stages import GlyphDumpStage

    docs = generate_documents(4, seed=5)
    spans = rd.from_arrow(explode_documents(docs))
    glyphs = spans.map_batches(
        GlyphDumpStage, batch_format="pyarrow", batch_size=8, concurrency=1
    )
    t = pa.Table.from_pandas(glyphs.to_pandas())
    assert {"left", "right", "top", "bottom"} <= set(t.column_names)
    lefts = t.column("left").to_pylist()
    rights = t.column("right").to_pylist()
    assert all(r > l >= 0 for l, r in zip(lefts, rights))
