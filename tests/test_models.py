"""Learned scorers: dense MLP (K5/K8) and conv model (K7), numpy-native."""

import numpy as np
import pytest

from tensorflow_ocr_ray.config import FIXTURE_CONFIG
from tensorflow_ocr_ray.core.page import ocr_page_image
from tensorflow_ocr_ray.fixtures import PageSpec, expected_page_text, render_page
from tensorflow_ocr_ray.fonts import get_font_index
from tensorflow_ocr_ray.models.dense import DenseModel, train_on_font_index


@pytest.fixture(scope="module")
def dense_model():
    model, acc = train_on_font_index(get_font_index(), epochs=600)
    assert acc == 1.0  # converges on the 62-label font corpus
    return model


def test_dense_vocab_is_sorted_distinct(dense_model):
    # t5.py:30-31 — vocab = sorted distinct label strings
    assert dense_model.vocab == sorted(set(dense_model.vocab))


def test_dense_state_roundtrip(dense_model):
    idx = get_font_index()
    again = DenseModel.from_state(dense_model.to_state())
    assert again.predict(idx.tuples[:8]) == dense_model.predict(idx.tuples[:8])


def test_dense_classifier_in_assembly(dense_model):
    spec = PageSpec(lines=["Hello World 42"], indents=[0], para_breaks=[False])
    res = ocr_page_image(
        render_page(spec), FIXTURE_CONFIG, get_font_index(),
        classifier=dense_model.predict,
    )
    assert res.text == expected_page_text(spec)


def test_cnn_trains_and_scores_in_assembly():
    from tensorflow_ocr_ray.models.cnn import CnnModel, train_on_font_windows

    model, acc = train_on_font_windows(epochs=120)
    assert acc == 1.0
    again = CnnModel.from_state(model.to_state())
    spec = PageSpec(lines=["fox jumps"], indents=[0], para_breaks=[False])
    res = ocr_page_image(
        render_page(spec), FIXTURE_CONFIG, get_font_index(),
        classifier=again.predict, classifier_input="windows",
    )
    assert res.text == expected_page_text(spec)


def test_glyph_windows_shape_and_binary():
    from tensorflow_ocr_ray.core.raster import glyph_windows

    img = np.zeros((50, 50), dtype=np.uint8)
    img[10:30, 10:20] = 1
    wins = glyph_windows(img, [(10, 20, 10, 30), (0, 5, 0, 5)])
    assert wins.shape == (2, 24, 24)
    assert set(np.unique(wins)) <= {0.0, 1.0}
    assert wins[0].mean() == 1.0  # solid crop stays solid after resample
    assert wins[1].mean() == 0.0  # blank crop stays blank


def test_scorer_actors_never_train(ray_session):
    """A scorer spec without trained weights must be rejected — training
    happens once on the driver, never inside pool actors (VERDICT r1 #5)."""
    import pytest as _pytest

    from tensorflow_ocr_ray.stages.ocr_stages import OcrSpanStage

    for kind in ("dense", "cnn"):
        with _pytest.raises(ValueError, match="never train"):
            OcrSpanStage(scorer_spec={"kind": kind})


def test_scorer_broadcast_state_matches_inline_state(ray_session, dense_model):
    """state_ref (ray.put broadcast) and inline state yield the same
    classifier predictions."""
    import numpy as np
    import ray as _ray

    from tensorflow_ocr_ray.stages.ocr_stages import OcrSpanStage

    state = dense_model.to_state()
    a = OcrSpanStage(scorer_spec={"kind": "dense", "state": state})
    b = OcrSpanStage(
        scorer_spec={"kind": "dense", "state_ref": _ray.put(state)}
    )
    rng = np.random.Generator(np.random.PCG64(3))
    feats = rng.random((16, 27), dtype=np.float32)
    assert list(a.classifier(feats)) == list(b.classifier(feats))
