"""Hypothesis property tests for the G4 / LZW codecs — broader input
space than the deterministic sweep in test_codecs.py."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tensorflow_ocr_ray.core.ccitt import decode_g4, encode_g4
from tensorflow_ocr_ray.core.tiff_lzw import lzw_decode, lzw_encode


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 120),
    density=st.floats(0.0, 1.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_g4_roundtrip_random_bitmaps(h, w, density, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    img = (rng.random((h, w)) < density).astype(np.uint8)
    assert (decode_g4(encode_g4(img), w, h) == img).all()


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=5000))
def test_lzw_roundtrip_arbitrary_bytes(data):
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 255),
    st.integers(1, 40000),
)
def test_lzw_roundtrip_long_constant_runs(byte, n):
    data = bytes([byte]) * n
    assert lzw_decode(lzw_encode(data)) == data
