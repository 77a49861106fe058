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


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 100),
    density=st.floats(0.0, 1.0),
    seed=st.integers(0, 2**31 - 1),
    framing=st.sampled_from(["plain", "eol", "align"]),
)
def test_g3_1d_roundtrip_random_bitmaps(h, w, density, seed, framing):
    from test_g3 import encode_g3_1d

    from tensorflow_ocr_ray.core.ccitt import decode_g3

    rng = np.random.Generator(np.random.PCG64(seed))
    img = (rng.random((h, w)) < density).astype(np.uint8)
    if framing == "plain":
        data, kw = encode_g3_1d(img), {}
    elif framing == "eol":
        data, kw = encode_g3_1d(img, eol=True, fill=3), {}
    else:
        data, kw = encode_g3_1d(img, byte_align=True), {"byte_align": True}
    assert (decode_g3(data, w, h, **kw) == img).all()


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(2, 14),
    w=st.integers(2, 80),
    density=st.floats(0.0, 1.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_g3_2d_roundtrip_random_bitmaps(h, w, density, seed):
    from test_g3 import encode_g3_2d

    from tensorflow_ocr_ray.core.ccitt import decode_g3

    rng = np.random.Generator(np.random.PCG64(seed))
    img = (rng.random((h, w)) < density).astype(np.uint8)
    tags = [1] + [int(rng.integers(0, 2)) for _ in range(h - 1)]
    data = encode_g3_2d(img, tags)
    assert (decode_g3(data, w, h, two_d=True) == img).all()
