"""CCITT Group 3 (T.4) decode: 1-D Modified Huffman, EOL framing,
byte-aligned rows, and K>0 mixed 1-D/2-D streams.

The encoders here are written INDEPENDENTLY in the test from the T.4
run tables and coding rules (the repo's verification style for codecs)
and exercised against `ccitt.decode_g3`, plus the TIFF compression-2/3
and PDF CCITTFaxDecode K>=0 integration paths.
"""

import sys
import zlib  # noqa: F401  (parity with the other codec test imports)
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from tensorflow_ocr_ray.core.ccitt import (
    _BLACK_MAKEUP,
    _BLACK_TERM,
    _EXT_MAKEUP,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    decode_g3,
)


# ---------------------------------------------------------------------------
# independent T.4 encoders (bit-string based; slow and obvious on purpose)


def _run_bits(length: int, black: bool) -> str:
    term = _BLACK_TERM if black else _WHITE_TERM
    makeup = _BLACK_MAKEUP if black else _WHITE_MAKEUP
    bits = ""
    while length > 63:
        m = min(2560, (length // 64) * 64)
        if length - m > 63:
            m = 2560
        bits += makeup[m] if m <= 1728 else _EXT_MAKEUP[m]
        length -= m
    return bits + term[length]


def _row_runs(row: np.ndarray) -> list[tuple[int, bool]]:
    """(run_length, is_black) pairs, white-first (possibly 0-length)."""
    runs = []
    color = 0
    pos = 0
    w = len(row)
    while pos < w:
        end = pos
        while end < w and row[end] == color:
            end += 1
        runs.append((end - pos, bool(color)))
        color ^= 1
        pos = end
    if not runs or runs[0][1]:
        runs.insert(0, (0, False))
    return runs


def _mh_row_bits(row: np.ndarray) -> str:
    return "".join(_run_bits(n, b) for n, b in _row_runs(row))


def _changes(row: np.ndarray) -> list[int]:
    chg = []
    prev = 0
    for x, v in enumerate(row):
        if v != prev:
            chg.append(x)
            prev = v
    return chg


def _2d_row_bits(row: np.ndarray, ref_row: np.ndarray) -> str:
    """T.4 2-D READ coding of one row against its reference row."""
    width = len(row)
    cur = _changes(row)
    ref = _changes(ref_row)
    v_codes = {0: "1", 1: "011", 2: "000011", 3: "0000011",
               -1: "010", -2: "000010", -3: "0000010"}
    bits = ""
    a0 = -1
    color = 0
    while a0 < width:
        b1 = width
        for c in ref:
            if c > a0:
                # changes alternate W->B (even idx) / B->W (odd);
                # b1 must change to the opposite of the current color
                i = ref.index(c)
                while i < len(ref) and (
                        ref[i] <= a0 or (i & 1) != color):
                    i += 1
                b1 = ref[i] if i < len(ref) else width
                break
        b2 = width
        if b1 < width:
            i = ref.index(b1)
            b2 = ref[i + 1] if i + 1 < len(ref) else width
        a1 = width
        for c in cur:
            if c > a0:
                a1 = c
                break
        if b2 < a1:
            bits += "0001"  # pass
            a0 = b2
            continue
        if abs(a1 - b1) <= 3:
            bits += v_codes[a1 - b1]
            a0 = a1
            color ^= 1
            continue
        a2 = width
        for c in cur:
            if c > a1:
                a2 = c
                break
        start = 0 if a0 < 0 else a0
        bits += "001" + _run_bits(a1 - start, bool(color)) \
            + _run_bits(a2 - a1, not color)
        a0 = a2
    return bits


def _pack(bits: str) -> bytes:
    pad = (-len(bits)) % 8
    bits += "0" * pad
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


EOL = "000000000001"


def encode_g3_1d(img: np.ndarray, eol: bool = False,
                 byte_align: bool = False, fill: int = 0) -> bytes:
    bits = ""
    for row in img:
        if byte_align and len(bits) % 8:
            bits += "0" * ((-len(bits)) % 8)
        if eol:
            bits += "0" * fill + EOL
        bits += _mh_row_bits(row)
    return _pack(bits)


def encode_g3_2d(img: np.ndarray, tags: list[int]) -> bytes:
    """K>0 stream: per-row EOL + tag bit (1=1-D, 0=2-D per `tags`)."""
    bits = ""
    ref = np.zeros(img.shape[1], dtype=np.uint8)
    for y, row in enumerate(img):
        bits += EOL + str(tags[y])
        if tags[y]:
            bits += _mh_row_bits(row)
        else:
            bits += _2d_row_bits(row, ref)
        ref = row
    return _pack(bits)


def _rand(h, w, density, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    return (rng.random((h, w)) < density).astype(np.uint8)


# ---------------------------------------------------------------------------
# decode_g3 unit tests


@pytest.mark.parametrize("seed,density", [(1, 0.1), (2, 0.5), (3, 0.9),
                                          (4, 0.0), (5, 1.0)])
def test_mh_roundtrip_contiguous(seed, density):
    img = _rand(12, 70, density, seed)
    assert (decode_g3(encode_g3_1d(img), 70, 12) == img).all()


def test_mh_with_eols_and_fill():
    img = _rand(9, 85, 0.4, 11)
    data = encode_g3_1d(img, eol=True, fill=5)
    assert (decode_g3(data, 85, 9) == img).all()


def test_mh_byte_aligned_rows():
    img = _rand(7, 61, 0.35, 12)
    data = encode_g3_1d(img, byte_align=True)
    assert (decode_g3(data, 61, 7, byte_align=True) == img).all()


def test_k_positive_mixed_rows():
    img = _rand(10, 64, 0.3, 13)
    tags = [1, 0, 0, 1, 0, 0, 0, 1, 0, 0]  # first row 1-D, mixed after
    data = encode_g3_2d(img, tags)
    assert (decode_g3(data, 64, 10, two_d=True) == img).all()


def test_k_positive_all_2d_after_first():
    img = _rand(16, 48, 0.5, 14)
    tags = [1] + [0] * 15
    data = encode_g3_2d(img, tags)
    assert (decode_g3(data, 48, 16, two_d=True) == img).all()


def test_long_runs_makeup_chain():
    img = np.zeros((2, 2900), dtype=np.uint8)
    img[0, 2800:] = 1     # white run 2800 (2560 + 176 + 40-ish) then black
    img[1, :5] = 1        # black first (zero-length white lead-in)
    assert (decode_g3(encode_g3_1d(img), 2900, 2) == img).all()


def test_corrupt_row_raises():
    img = _rand(3, 40, 0.5, 15)
    data = bytearray(encode_g3_1d(img))
    data[0] ^= 0xFF
    with pytest.raises(ValueError):
        decode_g3(bytes(data), 40, 3)


# ---------------------------------------------------------------------------
# TIFF compression 2 / 3 integration


def _tiff_ccitt(img: np.ndarray, compression: int, body: bytes,
                t4options: int | None = None) -> bytes:
    import struct

    h, w = img.shape
    tags = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
            (259, 3, 1, compression), (262, 3, 1, 0)]
    if t4options is not None:
        tags.append((293, 4, 1, t4options))
    header = 8
    ifd_size = 2 + (len(tags) + 4) * 12 + 4
    data_off = header + ifd_size
    tags += [(273, 4, 1, data_off), (277, 3, 1, 1), (278, 3, 1, h),
             (279, 4, 1, len(body))]
    tags.sort()
    out = struct.pack("<4sI", b"II*\x00", header)
    out += struct.pack("<H", len(tags))
    for tag, typ, count, value in tags:
        out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0) + body
    return out


def test_tiff_compression2_mh():
    from tensorflow_ocr_ray.core.raster import decode_tiff

    img = _rand(11, 52, 0.4, 21)
    payload = _tiff_ccitt(img, 2, encode_g3_1d(img, byte_align=True))
    got, bits = decode_tiff(payload)
    assert bits == 1
    np.testing.assert_array_equal(got, img)  # photometric 0: 1 = ink


def test_tiff_compression3_1d_and_2d():
    from tensorflow_ocr_ray.core.raster import decode_tiff

    img = _rand(9, 44, 0.45, 22)
    payload = _tiff_ccitt(img, 3, encode_g3_1d(img, eol=True),
                          t4options=0)
    np.testing.assert_array_equal(decode_tiff(payload)[0], img)

    tags = [1] + [0] * 8
    payload = _tiff_ccitt(img, 3, encode_g3_2d(img, tags), t4options=1)
    np.testing.assert_array_equal(decode_tiff(payload)[0], img)


# ---------------------------------------------------------------------------
# PDF CCITTFaxDecode K>=0 integration


def test_pdf_ccitt_k0_and_kpos():
    from test_pdfimage import one_image_pdf, stream_obj

    from tensorflow_ocr_ray.core.pdfimage import pdf_page_images

    img = _rand(14, 56, 0.35, 23)
    body = stream_obj(
        b"/Subtype /Image /Width 56 /Height 14 /BitsPerComponent 1 "
        b"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
        b"/DecodeParms << /K 0 /Columns 56 /Rows 14 >>",
        encode_g3_1d(img))
    got = pdf_page_images(one_image_pdf(body))[0]
    np.testing.assert_array_equal(got, (1 - img) * np.uint8(255))

    tags = [1] + [0] * 13
    body = stream_obj(
        b"/Subtype /Image /Width 56 /Height 14 /BitsPerComponent 1 "
        b"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
        b"/DecodeParms << /K 4 /Columns 56 /Rows 14 >>",
        encode_g3_2d(img, tags))
    got = pdf_page_images(one_image_pdf(body))[0]
    np.testing.assert_array_equal(got, (1 - img) * np.uint8(255))
