"""PNG decoder vs spec-crafted fixtures.

Every fixture is assembled chunk-by-chunk in this file from RFC 2083:
the filtered scanline bytes for Sub/Up/Average/Paeth are computed by an
independent scalar reference ENCODER written here from the same spec
(the filter recurrences inverted), so the decoder's defilter path is
checked against hand-derivable bytes, never against itself."""

import struct
import zlib

import numpy as np
import pytest

from tensorflow_ocr_ray.core.png import decode_png_gray


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + cid + body
        + struct.pack(">I", zlib.crc32(cid + body))
    )


def _png(w, h, depth, ctype, raw, plte=None):
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                       ctype, 0, 0, 0))
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return out


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_rows(img: np.ndarray, ftypes: list[int],
                 bpp: int = 1) -> bytes:
    """Independent scalar ENCODER: apply the requested filter type per
    row per the spec recurrences (img is (h, stride) uint8)."""
    h, stride = img.shape
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        prev = img[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        for x in range(stride):
            cur = int(img[y, x])
            left = int(img[y, x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                f = cur
            elif ft == 1:
                f = cur - left
            elif ft == 2:
                f = cur - up
            elif ft == 3:
                f = cur - ((left + up) >> 1)
            elif ft == 4:
                f = cur - _paeth_ref(left, up, ul)
            out.append(f & 0xFF)
    return bytes(out)


def test_gray8_every_filter_type():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (10, 7), dtype=np.uint8)
    raw = _filter_rows(img, [0, 1, 2, 3, 4])
    got = decode_png_gray(_png(7, 10, 8, 0, raw))
    assert (got == img).all()


def test_rgb8_luma():
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)
    img[1, 2] = (0, 255, 0)
    flat = img.reshape(2, 9)
    raw = _filter_rows(flat, [0], bpp=3)
    got = decode_png_gray(_png(3, 2, 8, 2, raw))
    assert got[0, 0] == (77 * 255) >> 8
    assert got[1, 2] == (150 * 255) >> 8
    assert got[0, 1] == 0


def test_palette_indexed():
    plte = bytes((0, 0, 0)) + bytes((255, 255, 255)) + bytes((0, 0, 255))
    img = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    raw = _filter_rows(img, [0])
    got = decode_png_gray(_png(2, 2, 8, 3, raw, plte=plte))
    assert got[0, 0] == 0
    assert got[0, 1] == 255
    # index 2 is pure blue -> 601 luma of (0,0,255)
    assert got[1, 0] == (29 * 255) >> 8


def test_gray1_bit_packed():
    # 1-bit gray, 10px wide (stride 2, MSB first): alternating pattern
    img_bits = np.tile(np.array([1, 0], dtype=np.uint8), 5)
    packed = np.packbits(img_bits).reshape(1, 2)
    raw = _filter_rows(packed, [0])
    got = decode_png_gray(_png(10, 1, 1, 0, raw))
    assert got.shape == (1, 10)
    assert got[0].tolist() == [255, 0] * 5  # scaled to full range


def test_gray16_high_byte():
    vals = np.array([[0x1234, 0xFF00, 0x00FF]], dtype=">u2")
    raw = _filter_rows(
        np.frombuffer(vals.tobytes(), dtype=np.uint8).reshape(1, 6),
        [0], bpp=2,
    )
    got = decode_png_gray(_png(3, 1, 16, 0, raw))
    assert got[0].tolist() == [0x12, 0xFF, 0x00]


def test_rgba_alpha_ignored():
    px = np.array([[10, 20, 30, 0, 200, 200, 200, 255]],
                  dtype=np.uint8)  # 2 RGBA pixels
    raw = _filter_rows(px, [0], bpp=4)
    got = decode_png_gray(_png(2, 1, 8, 6, raw))
    want0 = (77 * 10 + 150 * 20 + 29 * 30) >> 8
    assert got[0, 0] == want0
    assert got[0, 1] == (77 * 200 + 150 * 200 + 29 * 200) >> 8


def test_interlaced_raises():
    body = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
    payload = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", body)
               + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png_gray(payload)


def test_not_png_raises():
    with pytest.raises(ValueError):
        decode_png_gray(b"\x00" * 32)


def test_png_through_image_stage(ray_session):
    import pyarrow as pa

    from tensorflow_ocr_ray.stages.multimodal import ImageStatsStage

    img = np.full((12, 12), 255, dtype=np.uint8)
    img[3:6, 3:9] = 0
    raw = _filter_rows(img, [0, 2])
    batch = pa.table(
        {"media_ref": pa.array(["p1"]),
         "image": pa.array([_png(12, 12, 8, 0, raw)], type=pa.binary())}
    )
    out = ImageStatsStage()(batch)
    assert out.column("height").to_pylist() == [12]
    ink = out.column("ink_ratio").to_pylist()[0]
    assert abs(ink - (3 * 6) / 144) < 1e-9  # PNG is lossless
