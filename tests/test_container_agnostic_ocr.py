"""Container-agnostic OCR: the SAME fixture page re-encoded into every
image container the engine decodes (gray PNG, LZW TIFF, G4 TIFF,
PackBits TIFF, GIF) must OCR to the identical text — the per-row
heterogeneous-corpus guarantee the media-span pipeline relies on
(decode_payload sniffs magic per payload; OCR never knows the
container)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tensorflow_ocr_ray.config import FIXTURE_CONFIG
from tensorflow_ocr_ray.core.page import ocr_payload
from tensorflow_ocr_ray.core.raster import decode_payload, encode_tiff
from tensorflow_ocr_ray.fixtures import payload_for_ref, truth_for_ref
from tensorflow_ocr_ray.fonts import get_font_index

REF = "page-42-000007-0"


def _bitonal() -> np.ndarray:
    return decode_payload(payload_for_ref(REF))


def _png_gray(img01: np.ndarray) -> bytes:
    """Gray-8 PNG, filter 0 rows (ink=1 -> black=0)."""
    gray = np.where(img01 == 1, 0, 255).astype(np.uint8)
    h, w = gray.shape
    raw = b"".join(b"\x00" + gray[r].tobytes() for r in range(h))

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _gif(img01: np.ndarray) -> bytes:
    from tensorflow_ocr_ray.core.gif import gif_lzw_encode

    h, w = img01.shape
    pal = bytes([0, 0, 0, 255, 255, 255])  # idx 0 black, 1 white
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80, 1, 0) + pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = gif_lzw_encode((img01 ^ 1).astype(np.uint8).tobytes(), 2)
    out += b"\x02"
    for j in range(0, len(lzw), 255):
        c = lzw[j:j + 255]
        out += bytes([len(c)]) + c
    out += b"\x00\x3b"
    return bytes(out)


@pytest.mark.parametrize("container", [
    "png", "tiff_lzw", "tiff_g4", "tiff_packbits", "gif",
])
def test_same_text_from_every_container(container):
    img = _bitonal()
    if container == "png":
        payload = _png_gray(img)
    elif container == "gif":
        payload = _gif(img)
    else:
        payload = encode_tiff(img, bilevel=True,
                              compression=container.split("_")[1])
    # the decode is container-faithful...
    np.testing.assert_array_equal(decode_payload(payload), img)
    # ...and the OCR result is container-blind
    got = ocr_payload(payload, FIXTURE_CONFIG, get_font_index()).text
    assert got == truth_for_ref(REF)
