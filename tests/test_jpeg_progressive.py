"""Progressive JPEG (SOF2) decode: spectral selection, successive
approximation (DC + AC refinement scans), EOB runs, restarts.

The encoder here is written INDEPENDENTLY from T.81 Annex G in the
test (the repo's codec verification style, mirroring libjpeg's
encode_mcu_AC_refine buffering discipline).  With an all-ones quant
table the progressive stream carries the exact FDCT coefficients, so
decode must reproduce the IDCT of those integer coefficients
bit-for-bit — and be near the original pixels.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from test_jpeg import _category, _fdct2, _fixed_table

from tensorflow_ocr_ray.core.jpeg import ZIGZAG, _idct2, decode_jpeg_gray


def _blocks_of(img: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) int zigzag-order coefficient blocks (quant = 1)."""
    h, w = img.shape
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    padded = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
    padded[:h, :w] = img.astype(np.float64)
    padded[h:, :w] = padded[h - 1:h, :w]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1:w]
    out = np.zeros((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            blk = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = np.round(_fdct2(blk)).astype(np.int64).reshape(64)
            out[by, bx] = coef[ZIGZAG]
    return out


class _W:
    """Bit writer with 0xFF stuffing, RSTn, and a pluggable symbol
    table (set after the symbol-collection pass)."""

    def __init__(self, code_map=None):
        self.code_map = code_map
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def sym(self, s):
        code, ln = self.code_map[s]
        self.bits(code, ln)

    def pad(self):
        while self.n:
            self.bits(1, 1)

    def rst(self, n):
        self.pad()
        self.out += bytes([0xFF, 0xD0 + n])


def _scan_stream(blocks, ss, se, ah, al, restart, writer, symbols):
    """One pass over the blocks for one scan: emits into ``writer`` if
    it has a code_map, always records needed symbols in ``symbols``."""
    emit = writer.code_map is not None
    nby, nbx, _ = blocks.shape
    pred = 0
    eob_pending = 0
    eob_corr: list[list[int]] = []

    def flush_eob():
        nonlocal eob_pending
        if not eob_pending:
            return
        r = eob_pending.bit_length() - 1
        symbols.add(r << 4)
        if emit:
            writer.sym(r << 4)
            if r:
                writer.bits(eob_pending - (1 << r), r)
            for corr in eob_corr:
                for b in corr:
                    writer.bits(b, 1)
        eob_pending = 0
        eob_corr.clear()

    count = 0
    rst_n = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart and count and count % restart == 0:
                flush_eob()
                if emit:
                    writer.rst(rst_n)
                rst_n = (rst_n + 1) % 8
                pred = 0
            coef = blocks[by, bx]
            count += 1
            if ss == 0:
                if ah == 0:
                    v = int(coef[0]) >> al
                    diff = v - pred
                    pred = v
                    t = _category(diff)
                    symbols.add(t)
                    if emit:
                        writer.sym(t)
                        if t:
                            writer.bits(
                                diff if diff >= 0
                                else diff + (1 << t) - 1, t)
                else:
                    if emit:
                        writer.bits((int(coef[0]) >> al) & 1, 1)
                continue
            band = [int(coef[k]) for k in range(ss, se + 1)]
            if ah == 0:
                vals = [v >> al if v >= 0 else -((-v) >> al)
                        for v in band]
                nz = [i for i, v in enumerate(vals) if v]
                if not nz:
                    eob_pending += 1
                    eob_corr.append([])
                    if eob_pending == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                prev = -1
                for i in nz:
                    r = i - prev - 1
                    while r > 15:
                        symbols.add(0xF0)
                        if emit:
                            writer.sym(0xF0)
                        r -= 16
                    v = vals[i]
                    s = _category(v)
                    symbols.add((r << 4) | s)
                    if emit:
                        writer.sym((r << 4) | s)
                        writer.bits(
                            v if v >= 0 else v + (1 << s) - 1, s)
                    prev = i
                if nz[-1] < len(band) - 1:
                    eob_pending += 1
                    eob_corr.append([])
                continue
            # AC refinement — libjpeg encode_mcu_AC_refine discipline:
            # t == 0 zero history+bit, t == 1 newly significant,
            # t > 1 already significant (correction bit t & 1).
            # ZRLs trigger at ANY nonzero once r > 15 while still
            # before the last newly-significant coefficient (beyond it
            # they fold into the EOB), and each ZRL flushes only the
            # corrections buffered SO FAR — this partitioning is what
            # keeps the decoder's bit reads in sync.
            t = [abs(v) >> al for v in band]
            newly = [k for k in range(len(band)) if t[k] == 1]
            eobpos = (newly[-1] + 1) if newly else 0
            r = 0
            br: list[int] = []
            for k in range(len(band)):
                tk = t[k]
                if tk == 0:
                    r += 1
                    continue
                while r > 15 and k < eobpos:
                    flush_eob()
                    symbols.add(0xF0)
                    if emit:
                        writer.sym(0xF0)
                        for b in br:
                            writer.bits(b, 1)
                    br = []
                    r -= 16
                if tk > 1:
                    br.append(tk & 1)
                    continue
                flush_eob()
                symbols.add((r << 4) | 1)
                if emit:
                    writer.sym((r << 4) | 1)
                    writer.bits(1 if band[k] >= 0 else 0, 1)
                    for b in br:
                        writer.bits(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eob_pending += 1
                eob_corr.append(br)
                if eob_pending == 0x7FFF:
                    flush_eob()
    flush_eob()
    writer.pad()


def _encode_progressive(img: np.ndarray, scans, restart: int = 0) -> bytes:
    """Single-component (gray) progressive stream; ``scans`` is the
    script of (ss, se, ah, al), quant all-ones."""
    blocks = _blocks_of(img)
    h, w = img.shape
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00"
    out += bytes([1] * 64)
    out += b"\xff\xc2" + (2 + 6 + 3).to_bytes(2, "big")
    out += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += bytes([1, 1, 0x11, 0])
    if restart:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart.to_bytes(2, "big")
    for ss, se, ah, al in scans:
        symbols: set[int] = set()
        _scan_stream(blocks, ss, se, ah, al, restart, _W(None), symbols)
        dc_refine = ss == 0 and ah > 0
        code_map = {}
        if not dc_refine:  # DC-refinement scans are raw bits, no table
            if not symbols:
                symbols = {0}
            bits, values, code_map = _fixed_table(sorted(symbols))
            tc = 0 if ss == 0 else 1
            out += b"\xff\xc4" + (2 + 1 + 16 + len(values)).to_bytes(
                2, "big")
            out += bytes([tc << 4]) + bytes(bits) + values
        w2 = _W(code_map)  # non-None code_map → emit mode
        symbols2: set[int] = set()
        _scan_stream(blocks, ss, se, ah, al, restart, w2, symbols2)
        out += b"\xff\xda" + (2 + 1 + 2 + 3).to_bytes(2, "big")
        out += bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        out += w2.out
    out += b"\xff\xd9"
    return bytes(out)


def _idct_reference(img):
    """Pixels a lossless-quant progressive decode must reproduce."""
    blocks = _blocks_of(img)
    nby, nbx, _ = blocks.shape
    out = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
    for by in range(nby):
        for bx in range(nbx):
            blk = np.zeros(64, dtype=np.int64)
            blk[ZIGZAG] = blocks[by, bx]
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                _idct2(blk.reshape(8, 8)) + 128.0)
    h, w = img.shape
    return np.clip(np.round(out), 0, 255).astype(np.uint8)[:h, :w]


SCRIPTS = {
    "spectral_only": [(0, 0, 0, 0), (1, 5, 0, 0), (6, 63, 0, 0)],
    "dc_approx": [(0, 0, 0, 1), (1, 63, 0, 0), (0, 0, 1, 0)],
    "full_approx": [
        (0, 0, 0, 1), (1, 5, 0, 2), (6, 63, 0, 2),
        (0, 0, 1, 0), (1, 63, 2, 1), (1, 63, 1, 0),
    ],
}


@pytest.mark.parametrize("script", sorted(SCRIPTS))
def test_progressive_matches_exact_coefficients(script):
    rng = np.random.Generator(np.random.PCG64(5))
    img = rng.integers(0, 256, size=(21, 30), dtype=np.uint8)
    payload = _encode_progressive(img, SCRIPTS[script])
    got = decode_jpeg_gray(payload)
    np.testing.assert_array_equal(got, _idct_reference(img))


def test_progressive_gradient_and_flat():
    img = np.clip(
        np.add.outer(np.arange(24) * 5, np.arange(40) * 2), 0, 255
    ).astype(np.uint8)
    payload = _encode_progressive(img, SCRIPTS["full_approx"])
    np.testing.assert_array_equal(decode_jpeg_gray(payload),
                                  _idct_reference(img))
    flat = np.full((16, 16), 130, dtype=np.uint8)
    payload = _encode_progressive(flat, SCRIPTS["dc_approx"])
    np.testing.assert_array_equal(decode_jpeg_gray(payload),
                                  _idct_reference(flat))


def test_progressive_with_restarts():
    rng = np.random.Generator(np.random.PCG64(6))
    img = rng.integers(0, 256, size=(24, 48), dtype=np.uint8)
    payload = _encode_progressive(img, SCRIPTS["full_approx"], restart=4)
    np.testing.assert_array_equal(decode_jpeg_gray(payload),
                                  _idct_reference(img))


def test_progressive_near_original():
    rng = np.random.Generator(np.random.PCG64(7))
    img = rng.integers(0, 256, size=(17, 19), dtype=np.uint8)
    got = decode_jpeg_gray(_encode_progressive(img, SCRIPTS["dc_approx"]))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_progressive_jpeg_in_pdf_and_payload_dispatch():
    """A progressive JPEG flows through the PDF DCTDecode path and the
    raw-payload dispatch identically to baseline."""
    from test_pdfimage import one_image_pdf, stream_obj

    from tensorflow_ocr_ray.core.pdfimage import pdf_page_images
    from tensorflow_ocr_ray.core.raster import decode_payload

    rng = np.random.Generator(np.random.PCG64(8))
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    payload = _encode_progressive(img, SCRIPTS["full_approx"])
    body = stream_obj(
        b"/Subtype /Image /Width 24 /Height 16 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceGray /Filter /DCTDecode", payload)
    got = pdf_page_images(one_image_pdf(body))[0]
    np.testing.assert_array_equal(got, _idct_reference(img))
    # binarized dispatch path (media payloads)
    ink = decode_payload(payload)
    assert ink.shape == img.shape


def test_interleaved_dc_color_progressive():
    """3-component progressive (no subsampling): the DC scan is
    INTERLEAVED (every component entropy-decoded to keep sync, per-MCU
    order), luma AC comes in its own scan, chroma AC scans are pure
    EOB runs the decoder byte-skips.  Luma out must be bit-exact."""
    rng = np.random.Generator(np.random.PCG64(9))
    y = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    yb = _blocks_of(y)
    nby, nbx, _ = yb.shape
    nblocks = nby * nbx
    cb_dc, cr_dc = 8 * (100 - 128), 8 * (200 - 128)  # flat chroma

    h, w = y.shape
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00"
    out += bytes([1] * 64)
    out += b"\xff\xc2" + (2 + 6 + 9).to_bytes(2, "big")
    out += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])

    # ---- interleaved DC scan (Y, Cb, Cr per MCU) ----
    diffs = []
    preds = {1: 0, 2: 0, 3: 0}
    for by in range(nby):
        for bx in range(nbx):
            for cs, dc in ((1, int(yb[by, bx, 0])), (2, cb_dc),
                           (3, cr_dc)):
                diffs.append(dc - preds[cs])
                preds[cs] = dc
    symbols = sorted({_category(d) for d in diffs})
    bits, values, code_map = _fixed_table(symbols)
    out += b"\xff\xc4" + (2 + 1 + 16 + len(values)).to_bytes(2, "big")
    out += bytes([0x00]) + bytes(bits) + values
    w1 = _W(code_map)
    for d in diffs:
        t = _category(d)
        w1.sym(t)
        if t:
            w1.bits(d if d >= 0 else d + (1 << t) - 1, t)
    w1.pad()
    out += b"\xff\xda" + (2 + 1 + 6 + 3).to_bytes(2, "big")
    out += bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00])
    out += w1.out

    # ---- luma AC scan ----
    symbols2: set[int] = set()
    _scan_stream(yb, 1, 63, 0, 0, 0, _W(None), symbols2)
    bits, values, code_map = _fixed_table(sorted(symbols2 or {0}))
    out += b"\xff\xc4" + (2 + 1 + 16 + len(values)).to_bytes(2, "big")
    out += bytes([0x10]) + bytes(bits) + values
    w2 = _W(code_map)
    _scan_stream(yb, 1, 63, 0, 0, 0, w2, set())
    out += b"\xff\xda" + (2 + 1 + 2 + 3).to_bytes(2, "big")
    out += bytes([1, 1, 0x00, 1, 63, 0x00])
    out += w2.out

    # ---- chroma AC scans: one EOB run covering every block ----
    for cs in (2, 3):
        r = nblocks.bit_length() - 1
        sym = r << 4
        bits, values, code_map = _fixed_table([sym])
        out += b"\xff\xc4" + (2 + 1 + 16 + len(values)).to_bytes(2, "big")
        out += bytes([0x11]) + bytes(bits) + values
        w3 = _W(code_map)
        w3.code_map = code_map
        w3.sym(sym)
        if r:
            w3.bits(nblocks - (1 << r), r)
        w3.pad()
        out += b"\xff\xda" + (2 + 1 + 2 + 3).to_bytes(2, "big")
        out += bytes([1, cs, 0x11, 1, 63, 0x00])
        out += w3.out
    out += b"\xff\xd9"

    got = decode_jpeg_gray(bytes(out))
    np.testing.assert_array_equal(got, _idct_reference(y))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=2000)
@given(seed=st.integers(0, 2**31 - 1), cut=st.floats(0.1, 0.99))
def test_fuzz_truncated_progressive_never_hangs(seed, cut):
    """Truncating a progressive stream anywhere raises cleanly (or, if
    the cut lands after the last needed byte, still decodes)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload = _encode_progressive(img, SCRIPTS["full_approx"])
    trunc = payload[:max(4, int(len(payload) * cut))]
    try:
        out = decode_jpeg_gray(trunc)
        assert out.dtype == np.uint8
    except Exception:
        pass
