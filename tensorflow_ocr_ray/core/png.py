"""PNG decoding (RFC 2083 / ISO 15948), pure numpy + stdlib zlib —
grayscale output.

The fourth spec-implemented codec family (TIFF G4/LZW/PackBits, WAV
G.711/ADPCM, baseline JPEG, now PNG): chunk walk, IHDR validation,
IDAT concatenation through ``zlib``, and the five per-row defilters
(None/Sub/Up/Average/Paeth) exactly per the standard's recurrences.
Color types 0 (gray 1/2/4/8/16), 2 (RGB), 3 (palette), 4 (gray+alpha)
and 6 (RGBA) are handled; color/alpha reduce to LUMA uint8 with the
same ITU-R 601 integer weights the AVI decoder uses (alpha is ignored
— this engine consumes pixels for analysis, not compositing).
Adam7 interlace is decoded per the spec: the stream is SEVEN
independently-filtered sub-images (each pass has its own scanline
stride and byte padding); each defilters and converts on its own, then
scatters into the output grid at its (origin, step) lattice.

Defiltering is row-sequential by construction (each row references the
previous); within a row, Sub/Paeth/Average are per-pixel recurrences —
implemented as tight loops over the row, adequate for the multimodal
stage's frame sizes (the G4 decoder precedent applies if this ever
becomes a hot path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _defilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Filtered scanlines → recon bytes, (h, stride) uint8."""
    if len(raw) < h * (1 + stride):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            row = bytearray(
                (np.frombuffer(bytes(row), dtype=np.uint8) + prev)
                .astype(np.uint8).tobytes()
            )
        elif ft == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    return out


def _luma(r, g, b):
    return (
        (77 * r.astype(np.uint32) + 150 * g.astype(np.uint32)
         + 29 * b.astype(np.uint32)) >> 8
    ).astype(np.uint8)


def decode_png_gray(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 grayscale."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        cid = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        pos += 12 + size  # incl. CRC (not validated — data bugs raise
        # downstream; the engine's media-error policy handles corruption)
        if cid == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("non-standard compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            ihdr = (w, h, depth, ctype, interlace)
        elif cid == b"PLTE":
            pal = np.frombuffer(body, dtype=np.uint8)
            pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
            plte = _luma(pal[:, 0], pal[:, 1], pal[:, 2])
            if len(plte) < 256:
                plte = np.concatenate(
                    [plte, np.zeros(256 - len(plte), dtype=np.uint8)]
                )
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    if ctype in (2, 4, 6) and depth not in (8, 16):
        raise ValueError(f"invalid depth {depth} for color type {ctype}")

    bits_pp = channels * depth
    bpp = max(1, bits_pp // 8)
    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        stride = (w * bits_pp + 7) // 8
        recon = _defilter(raw, h, stride, bpp)
        return _to_gray(recon, h, w, depth, ctype, channels, plte)

    # Adam7: seven sub-images, each with its own scanline stride
    out = np.zeros((h, w), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        stride = (pw * bits_pp + 7) // 8
        nbytes = ph * (1 + stride)
        recon = _defilter(raw[pos:pos + nbytes], ph, stride, bpp)
        pos += nbytes
        out[y0::dy, x0::dx] = _to_gray(
            recon, ph, pw, depth, ctype, channels, plte
        )
    return out


_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _to_gray(recon, h, w, depth, ctype, channels, plte):
    """Defiltered sample bytes of one (sub-)image → (h, w) gray uint8."""
    if depth < 8:  # gray/palette sub-byte packing, MSB first
        bits = np.unpackbits(recon, axis=1)[:, : w * depth]
        vals = bits.reshape(h, w, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        px = (vals * weights).sum(axis=2).astype(np.uint16)
        if ctype == 3:
            if plte is None:
                raise ValueError("palette image without PLTE")
            return plte[px.astype(np.uint8)]
        # scale to full 8-bit range per the spec's sample depth scaling
        return ((px * 255) // ((1 << depth) - 1)).astype(np.uint8)

    if depth == 16:
        arr = recon.view(">u2").reshape(h, w, channels).astype(np.uint16)
        arr = (arr >> 8).astype(np.uint8)  # high byte ≈ /257, spec-ok
    else:
        arr = recon.reshape(h, w, channels)

    if ctype == 0:
        return arr[:, :, 0]
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte[arr[:, :, 0]]
    if ctype == 4:
        return arr[:, :, 0]  # gray, alpha ignored
    # RGB / RGBA
    return _luma(arr[:, :, 0], arr[:, :, 1], arr[:, :, 2])
