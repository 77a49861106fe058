"""GIF87a/89a decoding (CompuServe GIF spec / W3C note), pure numpy +
stdlib — grayscale frame output.

The fifth spec-implemented still-image family (after TIFF G3/G4/LZW/
PackBits/Deflate, baseline+progressive JPEG, PNG, scanned PDF):

- **GIF-variant LZW**: LSB-first bit packing (TIFF's is MSB-first),
  initial code width ``min_code_size + 1``, Clear = ``1 << mcs``,
  EOI = Clear + 1, and the *late* width change — the width bumps when
  the next code to assign reaches ``1 << width`` (contrast
  ``tiff_lzw.py``'s TIFF "early change", one code sooner).  When the
  table reaches 4096 the decoder stops growing it until a Clear code
  arrives ("deferred clear" — emitted by some encoders).
- **Interlace**: the 4-pass row order (rows 0%8, 4%8, 2%4, 1%2).
- **Animation**: Graphic Control Extensions carry per-frame disposal
  and transparency; frames composite onto the logical screen —
  disposal 0/1 leave the canvas, 2 restores the frame RECT to the
  background color, 3 restores it to the pre-frame canvas.
  Transparent-index pixels are not drawn.
- **Palettes** (global and per-frame local) reduce to gray with the
  same ITU-R 601 integer luma PNG and the AVI decoder use:
  ``(77 r + 150 g + 29 b) >> 8``.

Hand-verified spec vector (see ``tests/test_gif.py``): indices
``[1,1,1,1,1]`` at ``mcs=2`` encode to codes ``[Clear,1,6,1,EOI]``
with the width bump landing exactly between codes 6 and 1, i.e. bytes
``8C A3 00``.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_CODE = 4096  # 12-bit ceiling, per spec

# decompression-bomb guard: a 13-byte header can declare a 65535x65535
# logical screen (a 4.3 GB canvas); real scanned pages stay far below
# 2^28 px (= a 16k x 16k page), so anything larger is rejected rather
# than allocated
MAX_PIXELS = 1 << 28


def _luma(pal: np.ndarray) -> np.ndarray:
    """(N,3) uint8 palette -> (N,) uint8 gray, ITU-R 601 integer."""
    p = pal.astype(np.uint32)
    return ((77 * p[:, 0] + 150 * p[:, 1] + 29 * p[:, 2]) >> 8).astype(
        np.uint8
    )


def gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Decompress one image's concatenated data sub-blocks to index bytes."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = list(base)
    width = min_code_size + 1
    prev = -1

    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # missing EOI: tolerated by real decoders; stop cleanly
                return bytes(out)
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            return bytes(out)
        if prev < 0:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not in table")
            out += table[code]
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out += entry
        if len(table) < MAX_CODE:
            table.append(table[prev] + entry[:1])
            # late change, decoder side: the decoder's add for the
            # encoder's Nth assignment happens one code later, so it
            # bumps at (1<<width)-1 where the encoder bumps at 1<<width
            # (same convention as giflib's RunningCode > MaxCode1)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = code


def gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Compress index bytes (values < ``1 << min_code_size``); emits a
    Clear on table overflow (the non-deferred strategy)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    buf = 0
    nbits = 0
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    it = iter(indices)
    prev = next(it, None)
    if prev is not None:
        if prev >= clear:
            raise ValueError("index out of palette range")
        for ch in it:
            if ch >= clear:
                raise ValueError("index out of palette range")
            key = (prev, ch)
            code = table.get(key)
            if code is not None:
                prev = code
                continue
            emit(prev)
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            if next_code == MAX_CODE:
                emit(clear)
                width = min_code_size + 1
                table = {}
                next_code = eoi + 1
            prev = ch
        emit(prev)
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder interlaced rows (as stored) into display order."""
    h = rows.shape[0]
    order = [r for start, step in _INTERLACE_PASSES
             for r in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order, dtype=np.int64)] = rows
    return out


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated inside sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > len(payload):
            raise ValueError("GIF truncated inside sub-blocks")
        chunks.append(payload[pos:pos + size])
        pos += size


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """All composited frames of a GIF as grayscale uint8 (H, W) arrays
    on the logical screen."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF truncated in header")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise ValueError("GIF with zero logical screen dimension")
    if w * h > MAX_PIXELS:
        raise ValueError(f"GIF logical screen {w}x{h} exceeds pixel cap")
    pos = 13
    gct_gray = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = payload[pos:pos + 3 * n]
        if len(raw) < 3 * n:
            raise ValueError("GIF truncated in global color table")
        gct_gray = _luma(np.frombuffer(raw, np.uint8).reshape(n, 3))
        pos += 3 * n

    bg = int(gct_gray[bg_idx]) if (
        gct_gray is not None and bg_idx < len(gct_gray)) else 255
    canvas = np.full((h, w), bg, dtype=np.uint8)

    frames: list[np.ndarray] = []
    disposal = 0
    transparent = -1
    while True:
        if pos >= len(payload):
            break  # missing trailer: tolerate, like missing EOI
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF truncated in extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                flags, _delay, tidx = struct.unpack_from("<BHB", data, 0)
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        if pos + 9 > len(payload):
            raise ValueError("GIF truncated in image descriptor")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame rect outside logical screen")
        pal_gray = gct_gray
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            raw = payload[pos:pos + 3 * n]
            if len(raw) < 3 * n:
                raise ValueError("GIF truncated in local color table")
            pal_gray = _luma(np.frombuffer(raw, np.uint8).reshape(n, 3))
            pos += 3 * n
        if pal_gray is None:
            raise ValueError("GIF frame with no color table")

        if pos >= len(payload):
            raise ValueError("GIF truncated before LZW data")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = np.frombuffer(gif_lzw_decode(data, mcs), np.uint8)
        if idx.size < fw * fh:
            raise ValueError("GIF frame pixel data short")
        idx = idx[: fw * fh].reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal_gray):
            raise ValueError("GIF pixel index beyond palette")

        before = canvas[fy:fy + fh, fx:fx + fw].copy()
        region = pal_gray[idx]
        if transparent >= 0:
            region = np.where(idx == transparent, before, region)
        canvas[fy:fy + fh, fx:fx + fw] = region
        frames.append(canvas.copy())
        if disposal == 2:  # restore rect to background
            canvas[fy:fy + fh, fx:fx + fw] = bg
        elif disposal == 3:  # restore rect to previous
            canvas[fy:fy + fh, fx:fx + fw] = before
        disposal = 0
        transparent = -1

    if not frames:
        raise ValueError("GIF with no image frames")
    return frames


def decode_gif_gray(payload: bytes) -> np.ndarray:
    """First composited frame as grayscale uint8."""
    return decode_gif_frames(payload)[0]
