"""CCITT Group 4 (ITU-T T.6) bilevel codec — pure numpy/Python.

The reference reads any TIFF libtiff reads (``main/readPicture.c:36-117``
via ``TIFFReadRGBAImage``); real scanned-book corpora are overwhelmingly
Group-4 fax TIFF, so the engine decodes (and, for tests/fixtures, encodes)
T.6 2-D MMR itself — no image libraries in this environment.

Implements the full T.6 modified-modified-READ coding: vertical modes
V(0)/VR(1..3)/VL(1..3), horizontal mode with the T.4 white/black run
tables (terminating + makeup + shared extended makeup to 2560), and pass
mode.  Bit order is MSB-first ("fill order" 1), the TIFF default.

Tables transcribed from ITU-T Recommendation T.4 (07/2003) Tables 2/3/4
and T.6 §2.2.1 — public standards.
"""

from __future__ import annotations

import numpy as np

# ---------------- T.4 run-length code tables ------------------------------
# (run_length, code_string) — code strings are MSB-first bit literals.

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes, shared by both colors (T.4 Table 4)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 mode codes
_MODE_P = "0001"
_MODE_H = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}
# EOFB = two EOL codes (000000000001 twice)
_EOFB = "000000000001" * 2


def _invert(table: dict[int, str]) -> dict[str, int]:
    return {v: k for k, v in table.items()}

_WHITE_DEC = {**_invert(_WHITE_TERM),
              **{c: r for r, c in _WHITE_MAKEUP.items()},
              **{c: r for r, c in _EXT_MAKEUP.items()}}
_WHITE_IS_TERM = {c for r, c in _WHITE_TERM.items()}
_BLACK_DEC = {**_invert(_BLACK_TERM),
              **{c: r for r, c in _BLACK_MAKEUP.items()},
              **{c: r for r, c in _EXT_MAKEUP.items()}}
_BLACK_IS_TERM = {c for r, c in _BLACK_TERM.items()}
_MAX_CODE_LEN = 14


class _BitWriter:
    def __init__(self):
        self.bits: list[str] = []

    def write(self, code: str) -> None:
        self.bits.append(code)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        pad = (-len(s)) % 8
        s += "0" * pad
        return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


class _BitReader:
    """MSB-first bit cursor over a byte string."""

    def __init__(self, data: bytes):
        self.arr = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def peek_str(self, n: int) -> str:
        chunk = self.arr[self.pos : self.pos + n]
        return "".join("1" if b else "0" for b in chunk)

    def skip(self, n: int) -> None:
        self.pos += n

    @property
    def remaining(self) -> int:
        return len(self.arr) - self.pos


def _encode_run(w: _BitWriter, run: int, white: bool) -> None:
    """One color run as (extended-)makeup + terminating codes."""
    while run >= 2624:  # 2560 + max 63 terminator keeps the loop simple
        w.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 1792:
        base = (run - 1792) // 64 * 64 + 1792
        w.write(_EXT_MAKEUP[base])
        run -= base
    elif run >= 64:
        base = run // 64 * 64
        w.write((_WHITE_MAKEUP if white else _BLACK_MAKEUP)[base])
        run -= base
    w.write((_WHITE_TERM if white else _BLACK_TERM)[run])


def _decode_run(r: _BitReader, white: bool) -> int:
    """One full run (makeup chain + terminating code)."""
    dec = _WHITE_DEC if white else _BLACK_DEC
    term = _WHITE_IS_TERM if white else _BLACK_IS_TERM
    total = 0
    while True:
        for ln in range(2, _MAX_CODE_LEN):
            code = r.peek_str(ln)
            if len(code) < ln:
                raise ValueError("truncated CCITT run code")
            if code in dec:
                r.skip(ln)
                total += dec[code]
                if code in term:
                    return total
                break  # makeup: continue with the next code
        else:
            raise ValueError(f"bad CCITT run code near bit {r.pos}")


def _changes(row: np.ndarray) -> np.ndarray:
    """Positions where color changes, appended with two width sentinels
    (the T.6 b1/b2 convention).  Lines start imaginarily WHITE, so a black
    pixel at position 0 is itself a changing element."""
    w = len(row)
    diff = np.nonzero(row[1:] != row[:-1])[0] + 1
    if row[0] != 0:
        diff = np.concatenate([[0], diff])
    return np.concatenate([diff, [w, w]])


def encode_g4(image: np.ndarray) -> bytes:
    """T.6 encode a 0/1 uint8 bitmap (1 = black ink)."""
    img = np.ascontiguousarray((image != 0).astype(np.uint8))
    h, w = img.shape
    writer = _BitWriter()
    ref = np.zeros(w, dtype=np.uint8)  # imaginary all-white reference line
    for y in range(h):
        cur = img[y]
        cur_chg = _changes(cur)
        ref_chg = _changes(ref)
        a0 = -1
        color = 0  # current color at/after a0 (0 = white)
        while a0 < w:
            # a1: first change right of a0 with color != color
            idx = np.searchsorted(cur_chg, a0 + 1)
            a1 = int(cur_chg[idx]) if idx < len(cur_chg) else w
            # changes alternate; ensure a1 is a change TO the opposite color:
            # a change at p flips to color of cur[p]; we need cur[a1]!=color
            while a1 < w and cur[a1] == color:
                idx += 1
                a1 = int(cur_chg[idx]) if idx < len(cur_chg) else w
            # b1: first change on ref right of a0 with opposite color of color
            j = np.searchsorted(ref_chg, a0 + 1)
            b1 = int(ref_chg[j]) if j < len(ref_chg) else w
            while b1 < w and ref[b1] == color:
                j += 1
                b1 = int(ref_chg[j]) if j < len(ref_chg) else w
            # b2: next change after b1
            jj = np.searchsorted(ref_chg, b1 + 1)
            b2 = int(ref_chg[jj]) if jj < len(ref_chg) else w
            if b2 < a1:
                writer.write(_MODE_P)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                writer.write(_MODE_V[d])
                a0 = a1
                color ^= 1
                continue
            # horizontal mode: runs a0a1 (current color), a1a2 (opposite)
            idx2 = np.searchsorted(cur_chg, a1 + 1)
            a2 = int(cur_chg[idx2]) if idx2 < len(cur_chg) else w
            while a2 < w and cur[a2] != color:
                idx2 += 1
                a2 = int(cur_chg[idx2]) if idx2 < len(cur_chg) else w
            start = 0 if a0 < 0 else a0
            writer.write(_MODE_H)
            _encode_run(writer, a1 - start, white=(color == 0))
            _encode_run(writer, a2 - a1, white=(color == 1))
            a0 = a2
        ref = cur
    writer.write(_EOFB)
    return writer.tobytes()


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 decode to a 0/1 uint8 bitmap (1 = black ink)."""
    r = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    ref = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        cur = np.zeros(width, dtype=np.uint8)
        ref_chg = _changes(ref)
        a0 = -1
        color = 0
        while a0 < width:
            # b1/b2 relative to current a0 and color
            j = np.searchsorted(ref_chg, a0 + 1)
            b1 = int(ref_chg[j]) if j < len(ref_chg) else width
            while b1 < width and ref[b1] == color:
                j += 1
                b1 = int(ref_chg[j]) if j < len(ref_chg) else width
            jj = np.searchsorted(ref_chg, b1 + 1)
            b2 = int(ref_chg[jj]) if jj < len(ref_chg) else width
            # decode mode code
            matched = None
            for ln in (1, 3, 4, 6, 7):
                code = r.peek_str(ln)
                if len(code) < ln:
                    raise ValueError("truncated CCITT stream")
                if ln == 1 and code == "1":
                    matched = ("v", 0)
                elif ln == 3 and code == "011":
                    matched = ("v", 1)
                elif ln == 3 and code == "010":
                    matched = ("v", -1)
                elif ln == 3 and code == "001":
                    matched = ("h", None)
                elif ln == 4 and code == "0001":
                    matched = ("p", None)
                elif ln == 6 and code == "000011":
                    matched = ("v", 2)
                elif ln == 6 and code == "000010":
                    matched = ("v", -2)
                elif ln == 7 and code == "0000011":
                    matched = ("v", 3)
                elif ln == 7 and code == "0000010":
                    matched = ("v", -3)
                if matched:
                    r.skip(ln)
                    break
            if not matched:
                raise ValueError(f"bad CCITT mode code near bit {r.pos}")
            kind, arg = matched
            if kind == "p":
                if color:
                    cur[max(a0, 0) : b2] = 1
                a0 = b2
            elif kind == "v":
                a1 = b1 + arg
                if color:
                    cur[max(a0, 0) : a1] = 1
                a0 = a1
                color ^= 1
            else:  # horizontal: two explicit runs
                run1 = _decode_run(r, white=(color == 0))
                run2 = _decode_run(r, white=(color == 1))
                start = 0 if a0 < 0 else a0
                if color:
                    cur[start : start + run1] = 1
                    a0 = start + run1 + run2
                else:
                    cur[start + run1 : start + run1 + run2] = 1
                    a0 = start + run1 + run2
        out[y] = cur
        ref = cur
    return out
