"""TIFF-variant LZW codec (TIFF 6.0 spec §13) — pure Python.

MSB-first bit packing, initial 9-bit codes, Clear=256, EOI=257, first
dictionary code 258, and the TIFF "early change": the code width bumps
when the NEXT code to be assigned would not fit (one code earlier than
the GIF convention).
"""

from __future__ import annotations

CLEAR = 256
EOI = 257


def lzw_encode(data: bytes) -> bytes:
    out_bits: list[str] = []
    width = 9
    next_code = 258
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}

    def emit(code: int) -> None:
        out_bits.append(format(code, f"0{width}b"))

    emit(CLEAR)
    s = b""
    for ch in data:
        c = bytes([ch])
        if s + c in table:
            s += c
            continue
        emit(table[s])
        table[s + c] = next_code
        next_code += 1
        # early change: bump width when the next assignment would overflow
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # table full: reset
            emit(CLEAR)
            width = 9
            next_code = 258
            table = {bytes([i]): i for i in range(256)}
        s = c
    if s:
        emit(table[s])
    emit(EOI)
    bits = "".join(out_bits)
    bits += "0" * ((-len(bits)) % 8)
    return int(bits, 2).to_bytes(len(bits) // 8, "big") if bits else b""


def lzw_decode(data: bytes, max_out: int | None = None) -> bytes:
    bits = "".join(format(b, "08b") for b in data)
    pos = 0
    width = 9
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    while pos + width <= len(bits):
        code = int(bits[pos : pos + width], 2)
        pos += width
        if code == EOI:
            break
        if code == CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        prev = entry
        # early change: the decoder's table assignment trails the
        # encoder's by one code, so it switches at 510/1022/2046 where
        # the encoder switches at 511/1023/2047
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if len(table) >= 4094:
            # encoder resets after this point; expect a CLEAR next
            pass
        if max_out is not None and len(out) >= max_out:
            break
    return bytes(out)
