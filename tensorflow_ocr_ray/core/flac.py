"""FLAC decoding (the public xiph.org format spec / RFC 9639), pure
Python + numpy — the compressed-audio counterpart of the image tier's
spec codecs (G4, LZW, JPEG, PNG, GIF).

Covered: STREAMINFO + metadata-block walk; frame header (block size /
sample rate / channel assignment / sample size codes, UTF-8-coded
frame number); subframes CONSTANT, VERBATIM, FIXED orders 0-4 and LPC
(quantized coefficients + shift) with wasted-bits; Rice residuals in
both methods (4- and 5-bit parameters) incl. the escape-to-raw case
and partition orders > 0; stereo decorrelation left/side, right/side
and mid/side (the side channel carries bps+1 bits per the spec).
CRCs are parsed over but not validated (the PNG precedent: corruption
surfaces as a decode error, handled by the media-error policy).

Bit access is MSB-first over an int cursor; the residual fast path
pre-scans unary runs with ``bytes.find``-free numpy popcount windows
kept simple — fixtures in this repo are small clips, and the decode
loop shape matches the G4 precedent if it ever needs tightening.

Output contract matches ``decode_wav``: mono float32 in [-1, 1),
channels mean-mixed after reconstruction.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self.n = 8 * len(data)

    def read(self, k: int) -> int:
        if self.pos + k > self.n:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        pos = self.pos
        data = self.data
        # byte-at-a-time refill
        end = pos + k
        first_byte = pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(data[first_byte:last_byte], "big")
        total_bits = 8 * (last_byte - first_byte)
        v = (chunk >> (total_bits - (end - 8 * first_byte))) & ((1 << k) - 1)
        self.pos = end
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the terminating 1."""
        count = 0
        pos = self.pos
        data = self.data
        n = self.n
        while True:
            if pos >= n:
                raise ValueError("FLAC bitstream truncated in unary")
            byte = data[pos >> 3]
            rem = 8 - (pos & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                count += rem
                pos += rem
                continue
            lead = rem - window.bit_length()
            count += lead
            pos += lead + 1
            self.pos = pos
            return count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(b: "_Bits") -> int:
    """FLAC's extended-UTF-8 coded frame/sample number (up to 7 bytes)."""
    first = b.read(8)
    if first < 0x80:
        return first
    ones = 0
    mask = 0x80
    while first & mask:
        ones += 1
        mask >>= 1
    if ones < 2 or ones > 7:
        raise ValueError("bad FLAC UTF-8 number prefix")
    v = first & (0x7F >> ones)
    for _ in range(ones - 1):
        cont = b.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_residual(b: "_Bits", blocksize: int, order: int) -> list[int]:
    method = b.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 + method  # rice parameter width
    escape = (1 << plen) - 1
    porder = b.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize >> porder
        if p == 0:
            n -= order
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = b.read(plen)
        if param == escape:
            raw = b.read(5)
            out.extend(
                b.read_signed(raw) if raw else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = b.read_unary()
                r = b.read(param) if param else 0
                out.append(_zigzag((q << param) | r))
    return out


def _read_subframe(b: "_Bits", blocksize: int, bps: int) -> np.ndarray:
    if b.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = b.read_unary() + 1
        bps -= wasted

    if stype == 0:  # CONSTANT
        v = b.read_signed(bps)
        samples = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        samples = np.fromiter(
            (b.read_signed(bps) for _ in range(blocksize)),
            dtype=np.int64, count=blocksize,
        )
    elif 8 <= stype <= 12:  # FIXED, order = stype & 7
        order = stype & 7
        warm = [b.read_signed(bps) for _ in range(order)]
        resid = _read_residual(b, blocksize, order)
        coefs = _FIXED_COEFS[order]
        s = warm + [0] * len(resid)
        for i in range(len(resid)):
            j = order + i
            s[j] = resid[i] + sum(
                c * s[j - 1 - k] for k, c in enumerate(coefs)
            )
        samples = np.asarray(s, dtype=np.int64)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [b.read_signed(bps) for _ in range(order)]
        prec = b.read(4)
        if prec == 0xF:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = b.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [b.read_signed(prec) for _ in range(order)]
        resid = _read_residual(b, blocksize, order)
        s = warm + [0] * len(resid)
        for i in range(len(resid)):
            j = order + i
            acc = sum(c * s[j - 1 - k] for k, c in enumerate(coefs))
            s[j] = resid[i] + (acc >> shift)
        samples = np.asarray(s, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")

    if wasted:
        samples = samples << wasted
    return samples


def decode_flac(payload: bytes) -> np.ndarray:
    """FLAC bytes → mono float32 in [-1, 1) (channels mean-mixed),
    all frames concatenated."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC truncated in metadata")
        head = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + length]
        pos += 4 + length
        if head & 0x7F == 0:
            if length < 34:
                raise ValueError("short FLAC STREAMINFO")
            streaminfo = body
        if head & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    sr = si.read(20)
    n_channels = si.read(3) + 1
    bps_stream = si.read(5) + 1
    total_samples = si.read(36)
    if sr == 0:
        raise ValueError("FLAC stream with zero sample rate")

    chans: list[list[np.ndarray]] = [[] for _ in range(n_channels)]
    got = 0
    b = _Bits(payload, pos * 8)
    while b.pos + 32 <= b.n and (total_samples == 0 or got < total_samples):
        sync = b.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync code")
        b.read(1)  # reserved
        b.read(1)  # blocking strategy
        bs_code = b.read(4)
        sr_code = b.read(4)
        ch_code = b.read(4)
        ss_code = b.read(3)
        b.read(1)  # reserved
        _read_utf8_number(b)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = b.read(8) + 1
        elif bs_code == 7:
            blocksize = b.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            b.read(8)
        elif sr_code in (13, 14):
            b.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        bps = (_SAMPLE_SIZE_TABLE[ss_code]
               if ss_code in _SAMPLE_SIZE_TABLE else bps_stream)
        b.read(8)  # header CRC-8 (not validated)

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != n_channels:
                raise ValueError("FLAC frame channel count mismatch")
            sub = [_read_subframe(b, blocksize, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _read_subframe(b, blocksize, bps)
                side = _read_subframe(b, blocksize, bps + 1)
                sub = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _read_subframe(b, blocksize, bps + 1)
                right = _read_subframe(b, blocksize, bps)
                sub = [side + right, right]
            else:  # mid/side
                mid = _read_subframe(b, blocksize, bps)
                side = _read_subframe(b, blocksize, bps + 1)
                m2 = (mid << 1) | (side & 1)
                sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")

        b.align()
        b.read(16)  # frame CRC-16 (not validated)
        for c in range(n_channels):
            chans[c].append(sub[c])
        got += blocksize

    if not chans[0]:
        raise ValueError("FLAC stream with no frames")
    full = [np.concatenate(c) for c in chans]
    if total_samples:
        full = [f[:total_samples] for f in full]
    mono = np.mean(np.stack(full, axis=0), axis=0)
    return (mono / float(1 << (bps_stream - 1))).astype(np.float32)
