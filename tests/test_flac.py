"""FLAC decoder vs an independent spec-written encoder (the PNG/JPEG
test precedent): frames, subframe types, rice partitions + escapes,
stereo decorrelation, wasted bits — all construction-derived."""

import struct

import numpy as np
import pytest

from tensorflow_ocr_ray.core.flac import _FIXED_COEFS, decode_flac


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, k: int):
        assert 0 <= v < (1 << k)
        self.acc = (self.acc << k) | v
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, k: int):
        self.write(v & ((1 << k) - 1), k)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def write_residual(w: BitWriter, resid, order, porder=0, param=6,
                   escape_raw=None):
    """Partition sizes follow the spec rule: blocksize/2^p samples per
    partition, the FIRST one short by the predictor order."""
    blocksize = len(resid) + order
    w.write(0, 2)  # method: 4-bit rice
    w.write(porder, 4)
    nparts = 1 << porder
    assert blocksize % nparts == 0
    idx = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        chunk = resid[idx:idx + n]
        idx += n
        if escape_raw is not None:
            w.write(0xF, 4)
            w.write(escape_raw, 5)
            for v in chunk:
                w.write_signed(v, escape_raw)
        else:
            w.write(param, 4)
            for v in chunk:
                zz = zigzag(v)
                w.write_unary(zz >> param)
                if param:
                    w.write(zz & ((1 << param) - 1), param)
    assert idx == len(resid)


def write_subframe(w: BitWriter, kind, samples, bps, order=0, lpc=None,
                   wasted=0, **res_kw):
    w.write(0, 1)  # pad
    samples = [int(s) for s in samples]
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    if kind == "constant":
        w.write(0, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        w.write_signed(samples[0], bps)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        for s in samples:
            w.write_signed(s, bps)
        return
    if kind == "fixed":
        w.write(0b001000 | order, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        for s in samples[:order]:
            w.write_signed(s, bps)
        coefs = _FIXED_COEFS[order]
        resid = [
            samples[j] - sum(c * samples[j - 1 - k]
                             for k, c in enumerate(coefs))
            for j in range(order, len(samples))
        ]
        write_residual(w, resid, order, **res_kw)
        return
    if kind == "lpc":
        coefs, prec, shift = lpc
        order = len(coefs)
        w.write(0b100000 | (order - 1), 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        for s in samples[:order]:
            w.write_signed(s, bps)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        resid = [
            samples[j]
            - (sum(c * samples[j - 1 - k] for k, c in enumerate(coefs))
               >> shift)
            for j in range(order, len(samples))
        ]
        write_residual(w, resid, order, **res_kw)
        return
    raise AssertionError(kind)


def streaminfo(sr=8000, channels=1, bps=16, total=0) -> bytes:
    w = BitWriter()
    w.write(16, 16)   # min block size
    w.write(65535, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    body = w.bytes() + b"\x00" * 16  # md5 unset
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def frame(channel_writers, blocksize, ch_code, ss_code=4, frame_no=0):
    """channel_writers: list of (kind, samples, bps, kwargs) tuples."""
    w = BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed-blocksize strategy
    w.write(7, 4)  # 16-bit blocksize-1 follows
    w.write(0, 4)  # sample rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(ss_code, 3)
    w.write(0, 1)
    assert frame_no < 0x80
    w.write(frame_no, 8)  # single-byte UTF-8 number
    w.write(blocksize - 1, 16)
    w.write(0, 8)  # header CRC-8 (decoder skips)
    for kind, samples, bps, kw in channel_writers:
        write_subframe(w, kind, samples, bps, **kw)
    w.align()
    w.write(0, 16)  # frame CRC-16 (decoder skips)
    return w.bytes()


def mono_flac(kind, samples, bps=16, blocksize=None, total=0, **kw):
    blocksize = blocksize or len(samples)
    return streaminfo(bps=bps, total=total) + frame(
        [(kind, samples, bps, kw)], blocksize, ch_code=0
    )


def as_float(samples, bps=16):
    return (np.asarray(samples, dtype=np.float64)
            / (1 << (bps - 1))).astype(np.float32)


def test_constant():
    got = decode_flac(mono_flac("constant", [-1234] * 80))
    np.testing.assert_array_equal(got, as_float([-1234] * 80))


def test_verbatim_random():
    rng = np.random.Generator(np.random.PCG64(1))
    s = rng.integers(-32768, 32768, size=200).tolist()
    np.testing.assert_array_equal(
        decode_flac(mono_flac("verbatim", s)), as_float(s)
    )


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    rng = np.random.Generator(np.random.PCG64(2 + order))
    # a random walk keeps residuals small across all orders
    s = np.cumsum(rng.integers(-50, 51, size=256)).tolist()
    got = decode_flac(mono_flac("fixed", s, order=order))
    np.testing.assert_array_equal(got, as_float(s))


def test_lpc():
    rng = np.random.Generator(np.random.PCG64(9))
    s = np.cumsum(rng.integers(-30, 31, size=300)).tolist()
    got = decode_flac(
        mono_flac("lpc", s, lpc=([3, -1], 4, 1))
    )
    np.testing.assert_array_equal(got, as_float(s))


def test_rice_partitions():
    rng = np.random.Generator(np.random.PCG64(5))
    s = np.cumsum(rng.integers(-40, 41, size=256)).tolist()
    # order 0 with porder 2: 4 partitions of 64
    got = decode_flac(mono_flac("fixed", s, order=0, porder=2))
    np.testing.assert_array_equal(got, as_float(s))


def test_rice_escape_raw():
    rng = np.random.Generator(np.random.PCG64(6))
    s = rng.integers(-4096, 4096, size=128).tolist()
    got = decode_flac(
        mono_flac("fixed", s, order=0, escape_raw=14)
    )
    np.testing.assert_array_equal(got, as_float(s))


def test_wasted_bits():
    rng = np.random.Generator(np.random.PCG64(7))
    s = (np.cumsum(rng.integers(-20, 21, size=120)) << 3).tolist()
    got = decode_flac(mono_flac("fixed", s, order=1, wasted=3))
    np.testing.assert_array_equal(got, as_float(s))


@pytest.mark.parametrize("mode", ["ls", "rs", "ms", "indep"])
def test_stereo_decorrelation(mode):
    rng = np.random.Generator(np.random.PCG64(11))
    left = np.cumsum(rng.integers(-25, 26, size=192)).astype(np.int64)
    right = left + rng.integers(-10, 11, size=192)
    bps = 16
    if mode == "indep":
        chans = [("verbatim", left.tolist(), bps, {}),
                 ("verbatim", right.tolist(), bps, {})]
        code = 1
    elif mode == "ls":
        side = (left - right).tolist()
        chans = [("verbatim", left.tolist(), bps, {}),
                 ("verbatim", side, bps + 1, {})]
        code = 8
    elif mode == "rs":
        side = (left - right).tolist()
        chans = [("verbatim", side, bps + 1, {}),
                 ("verbatim", right.tolist(), bps, {})]
        code = 9
    else:  # ms
        mid = ((left + right) >> 1).tolist()
        side = (left - right).tolist()
        chans = [("verbatim", mid, bps, {}),
                 ("verbatim", side, bps + 1, {})]
        code = 10
    payload = streaminfo(channels=2, bps=bps) + frame(
        chans, 192, ch_code=code
    )
    got = decode_flac(payload)
    exp = ((left + right) / 2.0 / (1 << (bps - 1))).astype(np.float32)
    np.testing.assert_array_equal(got, exp)


def test_multi_frame_concat_and_total_clip():
    s1 = [100] * 64
    s2 = [-200] * 64
    payload = streaminfo(total=100) + frame(
        [("constant", s1, 16, {})], 64, ch_code=0, frame_no=0
    ) + frame(
        [("constant", s2, 16, {})], 64, ch_code=0, frame_no=1
    )
    got = decode_flac(payload)
    assert len(got) == 100  # clipped to STREAMINFO total
    np.testing.assert_array_equal(got, as_float(s1 + s2[:36]))


def test_truncated_and_garbage_raise():
    payload = mono_flac("constant", [5] * 32)
    with pytest.raises(ValueError):
        decode_flac(payload[: len(payload) - 4])
    with pytest.raises(ValueError):
        decode_flac(b"NOPE" + payload[4:])
    # corrupt sync code (STREAMINFO block = 4 magic + 4 header + 34)
    bad = bytearray(payload)
    assert bad[42] == 0xFF  # first frame sync byte
    bad[42] = 0x00
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))


def test_audio_stage_dispatches_flac():
    import pyarrow as pa

    from tensorflow_ocr_ray.stages.multimodal import AudioFeatureStage

    payload = mono_flac("constant", [8192] * 2048)
    stage = AudioFeatureStage(frame=1024)
    out = stage(pa.table({"media_ref": ["f1"], "audio": [payload]}))
    assert out.column("n_frames").to_pylist() == [2]
    rms = out.column("rms").to_pylist()[0]
    assert abs(rms - 8192 / 32768) < 1e-6


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=3000)
@given(seed=st.integers(0, 2**31 - 1), nmut=st.integers(1, 25))
def test_fuzz_mutated_flac_never_hangs(seed, nmut):
    rng = np.random.Generator(np.random.PCG64(seed))
    s = np.cumsum(rng.integers(-30, 31, size=128)).tolist()
    payload = bytearray(mono_flac("fixed", s, order=2))
    for _ in range(nmut):
        payload[rng.integers(0, len(payload))] = rng.integers(0, 256)
    try:
        out = decode_flac(bytes(payload))
        assert out.dtype == np.float32
    except (ValueError, KeyError, OverflowError):
        pass  # clean rejection; hangs/crashes are the failure mode
