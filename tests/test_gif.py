"""GIF decode: spec-vector LZW, roundtrips, interlace, palettes,
animation compositing (disposal 0/1/2/3, transparency), dispatch."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tensorflow_ocr_ray.core.gif import (
    decode_gif_frames,
    decode_gif_gray,
    gif_lzw_decode,
    gif_lzw_encode,
)
from tensorflow_ocr_ray.core.raster import decode_payload, decode_payload_pages

GRAY_PAL = bytes(v for g in range(256) for v in (g, g, g))


def luma(r, g, b):
    return (77 * r + 150 * g + 29 * b) >> 8


def sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def frame_block(
    idx: np.ndarray,
    left=0,
    top=0,
    mcs=8,
    local_pal: bytes | None = None,
    interlace=False,
    disposal=None,
    transparent=None,
) -> bytes:
    """One (optional GCE +) image descriptor + LZW data block."""
    out = bytearray()
    if disposal is not None or transparent is not None:
        flags = (disposal or 0) << 2 | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", flags, 1, transparent or 0
        ) + b"\x00"
    h, w = idx.shape
    packed = 0
    if local_pal is not None:
        n = len(local_pal) // 3
        packed |= 0x80 | (n.bit_length() - 2)
    if interlace:
        packed |= 0x40
        rows = [r for s, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                for r in range(s, h, step)]
        idx = idx[np.asarray(rows)]
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, packed)
    if local_pal is not None:
        out += local_pal
    out += bytes([mcs]) + sub_blocks(
        gif_lzw_encode(idx.astype(np.uint8).tobytes(), mcs)
    )
    return bytes(out)


def build_gif(w, h, frames: list[bytes], pal: bytes | None = GRAY_PAL,
              bg=255) -> bytes:
    out = bytearray(b"GIF89a")
    packed = 0
    if pal is not None:
        n = len(pal) // 3
        packed = 0x80 | (n.bit_length() - 2)
    out += struct.pack("<HHBBB", w, h, packed, bg, 0)
    if pal is not None:
        out += pal
    for f in frames:
        out += f
    out += b"\x3b"
    return bytes(out)


def gray_gif(img: np.ndarray, **kw) -> bytes:
    h, w = img.shape
    return build_gif(w, h, [frame_block(img, **kw)])


# ---------------------------------------------------------------- LZW


def test_lzw_spec_vector():
    """Hand-derived from the spec algorithm: indices 1,1,1,1,1 at mcs=2
    emit codes [Clear=4, 1, 6, 6, EOI=5] (greedy match: "1", "11",
    then the trailing "11"); the late width change (3->4 bits) lands
    after the first 6 — LSB-first packs to 8C AD 00.  The second 6 is
    read by the decoder via the KwKwK rule (code == table length)."""
    enc = gif_lzw_encode(bytes([1, 1, 1, 1, 1]), 2)
    assert enc == bytes([0x8C, 0xAD, 0x00])
    assert gif_lzw_decode(enc, 2) == bytes([1, 1, 1, 1, 1])


def test_lzw_deferred_clear_tolerated():
    """A stream whose table hits 4096 with NO clear code (deferred-clear
    encoder) still decodes: hand-build codes that fill the table."""
    # all-distinct pairs grow the table fastest: cycle bytes
    data = bytes((7 * i) % 256 for i in range(20000))
    enc = gif_lzw_encode(data, 8)
    assert gif_lzw_decode(enc, 8) == data


@settings(max_examples=80, deadline=4000)
@given(
    mcs=st.integers(2, 8),
    data=st.binary(min_size=0, max_size=3000),
)
def test_lzw_roundtrip(mcs, data):
    clipped = bytes(b % (1 << mcs) for b in data)
    assert gif_lzw_decode(gif_lzw_encode(clipped, mcs), mcs) == clipped


def test_lzw_width_growth_12bit():
    rng = np.random.Generator(np.random.PCG64(7))
    data = rng.integers(0, 256, size=40000, dtype=np.uint8).tobytes()
    assert gif_lzw_decode(gif_lzw_encode(data, 8), 8) == data


# ------------------------------------------------------------- frames


def test_single_frame_gray_palette():
    rng = np.random.Generator(np.random.PCG64(1))
    img = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    got = decode_gif_gray(gray_gif(img))
    # gray palette entry g has luma (77g+150g+29g)>>8 == g
    np.testing.assert_array_equal(got, img)


def test_color_palette_luma():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    got = decode_gif_gray(build_gif(2, 2, [frame_block(idx, mcs=2)], pal))
    exp = np.array(
        [[luma(255, 0, 0), luma(0, 255, 0)],
         [luma(0, 0, 255), luma(255, 255, 255)]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(got, exp)


def test_interlaced_equals_sequential():
    rng = np.random.Generator(np.random.PCG64(2))
    img = rng.integers(0, 256, size=(23, 9), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_gif_gray(gray_gif(img, interlace=True)),
        decode_gif_gray(gray_gif(img)),
    )


def test_local_palette_overrides_global():
    pal_local = bytes([10, 10, 10, 200, 200, 200])
    idx = np.array([[0, 1]], dtype=np.uint8)
    got = decode_gif_gray(
        build_gif(2, 1, [frame_block(idx, mcs=2, local_pal=pal_local)])
    )
    np.testing.assert_array_equal(got, np.array([[10, 200]], np.uint8))


def test_subrect_frame_on_background():
    idx = np.full((2, 2), 7, dtype=np.uint8)
    got = decode_gif_gray(
        build_gif(4, 4, [frame_block(idx, left=1, top=2)], bg=200)
    )
    exp = np.full((4, 4), 200, dtype=np.uint8)
    exp[2:4, 1:3] = 7
    np.testing.assert_array_equal(got, exp)


def test_animation_disposal_none_accumulates():
    f1 = frame_block(np.full((1, 4), 50, np.uint8), disposal=1)
    f2 = frame_block(np.full((1, 2), 99, np.uint8), left=2, disposal=1)
    frames = decode_gif_frames(build_gif(4, 1, [f1, f2], bg=255))
    np.testing.assert_array_equal(frames[0], [[50, 50, 50, 50]])
    np.testing.assert_array_equal(frames[1], [[50, 50, 99, 99]])


def test_animation_disposal_background_restores():
    f1 = frame_block(np.full((1, 2), 50, np.uint8), disposal=2)
    f2 = frame_block(np.full((1, 1), 99, np.uint8), left=3, disposal=1)
    frames = decode_gif_frames(build_gif(4, 1, [f1, f2], bg=255))
    np.testing.assert_array_equal(frames[0], [[50, 50, 255, 255]])
    # frame 1's rect went back to bg before frame 2 drew
    np.testing.assert_array_equal(frames[1], [[255, 255, 255, 99]])


def test_animation_disposal_previous_restores():
    base = frame_block(np.full((1, 4), 50, np.uint8), disposal=1)
    overlay = frame_block(np.full((1, 2), 99, np.uint8), left=1, disposal=3)
    last = frame_block(np.full((1, 1), 7, np.uint8), disposal=1)
    frames = decode_gif_frames(build_gif(4, 1, [base, overlay, last]))
    np.testing.assert_array_equal(frames[1], [[50, 99, 99, 50]])
    # overlay undone, only the new 1px frame differs from base
    np.testing.assert_array_equal(frames[2], [[7, 50, 50, 50]])


def test_transparency_skips_pixels():
    f1 = frame_block(np.full((1, 3), 50, np.uint8), disposal=1)
    idx = np.array([[99, 0, 99]], dtype=np.uint8)
    f2 = frame_block(idx, disposal=1, transparent=0)
    frames = decode_gif_frames(build_gif(3, 1, [f1, f2]))
    np.testing.assert_array_equal(frames[1], [[99, 50, 99]])


# ------------------------------------------------------------ dispatch


def test_decode_payload_binarizes_gif():
    img = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    got = decode_payload(gray_gif(img), cutoff=0.5)
    np.testing.assert_array_equal(got, np.array([[1, 0], [0, 1]], np.uint8))


def test_decode_payload_pages_multiframe():
    f1 = frame_block(np.zeros((2, 2), np.uint8), disposal=1)
    f2 = frame_block(np.full((2, 2), 255, np.uint8), disposal=1)
    pages = decode_payload_pages(build_gif(2, 2, [f1, f2]))
    assert len(pages) == 2
    assert pages[0].sum() == 4 and pages[1].sum() == 0


def test_video_stage_samples_gif_frames():
    import pyarrow as pa

    from tensorflow_ocr_ray.stages.multimodal import VideoFrameSampleStage

    blocks = [
        frame_block(np.full((3, 3), 255 if i % 2 else 0, np.uint8),
                    disposal=1)
        for i in range(5)
    ]
    payload = build_gif(3, 3, blocks)
    stage = VideoFrameSampleStage(every=2)
    out = stage(pa.table({"media_ref": ["g1"], "video": [payload]}))
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]


# ------------------------------------------------------------- errors


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],
        lambda b: b[:6] + b"\xff\xff" + b[8:],  # huge width, no data
        lambda b: b.replace(b"\x2c", b"\x7e", 1),  # unknown block
        lambda b: b[:-1],  # missing trailer (tolerated, still decodes)
    ],
)
def test_malformed_raises_or_decodes(mutate):
    img = np.zeros((4, 4), dtype=np.uint8)
    payload = mutate(gray_gif(img))
    try:
        out = decode_gif_frames(payload)
        assert all(f.dtype == np.uint8 for f in out)
    except ValueError:
        pass


@settings(max_examples=60, deadline=2000)
@given(seed=st.integers(0, 2**31 - 1), nmut=st.integers(1, 30))
def test_fuzz_mutated_gif_never_hangs(seed, nmut):
    rng = np.random.Generator(np.random.PCG64(seed))
    img = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    payload = bytearray(gray_gif(img))
    for _ in range(nmut):
        payload[rng.integers(0, len(payload))] = rng.integers(0, 256)
    try:
        for f in decode_gif_frames(bytes(payload)):
            assert f.dtype == np.uint8
    except (ValueError, struct.error):
        pass
