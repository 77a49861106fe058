"""Multimodal stages: real image ops, stubbed audio/video with real
Ray-side plumbing (schema, batching, actor signatures)."""

import numpy as np
import pyarrow as pa
import pytest

from tensorflow_ocr_ray.core.raster import decode_payload, encode_bitonal
from tensorflow_ocr_ray.fixtures import payload_for_ref
from tensorflow_ocr_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageResizeStage,
    ImageStatsStage,
    VideoFrameSampleStage,
    make_fake_audio,
    make_fake_video,
)


def _image_batch(n=3):
    refs = [f"page-42-{i:06d}-0" for i in range(n)]
    return pa.table(
        {
            "media_ref": pa.array(refs),
            "image": pa.array([payload_for_ref(r) for r in refs],
                              type=pa.binary()),
        }
    )


def test_image_stats_stage():
    out = ImageStatsStage()(_image_batch())
    assert out.column_names == [
        "media_ref", "height", "width", "ink_ratio", "centroid_y",
        "centroid_x",
    ]
    assert all(0 < r < 1 for r in out.column("ink_ratio").to_pylist())
    assert all(h > 0 for h in out.column("height").to_pylist())


def test_image_resize_stage_roundtrip():
    out = ImageResizeStage(size=32)(_image_batch())
    for payload in out.column("image").to_pylist():
        thumb = decode_payload(payload)
        assert thumb.shape == (32, 32)
        assert set(np.unique(thumb)) <= {0, 1}


def test_audio_fake_codec_features():
    batch = pa.table(
        {
            "media_ref": pa.array(["a1", "a2"]),
            "audio": pa.array(
                [make_fake_audio("a1"), make_fake_audio("a2")],
                type=pa.binary(),
            ),
        }
    )
    out = AudioFeatureStage(frame=512)(batch)
    assert out.column_names == ["media_ref", "n_frames", "rms", "peak"]
    assert out.column("n_frames").to_pylist() == [31, 31]  # 16000 // 512
    assert all(r > 0 for r in out.column("rms").to_pylist())
    # deterministic: same ref → same features
    again = AudioFeatureStage(frame=512)(batch)
    assert out.equals(again)


def test_audio_compressed_decode_stubbed():
    """Non-WAV, non-FAKEAUD payloads (compressed formats) still need the
    external soundfile deployment path."""
    stage = AudioFeatureStage()
    if stage._sf is not None:
        pytest.skip("soundfile present; stub path not reachable")
    batch = pa.table(
        {
            "media_ref": pa.array(["x"]),
            "audio": pa.array([b"OggS....compressed"], type=pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        stage(batch)


def test_video_frame_sampling():
    batch = pa.table(
        {
            "media_ref": pa.array(["v1"]),
            "video": pa.array([make_fake_video("v1", n_frames=12)],
                              type=pa.binary()),
        }
    )
    out = VideoFrameSampleStage(every=4)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 4, 8]
    for f in out.column("frame").to_pylist():
        assert decode_payload(f).shape == (8, 8)


def test_multimodal_in_ray_pipeline(ray_session):
    """The actor-pool plumbing end-to-end: binary column in, stats out."""
    import ray.data as rd

    ds = rd.from_arrow(_image_batch(8)).map_batches(
        ImageStatsStage, batch_format="pyarrow", batch_size=4,
        concurrency=2,
    )
    df = ds.to_pandas()
    assert len(df) == 8
    assert (df["ink_ratio"] > 0).all()


def test_audio_real_wav_pcm_decode(ray_session):
    """Uncompressed PCM WAV decodes for REAL via stdlib `wave` — only
    compressed formats need the external-soundfile deployment path."""
    import io
    import struct as _struct
    import wave

    import numpy as np
    import pyarrow as pa

    from tensorflow_ocr_ray.stages.multimodal import AudioFeatureStage

    rng = np.random.Generator(np.random.PCG64(7))
    samples = (rng.normal(0, 3000, 4096)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        stereo = np.repeat(samples, 2).astype("<i2")
        w.writeframes(stereo.tobytes())
    payload = buf.getvalue()

    stage = AudioFeatureStage(frame=512)
    out = stage(pa.table({"media_ref": ["a"], "audio": [payload]}))
    assert out.column("n_frames")[0].as_py() == 8
    want_rms = float(
        np.sqrt(
            ((samples.astype(np.float32) / 32768.0)[: 8 * 512]
             .reshape(8, 512) ** 2).mean(axis=1)
        ).mean()
    )
    assert abs(out.column("rms")[0].as_py() - want_rms) < 1e-6


def test_dhash56_brightness_invariant_and_discriminating():
    """The perceptual hash collides across brightness shifts of the
    same pattern and separates the 8 planted pattern classes — through
    the TIFF encode/decode round trip."""
    import numpy as np

    from tensorflow_ocr_ray.core.raster import decode_tiff, encode_tiff
    from tensorflow_ocr_ray.stages.multimodal import dhash56

    ii, jj = np.mgrid[0:16, 0:16]
    hashes = set()
    for k in range(8):
        base = (((ii * 3 + jj * (k + 2)) % 17) * 12).astype(np.int64)
        per_brightness = set()
        for b in range(0, 15, 3):
            img = (base + b).astype(np.uint8)
            gray, _bits = decode_tiff(encode_tiff(img, bilevel=False))
            per_brightness.add(dhash56(gray))
        assert len(per_brightness) == 1  # brightness cancels
        hashes.update(per_brightness)
    assert len(hashes) == 8              # patterns separate

    import pytest
    with pytest.raises(ValueError):
        dhash56(np.zeros((8, 8), dtype=np.uint8))


def test_read_tiff_tags_types_roundtrip():
    """ASCII (external), inline SHORT, RATIONAL (external value area)
    all decode from a crafted little-endian single-IFD TIFF."""
    import struct

    from tensorflow_ocr_ray.stages.multimodal import read_tiff_tags

    desc = b"hello-world\x00"
    n_tags = 3
    ifd_off = 8
    ext = ifd_off + 2 + n_tags * 12 + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n_tags)
    out += struct.pack("<HHII", 270, 2, len(desc), ext)
    out += struct.pack("<HHII", 274, 3, 1, 6)
    out += struct.pack("<HHII", 282, 5, 1, ext + len(desc))
    out += struct.pack("<I", 0)
    out += desc
    out += struct.pack("<II", 300, 4)
    tags = read_tiff_tags(bytes(out))
    assert tags[270] == "hello-world"
    assert tags[274] == 6
    assert tags[282] == (300, 4)


def test_scene_cut_frames_threshold_and_jitter():
    """Small intra-scene jitter stays below threshold; a multi-row
    scene flip is detected with its exact pixel diff."""
    import numpy as np

    from tensorflow_ocr_ray.stages.multimodal import scene_cut_frames

    f = np.zeros((5, 8, 8), dtype=np.uint8)
    for i in range(5):
        f[i, 7, i] = 1          # jitter: diff 2 between neighbors
    f[3:, 0:2, :] = 1           # scene flip at frame 3: +16 px
    cuts = scene_cut_frames(f, threshold=10)
    assert cuts == [(3, 18)]    # 16 scene px + 2 jitter px
    assert scene_cut_frames(f[:1], threshold=0) == []


def test_audio_energy_segments_planted_runs(ray_session):
    """doc_id=13 -> bits 14 = 0b001110 -> one segment blocks 1..3."""
    import __ray_entry__ as e

    got = (e.queries()["audio_energy_segments"]("/root/testdata/sf0.001")
           .to_pandas())
    d13 = got[got["doc_id"] == 13].reset_index(drop=True)
    assert len(d13) == 1
    assert (int(d13["start_block"][0]), int(d13["end_block"][0]),
            int(d13["n_blocks"][0])) == (1, 3, 3)
