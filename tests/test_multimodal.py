"""Multimodal binary plumbing: metadata, fake-decode pipeline shape,
frame-sampling row expansion, and codec-missing behavior."""

import hashlib

import pytest
from pyspark.sql import functions as F

from prefixtree_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 256]) * (100 + i * 37)) for i in range(8)] + [(99, b"")]
    return spark.createDataFrame(rows, ["media_id", "blob"])


def test_attach_binary_metadata(spark, media):
    got = {r.media_id: r for r in multimodal.attach_binary_metadata(media, "blob").collect()}
    assert got[0].n_bytes == 100
    assert got[0].sha256 == hashlib.sha256(bytes([0]) * 100).hexdigest()
    assert got[99].n_bytes == 0


def test_decode_image_meta_fake(spark, media):
    got = {r.media_id: r for r in multimodal.decode_image_meta(media, "media_id", "blob", fake_decode=True).collect()}
    assert len(got) == 9
    r = got[1]
    assert 64 <= r.width < 256 and 64 <= r.height < 256 and 1 <= r.channels <= 4
    # deterministic: same blob -> same fake meta
    again = {r.media_id: r for r in multimodal.decode_image_meta(media, "media_id", "blob", fake_decode=True).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {k: tuple(v) for k, v in again.items()}


def test_decode_without_codec_raises(spark, media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        multimodal.decode_image_meta(media, "media_id", "blob").collect()
    assert "codec" in str(exc.value)


def test_sample_frames_expansion(spark, media):
    frames = multimodal.sample_frames(media, "media_id", "blob", n_frames=4, fake_decode=True)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    by_id = {r.media_id: r.n for r in got}
    assert by_id[0] == 4
    assert 99 not in by_id  # empty blob: no frames
    # frame bytes are slices of the original
    f0 = {r.frame_no: bytes(r.frame_bytes) for r in frames.where("media_id = 0").collect()}
    assert all(set(b) == {0} for b in f0.values())


# --- real header sniffing (no codec) -----------------------------------

PNG_RGBA_64x48 = bytes.fromhex(
    "89504E470D0A1A0A0000000D4948445200000040000000300806000000"
)
GIF_320x200 = bytes.fromhex("4749463839614001C800000000")
BMP_8BIT_100x50 = bytes.fromhex(
    "424D00000000000000003600000028000000640000003200000001000800"
)
JPEG_640x480 = bytes.fromhex("FFD8FFC000110801E0028003011100021101031101")
# APP0 (JFIF) segment before the SOF — the common on-disk layout
JPEG_WITH_APP0 = bytes.fromhex(
    "FFD8FFE000104A46494600010100000100010000"
    "FFC000110801E0028003011100021101031101"
)


def test_sniff_image_meta_headers():
    assert multimodal.sniff_image_meta(PNG_RGBA_64x48) == ("png", 64, 48, 4)
    assert multimodal.sniff_image_meta(GIF_320x200) == ("gif", 320, 200, 3)
    assert multimodal.sniff_image_meta(BMP_8BIT_100x50) == ("bmp", 100, 50, 1)
    assert multimodal.sniff_image_meta(JPEG_640x480) == ("jpeg", 640, 480, 3)
    assert multimodal.sniff_image_meta(JPEG_WITH_APP0) == ("jpeg", 640, 480, 3)
    # trailing payload bytes don't disturb header parsing
    assert multimodal.sniff_image_meta(PNG_RGBA_64x48 + b"garbage") == (
        "png", 64, 48, 4,
    )
    # top-down BMP stores a negative height
    neg = bytearray(BMP_8BIT_100x50)
    neg[22:26] = (-50).to_bytes(4, "little", signed=True)
    assert multimodal.sniff_image_meta(bytes(neg)) == ("bmp", 100, 50, 1)


def test_sniff_image_meta_rejects_unknown_and_truncated():
    assert multimodal.sniff_image_meta(b"") is None
    assert multimodal.sniff_image_meta(b"plain text bytes") is None
    assert multimodal.sniff_image_meta(PNG_RGBA_64x48[:20]) is None
    assert multimodal.sniff_image_meta(GIF_320x200[:8]) is None
    assert multimodal.sniff_image_meta(b"\xff\xd8\x00\x00") is None  # bad marker
    assert multimodal.sniff_image_meta(JPEG_WITH_APP0[:18]) is None  # no SOF yet


def test_sniff_rejects_bm_prefixed_text():
    """'BM' alone must not sniff as bmp (round-4 advice): a text blob
    starting 'BMW ...' has no valid DIB header size / bit depth."""
    blob = b"BMW group quarterly report, fiscal year text " * 2
    assert len(blob) >= 30
    assert multimodal.sniff_image_meta(blob) is None
    # corrupt DIB size on a real-shaped header also rejects
    bad = bytearray(BMP_8BIT_100x50)
    bad[14] = 0x29  # 41: not a published header size
    assert multimodal.sniff_image_meta(bytes(bad)) is None
    bad2 = bytearray(BMP_8BIT_100x50)
    bad2[28:30] = (7).to_bytes(2, "little")  # illegal bit depth
    assert multimodal.sniff_image_meta(bytes(bad2)) is None


def test_sniff_jpeg_with_fill_bytes():
    """0xFF fill bytes between segments are legal (ITU T.81 B.1.1.2);
    the segment walk must skip them, not misread a segment length."""
    padded = (
        bytes.fromhex("FFD8")
        + b"\xff\xff\xff"  # fill run before APP0
        + bytes.fromhex("FFE000104A46494600010100000100010000")
        + b"\xff\xff"  # fill run before SOF
        + bytes.fromhex("FFC000110801E0028003011100021101031101")
    )
    assert multimodal.sniff_image_meta(padded) == ("jpeg", 640, 480, 3)


def test_decode_image_meta_sniffs_real_headers(spark):
    rows = [
        (1, PNG_RGBA_64x48 + b"xx"),
        (2, GIF_320x200),
        (3, BMP_8BIT_100x50),
        (4, JPEG_WITH_APP0),
        (5, b"not an image"),
    ]
    df = spark.createDataFrame(rows, ["media_id", "blob"])
    got = {
        r.media_id: (r.format, r.width, r.height, r.channels, r.n_bytes)
        for r in multimodal.decode_image_meta(
            df, "media_id", "blob", fake_decode=True
        ).collect()
    }
    assert got[1] == ("png", 64, 48, 4, len(PNG_RGBA_64x48) + 2)
    assert got[2] == ("gif", 320, 200, 3, len(GIF_320x200))
    assert got[3] == ("bmp", 100, 50, 1, len(BMP_8BIT_100x50))
    assert got[4] == ("jpeg", 640, 480, 3, len(JPEG_WITH_APP0))
    assert got[5][0] == "fake"  # unknown format falls back to the fake
    # without fake_decode, KNOWN formats still decode for real...
    known = spark.createDataFrame(rows[:4], ["media_id", "blob"])
    assert multimodal.decode_image_meta(known, "media_id", "blob").count() == 4
    # ...and only unknown formats demand a codec
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        multimodal.decode_image_meta(df, "media_id", "blob").collect()
    assert "codec" in str(exc.value)


def _wav(channels=2, rate=44100, bits=16, data_size=352800):
    import struct

    byte_rate = rate * channels * bits // 8
    return (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * bits // 8, bits)
        + b"data" + struct.pack("<I", data_size)
    )


def _mp4(timescale=1000, duration=7500, version=0):
    import struct

    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    if version == 0:
        body = bytes([0, 0, 0, 0]) + b"\0" * 8 + struct.pack(">II", timescale, duration)
    else:
        body = bytes([1, 0, 0, 0]) + b"\0" * 16 + struct.pack(">IQ", timescale, duration)
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def test_sniff_audio_meta_wav():
    assert multimodal.sniff_audio_meta(_wav()) == ("wav", 2, 44100, 2.0)
    assert multimodal.sniff_audio_meta(_wav(channels=1, rate=16000, data_size=16000 * 2 * 3)) == ("wav", 1, 16000, 3.0)
    assert multimodal.sniff_audio_meta(b"RIFF1234WAVE") is None  # no chunks
    assert multimodal.sniff_audio_meta(b"not audio") is None
    # LIST chunk before fmt/data still parses (chunk walk, not offsets)
    import struct as s

    w = _wav()
    listed = w[:12] + b"LIST" + s.pack("<I", 4) + b"INFO" + w[12:]
    assert multimodal.sniff_audio_meta(listed) == ("wav", 2, 44100, 2.0)


def test_sniff_video_meta_mp4():
    assert multimodal.sniff_video_meta(_mp4()) == ("mp4", 7.5)
    assert multimodal.sniff_video_meta(_mp4(timescale=90000, duration=90000 * 61, version=1)) == ("mp4", 61.0)
    assert multimodal.sniff_video_meta(b"\x00\x00\x00\x10freeAAAAAAAA") is None  # no ftyp
    assert multimodal.sniff_video_meta(_mp4()[:20]) is None  # truncated before moov


def test_sniffers_never_crash_on_fuzz():
    """Arbitrary bytes (including prefix-valid-then-garbage blobs) must
    yield a well-formed tuple or None — never raise: the sniffers run
    inside executors over untrusted corpus blobs."""
    import random

    rng = random.Random(42)
    seeds = [
        PNG_RGBA_64x48, GIF_320x200, BMP_8BIT_100x50, JPEG_WITH_APP0,
        _wav(), _mp4(), b"",
    ]
    blobs = []
    for _ in range(300):
        base = rng.choice(seeds)
        cut = rng.randrange(0, max(1, len(base) + 1))
        mutated = bytearray(base[:cut])
        for _ in range(rng.randrange(0, 6)):
            if mutated:
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        mutated += bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        blobs.append(bytes(mutated))
    for b in blobs:
        for fn, width in [
            (multimodal.sniff_image_meta, 4),
            (multimodal.sniff_audio_meta, 4),
            (multimodal.sniff_video_meta, 2),
        ]:
            got = fn(b)
            assert got is None or (isinstance(got, tuple) and len(got) == width)


def test_decoders_skip_null_blobs(spark):
    """A NULL binary value (failed fetch upstream) is a skipped row,
    not a stage-killing bytes(None) TypeError."""
    from prefixtree_spark.operators import multimodal as mm

    rows = [(1, bytes([0x42, 0x4D]) + b"\x00" * 40), (2, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = mm.decode_image_meta(df, "media_id", "payload", fake_decode=True)
    assert {r.media_id for r in out.collect()} == {1}
    frames = mm.sample_frames(df, "media_id", "payload", fake_decode=True)
    assert {r.media_id for r in frames.collect()} == {1}
    av = mm.decode_av_meta(df, "media_id", "payload", fake_decode=True)
    assert {r.media_id for r in av.collect()} == {1}
