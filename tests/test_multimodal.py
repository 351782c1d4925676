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
