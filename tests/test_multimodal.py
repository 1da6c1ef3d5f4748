"""Multimodal plumbing: schema, deterministic fake codec, resize, frame
sampling, and the explicit real-decoder seam."""

import pytest
from pyspark.sql import functions as F

from sparksketch.multimodal import decode_features, resize_stub, sample_frames, synth_media


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 200, seed=42, partitions=4).cache()


def test_synth_media_schema(media):
    assert media.count() == 200
    row = media.first()
    assert row.media[:4] == bytearray(b"FMED")
    assert len(row.media) == 10 + row.width * row.height * row.n_frames
    mimes = {r.mime for r in media.select("mime").distinct().collect()}
    assert mimes == {"image/fake", "video/fake"}


def test_decode_features(media):
    feats = decode_features(media, n_features=16)
    rows = feats.collect()
    assert len(rows) == 200
    assert all(len(r.features) == 16 for r in rows)
    # deterministic: rerun yields identical vectors
    again = {r.media_id: r.features for r in decode_features(media, n_features=16).collect()}
    for r in rows:
        assert again[r.media_id] == r.features


def test_real_decoder_raises(media):
    with pytest.raises(Exception) as ei:
        decode_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_resize(media):
    small = resize_stub(media, target=16)
    rows = small.collect()
    assert all(r.width == 16 and r.height == 16 for r in rows)
    assert all(len(r.media) == 10 + 16 * 16 * r.n_frames for r in rows)


def test_sample_frames(media):
    frames = sample_frames(media, every=2)
    got = frames.groupBy("media_id").count().collect()
    meta = {r.media_id: r.n_frames for r in media.select("media_id", "n_frames").collect()}
    for r in got:
        expect = (meta[r.media_id] + 1) // 2
        assert r["count"] == expect
    one = frames.first()
    assert one.frame[:4] == bytearray(b"FMED")
