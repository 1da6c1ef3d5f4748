"""Multimodal plumbing: schema, deterministic fake codec, resize, frame
sampling, and the explicit real-decoder seam."""

import numpy as np
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


def test_real_decoder_matches_fake_on_fmed(media):
    """decoder='real' dispatches FMED blobs to the same kernel — identical
    schema AND values, proving a decoder swap never changes the plumbing."""
    real = decode_features(media, decoder="real", n_features=16)
    fake = decode_features(media, decoder="fake", n_features=16)
    assert real.schema == fake.schema
    rv = {r.media_id: r.features for r in real.collect()}
    fv = {r.media_id: r.features for r in fake.collect()}
    assert rv == fv


def _pgm_blob(w, h, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, (h, w), dtype=np.uint8)
    return b"P5\n# comment\n%d %d\n255\n" % (w, h) + pix.tobytes(), pix


def _wav_blob(n, seed):
    import io
    import wave
    rng = np.random.default_rng(seed)
    samples = rng.integers(-30000, 30000, n, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_real_decoder_pgm_and_wav(spark):
    """Real formats decode natively: binary PGM via numpy, WAV via stdlib
    wave — through the full Spark pipeline with the fake-path schema."""
    from sparksketch.multimodal import decode_blob
    pgm, pix = _pgm_blob(12, 7, 3)
    wav, samples = _wav_blob(500, 4)
    # kernel-level: exact pixel/sample recovery
    got_pix, nf = decode_blob(pgm)
    assert nf == 1 and np.array_equal(got_pix, pix.ravel())
    got_s, _ = decode_blob(wav)
    assert np.array_equal(got_s, ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8))
    # pipeline-level: same schema as the fake path
    df = spark.createDataFrame([(1, bytearray(pgm)), (2, bytearray(wav))],
                               "media_id long, media binary")
    out = decode_features(df, decoder="real", n_features=16).collect()
    feats = {r.media_id: r.features for r in out}
    assert len(feats[1]) == 16 and len(feats[2]) == 16
    assert abs(feats[1][0] - pix.mean() / 255.0) < 1e-6


def test_real_decoder_png_seam(spark):
    """PNG/JPEG go through the PIL probe: decode when PIL is importable,
    NotImplementedError at the seam otherwise (either way, same plumbing)."""
    import importlib.util

    from sparksketch.multimodal import decode_blob
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(NotImplementedError):
            decode_blob(png_magic)
    else:  # pragma: no cover - container has no PIL; branch for real deploys
        with pytest.raises(Exception):
            decode_blob(png_magic)  # truncated PNG still fails, but in PIL


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


def test_synth_real_media_decode_stats_exact(spark):
    # the r5 certificate path: REAL-format blobs (PGM / WAV) decoded by
    # decode_blob's real branches match the generator's carried ground
    # truth EXACTLY — pixel count, int64 pixel sum, frame count
    from pyspark.sql import functions as F

    from sparksketch.multimodal import decode_stats, synth_real_media
    ids = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    media = synth_real_media(ids, "doc_id", seed=42)
    checked = decode_stats(
        media, decoder="real",
        keep=["mime", "expected_pixels", "expected_sum", "expected_frames"])
    bad = checked.filter(
        (F.col("n_pixels") != F.col("expected_pixels"))
        | (F.col("pixel_sum") != F.col("expected_sum"))
        | (F.col("n_frames") != F.col("expected_frames")))
    assert bad.count() == 0
    mimes = dict(checked.groupBy("mime").count().collect())
    assert mimes == {"image/pgm": 150, "audio/wav": 150}
    # determinism: same (id, seed) → byte-identical blobs
    b1 = media.filter("media_id = 7").first().media
    b2 = synth_real_media(ids, "doc_id", seed=42).filter("media_id = 7").first().media
    assert bytes(b1) == bytes(b2)


def test_decode_stats_catches_corruption(spark):
    # negative control: flip payload bytes → pixel_sum must mismatch
    from pyspark.sql import functions as F

    from sparksketch.multimodal import decode_stats, synth_real_media
    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    media = synth_real_media(ids, "doc_id", seed=42)
    # corrupt the LAST byte (payload) of every blob; headers stay valid
    corrupted = media.withColumn(
        "media",
        F.concat(F.expr("substring(media, 1, length(media) - 1)"),
                 F.expr("CAST(X'00' AS BINARY)")))
    checked = decode_stats(
        corrupted, decoder="real", keep=["expected_sum"])
    n_bad = checked.filter(F.col("pixel_sum") != F.col("expected_sum")).count()
    assert n_bad > 0
