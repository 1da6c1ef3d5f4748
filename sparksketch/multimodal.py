"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The Spark-side machinery — schemas, batch iteration, partition sizing, UDF
signatures — is real and tested.  ``decoder="fake"`` uses a deterministic
synthetic codec (documented header format below) so the full pipeline runs
end-to-end in CI; ``decoder="real"`` dispatches per blob: binary PGM images
parse with pure numpy and RIFF/WAVE audio with the stdlib ``wave`` module
(both genuinely decode in this container), while PNG/JPEG probe for PIL at
the seam and raise ``NotImplementedError`` when it is absent.

Fake media format (for the deterministic codec):
    bytes 0-3   magic b"FMED"
    bytes 4-5   width  (uint16 LE)
    bytes 6-7   height (uint16 LE)
    bytes 8-9   n_frames (uint16 LE; 1 = still image)
    bytes 10..  payload: n_frames · width · height bytes (grayscale)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, media binary, mime string, width int, height int, "
                "n_frames int, source_url string")

_MAGIC = b"FMED"


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42,
                partitions: int | None = None, max_dim: int = 64) -> DataFrame:
    """Deterministic fake media table (pure function of row id)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rng_mix = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed))
            w = (rng_mix % np.uint64(max_dim - 8) + np.uint64(8)).astype(np.int32)
            h = ((rng_mix >> np.uint64(17)) % np.uint64(max_dim - 8) + np.uint64(8)).astype(np.int32)
            frames = ((rng_mix >> np.uint64(33)) % np.uint64(4) + np.uint64(1)).astype(np.int32)
            blobs = []
            for i in range(len(ids)):
                size = int(w[i]) * int(h[i]) * int(frames[i])
                payload = (np.arange(size, dtype=np.uint64) * np.uint64(2654435761)
                           + rng_mix[i]) % np.uint64(256)
                blobs.append(
                    _MAGIC + struct.pack("<HHH", int(w[i]), int(h[i]), int(frames[i]))
                    + payload.astype(np.uint8).tobytes()
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(blobs, pa.binary()),
                    pa.array(np.where(frames > 1, "video/fake", "image/fake"), pa.string()),
                    pa.array(w, pa.int32()),
                    pa.array(h, pa.int32()),
                    pa.array(frames, pa.int32()),
                    pa.array(np.char.add("https://media.example.com/m", ids.astype("U20")), pa.string()),
                ],
                names=["media_id", "media", "mime", "width", "height", "n_frames", "source_url"],
            )

    return spark.range(0, n_rows, 1, parts).mapInArrow(gen, MEDIA_SCHEMA)


def _parse_header(blob: bytes) -> tuple[int, int, int]:
    if blob[:4] != _MAGIC:
        raise ValueError("not fake-media format")
    return struct.unpack("<HHH", blob[4:10])


def _have_pil() -> bool:
    import importlib.util
    return importlib.util.find_spec("PIL") is not None


def _decode_pgm(b: bytes) -> np.ndarray:
    """Binary PGM (netpbm P5, maxval ≤ 255) → (h, w) uint8 — a REAL image
    format parsed with pure numpy (no codec library needed)."""
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(b[start:pos]))
    w, h, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    pos += 1  # single whitespace after maxval
    return np.frombuffer(b, dtype=np.uint8, offset=pos, count=w * h).reshape(h, w)


def _decode_wav(b: bytes) -> np.ndarray:
    """RIFF/WAVE (stdlib ``wave``) → (1, n_samples) uint8 (16-bit PCM
    samples rescaled to 0..255 so audio flows through the same feature
    kernel as images — one modality-agnostic pipeline)."""
    import io
    import wave
    with wave.open(io.BytesIO(b)) as wf:
        n = wf.getnframes()
        raw = wf.readframes(n)
        width = wf.getsampwidth()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
        scaled = ((samples + 32768) >> 8).astype(np.uint8)
    elif width == 1:
        scaled = np.frombuffer(raw, dtype=np.uint8)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return scaled.reshape(1, -1)


def decode_blob(b: bytes) -> tuple[np.ndarray, int]:
    """One media blob → ((n_frames·h, w)-ish flat uint8 array, n_frames),
    dispatched on the container magic:

    - ``FMED`` — the deterministic fake codec (tests/CI);
    - ``P5`` — binary PGM, decoded with pure numpy (real format, real
      parse, no library);
    - ``RIFF..WAVE`` — PCM audio via the stdlib ``wave`` module;
    - PNG/JPEG — PIL when importable (probed at call time), else
      NotImplementedError at this exact seam.
    """
    if b[:4] == _MAGIC:
        w, h, nf = _parse_header(b)
        return np.frombuffer(b, dtype=np.uint8, offset=10), nf
    if b[:2] == b"P5":
        return _decode_pgm(b).ravel(), 1
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return _decode_wav(b).ravel(), 1
    if _have_pil():
        import io

        from PIL import Image
        img = Image.open(io.BytesIO(b)).convert("L")
        return np.asarray(img, dtype=np.uint8).ravel(), 1
    raise NotImplementedError(
        "PNG/JPEG decode needs PIL (not in this container) — probed via "
        "importlib at the decode seam; PGM/WAV/FMED decode natively")


def decode_features(df: DataFrame, media_col: str = "media", decoder: str = "fake",
                    n_features: int = 16) -> DataFrame:
    """media binary → feature vector array<float>[n_features].

    ``fake``: deterministic codec only (FMED blobs) — the CI path.
    ``real``: per-blob dispatch via :func:`decode_blob` — PGM and WAV decode
    natively in this container; PNG/JPEG through PIL when importable, else
    NotImplementedError at the seam.  Both paths share the same feature
    kernel and output schema, so swapping decoders never changes the
    Spark-side plumbing."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def fn(it):
        for pdf in it:
            feats = []
            for blob in pdf[media_col]:
                b = bytes(blob)
                if decoder == "fake":
                    _w, _h, nf = _parse_header(b)
                    pix = np.frombuffer(b, dtype=np.uint8, offset=10)
                else:
                    pix, nf = decode_blob(b)
                pix = pix.astype(np.float32)
                hist, _ = np.histogram(pix, bins=n_features - 2, range=(0, 256))
                v = np.concatenate((
                    [pix.mean() / 255.0, float(nf)],
                    hist / max(pix.size, 1),
                )).astype(np.float32)
                feats.append(v)
            yield pdf[["media_id"]].assign(features=feats)

    return df.mapInPandas(fn, "media_id long, features array<float>")


def synth_real_media(ids: DataFrame, id_col: str = "doc_id",
                     seed: int = 42, max_dim: int = 48) -> DataFrame:
    """REAL-format media (binary PGM images for even ids, RIFF/WAVE 16-bit
    PCM for odd ids), one blob per input id, pure function of (id, seed) —
    plus the decode ground truth carried alongside as exact integers
    (``expected_pixels``/``expected_sum``/``expected_frames``), derivable
    because the generator knows every byte it wrote.  This is what lets the
    driver gate exercise the REAL decoder (:func:`decode_blob`'s PGM and
    WAV branches, not the FMED fake) and still pin an exact certificate."""
    import io
    import wave

    import pandas as pd

    def gen(it):
        for pdf in it:
            vals = pdf[id_col].to_numpy()
            rows = {"media_id": [], "media": [], "mime": [],
                    "expected_pixels": [], "expected_sum": [],
                    "expected_frames": []}
            for i in vals:
                i = int(i)
                mix = (i * 0x9E3779B97F4A7C15 + seed) & 0xFFFFFFFFFFFFFFFF
                if i % 2 == 0:  # binary PGM
                    w = mix % (max_dim - 8) + 8
                    h = (mix >> 17) % (max_dim - 8) + 8
                    pix = ((np.arange(w * h, dtype=np.uint64)
                            * np.uint64(2654435761)
                            + np.uint64(mix)) % np.uint64(256)).astype(np.uint8)
                    blob = f"P5\n# id {i}\n{w} {h}\n255\n".encode() + pix.tobytes()
                    mime, npx, s = "image/pgm", w * h, int(pix.astype(np.int64).sum())
                else:  # RIFF/WAVE, 16-bit PCM mono
                    n = (mix >> 7) % 1900 + 100
                    samples = (((np.arange(n, dtype=np.uint64) * np.uint64(48271)
                                 + np.uint64(mix)) % np.uint64(65536))
                               .astype(np.int64) - 32768).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(8000)
                        wf.writeframes(samples.tobytes())
                    blob = buf.getvalue()
                    # the decoder rescales (s + 32768) >> 8 — mirror it
                    scaled = ((samples.astype(np.int64) + 32768) >> 8)
                    mime, npx, s = "audio/wav", int(n), int(scaled.sum())
                rows["media_id"].append(i)
                rows["media"].append(blob)
                rows["mime"].append(mime)
                rows["expected_pixels"].append(npx)
                rows["expected_sum"].append(s)
                rows["expected_frames"].append(1)
            yield pd.DataFrame(rows)

    return ids.mapInPandas(
        gen, "media_id long, media binary, mime string, expected_pixels long, "
             "expected_sum long, expected_frames int")


def decode_stats(df: DataFrame, media_col: str = "media",
                 decoder: str = "real", keep: list[str] | None = None) -> DataFrame:
    """Decode each blob and emit EXACT integer evidence — pixel count,
    int64 pixel sum, frame count — plus any ``keep`` passthrough columns
    (carrying ground truth through the same pass avoids a self-join against
    the generator lineage).  ``decoder`` as in :func:`decode_features`."""
    import pandas as pd

    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    keep = keep or []

    def fn(it):
        for pdf in it:
            n_frames, n_pixels, sums = [], [], []
            for blob in pdf[media_col]:
                b = bytes(blob)
                if decoder == "fake":
                    _w, _h, nf = _parse_header(b)
                    pix = np.frombuffer(b, dtype=np.uint8, offset=10)
                else:
                    pix, nf = decode_blob(b)
                n_frames.append(int(nf))
                n_pixels.append(int(pix.size))
                sums.append(int(pix.astype(np.int64).sum()))
            out = pdf[["media_id", *keep]].copy()
            out["n_frames"] = pd.Series(n_frames, index=pdf.index, dtype="int32")
            out["n_pixels"] = n_pixels
            out["pixel_sum"] = sums
            yield out

    keep_schema = "".join(
        f", `{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in keep)
    return df.mapInPandas(
        fn, f"media_id long{keep_schema}, n_frames int, n_pixels long, "
            f"pixel_sum long")


def resize_stub(df: DataFrame, media_col: str = "media", target: int = 32) -> DataFrame:
    """Nearest-neighbor resize of fake media (the real seam would call a
    codec); demonstrates binary-in/binary-out batch plumbing."""

    def fn(it):
        for pdf in it:
            out = []
            for blob in pdf[media_col]:
                b = bytes(blob)
                w, h, nf = _parse_header(b)
                pix = np.frombuffer(b, dtype=np.uint8, offset=10).reshape(nf, h, w)
                yi = (np.arange(target) * h // target)
                xi = (np.arange(target) * w // target)
                small = pix[:, yi][:, :, xi]
                out.append(_MAGIC + struct.pack("<HHH", target, target, nf) + small.tobytes())
            yield pdf.assign(**{media_col: out, "width": target, "height": target})

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(fn, schema)


def sample_frames(df: DataFrame, media_col: str = "media", every: int = 2) -> DataFrame:
    """Video → exploded rows of sampled frames (frame_idx, frame binary).
    The frame-sampling pattern for video corpora: one input row fans out to
    ceil(n_frames / every) rows."""

    def fn(it):
        import pandas as pd
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, blob in zip(pdf["media_id"], pdf[media_col]):
                b = bytes(blob)
                w, h, nf = _parse_header(b)
                pix = np.frombuffer(b, dtype=np.uint8, offset=10).reshape(nf, h, w)
                for fi in range(0, nf, every):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["frame"].append(_MAGIC + struct.pack("<HHH", w, h, 1) + pix[fi].tobytes())
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, "media_id long, frame_idx int, frame binary")
