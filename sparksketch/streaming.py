"""Structured Streaming integration: incrementally fold a stream into a
mergeable sketch.

Mergeable sketches are the natural streaming aggregate: each micro-batch is
just another partial to OR/max/add into the running state.  The fold runs in
``foreachBatch`` with an epoch guard, so replayed micro-batches (after a
crash) are skipped — exactly-once state even for the non-idempotent parts
(key counts, CMS counters).

The north rule is batch + resume, so this module is a thin composition of
the batch builders (no custom stateful operators needed):

    q = stream_bloom(readStream_df, "url", cfg, "/state/bloom").start()

State layout: ``{dir}/state.bin`` (the sketch blob) + ``{dir}/commit.json``
(last folded epoch), both atomically replaced — a reader always sees a
consistent (epoch, blob) pair.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame

from sparksketch.bloom import BloomConfig, BloomFilterState, build_bloom
from sparksketch.sketch import build_sketch


class SketchStateStore:
    """Atomic (epoch, blob) store for the streaming fold."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _blob_path(self) -> str:
        return os.path.join(self.path, "state.bin")

    @property
    def _commit_path(self) -> str:
        return os.path.join(self.path, "commit.json")

    def last_epoch(self) -> int:
        try:
            with open(self._commit_path) as f:
                return int(json.load(f)["epoch"])
        except (OSError, ValueError, KeyError):
            return -1

    def read_blob(self) -> bytes | None:
        try:
            with open(self._blob_path, "rb") as f:
                return f.read()
        except OSError:
            return None

    def commit(self, epoch: int, blob: bytes) -> None:
        tmp = self._blob_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, self._blob_path)
        ctmp = self._commit_path + ".tmp"
        with open(ctmp, "w") as f:
            json.dump({"epoch": epoch}, f)
        os.replace(ctmp, self._commit_path)


def foreach_batch_fold(store: SketchStateStore,
                       build_partial: Callable[[DataFrame], bytes],
                       merge_blobs_fn: Callable[[bytes, bytes], bytes]):
    """The generic epoch-guarded fold for ``writeStream.foreachBatch``."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= store.last_epoch():
            return  # replayed micro-batch after recovery: already folded
        partial = build_partial(batch_df)
        prev = store.read_blob()
        blob = partial if prev is None else merge_blobs_fn(prev, partial)
        store.commit(epoch_id, blob)

    return handle


def stream_bloom(stream_df: DataFrame, col: str, cfg: BloomConfig, state_dir: str,
                 n_shards: int = 64, partitions: int | None = None,
                 expected_keys: int | None = None, checkpoint_dir: str | None = None):
    """Fold a streaming DataFrame's ``col`` into a running Bloom filter.

    Returns the ``DataStreamWriter`` (caller adds trigger/options and
    ``.start()``).  ``checkpoint_dir`` is the Spark streaming checkpoint
    (offsets); sketch state lives in ``state_dir``."""
    from sparksketch.bloom import merge_blobs

    store = SketchStateStore(state_dir)

    def build_partial(batch_df: DataFrame) -> bytes:
        st = build_bloom(batch_df, col, cfg, n_shards=n_shards,
                         partitions=partitions, expected_keys=expected_keys)
        return st.to_bytes()

    writer = stream_df.writeStream.foreachBatch(
        foreach_batch_fold(store, build_partial, merge_blobs))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def stream_sketch(stream_df: DataFrame, col: str, factory: Callable, *,
                  seeds: tuple[int, ...] | None = None, numeric: bool = False,
                  state_dir: str, checkpoint_dir: str | None = None):
    """Same fold for any sketch of the library (HLL/CMS/t-digest/KLL)."""
    store = SketchStateStore(state_dir)
    cls = type(factory(0))

    def build_partial(batch_df: DataFrame) -> bytes:
        return build_sketch(batch_df, col, factory, seeds=seeds, numeric=numeric).to_bytes()

    def merge_blobs_fn(a: bytes, b: bytes) -> bytes:
        return cls.from_bytes(a).merge(cls.from_bytes(b)).to_bytes()

    writer = stream_df.writeStream.foreachBatch(
        foreach_batch_fold(store, build_partial, merge_blobs_fn))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def read_bloom_state(state_dir: str) -> BloomFilterState | None:
    blob = SketchStateStore(state_dir).read_blob()
    return None if blob is None else BloomFilterState.from_bytes(blob)


def stream_windowed_sketch(stream_df: DataFrame, ts_col: str, col: str,
                           factory: Callable, *, window: str = "1 hour",
                           seeds: tuple[int, ...] | None = None, numeric: bool = False,
                           state_dir: str, checkpoint_dir: str | None = None):
    """Per-event-time-window sketches over a stream: each micro-batch's rows
    are sketched per window (map-side combine via sketch_by_group keyed on
    the window start) and merged into that window's persisted blob.  Late
    rows merge into their window whenever they arrive — mergeable sketches
    make watermark-free lateness handling trivial for this state shape
    (nothing is emitted early that would need retraction)."""
    import re as _re

    from pyspark.sql import functions as F

    from sparksketch.sketch import sketch_by_group

    store = SketchStateStore(state_dir)
    cls = type(factory(0))

    def safe(name: str) -> str:
        return _re.sub(r"[^0-9A-Za-zT:-]", "_", name)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= store.last_epoch():
            return
        keyed = batch_df.withColumn(
            "_w", F.window(F.col(ts_col), window)["start"].cast("string"))
        partials = sketch_by_group(keyed, "_w", col, factory, seeds=seeds, numeric=numeric)
        for row in partials.collect():
            path = os.path.join(state_dir, f"w_{safe(row.group)}.bin")
            nxt = bytes(row.state)
            try:
                with open(path, "rb") as f:
                    nxt = cls.from_bytes(f.read()).merge(cls.from_bytes(nxt)).to_bytes()
            except OSError:
                pass
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(nxt)
            os.replace(tmp, path)
        store.commit(epoch_id, b"windowed")

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def read_windowed_states(state_dir: str, cls) -> dict[str, object]:
    out = {}
    for name in sorted(os.listdir(state_dir)):
        if name.startswith("w_") and name.endswith(".bin"):
            with open(os.path.join(state_dir, name), "rb") as f:
                out[name[2:-4]] = cls.from_bytes(f.read())
    return out
