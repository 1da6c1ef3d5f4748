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
import struct
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksketch.bloom import BloomConfig, BloomFilterState, build_bloom
from sparksketch.sketch import build_sketch


_STATE_MAGIC = b"SKST"


class SketchStateStore:
    """Atomic (epoch, blob) store for the streaming fold.

    The epoch travels IN the state file's header, replaced in ONE
    ``os.replace`` — a two-file design (blob then commit marker) has a
    crash window between the writes where the blob already contains the
    epoch's fold but the marker says it doesn't, and the replayed batch
    folds twice.  ``commit.json`` is still written as a human-readable
    mirror; the header is authoritative."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _blob_path(self) -> str:
        return os.path.join(self.path, "state.bin")

    @property
    def _commit_path(self) -> str:
        return os.path.join(self.path, "commit.json")

    def _read(self) -> tuple[bytes | None, int]:
        try:
            with open(self._blob_path, "rb") as f:
                data = f.read()
        except OSError:
            data = None
        if data is not None and data[:4] == _STATE_MAGIC:
            (epoch,) = struct.unpack_from("<q", data, 4)
            return data[12:], epoch
        # legacy layout: headerless blob + commit.json marker
        try:
            with open(self._commit_path) as f:
                epoch = int(json.load(f)["epoch"])
        except (OSError, ValueError, KeyError):
            epoch = -1
        return data, epoch

    def last_epoch(self) -> int:
        return self._read()[1]

    def read_blob(self) -> bytes | None:
        return self._read()[0]

    def commit(self, epoch: int, blob: bytes) -> None:
        tmp = self._blob_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_STATE_MAGIC + struct.pack("<q", epoch) + blob)
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
        last = store.last_epoch()
        if epoch_id == last:
            return  # replayed micro-batch after recovery: already folded
        if epoch_id < last:
            # a FRESH streaming checkpoint restarts epochs at 0; silently
            # skipping would discard the next `last` batches of data
            raise ValueError(
                f"state_dir committed epoch {last} but the stream delivered "
                f"epoch {epoch_id}: this state belongs to a different "
                f"checkpoint lineage — clear the state_dir or reuse the "
                f"original checkpointLocation")
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
                  keyed: bool = False,
                  state_dir: str, checkpoint_dir: str | None = None):
    """Same fold for any sketch of the library (HLL/CMS/t-digest/KLL;
    ``keyed=True`` for raw-key sketches like Misra-Gries trending keys)."""
    store = SketchStateStore(state_dir)
    cls = type(factory(0))

    def build_partial(batch_df: DataFrame) -> bytes:
        return build_sketch(batch_df, col, factory, seeds=seeds,
                            numeric=numeric, keyed=keyed).to_bytes()

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


_WIN_MAGIC = b"SKW1"


def _read_window_file(path: str) -> tuple[bytes | None, int]:
    """(sketch blob, last-folded epoch). Headerless legacy files → epoch -1."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None, -1
    if data[:4] == _WIN_MAGIC:
        (epoch,) = struct.unpack_from("<q", data, 4)
        return data[12:], epoch
    return data, -1


def windowed_fold_handler(store: SketchStateStore, state_dir: str, factory: Callable,
                          ts_col: str, col: str, window: str,
                          seeds: tuple[int, ...] | None, numeric: bool,
                          keyed: bool = False):
    """The per-window epoch-idempotent ``foreachBatch`` handler (exposed for
    crash-replay tests).  Idempotency: every window file records the last
    epoch folded into it; a crash between window writes and the global
    commit leaves some windows already at this epoch, and the replayed
    micro-batch skips exactly those — no double-counting.  The global epoch
    commits only after every window of the batch succeeded."""
    import re as _re

    from pyspark.sql import functions as F

    from sparksketch.sketch import sketch_by_group

    cls = type(factory(0))

    def safe(name: str) -> str:
        return _re.sub(r"[^0-9A-Za-zT:-]", "_", name)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        last = store.last_epoch()
        if epoch_id == last:
            return
        if epoch_id < last:
            raise ValueError(
                f"state_dir committed epoch {last} but the stream delivered "
                f"epoch {epoch_id}: this state belongs to a different "
                f"checkpoint lineage — clear the state_dir or reuse the "
                f"original checkpointLocation")
        win = batch_df.withColumn(
            "_w", F.window(F.col(ts_col), window)["start"].cast("string"))
        partials = sketch_by_group(win, "_w", col, factory, seeds=seeds,
                                   numeric=numeric, keyed=keyed)
        # bounded collect: one blob-sized row per event-time window present
        # in THIS micro-batch (not per input row)
        for row in partials.collect():
            path = os.path.join(state_dir, f"w_{safe(row.group)}.bin")
            prev, w_epoch = _read_window_file(path)
            if w_epoch >= epoch_id:
                continue  # crash replay: this window already folded this epoch
            nxt = bytes(row.state)
            if prev is not None:
                nxt = cls.from_bytes(prev).merge(cls.from_bytes(nxt)).to_bytes()
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(_WIN_MAGIC + struct.pack("<q", epoch_id) + nxt)
            os.replace(tmp, path)
        store.commit(epoch_id, b"windowed")

    return handle


def stream_windowed_sketch(stream_df: DataFrame, ts_col: str, col: str,
                           factory: Callable, *, window: str = "1 hour",
                           seeds: tuple[int, ...] | None = None, numeric: bool = False,
                           keyed: bool = False,
                           state_dir: str, checkpoint_dir: str | None = None):
    """Per-event-time-window sketches over a stream: each micro-batch's rows
    are sketched per window (map-side combine via sketch_by_group keyed on
    the window start) and merged into that window's persisted blob.  Late
    rows merge into their window whenever they arrive — mergeable sketches
    make watermark-free lateness handling trivial for this state shape
    (nothing is emitted early that would need retraction).

    State layout: one ``w_{window_start}.bin`` per window under ``state_dir``
    (any shared mount / fuse-mounted object store works — writes are
    single-writer from the driver with atomic replace).  Exactly-once: each
    window file carries its last-folded epoch, so a replayed micro-batch
    after a mid-loop crash skips windows that already absorbed it (see
    :func:`windowed_fold_handler`).  The per-epoch collect is bounded by the
    number of windows in the batch, not its row count."""
    store = SketchStateStore(state_dir)
    handle = windowed_fold_handler(store, state_dir, factory, ts_col, col,
                                   window, seeds, numeric, keyed)
    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def stateful_sketch_by_key(stream_df: DataFrame, key_col: str, col: str,
                           factory: Callable, *, seeds: tuple[int, ...] | None = None,
                           numeric: bool = False, ts_col: str | None = None,
                           ttl_seconds: int | None = None) -> DataFrame:
    """Custom stateful streaming operator: a running sketch PER KEY kept in
    Spark's keyed state store (``applyInPandasWithState``), emitting
    ``(key, n_rows, estimate, evicted)`` updates each micro-batch.

    This is the state-store-native alternative to the ``foreachBatch`` folds
    above: state is partitioned by key across executors (scales with keys,
    no driver files), checkpointed/restored by Structured Streaming itself,
    and exactly-once under replay because the state version is tied to the
    batch epoch.  Hashing stays JVM-side — the stream is projected to
    seeded ``xxhash64`` columns BEFORE the stateful groupBy, so the state
    function only does numpy updates on int64 columns (no per-row Python).

    **Bounded state for unbounded key spaces**: pass ``ts_col`` +
    ``ttl_seconds`` and apply ``withWatermark(ts_col, ...)`` upstream —
    keys idle past the watermark + TTL emit one final ``evicted=True`` row
    and their state is removed (event-time timeout).  Without eviction a
    10^9-key stream grows the store forever; with it, state size tracks the
    ACTIVE key set.  A key seen again later starts fresh (documented
    forgetting semantics — size the TTL to the lateness you must absorb).

    Returns the transformed streaming DataFrame (caller adds writeStream).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sparksketch.hashing import hash_col, to_u64

    cls = type(factory(0))
    if (ts_col is None) != (ttl_seconds is None):
        raise ValueError("ts_col and ttl_seconds go together")

    extra = [F.col(ts_col)] if ts_col else []
    if numeric:
        proj = stream_df.filter(F.col(col).isNotNull()).select(
            F.col(key_col).cast("string").alias("_k"),
            F.col(col).cast("double").alias("_v0"), *extra)
        val_cols = ["_v0"]
    else:
        if not seeds:
            raise ValueError("stateful sketch needs seeds= or numeric=True")
        key = F.col(col).cast("string")
        proj = stream_df.filter(key.isNotNull()).select(
            F.col(key_col).cast("string").alias("_k"),
            *[hash_col(key, s).alias(f"_h{i}") for i, s in enumerate(seeds)], *extra)
        val_cols = [f"_h{i}" for i in range(len(seeds))]

    def fn(group_key, pdfs, state):
        if state.hasTimedOut:
            blob, n_rows = state.get
            sk = cls.from_bytes(bytes(blob))
            state.remove()
            yield pd.DataFrame({"key": [group_key[0]], "n_rows": [n_rows],
                                "estimate": [float(sk.estimate())],
                                "evicted": [True]})
            return
        if state.exists:
            blob, n_rows = state.get
            sk = cls.from_bytes(bytes(blob))
        else:
            sk, n_rows = factory(0), 0
        max_ev_ms = 0
        for pdf in pdfs:
            n_rows += len(pdf)
            if numeric:
                sk.update_values(pdf["_v0"].to_numpy(dtype=np.float64))
            else:
                sk.update_hashes(*[to_u64(pdf[c].to_numpy(dtype=np.int64))
                                   for c in val_cols])
            if ts_col is not None and len(pdf):
                ev = pdf[ts_col].dropna()  # all-NULL chunk → NaT.max() would raise
                if len(ev):
                    max_ev_ms = max(max_ev_ms, int(ev.max().timestamp() * 1000))
        state.update((sk.to_bytes(), n_rows))
        if ttl_seconds is not None:
            # base the timeout on the KEY'S OWN latest event time, not the
            # global watermark: the watermark is 0 on the first batch and
            # always one batch stale, which would evict keys long before
            # they were ttl_seconds idle in event time
            base = max(max_ev_ms, state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(base + ttl_seconds * 1000)
        yield pd.DataFrame({"key": [group_key[0]], "n_rows": [n_rows],
                            "estimate": [float(sk.estimate())],
                            "evicted": [False]})

    return proj.groupBy("_k").applyInPandasWithState(
        fn,
        outputStructType="key string, n_rows long, estimate double, evicted boolean",
        stateStructType="blob binary, n_rows long",
        outputMode="update",
        timeoutConf=(GroupStateTimeout.EventTimeTimeout if ttl_seconds is not None
                     else GroupStateTimeout.NoTimeout),
    )


def read_windowed_states(state_dir: str, cls) -> dict[str, object]:
    out = {}
    for name in sorted(os.listdir(state_dir)):
        if name.startswith("w_") and name.endswith(".bin"):
            blob, _epoch = _read_window_file(os.path.join(state_dir, name))
            out[name[2:-4]] = cls.from_bytes(blob)
    return out


# ====================================================================
# streaming exact dedup
# ====================================================================

def stream_dedup_exact(stream_df: DataFrame, cols: list[str], ts_col: str,
                       delay: str = "10 minutes",
                       hash_keys: bool = True) -> DataFrame:
    """Streaming **exact dedup**: drop rows whose key columns repeat within
    the watermark horizon — the streaming counterpart of
    ``dedup.exact_dedup`` (a Bloom handles the unbounded-history case
    probabilistically via ``stream_bloom``; this is the exact-within-window
    pass).  Wraps ``dropDuplicatesWithinWatermark`` so state is evicted once
    the event-time watermark passes ``delay`` — bounded state at any input
    rate, unlike a plain ``dropDuplicates`` whose key store grows forever.

    With ``hash_keys`` (default) the dedup state stores one ``xxhash64``
    column instead of the raw keys — at 100 TB the state store holds 8 B per
    key, never document text (the same ship-hashes-not-text rule as the
    batch path; 64-bit collisions ≈ n²/2⁶⁵ false drops, documented).
    """
    if not cols:
        raise ValueError("stream_dedup_exact needs at least one key column")
    wm = stream_df.withWatermark(ts_col, delay)
    if hash_keys:
        # xxhash64 silently SKIPS null children, so (x, NULL) and (NULL, x)
        # would otherwise hash identically — a deterministic cross-column
        # collision.  Hash a per-column (null-flag, coalesced-value) pair
        # instead: flags are never null, so every key layout is distinct.
        parts = []
        for c in cols:
            parts.append(F.col(c).isNull().cast("int"))
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        wm = wm.withColumn("_dk", F.xxhash64(*parts))
        return wm.dropDuplicatesWithinWatermark(["_dk"]).drop("_dk")
    return wm.dropDuplicatesWithinWatermark(list(cols))


def stream_range_join(left: DataFrame, right: DataFrame, on: str,
                      l_ts: str, r_ts: str, delta_seconds: float,
                      delay: str = "10 minutes",
                      rsuffix: str = "_r") -> DataFrame:
    """Streaming **band join**: the stream-stream counterpart of
    ``events.range_join`` — pairs with equal ``on`` keys whose event times
    differ by at most ``delta_seconds``, as both sides arrive.

    Built on Spark's watermarked stream-stream inner join: both sides get
    an event-time watermark of ``delay``, and the time-RANGE condition
    (``r.ts BETWEEN l.ts − Δ AND l.ts + Δ``) lets the state store evict a
    row once the other side's watermark passes its band — **bounded state**
    at any input rate (delay + Δ of history per key), which is the whole
    point versus joining unbounded tables.  Matches later than
    ``delay`` after their partner's event time are dropped as late data —
    size ``delay`` to the real cross-stream skew and note the completeness
    contract is the watermark's, not the operator's.

    Right-side columns are suffixed with ``rsuffix`` (the ``on`` column is
    kept once).  Rows with NULL key or NULL event time never match, as in
    the batch operator.
    """
    delta_us = int(round(delta_seconds * 1_000_000))
    if delta_us <= 0:
        raise ValueError("delta_seconds must be positive")
    # shared validation with the batch Δ-cell joins: required columns,
    # reserved names, and suffix collisions all rejected with clear errors
    from sparksketch.events import _checked_suffix_rename
    ren = _checked_suffix_rename("stream_range_join", left, right,
                                 [on, l_ts], [on, r_ts], set(), rsuffix)
    r = right.select(*[F.col(c).alias(n) for c, n in ren.items()])
    r_on, r_ts_col = ren[on], ren[r_ts]
    # watermarks accept only TIMESTAMP (LTZ) event time — parquet NTZ
    # columns are cast here; wall-clock values are unchanged under the
    # library's pinned-UTC sessions
    lw = (left.filter(F.col(on).isNotNull() & F.col(l_ts).isNotNull())
          .withColumn(l_ts, F.col(l_ts).cast("timestamp"))
          .withWatermark(l_ts, delay))
    rw = (r.filter(F.col(r_on).isNotNull() & F.col(r_ts_col).isNotNull())
          .withColumn(r_ts_col, F.col(r_ts_col).cast("timestamp"))
          .withWatermark(r_ts_col, delay))
    # integer-microsecond interval: str(float) would render small deltas in
    # scientific notation, which the INTERVAL parser rejects — and micros
    # match the batch operator's boundary arithmetic exactly
    iv = F.expr(f"INTERVAL {delta_us} MICROSECONDS")
    cond = ((F.col(on) == F.col(r_on))
            & (F.col(r_ts_col) >= F.col(l_ts) - iv)
            & (F.col(r_ts_col) <= F.col(l_ts) + iv))
    return lw.join(rw, cond).drop(r_on)
