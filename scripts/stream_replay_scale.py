"""Bench-scale exactly-once certificate for the streaming bloom fold:
stream >=1M urls (16 micro-batches), KILL the query mid-run, resume from the
same checkpoint, and require the final sketch blob to be BYTE-IDENTICAL to
an uninterrupted run's — plus exact key_count and zero FN on a sample.

Prints ONE JSON line.  Usage:
  PYTHONPATH=/root/repo python scripts/stream_replay_scale.py [cpus]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparksketch.bloom import BloomConfig
from sparksketch.session import get_spark
from sparksketch.streaming import SketchStateStore, read_bloom_state, stream_bloom
from sparksketch.webtext import webpages

N_ROWS = 1_000_000
N_FILES = 16
KILL_AFTER_EPOCHS = 6


def run_stream(spark, src_dir, schema, state_dir, chk_dir, kill_after=None):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir)
              .select("url"))
    writer = stream_bloom(stream, "url", BloomConfig(), state_dir,
                          n_shards=64, partitions=16,
                          expected_keys=N_ROWS, checkpoint_dir=chk_dir)
    q = writer.trigger(availableNow=True).start()
    if kill_after is not None:
        store = SketchStateStore(state_dir)
        # kill mid-run: stop the query the moment `kill_after` epochs have
        # committed — whatever micro-batch is in flight is lost and must be
        # replayed (exactly once) on resume
        while q.isActive and store.last_epoch() < kill_after:
            time.sleep(0.05)
        q.stop()
        q.awaitTermination()
        return False  # not complete
    q.awaitTermination()
    return True


def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("stream-replay", cores=cpus, shuffle_partitions=cpus,
                      extra={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="stream_replay_")
    try:
        src_dir = os.path.join(tmp, "src")
        wp = webpages(spark, N_ROWS, seed=42, partitions=N_FILES).select("url")
        wp.repartition(N_FILES).write.parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema

        # run A: uninterrupted
        t0 = time.perf_counter()
        run_stream(spark, src_dir, schema,
                   os.path.join(tmp, "stateA"), os.path.join(tmp, "chkA"))
        clean_sec = round(time.perf_counter() - t0, 1)

        # run B: killed after KILL_AFTER_EPOCHS commits, then resumed
        t0 = time.perf_counter()
        done = run_stream(spark, src_dir, schema,
                          os.path.join(tmp, "stateB"), os.path.join(tmp, "chkB"),
                          kill_after=KILL_AFTER_EPOCHS)
        assert not done
        epochs_at_kill = SketchStateStore(os.path.join(tmp, "stateB")).last_epoch()
        # the certificate is vacuous unless the kill landed MID-RUN: a fast
        # box could commit all 16 epochs before the 50 ms poll fires.
        # foreachBatch epoch ids are 0-based, so a COMPLETED run shows
        # last_epoch == N_FILES - 1.
        assert epochs_at_kill < N_FILES - 1, (
            f"kill landed after epoch {epochs_at_kill} = the final batch - "
            "raise N_FILES or lower KILL_AFTER_EPOCHS")
        run_stream(spark, src_dir, schema,
                   os.path.join(tmp, "stateB"), os.path.join(tmp, "chkB"))
        replay_sec = round(time.perf_counter() - t0, 1)

        a = read_bloom_state(os.path.join(tmp, "stateA"))
        b = read_bloom_state(os.path.join(tmp, "stateB"))
        identical = a.to_bytes() == b.to_bytes()
        sample = [r.url for r in wp.limit(10_000).collect()]
        fn = sum(not b.contains(u) for u in sample)
        print(json.dumps({
            "metric": "stream_replay_byte_identical", "rows": N_ROWS,
            "files": N_FILES, "killed_after_epochs": epochs_at_kill,
            "byte_identical": identical, "key_count": b.key_count,
            "key_count_exact": b.key_count == N_ROWS,
            "fn_in_10k_sample": fn, "clean_sec": clean_sec,
            "kill_resume_sec": replay_sec, "cpus": cpus,
        }))
        return 0 if (identical and fn == 0 and b.key_count == N_ROWS) else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
