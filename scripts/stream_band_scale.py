"""Bench-scale evidence for the watermarked stream-stream band join:
stream 1M+1M deterministic events through ``stream_range_join`` in
micro-batches and require the PAIR SET to equal the batch ``range_join``'s
exactly (count + order-insensitive xxhash64 xor digest), plus throughput.

Prints ONE JSON line.  Usage:
  PYTHONPATH=/root/repo python scripts/stream_band_scale.py [cpus]
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

from sparksketch.events import range_join
from sparksketch.session import get_spark
from sparksketch.streaming import stream_range_join

N_ROWS = 1_000_000          # per side
N_KEYS = 100_000
WINDOW_S = 21_600           # 6 h of event time per key
DELTA_S = 300               # ±5 min band
N_FILES = 8                 # micro-batches per side


def synth_side(spark, n, seed, ts_col, id_col):
    base = F.lit(1_700_000_000)  # fixed epoch anchor
    mix = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(WINDOW_S))
    return (spark.range(n)
            .select((F.col("id") % N_KEYS).alias("user_id"),
                    F.timestamp_seconds(base + mix).alias(ts_col),
                    F.col("id").alias(id_col)))


def digest(df, cols):
    # order-insensitive exact pair-set digest: xor of row hashes (CLAUDE.md:
    # bit_xor not sum — ANSI overflow; null-flag+coalesce per column)
    parts = []
    for c in cols:
        parts.append(F.col(c).isNull().cast("int"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    row = df.select(F.xxhash64(*parts).alias("h"))
    r = row.agg(F.count("*").alias("n"),
                F.expr("bit_xor(h)").alias("x")).first()
    return int(r.n), int(r.x or 0)


def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("stream-band", cores=cpus, shuffle_partitions=cpus,
                      extra={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="stream_band_")
    try:
        l_dir, r_dir = os.path.join(tmp, "l"), os.path.join(tmp, "r")
        left = synth_side(spark, N_ROWS, 1, "c_ts", "lid")
        right = synth_side(spark, N_ROWS, 2, "p_ts", "rid")
        left.repartition(N_FILES).write.parquet(l_dir)
        right.repartition(N_FILES).write.parquet(r_dir)
        lb, rb = spark.read.parquet(l_dir), spark.read.parquet(r_dir)

        # batch ground truth (the Δ-cell equi-join operator)
        t0 = time.perf_counter()
        want = range_join(lb.withColumnRenamed("c_ts", "ts"),
                          rb.withColumnRenamed("p_ts", "ts"),
                          "user_id", "ts", DELTA_S)
        # only clashing right columns get the _r suffix — lid/rid are
        # already distinct, so the pair identity columns pass through
        want_n, want_x = digest(want.select("user_id", "lid", "rid"),
                                ["user_id", "lid", "rid"])
        batch_sec = round(time.perf_counter() - t0, 1)

        # streaming run: every row arrives inside the watermark horizon
        # (files replay historical data), so completeness must be exact
        t0 = time.perf_counter()
        ls = (spark.readStream.schema(lb.schema)
              .option("maxFilesPerTrigger", 1).parquet(l_dir))
        rs = (spark.readStream.schema(rb.schema)
              .option("maxFilesPerTrigger", 1).parquet(r_dir))
        out = stream_range_join(ls, rs, "user_id", "c_ts", "p_ts",
                                delta_seconds=DELTA_S, delay="30 days")
        sink = os.path.join(tmp, "sink")
        q = (out.select("user_id", "lid", "rid")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", os.path.join(tmp, "chk"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        stream_sec = round(time.perf_counter() - t0, 1)
        got_n, got_x = digest(spark.read.parquet(sink),
                              ["user_id", "lid", "rid"])

        equal = (got_n, got_x) == (want_n, want_x)
        print(json.dumps({
            "metric": "stream_band_join_pairset_equality",
            "rows_per_side": N_ROWS, "n_keys": N_KEYS,
            "delta_seconds": DELTA_S, "micro_batches": N_FILES,
            "pairs": got_n, "pairset_equal": equal,
            "batch_sec": batch_sec, "stream_sec": stream_sec,
            "stream_rows_per_sec": round(2 * N_ROWS / stream_sec),
            "cpus": cpus,
        }))
        return 0 if (equal and got_n > 0) else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
