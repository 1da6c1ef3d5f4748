"""Scale evidence for interval_join (the range_join sibling): 10M points x
2M intervals over 100k keys / 30-day span, interval length <= 600 s.

Prints ONE JSON line with the timing, pair count, and the plan's join
operators (the point: a Delta-cell equi-join — SortMergeJoin/ShuffledHashJoin,
never BroadcastNestedLoopJoin).  Synthetic input is a pure function of row
id (seed-free arithmetic), so the run is reproducible.

Usage: PYTHONPATH=/root/repo python scripts/interval_scale.py [cpus]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparksketch.events import interval_join
from sparksketch.plans import plan_digest
from sparksketch.session import get_spark

N_POINTS = 10_000_000
N_INTERVALS = 2_000_000
N_KEYS = 100_000
SPAN_S = 30 * 24 * 3600          # 30 days
MAX_LEN_S = 600                  # interval length contract

def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("interval-scale", cores=cpus, shuffle_partitions=cpus,
                      extra={"spark.ui.showConsoleProgress": "false"})
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")

    points = (spark.range(N_POINTS)
              .select(F.pmod(F.col("id") * 2654435761, F.lit(N_KEYS)).alias("k"),
                      F.timestamp_add(
                          "SECOND",
                          F.pmod(F.col("id") * 40503, F.lit(SPAN_S)).cast("int"),
                          t0).alias("ts")))
    intervals = (spark.range(N_INTERVALS)
                 .select(F.pmod(F.col("id") * 1099087573, F.lit(N_KEYS)).alias("k"),
                         F.pmod(F.col("id") * 48271, F.lit(SPAN_S - MAX_LEN_S)).cast("int").alias("_s"),
                         (F.pmod(F.col("id") * 69621, F.lit(MAX_LEN_S - 1)) + 1).cast("int").alias("_len"))
                 .select("k",
                         F.timestamp_add("SECOND", F.col("_s"), t0).alias("t_start"),
                         F.timestamp_add("SECOND", F.col("_s") + F.col("_len"), t0).alias("t_end")))

    out = interval_join(points, intervals, "k", "ts", "t_start", "t_end",
                        max_len_seconds=MAX_LEN_S)
    # warm the input generators / codegen so the timed run is the join
    points.count(); intervals.count()
    t = time.perf_counter()
    n_pairs = out.count()
    elapsed = round(time.perf_counter() - t, 1)
    d = plan_digest(out)
    print(json.dumps({
        "metric": "interval_join_pairs_at_scale", "n_points": N_POINTS,
        "n_intervals": N_INTERVALS, "n_keys": N_KEYS, "span_s": SPAN_S,
        "max_len_s": MAX_LEN_S, "pairs": n_pairs, "sec": elapsed,
        "cpus": cpus, "joins": d.joins,
        "cross_product": d.has_cross_product,
    }))
    spark.stop()
    return 0

if __name__ == "__main__":
    sys.exit(main())
