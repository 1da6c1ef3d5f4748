"""spark-submit entry: build the cascading Bloom filter over a web-page table.

Cluster usage (north_rule: run via ``spark-submit --py-files`` at N and 4N
executors):

    zip -r sparksketch.zip sparksketch/
    spark-submit --py-files sparksketch.zip sparksketch/jobs/build_filter.py \
        --input s3://bucket/webpages/ --col url \
        --n-shards 4096 --checkpoint-dir /chk/bloom --output /out/filter.bin

Sandbox usage (two parallelism levels stand in for two cluster sizes):

    python -m sparksketch.jobs.build_filter --synthetic 500000 --cores 8
    python -m sparksketch.jobs.build_filter --synthetic 500000 --cores 32

Prints ONE JSON line with rows, elapsed seconds, docs/sec, FPR bound and
checkpoint/resume info — the metrics feed BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Build a distributed cascading Bloom filter")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet path of the web-page table")
    src.add_argument("--synthetic", type=int, help="synthesize N webpages instead")
    ap.add_argument("--col", default="url", help="key column (default url)")
    ap.add_argument("--accuracy", choices=["low", "medium", "high"], default="medium")
    ap.add_argument("--capacity", choices=["low", "medium", "high", "very_high"], default="medium")
    ap.add_argument("--tiers", type=int, default=2)
    ap.add_argument("--no-rehash", action="store_true")
    ap.add_argument("--n-shards", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--expected-keys", type=int, default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--output", default=None, help="write the merged filter blob here")
    ap.add_argument("--cores", default=None, help="local[N] cores (sandbox only)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from sparksketch.bloom import build_bloom
    from sparksketch.checkpoint import save_state
    from sparksketch.config import Accuracy, BloomConfig, InitialCapacity
    from sparksketch.session import get_spark
    from sparksketch.webtext import webpages

    from pyspark.sql import SparkSession
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("build_filter", cores=args.cores)
    cfg = BloomConfig(
        accuracy=Accuracy(args.accuracy),
        initial_capacity=InitialCapacity(args.capacity),
        tiers=args.tiers,
        rehash=not args.no_rehash,
    )

    if args.synthetic:
        df = webpages(spark, args.synthetic, seed=args.seed)
        input_id = f"synthetic:{args.synthetic}:{args.seed}"
        expected = args.expected_keys or args.synthetic
    else:
        df = spark.read.parquet(args.input)
        input_id = args.input
        expected = args.expected_keys

    n_rows = df.count()
    t0 = time.perf_counter()
    state = build_bloom(
        df, args.col, cfg,
        n_shards=args.n_shards, partitions=args.partitions,
        expected_keys=expected, checkpoint_dir=args.checkpoint_dir,
        input_id=input_id,
    )
    elapsed = time.perf_counter() - t0

    blob_bytes = None
    if args.output:
        blob_bytes = save_state(state, args.output)

    cores = spark.sparkContext.defaultParallelism
    print(json.dumps({
        "rows": n_rows,
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n_rows / elapsed, 1),
        "cores": cores,
        "key_count": state.key_count,
        "bit_size": state.bit_size,
        "fpr_bound": state.fpr_bound(),
        "overflowed_levels": len(state.overflowed_levels()),
        "blob_bytes": blob_bytes,
        "input": input_id,
    }))
    if owns_session:
        spark.stop()  # don't tear down a session the caller owns
    return 0


if __name__ == "__main__":
    sys.exit(main())
