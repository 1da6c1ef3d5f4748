"""spark-submit entry: the full training-data pipeline over a web-page table.

One pass of what a 100 TB crawl-curation job does, composed from the
library's operators:

  1. load (Iceberg identifier or parquet path; synthetic fallback)
  2. extract text from html, verify byte-identical per url
  3. enforce the 1 MB key guard
  4. quality scoring + language ID; filter to quality ≥ threshold
  5. exact + MinHash near-dup removal
  6. build the Bloom filter over surviving urls (dedupe gate for the NEXT
     crawl increment: "which urls are definitely new?")
  7. companion sketches for corpus stats (distinct urls, host frequencies,
     doc-length quantiles)

Prints ONE JSON line of stage metrics (rows in/out per stage, docs/s).

    python -m sparksketch.jobs.pipeline --synthetic 200000 --cores 8
    spark-submit --py-files sparksketch.zip sparksketch/jobs/pipeline.py \
        --input iceberg.crawl.webpages --output-filter /filters/crawl.bin
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Web-corpus curation pipeline")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="Iceberg identifier or parquet path")
    src.add_argument("--synthetic", type=int)
    ap.add_argument("--cores", default=None)
    ap.add_argument("--quality-min", type=float, default=0.4)
    ap.add_argument("--jaccard-threshold", type=float, default=0.85)
    ap.add_argument("--n-shards", type=int, default=None)
    ap.add_argument("--output-filter", default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sparksketch.bloom import BloomConfig, build_bloom
    from sparksketch.checkpoint import save_state
    from sparksketch.cms import cms_build
    from sparksketch.dedup import dedup_representatives, exact_dedup, minhash_dedup_pairs
    from sparksketch.hll import hll_distinct
    from sparksketch.kll import kll_build
    from sparksketch.session import get_spark
    from sparksketch.sources import load_table
    from sparksketch.textstats import lang_id, quality_features
    from sparksketch.webtext import enforce_key_limit, extract_text, webpages

    from pyspark.sql import SparkSession
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("pipeline", cores=args.cores,
                      extra={"spark.ui.showConsoleProgress": "false"})
    t0 = time.perf_counter()
    metrics: dict = {"stages": {}}

    if args.synthetic:
        df = webpages(spark, args.synthetic, seed=args.seed)
    else:
        df = load_table(spark, args.input)
    n0 = df.count()
    metrics["stages"]["input_rows"] = n0

    # 2. extraction + invariant
    ext = extract_text(df, passthrough=["url", "text", "lang"])
    bad = ext.filter(F.col("extracted_text") != F.col("text")).count()
    metrics["stages"]["extraction_mismatches"] = bad

    # 3. key guard
    guarded = enforce_key_limit(ext.select("url", F.col("extracted_text").alias("text"), "lang"), "text")
    n_guard = guarded.count()
    metrics["stages"]["after_key_guard"] = n_guard

    # 4. quality + language
    scored = lang_id(quality_features(guarded))
    kept = scored.filter(F.col("quality_score") >= args.quality_min).cache()
    n_quality = kept.count()
    metrics["stages"]["after_quality_filter"] = n_quality

    # 5. dedup: exact, then near-dup PAIRS resolved into CLUSTERS (connected
    # components) and one representative kept per cluster — pair-local
    # drop-the-greater would keep two docs that are both near-dups of a
    # third but not of each other, and over-drop long chains.
    # doc_id = xxhash64(url): 64-bit id collisions alias ~n²/2^65 url pairs
    # (a few 10^4 at 10^12 docs) — negligible for curation, and content
    # dedup itself keys on a 128-bit fingerprint (see dedup.exact_dedup_ids)
    with_ids = kept.withColumn("doc_id", F.xxhash64("url"))
    exact = exact_dedup(with_ids, "text", "doc_id").cache()
    n_exact = exact.count()
    pairs = minhash_dedup_pairs(exact, "text", "doc_id",
                                threshold=args.jaccard_threshold)
    final = dedup_representatives(exact, pairs, "doc_id").cache()
    n_final = final.count()
    metrics["stages"]["after_exact_dedup"] = n_exact
    metrics["stages"]["after_near_dedup"] = n_final

    # 6. bloom filter over the curated urls
    state = build_bloom(final, "url", BloomConfig(), n_shards=args.n_shards,
                        expected_keys=n_final)
    metrics["bloom"] = {"key_count": state.key_count, "bit_size": state.bit_size,
                        "fpr_bound": state.fpr_bound()}
    if args.output_filter:
        metrics["bloom"]["blob_bytes"] = save_state(state, args.output_filter)

    # 7. corpus stats via sketches
    from sparksketch.topk import heavy_hitters
    hosts = final.select(
        F.substring_index(F.substring_index("url", "/", 3), "//", -1).alias("h"))
    hh = heavy_hitters(hosts, "h", k=16)
    kll = kll_build(final.select(F.length("text").alias("len")), "len")
    metrics["sketches"] = {
        "distinct_urls_hll": round(hll_distinct(final, "url", p=14), 1),
        "n_chars_p50": kll.quantile(0.5),
        "n_chars_p99": kll.quantile(0.99),
        "host_cms_total": cms_build(hosts, "h").total,
        "top_hosts": [{"host": k, "cnt_lo": c} for k, c in hh.topk(3)],
        "top_hosts_err_bound": hh.error_bound(),
    }

    # 8. deterministic train/val/test split (content-keyed, engine-portable)
    from sparksketch.decontam import hash_split
    splits = hash_split(final, "url", {"train": 0.9, "val": 0.05, "test": 0.05})
    metrics["splits"] = {r.split: r["count"] for r in
                         splits.groupBy("split").count().collect()}

    elapsed = time.perf_counter() - t0
    metrics["elapsed_sec"] = round(elapsed, 2)
    metrics["docs_per_sec"] = round(n0 / elapsed, 1)
    print(json.dumps(metrics))
    if owns_session:
        spark.stop()  # don't tear down a session the caller owns
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
