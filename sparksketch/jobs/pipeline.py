"""spark-submit entry: the full training-data pipeline over a web-page table.

One pass of what a 100 TB crawl-curation job does, composed from the
library's operators:

  1. load (Iceberg identifier or parquet path; synthetic fallback)
  2. extract text from html, verify byte-identical per url
  3. enforce the 1 MB key guard; collapse trivially-different URLs of the
     same resource via canonical_url (first-by-url kept, deterministic)
  4. quality scoring + language ID + Gopher/C4 repetition filters; PII
     scrub of the surviving text
  5. exact + MinHash near-dup removal, then corpus-level paragraph dedup
     of the survivors (boilerplate collapses to one copy)
  6. per-host quota cap (no single host dominates the mix)
  7. build the Bloom filter over curated urls (dedupe gate for the NEXT
     crawl increment: "which urls are definitely new?")
  8. companion sketches for corpus stats (distinct urls, host frequencies,
     doc-length quantiles)
  9. deterministic train/val/test split, then decontaminate train against
     the held-out splits' shingles (zero-FN gate)

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
    ap.add_argument("--host-cap", type=int, default=100_000,
                    help="max docs kept per host (quota_sample)")
    ap.add_argument("--decontam-max-heldout", type=int, default=1_000_000,
                    help="skip the in-pipeline leakage report beyond this "
                         "many held-out docs (driver-merged benchmark Bloom)")
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

    # 3. key guard + canonical-url dedup (same resource under tracking
    # params / case / port variants collapses to one row; first-by-url kept)
    guarded = enforce_key_limit(ext.select("url", F.col("extracted_text").alias("text"), "lang"), "text")
    n_guard = guarded.count()
    metrics["stages"]["after_key_guard"] = n_guard
    from sparksketch.webtext import canonical_url
    # winner per canonical key via map-side-combined min(struct) — NOT a
    # row_number window: a popular resource under millions of URL variants
    # is the expected hot key here (it's why canonical_url exists), and a
    # window would sort it all on one reducer
    canoned = (guarded.withColumn("url_canon", canonical_url("url"))
               .groupBy("url_canon")
               .agg(F.min(F.struct("url", "text", "lang")).alias("_w"))
               .select("_w.url", "_w.text", "_w.lang"))
    n_canon = canoned.count()
    metrics["stages"]["after_url_canon_dedup"] = n_canon

    # 4. quality + language + repetition filters, then PII scrub
    # (base is cached BEFORE the repetition semi-join — both join sides
    # derive from it, so the expensive scoring lineage runs once)
    from sparksketch.textstats import repetition_features, scrub_pii
    scored = lang_id(quality_features(canoned))
    base = scored.filter(F.col("quality_score") >= args.quality_min).cache()
    rep = repetition_features(base, "text", "url").filter(
        (F.col("dup_line_ratio") <= 0.3) & (F.col("top_2gram_ratio") <= 0.2)
    ).select("url")
    kept = (base.join(rep, "url", "left_semi")
            .withColumn("text", scrub_pii("text")).cache())
    n_quality = kept.count()
    base.unpersist()
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
    near = dedup_representatives(exact, pairs, "doc_id").cache()
    n_near = near.count()
    metrics["stages"]["after_exact_dedup"] = n_exact
    metrics["stages"]["after_near_dedup"] = n_near

    # 5b. corpus-level paragraph dedup: boilerplate shared across surviving
    # docs collapses to its first occurrence; doc rows are preserved
    from sparksketch.dedup import paragraph_dedup
    cleaned = paragraph_dedup(near, "text", "doc_id")
    deduped = (near.drop("text")
               .join(cleaned.select("doc_id", F.col("text_dedup").alias("text"),
                                    "n_removed"), "doc_id").cache())
    metrics["stages"]["paragraphs_removed"] = (
        deduped.agg(F.sum("n_removed")).first()[0] or 0)

    # 6. per-host quota: no single host dominates the training mix (the
    # host column is kept through stage 7's sketches — one derivation)
    from sparksketch.decontam import quota_sample
    host_col = F.substring_index(F.substring_index("url", "/", 3), "//", -1)
    final = quota_sample(
        deduped.drop("n_removed").withColumn("_host", host_col),
        "_host", "url", args.host_cap, n_buckets=4).cache()
    n_final = final.count()
    deduped.unpersist()
    metrics["stages"]["after_host_quota"] = n_final

    # 6. bloom filter over the curated urls
    state = build_bloom(final, "url", BloomConfig(), n_shards=args.n_shards,
                        expected_keys=n_final)
    metrics["bloom"] = {"key_count": state.key_count, "bit_size": state.bit_size,
                        "fpr_bound": state.fpr_bound()}
    if args.output_filter:
        metrics["bloom"]["blob_bytes"] = save_state(state, args.output_filter)

    # 7. corpus stats via sketches
    from sparksketch.topk import heavy_hitters
    hosts = final.select(F.col("_host").alias("h"))
    final = final.drop("_host")
    hh = heavy_hitters(hosts, "h", k=16)
    kll = kll_build(final.select(F.length("text").alias("len")), "len")
    # lang only: the url ndv is already the library-HLL metric below —
    # profiling it again would repeat the same estimate via a second scan
    from sparksketch.profile import profile_table
    metrics["profile"] = {
        r.column: {"n_nulls": r.n_nulls, "ndv_est": r.ndv_est}
        for r in profile_table(final, ["lang"]).collect()}
    metrics["sketches"] = {
        "distinct_urls_hll": round(hll_distinct(final, "url", p=14), 1),
        "n_chars_p50": kll.quantile(0.5),
        "n_chars_p99": kll.quantile(0.99),
        "host_cms_total": cms_build(hosts, "h").total,
        "top_hosts": [{"host": k, "cnt_lo": c} for k, c in hh.topk(3)],
        "top_hosts_err_bound": hh.error_bound(),
    }

    # 8. deterministic train/val/test split (content-keyed, engine-portable),
    # then decontaminate train against the held-out splits' shingles: any
    # train doc sharing enough content with val/test is flagged (zero FN —
    # a contaminated doc can never slip through the Bloom gate)
    from sparksketch.decontam import benchmark_filter, contamination, hash_split
    splits = hash_split(final, "url", {"train": 0.9, "val": 0.05, "test": 0.05}).cache()
    metrics["splits"] = {r.split: r["count"] for r in
                         splits.groupBy("split").count().collect()}
    # benchmark_filter's contract is a SMALL benchmark (the Bloom over its
    # distinct shingles is driver-merged and broadcast whole) — at real
    # scale you pass an external eval set here, not 10% of the corpus, so
    # the in-pipeline leakage report is gated on the held-out size and
    # skipped with an explicit note beyond it
    held_out = splits.filter(F.col("split") != "train")
    n_held = sum(v for k, v in metrics["splits"].items() if k != "train")
    if 0 < n_held <= args.decontam_max_heldout:
        bf = benchmark_filter(held_out, "text", shingle=30)
        train = splits.filter(F.col("split") == "train")
        flagged = (contamination(train, "text", "doc_id", bf, shingle=30)
                   .filter("contaminated").count())
        metrics["decontamination"] = {"train_docs_flagged": flagged}
    elif n_held:
        metrics["decontamination"] = {
            "skipped": f"held-out {n_held} docs > --decontam-max-heldout "
                       f"{args.decontam_max_heldout}; pass an external "
                       "benchmark table for at-scale decontamination"}

    # 9. fixed-k eval pull: a deterministic uniform sample of the val split
    # for human review (TakeOrdered plan — never a global sort)
    from sparksketch.decontam import uniform_sample_k
    n_eval = min(100, max(1, n_held))
    metrics["eval_pull"] = {
        "k": uniform_sample_k(splits.filter(F.col("split") == "val"),
                              "url", n_eval).count()}

    elapsed = time.perf_counter() - t0
    metrics["elapsed_sec"] = round(elapsed, 2)
    metrics["docs_per_sec"] = round(n0 / elapsed, 1)
    print(json.dumps(metrics))
    if owns_session:
        spark.stop()  # don't tear down a session the caller owns
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
