"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The headline is the reference's own metric — Bloom build throughput
(docs/sec) — plus the companion sketches, dedup, similarity, text analysis
and a relational query, all at sf0.1 scale.  The synthetic web corpus
(~500k pages at sf0.1) is generated once into .bench_data/ and then read
back as parquet so the benched jobs include a real columnar scan with
pushdown, like production.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_WEBPAGES = int(5_000_000 * SF)
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_data")


def ensure_webpages(spark, n):
    path = os.path.join(DATA_DIR, f"webpages_{n}.parquet")
    if not os.path.exists(path):
        from sparksketch.webtext import webpages
        webpages(spark, n, seed=42, partitions=max(CPUS, 8)).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def ensure_vectors(spark, n, dim=64):
    """Cached synthetic embedding corpus — ONE shared generator
    (sparksketch.webtext.synthetic_embeddings), so the 4M file is
    interchangeable between the bench and the scale scripts."""
    path = os.path.join(DATA_DIR, f"embeddings_{n}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from sparksketch.webtext import synthetic_embeddings
        synthetic_embeddings(spark, n, dim=dim).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> int:
    if not os.path.isdir(SF_DIR):
        print(json.dumps({"error": f"SPARK_GRAFT_SF_DIR does not exist: {SF_DIR}"}))
        return 2

    from pyspark.sql import functions as F

    from sparksketch.bloom import BloomConfig, build_bloom, with_membership
    from sparksketch.cms import cms_build
    from sparksketch.dedup import exact_dedup_ids, minhash_dedup_pairs, simhash
    from sparksketch.hll import HLL, hll_by_group, hll_distinct
    from sparksketch.kll import kll_build
    from sparksketch.session import get_spark
    from sparksketch.similarity import cosine_topk
    from sparksketch.sketch import estimate_col
    from sparksketch.tdigest import tdigest_build
    from sparksketch.textstats import lang_id, quality_features
    from sparksketch.webtext import extract_text

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS,
                      extra={"spark.ui.showConsoleProgress": "false"})

    wp = ensure_webpages(spark, N_WEBPAGES)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # warmup: spawn the Python workers, JIT the codegen paths, touch the
    # parquet footers — so the first timed query isn't charged session setup
    import pyarrow as _pa
    def _noop(batches):
        for b in batches:
            pass
        yield _pa.RecordBatch.from_pydict({"n": _pa.array([0], _pa.int64())})
    wp.limit(50_000).select("url").mapInArrow(_noop, "n long").count()
    for t in (docs, events, emb, lineitem):
        t.count()

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}  # floats, per-run lists, plan digests

    def bench(name, fn, repeats=1):
        # this box swings ±2x with page cache: queries flagged noisy run
        # repeats=3 and record the MEDIAN (first run doubles as the warm-up
        # — a one-off cold number lands above the median and is discarded);
        # the per-run samples go to extras so drift stays attributable
        runs = []
        result = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            result = fn()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = sorted(runs)[len(runs) // 2]
        if repeats > 1:
            extras[f"{name}_runs"] = runs
        return result

    # --- the headline: bloom build over the web corpus ---
    state = bench("bloom_build", lambda: build_bloom(
        wp, "url", BloomConfig(), n_shards=4 * CPUS, partitions=CPUS,
        expected_keys=N_WEBPAGES))
    extras["bloom_docs_per_sec"] = round(N_WEBPAGES / timings["bloom_build"], 1)
    extras["bloom_fpr_bound"] = state.fpr_bound()

    # --- probe throughput: all inserted + equal number of absent keys ---
    def probe():
        probes = wp.select("url").union(
            spark.range(N_WEBPAGES).select(
                F.concat(F.lit("https://absent.example.com/x"), F.col("id").cast("string")).alias("url")))
        return with_membership(probes, "url", state).filter(~F.col("is_member")).count()
    absent = bench("bloom_probe", probe)
    extras["bloom_probe_keys_per_sec"] = round(2 * N_WEBPAGES / timings["bloom_probe"], 1)
    extras["bloom_fn_or_fp_violations"] = float(abs(absent - N_WEBPAGES))

    # --- companion sketches ---
    bench("hll_distinct_urls", lambda: hll_distinct(wp, "url", p=14))
    bench("hll_by_lang", lambda: hll_by_group(wp, "lang", "url", p=12)
          .withColumn("est", estimate_col(HLL)("state")).collect())
    bench("cms_hosts", lambda: cms_build(
        wp.select(F.parse_url("url", F.lit("HOST")).alias("host")), "host", d=5, w=65536),
        repeats=3)
    bench("tdigest_events_value", lambda: tdigest_build(events, "value").quantile(0.5))
    bench("kll_docs_nchars", lambda: kll_build(docs, "n_chars").quantile(0.99))
    from sparksketch.theta import intersection_estimate, theta_build
    def theta_overlap():
        clicks = events.filter(F.col("event_type") == "click").select("user_id")
        views = events.filter(F.col("event_type") == "view").select("user_id")
        return intersection_estimate(theta_build(clicks, "user_id"),
                                     theta_build(views, "user_id"))
    bench("theta_user_overlap", theta_overlap)
    from sparksketch.ams import ams_build
    def ams_join():
        clicks = events.filter("event_type = 'click' AND user_id IS NOT NULL").select("user_id")
        views = events.filter("event_type = 'view' AND user_id IS NOT NULL").select("user_id")
        return ams_build(clicks, "user_id").inner_product(ams_build(views, "user_id"))
    bench("ams_join_size", ams_join)
    from sparksketch.kll import bucketize
    bench("kll_bucketize_events", lambda: bucketize(
        events.select(F.col("value").cast("double").alias("v")), "v", n_buckets=8
    )[0].groupBy("bucket").count().collect())

    # --- webtext ops ---
    bench("extract_text", lambda: extract_text(wp, passthrough=["text"])
          .filter(F.col("extracted_text") != F.col("text")).count())
    # quality_lang has drifted upward two rounds running under a "host
    # noise" explanation — median-of-3 plus a plan guard makes a REAL
    # regression (Python eval sneaking in, an extra shuffle) fail loudly
    # and distinguishable from page cache
    def _ql_df():
        # rebuilt per run: re-collecting the SAME DataFrame object lets
        # Spark reuse its registered shuffle output and skip every stage
        # (measured 0.04 s "runs"), which would make the median meaningless
        return (lang_id(quality_features(wp))
                .agg(F.avg("quality_score").alias("avg_q"),
                     F.count("lang_pred").alias("n_lang")))
    bench("quality_lang", lambda: _ql_df().collect(), repeats=3)
    from sparksketch.plans import plan_digest
    ql_plan = plan_digest(_ql_df())
    if ql_plan.n_python_evals != 0 or ql_plan.n_exchanges > 1:
        raise AssertionError(
            f"quality_lang plan regressed: {ql_plan.n_python_evals} Python "
            f"evals, {ql_plan.n_exchanges} exchanges (expected 0 / <=1)\n"
            + ql_plan.plan)
    extras["quality_lang_plan"] = {"exchanges": ql_plan.n_exchanges,
                                   "python_evals": ql_plan.n_python_evals,
                                   "codegen_spans": ql_plan.n_wholestage_spans}

    # --- crawl hygiene: URL canonicalization + PII scrub + repetition ---
    from sparksketch.textstats import repetition_features, scrub_pii
    from sparksketch.webtext import canonical_url
    bench("canon_scrub", lambda: wp.select(
        canonical_url("url").alias("cu"), scrub_pii(F.col("text")).alias("st"))
        .agg(F.count_distinct("cu"), F.sum(F.length("st"))).collect())
    bench("repetition_docs", lambda: repetition_features(docs)
          .filter((F.col("dup_line_ratio") > 0.3) | (F.col("top_2gram_ratio") > 0.2))
          .count())

    # --- dedup ---
    bench("dedup_exact_docs", lambda: exact_dedup_ids(docs, "text", "doc_id").count())
    from sparksketch.dedup import paragraph_dedup
    bench("paragraph_dedup_docs", lambda: paragraph_dedup(docs)
          .agg(F.sum("n_removed")).collect())
    bench("dedup_minhash_docs", lambda: minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.8).count())
    bench("simhash_docs", lambda: simhash(docs, "text", "doc_id").count())
    from sparksketch.dedup import kgram_dup_stats
    # substring-level dup accounting over 50k web pages (~21M chars) at
    # content-defined 1/8 gram sampling — the vectorized byte-roll path
    # (the JVM substring formulation is O(len²) per doc and unusable here).
    # ensure_webpages, NOT wp.limit(): GlobalLimit funnels all rows into
    # ONE partition, which would serialize the kernel on a 32-core box
    # repartition to the core count: the cached corpus is 8 parquet files
    # (~3 MB each, under maxPartitionBytes), which would cap the kernel at
    # 8-way parallelism; the 21 MB shuffle is timed and cheap
    wp50 = (ensure_webpages(spark, 50_000).repartition(CPUS)
            .select(F.xxhash64("url").alias("doc_id"), "text"))
    bench("kgram_dup_stats", lambda: kgram_dup_stats(
        wp50, "text", "doc_id", k=32, sample_mod=8)
        .agg(F.sum("n_dup_grams")).collect())

    # --- heavy hitters (no candidate set) ---
    from sparksketch.topk import heavy_hitters
    hosts = wp.select(F.substring_index(F.substring_index("url", "/", 3), "//", -1).alias("h"))
    hh = bench("heavy_hitters_hosts", lambda: heavy_hitters(hosts, "h", k=16))
    extras["heavy_hitters_top3"] = [k for k, _ in hh.topk(3)]

    # --- BM25 ranked retrieval over the full 500k-page corpus ---
    # two codegen scans (stats row + scoring) + TakeOrdered; terms are
    # expression literals, never a table
    from sparksketch.textstats import bm25_topk
    bm25 = bench("bm25_topk_500k", lambda: bm25_topk(
        wp, ["work", "time", "men"], col="text", id_col="url",
        k=10).collect())
    assert len(bm25) == 10 and all(r.score > 0 for r in bm25)

    # --- dedup-cluster resolution (alternating star CC) ---
    from sparksketch.dedup import connected_components
    n_cc = int(2_000_000 * SF)
    chain_edges = (spark.range(n_cc)
                   .filter(F.pmod("id", F.lit(32)) != 31)
                   .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")))
    comp = bench("dedup_components", lambda: connected_components(chain_edges)
                 .select(F.countDistinct("component")).first()[0])
    extras["cc_components"] = float(comp)

    # --- decontamination (bloom x shingles) ---
    from sparksketch.decontam import benchmark_filter, contamination
    def decontam():
        bench_docs = docs.filter(F.col("doc_id") % 10 == 0)
        st = benchmark_filter(bench_docs, "text", shingle=30, n_shards=32, partitions=CPUS)
        return contamination(docs, "text", "doc_id", st, shingle=30) \
            .filter("contaminated").count()
    extras["decontam_flagged"] = float(bench("decontam_docs", decontam))

    # --- event-stream ops ---
    from sparksketch.events import asof_join, sessionize
    bench("sessionize_events", lambda: sessionize(events, "user_id", "ts", 604800)
          .select(F.countDistinct("session_id")).first()[0])
    def asof():
        clicks = (events.filter(F.col("event_type") == "click")
                  .groupBy("user_id", "ts").agg(F.max("value").alias("cv")))
        return asof_join(events, clicks, "user_id", "ts", ["cv"]).count()
    bench("asof_join_events", asof)
    from sparksketch.events import range_join
    def rjoin():
        clicks = events.filter("event_type = 'click'").select("user_id", "ts")
        purch = events.filter("event_type = 'purchase'").select("user_id", "ts")
        return range_join(clicks, purch, "user_id", "ts", 600).count()
    bench("range_join_events", rjoin)
    from sparksketch.events import funnel_depth
    bench("funnel_depth_events", lambda: funnel_depth(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"])
        .agg(F.avg("depth")).collect())

    # --- similarity ---
    qv = np.array(emb.first().embedding, dtype=np.float32)
    bench("cosine_topk", lambda: cosine_topk(emb, "embedding", "vec_id", qv, k=10))
    from sparksketch.similarity import knn_join
    bench("knn_join_emb", lambda: knn_join(emb, "embedding", "vec_id", k=10).count())
    from sparksketch.fd import fd_build
    bench("fd_embeddings", lambda: float(
        fd_build(emb, "embedding", ell=32).singular_values()[0]))

    # --- clustering (round 5): one Lloyd iteration over 4M x 64 vectors ---
    # fixed init (not the sampled maximin) so the timing isolates the
    # distributed E-step + sufficient-statistics pass; scale/descent
    # evidence at 3 iterations is scripts/kmeans_scale.py
    from sparksketch.clustering import kmeans_fit
    emb4m = ensure_vectors(spark, 4_000_000)
    km_init = np.eye(64, dtype=np.float32)[:16]
    km = bench("kmeans_4m_iter", lambda: kmeans_fit(
        emb4m, "embedding", k=16, iters=1, seed=5, dim=64, init=km_init))
    assert km.n == 4_000_000  # every vector folded exactly once

    # --- product quantization (round 5): the compressed-ANN pipeline ---
    # train on a sample (standard PQ practice), encode the FULL corpus to
    # 8-byte codes persisted as a table (1 GB of float32 -> 32 MB), then
    # an ADC top-k that scans ONLY the code table — the 32x-smaller scan
    # is the whole point at 100 TB
    from sparksketch.pq import pq_encode, pq_topk, pq_train
    pqm = bench("pq_train_64k", lambda: pq_train(
        emb4m.sample(fraction=0.016, seed=7), "embedding",
        m_sub=8, k=256, iters=3, seed=7, dim=64))
    pq_path = os.path.join(DATA_DIR, "pq_codes_4m.parquet")
    bench("pq_encode_4m", lambda: (
        pq_encode(emb4m.select("vec_id", "embedding"), "embedding", pqm,
                  keep=["vec_id"])
        .write.mode("overwrite").parquet(pq_path)))
    codes = spark.read.parquet(pq_path)
    qv64 = np.array(emb4m.filter(F.col("vec_id") == 0).first().embedding,
                    dtype=np.float32)
    pq_top = bench("pq_adc_topk_4m", lambda: pq_topk(
        codes, "vec_id", pqm, qv64, k=10))
    # the query vector itself (ADC dist = its own quantization error) must
    # appear in the shortlist — a smoke-level sanity on the ADC scoring
    assert 0 in [i for i, _ in pq_top]

    # --- IVFPQ (round 5): the 100-TB query path — coarse lists prune the
    # code scan (n_probe/n_lists of the files via partitionBy + isin) AND
    # the codes are 32x smaller than the vectors; residual encoding keeps
    # recall.  Encode is ONE pass (list assign + residual + code).
    from sparksketch.pq import coarse_centroids_l2, ivfpq_topk, pq_train as _pqt
    coarse64 = bench("ivfpq_coarse_64", lambda: coarse_centroids_l2(
        emb4m.sample(fraction=0.004, seed=7), "embedding",
        n_lists=64, dim=64, seed=11))
    # residual-codebook train is setup here, not a timed entry — its cost
    # profile is pq_train_64k's (same pass, one extra GEMM per batch)
    ipqm = _pqt(emb4m.sample(fraction=0.016, seed=7), "embedding",
                m_sub=8, k=256, iters=2, seed=7, dim=64, coarse=coarse64)
    ivfpq_path = os.path.join(DATA_DIR, "ivfpq_codes_4m.parquet")
    # repartition by list before the partitionBy write: one file per list
    # instead of one sliver per (task, list) — the layout a 100-TB probe
    # wants (the 32 MB code shuffle is noise next to the encode)
    bench("ivfpq_encode_4m", lambda: (
        pq_encode(emb4m.select("vec_id", "embedding"), "embedding", ipqm,
                  keep=["vec_id"], coarse=coarse64)
        .repartition("ivf_list")
        .write.mode("overwrite").partitionBy("ivf_list").parquet(ivfpq_path)))
    icodes = spark.read.parquet(ivfpq_path)
    ivf_top = bench("ivfpq_adc_probe4_4m", lambda: ivfpq_topk(
        icodes, "vec_id", ipqm, coarse64, qv64, k=10, n_probe=4), repeats=3)
    assert 0 in [i for i, _ in ivf_top]  # home list is the top probe
    # batch compressed ANN join: 1000 queries x top-10 in ONE pruned pass
    # over the code table — each probed list is scanned once for all the
    # queries probing it (vs 1000 separate jobs for the single-query path)
    from sparksketch.pq import ivfpq_knn_join
    qset = emb4m.filter(F.col("vec_id") < 1000).select("vec_id", "embedding")
    n_batch = bench("ivfpq_knn_join_1k_4m", lambda: ivfpq_knn_join(
        icodes, "vec_id", ipqm, coarse64, qset, k=10, n_probe=4).count())
    assert n_batch == 10_000  # every query got a full top-10

    # --- round-4 operators ---
    from sparksketch.cbf import cbf_build, cbf_delete, with_cbf_membership
    def cbf_cycle():
        # build over 500k urls, delete a 1/8 sub-multiset, probe the rest
        st = cbf_build(wp, "url", m=1 << 21)
        st = cbf_delete(st, wp.filter(F.pmod(F.xxhash64("url"), F.lit(8)) == 0), "url")
        rest = wp.filter(F.pmod(F.xxhash64("url"), F.lit(8)) != 0)
        return with_cbf_membership(rest, "url", st).filter("NOT is_member").count()
    assert bench("cbf_build_delete", cbf_cycle) == 0  # zero FN after delete

    def cbf_single_pass():
        # the same build-minus-tombstones in ONE scan (delete_when=) —
        # vs the two scans cbf_cycle's build+delete spend; the probe job
        # is kept identical so the delta isolates the saved build scan
        st = cbf_build(wp, "url", m=1 << 21,
                       delete_when=F.pmod(F.xxhash64("url"), F.lit(8)) == 0)
        rest = wp.filter(F.pmod(F.xxhash64("url"), F.lit(8)) != 0)
        return with_cbf_membership(rest, "url", st).filter("NOT is_member").count()
    assert bench("cbf_single_pass", cbf_single_pass) == 0  # same zero-FN

    from sparksketch.decontam import pps_sample
    bench("pps_sample_docs", lambda: pps_sample(
        docs, "n_chars", "doc_id", rate=0.002).count())
    from sparksketch.tdigest import tdigest_weighted_build
    bench("tdigest_weighted", lambda: tdigest_weighted_build(
        docs.select(F.col("n_chars").cast("double").alias("v"),
                    (F.col("n_chars") / 5).cast("double").alias("w")),
        "v", "w").quantile(0.5))

    # --- relational surface ---
    # --- host-graph PageRank: derive the host link graph from the page ids
    # embedded in the corpus urls, 3 engine-exact integer iterations ---
    from sparksketch.graph import derive_host_edges, pagerank_int

    def pr_run():
        ids = wp.select(F.regexp_extract("url", r"/p(\d+)", 1)
                        .cast("long").alias("doc_id"))
        ranks = pagerank_int(derive_host_edges(ids), iters=3)
        return ranks.orderBy(F.desc("rank"), "node").limit(20).collect()

    top_hosts = bench("pagerank_hosts_corpus", pr_run, repeats=3)
    extras["pagerank_top_host"] = int(top_hosts[0].node)

    # --- DOULION sampled triangle count over the same host graph: the
    # dense-graph scale path (p = 1/4 cuts the wedge probes ~16x; the
    # exact counter on this 10k-host graph is ~10x the sampled time) ---
    from sparksketch.graph import triangle_estimate

    def tri_est():
        ids = wp.select(F.regexp_extract("url", r"/p(\d+)", 1)
                        .cast("long").alias("doc_id"))
        return triangle_estimate(derive_host_edges(ids),
                                 keep_ppm=250000).first()

    tri = bench("triangle_est_hosts", tri_est)
    assert tri.n_kept > 0 and tri.tri_sampled > 0  # sample can't go vacuous
    extras["triangle_est"] = float(tri.est)

    # --- persisted BM25 inverted index: build (bucket-clustered postings
    # write) + one partition-pruned 3-term query ---
    import shutil

    from sparksketch.textstats import bm25_index_topk, write_bm25_index
    wp50 = ensure_webpages(spark, 50_000)
    idx_path = os.path.join(DATA_DIR, "bm25_index_bench")

    def idx_build():
        shutil.rmtree(idx_path, ignore_errors=True)
        docs50 = wp50.select(F.regexp_extract("url", r"/p(\d+)", 1)
                             .cast("long").alias("doc_id"), "text")
        return write_bm25_index(docs50, idx_path, n_buckets=64)

    bench("bm25_index_build_50k", idx_build)
    qtop = bench("bm25_index_query", lambda: bm25_index_topk(
        spark, idx_path, ["world", "state", "people"],
        n_buckets=64, k=10).collect(), repeats=3)
    extras["bm25_index_top_doc"] = int(qtop[0].doc_id)

    bench("q1_pricing", lambda: lineitem
          .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity"), F.count("*")).collect())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "sparksketch_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "extras": {**extras, "cores": CPUS, "webpages": N_WEBPAGES},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
