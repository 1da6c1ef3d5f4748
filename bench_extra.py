"""Per-query isolation harness for optimization work (guide §1.4) —
bench.py is FROZEN for measurement, so every exploratory number lives here.

Mirrors bench.py's session shape ($SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS,
same get_spark knobs, same cached corpora) but runs ONLY the named queries,
repeated, with per-run samples printed — so a single operator can be
iterated on without paying the full bench, and `--explain` dumps the
`.explain("formatted")` plan of the query's central DataFrame to
plans/<tag>/<query>_<suffix>.txt for the plan-diff evidence the round
deliverables require.

Usage:
    python bench_extra.py quality_lang dedup_components --repeats 5
    python bench_extra.py quality_lang --explain before
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


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    repeats = 3
    explain_tag = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_tag = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from pyspark.sql import functions as F

    from sparksketch.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS,
                      extra={"spark.ui.showConsoleProgress": "false"})
    wp = spark.read.parquet(os.path.join(DATA_DIR, f"webpages_{N_WEBPAGES}.parquet"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # same warmup as bench.py: python workers + parquet footers
    import pyarrow as _pa
    def _np(batches):
        for b in batches:
            pass
        yield _pa.RecordBatch.from_pydict({"n": _pa.array([0], _pa.int64())})
    wp.limit(50_000).select("url").mapInArrow(_np, "n long").count()
    for t in (docs, events, emb):
        t.count()

    # ---- query registry: name -> (fn, df_builder_for_explain) ----
    reg = {}

    def q(name):
        def deco(fn):
            reg[name] = fn
            return fn
        return deco

    @q("quality_lang")
    def _quality_lang():
        from sparksketch.textstats import lang_id, quality_features
        # rebuilt per run (bench.py's lesson: re-collecting the same DF
        # object reuses registered shuffle output and skips every stage)
        def build():
            return (lang_id(quality_features(wp))
                    .agg(F.avg("quality_score").alias("avg_q"),
                         F.count("lang_pred").alias("n_lang")))
        def run():
            return build().collect()
        run.build = build
        return run, "call"

    @q("dedup_components")
    def _cc():
        from sparksketch.dedup import connected_components
        n_cc = int(2_000_000 * SF)
        chain_edges = (spark.range(n_cc)
                       .filter(F.pmod("id", F.lit(32)) != 31)
                       .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")))
        def run():
            return connected_components(chain_edges).select(
                F.countDistinct("component")).first()[0]
        return run, "call"

    @q("dedup_minhash")
    def _mh():
        from sparksketch.dedup import minhash_dedup_pairs
        def run():
            return minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8).count()
        return run, "call"

    @q("triangle_est")
    def _tri():
        from sparksketch.graph import derive_host_edges, triangle_estimate
        def run():
            ids = wp.select(F.regexp_extract("url", r"/p(\d+)", 1)
                            .cast("long").alias("doc_id"))
            return triangle_estimate(derive_host_edges(ids), keep_ppm=250000).first()
        return run, "call"

    @q("pagerank")
    def _pr():
        from sparksketch.graph import derive_host_edges, pagerank_int
        def run():
            ids = wp.select(F.regexp_extract("url", r"/p(\d+)", 1)
                            .cast("long").alias("doc_id"))
            ranks = pagerank_int(derive_host_edges(ids), iters=3)
            return ranks.orderBy(F.desc("rank"), "node").limit(20).collect()
        return run, "call"

    @q("pq_encode")
    def _pqe():
        from sparksketch.pq import pq_encode, pq_train
        emb4m = spark.read.parquet(os.path.join(DATA_DIR, "embeddings_4000000.parquet"))
        pqm = pq_train(emb4m.sample(fraction=0.016, seed=7), "embedding",
                       m_sub=8, k=256, iters=3, seed=7, dim=64)
        path = "/tmp/bex_pq_codes.parquet"
        def run():
            pq_encode(emb4m.select("vec_id", "embedding"), "embedding", pqm,
                      keep=["vec_id"]).write.mode("overwrite").parquet(path)
        return run, "call"

    @q("pq_train")
    def _pqt():
        from sparksketch.pq import pq_train
        emb4m = spark.read.parquet(os.path.join(DATA_DIR, "embeddings_4000000.parquet"))
        def run():
            return pq_train(emb4m.sample(fraction=0.016, seed=7), "embedding",
                            m_sub=8, k=256, iters=3, seed=7, dim=64)
        return run, "call"

    @q("ivfpq_encode")
    def _ivfe():
        from sparksketch.pq import coarse_centroids_l2, pq_encode, pq_train
        emb4m = spark.read.parquet(os.path.join(DATA_DIR, "embeddings_4000000.parquet"))
        coarse64 = coarse_centroids_l2(emb4m.sample(fraction=0.004, seed=7),
                                       "embedding", n_lists=64, dim=64, seed=11)
        ipqm = pq_train(emb4m.sample(fraction=0.016, seed=7), "embedding",
                        m_sub=8, k=256, iters=2, seed=7, dim=64, coarse=coarse64)
        path = "/tmp/bex_ivfpq_codes.parquet"
        def run():
            (pq_encode(emb4m.select("vec_id", "embedding"), "embedding", ipqm,
                       keep=["vec_id"], coarse=coarse64)
             .repartition("ivf_list")
             .write.mode("overwrite").partitionBy("ivf_list").parquet(path))
        return run, "call"

    @q("bm25_index_build")
    def _bm25b():
        import shutil
        from sparksketch.textstats import write_bm25_index
        wp50 = spark.read.parquet(os.path.join(DATA_DIR, "webpages_50000.parquet"))
        idx_path = "/tmp/bex_bm25_index"
        def run():
            shutil.rmtree(idx_path, ignore_errors=True)
            docs50 = wp50.select(F.regexp_extract("url", r"/p(\d+)", 1)
                                 .cast("long").alias("doc_id"), "text")
            return write_bm25_index(docs50, idx_path, n_buckets=64)
        return run, "call"

    @q("cbf_build_delete")
    def _cbf():
        from sparksketch.cbf import cbf_build, cbf_delete, with_cbf_membership
        def run():
            st = cbf_build(wp, "url", m=1 << 21)
            st = cbf_delete(st, wp.filter(F.pmod(F.xxhash64("url"), F.lit(8)) == 0), "url")
            rest = wp.filter(F.pmod(F.xxhash64("url"), F.lit(8)) != 0)
            return with_cbf_membership(rest, "url", st).filter("NOT is_member").count()
        return run, "call"

    @q("kgram_dup_stats")
    def _kg():
        from sparksketch.dedup import kgram_dup_stats
        wp50 = (spark.read.parquet(os.path.join(DATA_DIR, "webpages_50000.parquet"))
                .repartition(CPUS)
                .select(F.xxhash64("url").alias("doc_id"), "text"))
        def run():
            return kgram_dup_stats(wp50, "text", "doc_id", k=32, sample_mod=8) \
                .agg(F.sum("n_dup_grams")).collect()
        return run, "call"

    @q("canon_scrub")
    def _cs():
        from sparksketch.textstats import scrub_pii
        from sparksketch.webtext import canonical_url
        def build():
            return (wp.select(
                canonical_url("url").alias("cu"), scrub_pii(F.col("text")).alias("st"))
                .agg(F.count_distinct("cu"), F.sum(F.length("st"))))
        def run():
            return build().collect()
        run.build = build
        return run, "call"

    @q("repetition")
    def _rep():
        from sparksketch.textstats import repetition_features
        def run():
            return repetition_features(docs) \
                .filter((F.col("dup_line_ratio") > 0.3) | (F.col("top_2gram_ratio") > 0.2)) \
                .count()
        return run, "call"

    @q("sessionize")
    def _sess():
        from sparksketch.events import sessionize
        def run():
            return sessionize(events, "user_id", "ts", 604800) \
                .select(F.countDistinct("session_id")).first()[0]
        return run, "call"

    @q("range_join")
    def _rj():
        from sparksketch.events import range_join
        def run():
            clicks = events.filter("event_type = 'click'").select("user_id", "ts")
            purch = events.filter("event_type = 'purchase'").select("user_id", "ts")
            return range_join(clicks, purch, "user_id", "ts", 600).count()
        return run, "call"

    @q("decontam")
    def _dc():
        from sparksketch.decontam import benchmark_filter, contamination
        def run():
            bench_docs = docs.filter(F.col("doc_id") % 10 == 0)
            st = benchmark_filter(bench_docs, "text", shingle=30, n_shards=32, partitions=CPUS)
            return contamination(docs, "text", "doc_id", st, shingle=30) \
                .filter("contaminated").count()
        return run, "call"

    @q("bloom_build")
    def _bb():
        from sparksketch.bloom import BloomConfig, build_bloom
        def run():
            return build_bloom(wp, "url", BloomConfig(), n_shards=4 * CPUS,
                               partitions=CPUS, expected_keys=N_WEBPAGES)
        return run, "call"

    @q("extract_text")
    def _et():
        from sparksketch.webtext import extract_text
        def run():
            return extract_text(wp, passthrough=["text"]) \
                .filter(F.col("extracted_text") != F.col("text")).count()
        return run, "call"

    out = {}
    for name in names:
        if name not in reg:
            print(f"unknown query {name!r}; known: {sorted(reg)}", file=sys.stderr)
            return 2
        built = reg[name]()
        target, mode = built
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if explain_tag and getattr(target, "build", None):
            os.makedirs("plans/r06", exist_ok=True)
            p = os.path.join("plans/r06", f"{name}_{explain_tag}.txt")
            df = target.build()
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {p}", file=sys.stderr)
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            target()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": runs, "median": sorted(runs)[len(runs) // 2],
                     "min": min(runs)}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
