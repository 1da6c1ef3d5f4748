"""Focused guards for the round-6 plan/kernel optimizations: each test pins
the PROPERTY the optimization relies on (shared subexpression stays shared,
rewritten aggregation equals the old formulation, cached path is bitwise
the uncached path) so a regression is caught as a failure, not a slowdown."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- quality

def test_quality_features_single_tokenize_in_plan(spark):
    """The lowered-token array must be computed ONCE per row: the optimized
    plan carries exactly one regex-split subtree (CollapseProject keeps the
    non-cheap alias because it is referenced by several consumers).  Eleven
    split occurrences was the round-5 shape this guards against."""
    from sparksketch.plans import plan_digest
    from sparksketch.textstats import quality_features
    df = spark.createDataFrame([("a b c the of",), ("",)], "text string")
    out = quality_features(df).select("n_tokens", "stopword_ratio",
                                      "quality_score")
    d = plan_digest(out)
    assert d.plan.count("split(") == 1, d.plan


def test_lang_id_single_tokenize_in_plan(spark):
    from sparksketch.plans import plan_digest
    from sparksketch.textstats import lang_id
    df = spark.createDataFrame([("der die das und text",)], "text string")
    d = plan_digest(lang_id(df).select("lang_pred"))
    assert d.plan.count("split(") == 1, d.plan


def test_quality_features_tmp_column_never_leaks(spark):
    from sparksketch.textstats import lang_hits, lang_id, quality_features
    df = spark.createDataFrame([("x y z",)], "text string")
    for out in (quality_features(df), lang_id(df), lang_hits(df)):
        assert not [c for c in out.columns if c.startswith("_sk_toks")], out.columns
    # a pre-existing column with the reserved name survives untouched
    df2 = df.withColumn("_sk_toks_lower", F.lit("keep"))
    out2 = lang_id(df2)
    assert out2.select("_sk_toks_lower").first()[0] == "keep"


# ---------------------------------------------------------------- kgram

def test_kgram_doc_counts_matches_explode_formulation(spark):
    """The kernel-side per-doc gram counter must equal the exploded
    groupBy(_id).count() it replaced — including short docs (no grams),
    content-defined sampling, and docs whose grams are all sampled out."""
    from sparksketch.dedup import _kgram_doc_counts, _kgram_rows
    rows = [(1, "abcdefghijklmnop"), (2, "abcdefghijklmnop"),
            (3, "zzzzzzzz"), (4, "ab"), (5, ""), (6, "qrstuvwxyzqrstuvwxyz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, mod in ((4, 1), (4, 3), (8, 8)):
        grams = _kgram_rows(df, "text", "doc_id", k, "hash", mod)
        want = {(r._id, r.n) for r in grams.groupBy("_id")
                .agg(F.count("*").alias("n")).collect()}
        got = {(r.doc_id, r.n_grams) for r in
               _kgram_doc_counts(df, "text", "doc_id", k, mod).collect()}
        assert got == want, (k, mod, got, want)


# ---------------------------------------------------------------- bm25

def test_bm25_doclens_equals_postings_tf_sum(spark, tmp_path):
    """doclens written from the corpus (size of tokens) must equal the sum
    of tf over the doc's postings — the identity the one-scan rewrite
    depends on — with zero-token docs present as dl = 0."""
    from sparksketch.textstats import write_bm25_index
    rows = [(1, "a b b c"), (2, ""), (3, "   "), (4, "x"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    write_bm25_index(df, path, n_buckets=2)
    dl = {r.doc_id: r.dl for r in spark.read.parquet(f"{path}/doclens").collect()}
    post = {r.doc_id: r.s for r in spark.read.parquet(f"{path}/postings")
            .groupBy("doc_id").agg(F.sum("tf").alias("s")).collect()}
    assert dl == {1: 4, 2: 0, 3: 0, 4: 1, 5: 0}
    for doc, s in post.items():
        assert dl[doc] == s


# ---------------------------------------------------------------- graph

def test_tri_total_matches_per_node_counter(spark):
    """The direct closure/edge counts must equal the per-node counter's
    Σtri/3 and Σdeg/2 on a graph with hubs, pendants and parallel input
    edges (triangle_estimate at keep_ppm=10^6 keeps every edge)."""
    from sparksketch.graph import triangle_counts, triangle_estimate
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 3), (3, 0), (3, 1),
             (4, 0), (5, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    est = triangle_estimate(e, keep_ppm=10 ** 6).first()
    per = triangle_counts(e).agg(
        F.expr("sum(tri) div 3").alias("t"),
        F.expr("sum(deg) div 2").alias("m")).first()
    assert est.tri_sampled == per.t and est.n_kept == per.m
    assert est.n_edges == per.m  # p = 1: sampled graph == full graph


# ---------------------------------------------------------------- textstats

def test_repetition_top_gram_matches_window_formulation(spark):
    """The min(struct(-count, gram)) argmax must reproduce the window
    row_number(count desc, gram asc) winner and total — including the
    lexicographic tie-break and the gramless-doc zero fill."""
    from pyspark.sql import Window as W
    from sparksketch.textstats import repetition_features, tokens_col
    rows = [(1, "a b a b a c"), (2, "t t t t"), (3, "solo"), (4, ""),
            (5, "z y z y")]  # doc 5: 'y z' vs 'z y' tie on count
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.top_2gram_count, r.top_2gram_ratio)
           for r in repetition_features(df).collect()}
    toks = tokens_col(F.col("text"))
    grams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                   F.slice(toks, 2, F.size(toks) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)))
    g = df.select("doc_id", F.explode(grams).alias("_g"))
    counts = g.groupBy("doc_id", "_g").count()
    w = W.partitionBy("doc_id")
    ranked = counts.select(
        "doc_id", F.col("count"),
        F.row_number().over(w.orderBy(F.desc("count"), F.col("_g"))).alias("_rn"),
        F.sum("count").over(w).alias("_total"))
    want = {r.doc_id: (r.c, r.ratio) for r in
            ranked.filter("_rn = 1").select(
                "doc_id", F.col("count").cast("long").alias("c"),
                F.round(F.col("count") / F.col("_total"), 4).alias("ratio"))
            .collect()}
    for doc in (1, 2, 5):
        assert got[doc] == want[doc], (doc, got[doc], want[doc])
    # gramless docs (single token / empty) zero-fill via the left join
    assert got[3] == (0, 0.0) and got[4] == (0, 0.0)


# ---------------------------------------------------------------- pq

def test_pq_train_cached_equals_uncached(spark):
    """Persisting the projection before the init sample must not move a
    single sampled row: cached and uncached training produce bitwise-equal
    codebooks, costs and counts."""
    from sparksketch.pq import pq_train
    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=16).astype(float).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = pq_train(df, "embedding", m_sub=4, k=8, iters=3, seed=5, dim=16)
    b = pq_train(df, "embedding", m_sub=4, k=8, iters=3, seed=5, dim=16,
                 cache=False)
    assert np.array_equal(a.codebooks, b.codebooks)
    assert a.costs == b.costs and a.n == b.n == 400


def test_pq_encode_binary_codes_wellformed(spark):
    """The from_buffers binary column must produce exactly m_sub bytes per
    row (the property _codes_matrix validates downstream)."""
    from sparksketch.pq import pq_train, pq_encode
    rng = np.random.default_rng(4)
    rows = [(i, rng.normal(size=16).astype(float).tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m = pq_train(df, "embedding", m_sub=4, k=8, iters=1, seed=5, dim=16,
                 cache=False)
    out = pq_encode(df, "embedding", m, keep=["vec_id"]).collect()
    assert len(out) == 50
    assert all(isinstance(r.pq_code, (bytes, bytearray)) and len(r.pq_code) == 4
               for r in out)
