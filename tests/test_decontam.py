"""Benchmark decontamination (bloom x shingles) + deterministic hash splits."""

import pytest
from pyspark.sql import functions as F

from sparksketch.decontam import (
    benchmark_filter,
    contamination,
    decontaminate,
    hash_split,
    split_sql_case,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


SHINGLE = 30  # word-scale shingles: char-8-grams of this small-vocab corpus
              # collide across unrelated docs (~87% overlap); 30 chars ≈ 4-5
              # words makes overlap mean real shared text


def _exact_flags(spark, docs, shingle=SHINGLE, threshold=0.5):
    """Ground truth via exact shingle-set joins (no sketch)."""
    from sparksketch.decontam import shingle_strings
    sh = docs.select("doc_id", F.explode(shingle_strings("text", shingle)).alias("s"))
    bench = sh.filter(F.col("doc_id") % 10 == 0).select("s").distinct()
    hit = sh.join(bench.withColumn("_b", F.lit(1)), "s", "left")
    agg = hit.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum(F.coalesce("_b", F.lit(0))).alias("h"))
    return {r.doc_id: (r.h / r.n >= threshold) for r in agg.collect()}


def test_contamination_matches_exact_ground_truth(spark, docs):
    # benchmark = every 10th doc; members flag at ratio 1.0 (zero FN), and
    # the corpus contains REAL near-dups of benchmark docs that must flag too
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    state = benchmark_filter(bench, "text", shingle=SHINGLE, n_shards=8, partitions=4)
    flags = contamination(docs, "text", "doc_id", state, shingle=SHINGLE,
                          threshold=0.5).cache()
    members = flags.filter(F.col("doc_id") % 10 == 0)
    assert members.filter(~F.col("contaminated")).count() == 0
    assert members.filter(F.col("ratio") < 1.0).count() == 0
    got = {r.doc_id: r.contaminated for r in flags.collect()}
    want = _exact_flags(spark, docs)
    assert got == want  # ratios are bimodal → FP inflation can't flip flags
    assert sum(want.values()) > 50  # the corpus really has contaminated docs


def test_decontaminate_end_to_end(spark, docs):
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(F.col("text"))
    clean = decontaminate(docs, "text", "doc_id", bench, shingle=SHINGLE,
                          n_shards=8, partitions=4)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    want = _exact_flags(spark, docs)
    assert kept == {i for i, bad in want.items() if not bad}
    assert all(i % 10 != 0 for i in kept)  # benchmark members never survive


def test_hash_split_deterministic_and_proportional(spark, docs):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, "text", fr)
    b = hash_split(docs.repartition(7), "text", fr)  # partitioning-invariant
    ja = {r.doc_id: r.split for r in a.select("doc_id", "split").collect()}
    jb = {r.doc_id: r.split for r in b.select("doc_id", "split").collect()}
    assert ja == jb
    counts = {r.split: r["count"] for r in a.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert abs(counts.get("train", 0) / n - 0.8) < 0.08
    assert abs(counts.get("val", 0) / n - 0.1) < 0.06


def test_hash_split_matches_sql_case(spark, docs):
    import duckdb
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.doc_id: r.split for r in
           hash_split(docs, "text", fr).select("doc_id", "split").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = dict(con.sql(
        f"SELECT doc_id, {split_sql_case('text', fr)} AS s FROM documents").fetchall())
    assert got == want


def test_hash_split_validation(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, "text", {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        hash_split(docs, "text", {"a": 0.5})
    ok = hash_split(docs, "text", {"a": 0.5}, out_default="rest")
    assert {r.split for r in ok.select("split").distinct().collect()} <= {"a", "rest"}


def test_decontaminate_keeps_null_text_docs(spark, docs):
    withnull = docs.unionByName(
        spark.createDataFrame([(99999, None, "x", "srcX", 0)],
                              "doc_id long, text string, lang string, source string, n_chars long"))
    bench = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    clean = decontaminate(withnull, "text", "doc_id", bench, shingle=SHINGLE,
                          n_shards=8, partitions=4)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert 99999 in kept  # a NULL-text doc cannot be contaminated


def test_contamination_probe_modes_identical(spark):
    """probe='distinct' joins flags back on the filter's own base-hash pair
    — bit-identical to probing every occurrence."""
    from pyspark.sql import functions as F
    from sparksketch.decontam import benchmark_filter, contamination
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    state = benchmark_filter(bench, "text", shingle=20, n_shards=8, partitions=4)
    a = contamination(docs, "text", "doc_id", state, shingle=20, probe="all")
    d = contamination(docs, "text", "doc_id", state, shingle=20, probe="distinct")
    ra = sorted(map(tuple, a.collect()))
    rd = sorted(map(tuple, d.collect()))
    assert ra == rd
    import pytest as _pt
    with _pt.raises(ValueError):
        contamination(docs, "text", "doc_id", state, probe="bogus")


def test_stratified_sample(spark):
    import duckdb
    from sparksketch.decontam import sample_sql_pred, stratified_sample
    import pytest
    n = 4000
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"))
    fr = {"s0": 0.25, "s1": 0.75, "s2": 0.0}
    kept = stratified_sample(df, "src", "id", fr, default=1.0).cache()
    by = {r.src: r["count"] for r in kept.groupBy("src").count().collect()}
    assert by.get("s2", 0) == 0
    assert by["s3"] == n // 4                      # default 1.0 keeps all
    assert abs(by["s0"] - 0.25 * n / 4) < 0.25 * n / 4 * 0.35
    assert abs(by["s1"] - 0.75 * n / 4) < 0.75 * n / 4 * 0.2
    # engine parity: DuckDB picks the identical row set
    import pandas as pd
    pdf = df.toPandas()
    want = duckdb.sql(
        f"SELECT id FROM pdf WHERE {sample_sql_pred('src', 'id', fr, 1.0)} ORDER BY id"
    ).fetchall()
    got = sorted(r.id for r in kept.collect())
    assert got == [w[0] for w in want]
    # reshuffle-invariant
    again = sorted(r.id for r in stratified_sample(df.repartition(13), "src", "id", fr).collect())
    assert again == got
    with pytest.raises(ValueError, match="outside"):
        stratified_sample(df, "src", "id", {"s0": 1.5})


def test_quota_sample(spark):
    import duckdb
    from sparksketch.decontam import quota_sample, quota_sql_pred
    df = spark.range(3000).select(
        F.col("id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"))
    kept = quota_sample(df, "src", "id", 50)
    by = {r.src: r["count"] for r in kept.groupBy("src").count().collect()}
    assert by == {"s0": 50, "s1": 50, "s2": 50}
    # under-full stratum keeps everything
    small = quota_sample(df.filter("id < 30"), "src", "id", 50)
    assert small.count() == 30
    # dict quotas; None default = unlimited
    mixed = quota_sample(df, "src", "id", {"s0": 10, "s1": 0}, default_n=None)
    byq = {r.src: r["count"] for r in mixed.groupBy("src").count().collect()}
    assert byq.get("s0") == 10 and "s1" not in byq and byq["s2"] == 1000
    # two-phase bucketed plan returns the identical row set
    two = quota_sample(df, "src", "id", 50, n_buckets=8)
    assert sorted(r.id for r in two.collect()) == sorted(r.id for r in kept.collect())
    # DuckDB picks the identical rows
    pdf = df.toPandas()
    want = duckdb.sql(
        f"SELECT id FROM pdf QUALIFY {quota_sql_pred('src', 'id', 50)} ORDER BY id"
    ).fetchall()
    assert sorted(r.id for r in kept.collect()) == [w[0] for w in want]


def test_quota_sample_reserved_column_guard(spark):
    import pytest
    from sparksketch.decontam import quota_sample
    df = spark.range(10).select("id", F.lit("s").alias("src"), F.lit(1).alias("_rk"))
    with pytest.raises(ValueError, match="reserved"):
        quota_sample(df, "src", "id", 3)


def test_stratified_sample_plan_is_scan_side(spark, tmp_path):
    """The sample must stay a pushed predicate: zero Exchange in the plan,
    filter evaluated in the scan stage (at 100 TB it's a predicate, not a
    job)."""
    from sparksketch.decontam import stratified_sample
    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr("id", "'s' AS src").write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = stratified_sample(df, "src", "id", {"s": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "FileScan" in plan


def test_uniform_sample_k(spark):
    import duckdb
    import pytest
    from sparksketch.decontam import uniform_sample_k, uniform_sample_sql
    df = spark.range(3000).select(
        F.col("id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"))
    kept = uniform_sample_k(df, "id", 40)
    assert kept.columns == ["id", "src"]
    got = sorted(r.id for r in kept.collect())
    assert len(got) == 40
    # DuckDB picks the identical row set over the identical rank key
    pdf = df.toPandas()
    want = sorted(w[0] for w in duckdb.sql(
        uniform_sample_sql("pdf", "id", "id", 40)).fetchall())
    assert got == want
    # reshuffle-invariant
    again = sorted(r.id for r in uniform_sample_k(df.repartition(13), "id", 40).collect())
    assert again == got
    # k >= n keeps everything
    assert uniform_sample_k(df, "id", 5000).count() == 3000
    with pytest.raises(ValueError, match="k must"):
        uniform_sample_k(df, "id", 0)
    with pytest.raises(ValueError, match="reserved"):
        uniform_sample_k(df.withColumn("_rk", F.lit(1)), "id", 5)


def test_uniform_sample_k_plan_is_take_ordered(spark, tmp_path):
    """The global fixed-k sample must plan as TakeOrderedAndProject
    (partition-local top-k + driver merge) — never a global sort with a
    rangepartitioning Exchange."""
    from sparksketch.decontam import uniform_sample_k
    p = str(tmp_path / "u.parquet")
    spark.range(100_000).selectExpr("id", "'x' AS src").write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = uniform_sample_k(df, "id", 100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_pps_sample(spark):
    """PPS sampling: inclusion proportional to weight (capped at 1),
    deterministic, reshuffle-invariant, DuckDB-identical, HT weights
    unbiased to ~binomial tolerance."""
    import duckdb

    from sparksketch.decontam import pps_sample, pps_sql_pred
    df = spark.range(20_000).select(
        F.col("id"), (F.pmod(F.col("id"), F.lit(100)) + 1).alias("w"))
    rate = 1.0 / 80.0  # w in 1..100 -> p in 0.0125..1.0, cap exercised
    kept = pps_sample(df, "w", "id", rate, ht_weight="ht").cache()
    rows = kept.collect()
    # every w >= 80 row is kept with certainty (p >= 1)
    assert kept.filter("w >= 80").count() == df.filter("w >= 80").count()
    # HT estimate of the population count is within 5 sigma of truth
    est = sum(r.ht for r in rows)
    import math
    var = sum((1 - min(w / 80.0, 1.0)) / min(w / 80.0, 1.0) ** 2
              for w in range(1, 101)) * 200
    assert abs(est - 20_000) <= 5 * math.sqrt(var)
    # reshuffle-invariant, engine-identical
    again = sorted(r.id for r in pps_sample(df.repartition(17), "w", "id", rate).collect())
    assert again == sorted(r.id for r in rows)
    pdf = df.toPandas()
    want = sorted(x[0] for x in duckdb.sql(
        f"SELECT id FROM pdf WHERE {pps_sql_pred('w', 'id', rate)}").fetchall())
    assert again == want
    # NULL / non-positive weights never kept
    nulls = spark.createDataFrame([(1, None), (2, 0), (3, -5)], "id long, w int")
    assert pps_sample(nulls, "w", "id", rate).count() == 0
    with pytest.raises(ValueError, match="rate"):
        pps_sample(df, "w", "id", 0.0)


# ---------------------------------------------------------------- mixture

def _brute_mix(rows, proportions, budget, salt="mixbudget"):
    """Spec: rows = (key, source, w); returns {(key, epoch), ...}."""
    from hashlib import md5 as _md5
    avail = {}
    for k, s, w in rows:
        avail[s] = avail.get(s, 0) + w
    out = set()
    for s, p in proportions.items():
        a = avail.get(s, 0)
        ppm = round(p * 1_000_000)
        if a <= 0 or ppm <= 0:
            continue
        target = (budget * ppm) // 1_000_000
        n_full = target // a
        thr = f"{((target - n_full * a) << 32) // a:08x}"
        for k, src, w in rows:
            if src != s:
                continue
            pre = _md5(f"{s}|{salt}|{k}".encode()).hexdigest()[:8]
            for e in range(n_full):
                out.add((k, e))
            if pre < thr:
                out.add((k, n_full))
    return out


def test_mix_to_budget_matches_spec(spark):
    from sparksketch.decontam import mix_to_budget
    rows = [(i, f"s{i % 3}", 1) for i in range(90)] + [(1000, "other", 1)]
    df = spark.createDataFrame([(k, s) for k, s, _ in rows],
                               "doc_id long, source string")
    props = {"s0": 0.6, "s1": 0.3, "s2": 0.05, "missing": 0.05}
    budget = 450  # s0 target 270 over 30 rows -> 9 epochs
    got = {(r.doc_id, r.epoch)
           for r in mix_to_budget(df, props, budget).collect()}
    assert got == _brute_mix(rows, props, budget)
    assert max(e for _, e in got) >= 8        # epochs really replicate
    assert not any(k == 1000 for k, _ in got)  # unlisted source dropped


def test_mix_to_budget_weighted(spark):
    from sparksketch.decontam import mix_to_budget
    rows = [(i, "a" if i < 20 else "b", 10 + (i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    props = {"a": 0.7, "b": 0.3}
    budget = 2000
    got = {(r.doc_id, r.epoch)
           for r in mix_to_budget(df, props, budget,
                                  weight_col="n_tok").collect()}
    # spec with weighted avail
    assert got == _brute_mix(rows, props, budget)
    # achieved token mass is near target in expectation terms: full epochs
    # are exact, so at minimum n_full * avail tokens per source are present
    w = {k: t for k, _, t in rows}
    tok_a = sum(w[k] for k, e in got if k < 20)
    assert tok_a >= (budget * 700000 // 1000000 // sum(
        t for i, s, t in rows if s == "a")) * sum(
        t for i, s, t in rows if s == "a")


def test_mix_to_budget_edges(spark):
    from sparksketch.decontam import mix_to_budget
    import pytest as _pytest
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    assert mix_to_budget(df, {"zzz": 1.0}, 100).count() == 0  # no listed source present
    assert mix_to_budget(df, {"a": 1.0}, 0).count() == 0      # zero budget
    assert mix_to_budget(df, {}, 100).count() == 0            # empty plan
    with _pytest.raises(ValueError):
        mix_to_budget(df, {"a": -0.1}, 100)
    with _pytest.raises(ValueError):
        mix_to_budget(df, {"a": 1.0}, -1)
    # budget == avail exactly: one full epoch, no partial
    got = mix_to_budget(df, {"a": 1.0}, 1).collect()
    assert [(r.doc_id, r.epoch) for r in got] == [(1, 0)]
