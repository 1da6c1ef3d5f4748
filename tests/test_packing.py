"""Sequence packing: hand-computed layout parity, DuckDB engine parity,
reshuffle invariance, edge cases, and the one-window-per-bucket plan."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksketch.packing import pack_sequences, pack_sequences_sql


def _hand_pack(rows, capacity, n_buckets, salt="pack"):
    """Plain-Python reference: rows = [(key, tokens)]."""
    out = {}
    for b in range(n_buckets):
        docs = sorted((r for r in rows if r[0] % n_buckets == b),
                      key=lambda r: (hashlib.md5(f"{salt}|{r[0]}".encode()).hexdigest(), r[0]))
        cum = 0
        for key, tok in docs:
            seq, off = divmod(cum, capacity)
            out[key] = (b, seq, off, (cum + tok - 1) // capacity != seq)
            cum += tok
    return out


def test_pack_matches_hand_reference(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r.doc_id: (r.bucket, r.seq, r.offset, r.straddles)
           for r in pack_sequences(df, "n_tokens", "doc_id", capacity=256,
                                   n_buckets=4,
                                   bucket_expr=F.pmod("doc_id", F.lit(4))).collect()}
    assert got == _hand_pack(rows, 256, 4)


def test_pack_engine_parity_duckdb(spark):
    rows = [(i, 1 + (i * 13) % 500) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted((r.doc_id, r.bucket, r.seq, r.offset, r.straddles)
                 for r in pack_sequences(df, "n_tokens", "doc_id", capacity=512,
                                         n_buckets=2,
                                         bucket_expr=F.pmod("doc_id", F.lit(2))).collect())
    pdf = df.toPandas()
    want = sorted(map(tuple, duckdb.sql(pack_sequences_sql(
        "pdf", "doc_id", "n_tokens", "doc_id", 512, "doc_id % 2")).fetchall()))
    assert got == want


def test_pack_reshuffle_invariant_and_contiguous(spark):
    rows = [(i, 5 + i % 20) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df, "n_tokens", "doc_id", 128,
                                         n_buckets=8).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(13), "n_tokens",
                                         "doc_id", 128, n_buckets=8).collect()))
    assert a == b
    # per bucket the layout is gapless: total tokens == last seq*C + last end
    out = pack_sequences(df, "n_tokens", "doc_id", 128, n_buckets=8)
    chk = (out.groupBy("bucket")
           .agg(F.sum("n_tokens").alias("tok"),
                F.max(F.col("seq") * 128 + F.col("offset") + F.col("n_tokens")).alias("end"))
           .collect())
    assert chk and all(r.tok == r.end for r in chk)


def test_pack_edges(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, 0), (4, 64), (None, 50)],
        "doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", "doc_id", capacity=64, n_buckets=1)
    got = {r.doc_id: (r.seq, r.offset, r.straddles) for r in out.collect()}
    assert set(got) == {1, 4}                 # NULL/zero-token/NULL-key drop
    # the doc of exactly capacity tokens starting at (seq 0, offset 0)
    # does NOT straddle — the boundary is cum+tok-1, not cum+tok
    exact = [v for v in got.values() if v[1] == 0 and v[0] == 0]
    assert exact == [(0, 0, False)]
    with pytest.raises(ValueError):
        pack_sequences(df, "n_tokens", "doc_id", capacity=0)
    with pytest.raises(ValueError, match="clash"):
        pack_sequences(df.withColumn("seq", F.lit(1)), "n_tokens", "doc_id", 64)


def test_pack_plan_one_window_per_bucket(spark, tmp_path):
    p = str(tmp_path / "d.parquet")
    spark.range(10_000).selectExpr("id AS doc_id", "10 + id % 50 AS n_tokens") \
        .write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = pack_sequences(df, "n_tokens", "doc_id", 1024, n_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one shuffle (hashpartitioning on bucket) feeding one Window
    assert plan.count("Exchange") == 1
    assert "Window" in plan and "rangepartitioning" not in plan
