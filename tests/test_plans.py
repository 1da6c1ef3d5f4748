"""plan_digest / assert_scale_safe: the plan-regression-guard API."""

import pytest
from pyspark.sql import functions as F

from sparksketch.plans import assert_scale_safe, plan_digest


@pytest.fixture()
def tables(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(10_000).selectExpr("id", "id % 50 AS k", "'x' AS s") \
        .write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def test_digest_scan_side_filter(tables):
    d = plan_digest(tables.filter("id > 100").select("id"))
    assert d.n_scans == 1 and d.n_exchanges == 0
    assert any("GreaterThan" in p or "IsNotNull" in p for p in d.pushed_filters)
    assert d.read_schemas and "id" in d.read_schemas[0]
    assert not d.has_cross_product and d.n_python_evals == 0


def test_digest_counts_exchanges_and_joins(spark, tables):
    agg = tables.groupBy("k").count()
    assert plan_digest(agg).n_exchanges == 1
    dim = spark.range(10).selectExpr("id AS k", "'d' AS name")
    j = plan_digest(tables.join(F.broadcast(dim), "k"))
    assert j.joins == ["BroadcastHashJoin"]
    cross = plan_digest(tables.limit(5).crossJoin(dim))
    assert cross.has_cross_product


def test_digest_sort_shapes(tables):
    assert plan_digest(tables.orderBy("id").limit(3)).has_take_ordered
    d = plan_digest(tables.orderBy("id"))
    assert d.has_global_sort and not d.has_take_ordered


def test_assert_scale_safe(spark, tables):
    # a scale-safe query passes and returns its digest
    d = assert_scale_safe(tables.filter("id > 100").groupBy("k").count(),
                          max_exchanges=1, require_pushed="IsNotNull")
    assert d.n_exchanges == 1
    # each rule raises with the violated property named
    dim = spark.range(4).selectExpr("id AS j")
    with pytest.raises(AssertionError, match="cross-product"):
        assert_scale_safe(tables.crossJoin(dim))
    with pytest.raises(AssertionError, match="global sort"):
        assert_scale_safe(tables.orderBy("id"))
    with pytest.raises(AssertionError, match="Exchanges"):
        assert_scale_safe(tables.groupBy("k").count(), max_exchanges=0)
    with pytest.raises(AssertionError, match="no pushed filter"):
        assert_scale_safe(tables.select("id"), require_pushed="GreaterThan")


def test_digest_library_plans(spark):
    """The library's own headline plans satisfy their documented shapes."""
    from sparksketch.decontam import stratified_sample, uniform_sample_k
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # stratified sample: a pushed predicate, zero Exchange
    assert_scale_safe(stratified_sample(docs, "source", "doc_id", {"src0": 0.5}),
                      max_exchanges=0)
    # fixed-k sample: TakeOrdered, never a global sort
    d = plan_digest(uniform_sample_k(docs, "doc_id", 10))
    assert d.has_take_ordered and not d.has_global_sort


def test_digest_post_execution_no_double_count(tables):
    """After collect(), the plan string gains an '== Initial Plan ==' echo;
    the digest must count only the final section."""
    agg = tables.groupBy("k").count()
    agg.collect()
    d = plan_digest(agg)
    assert d.n_exchanges == 1 and d.n_scans == 1


def test_digest_truncated_pushed_filters(tables):
    """4+ pushed predicates exceed maxMetadataStringLength (no closing
    bracket) — the capture must still surface the leading predicates."""
    q = tables.filter("id > 100 AND id < 9000 AND k > 2 AND k < 40 AND s = 'x'")
    d = plan_digest(q)
    assert d.pushed_filters and "IsNotNull" in d.pushed_filters[0]
    assert all("\n" not in p for p in d.pushed_filters)
    assert_scale_safe(q, require_pushed="IsNotNull")


def test_digest_codegen_spans(tables):
    # treeString renders codegen as '*(N)' prefixes — visible only in the
    # executed final plan, so the span count turns nonzero after an action
    q = tables.filter("id > 5").groupBy("k").count()
    assert plan_digest(q).n_wholestage_spans == 0   # static plan: unannotated
    q.collect()
    assert plan_digest(q).n_wholestage_spans >= 2   # map + reduce stages


def test_digest_python_eval_stages(spark, tables):
    from pyspark.sql.types import LongType
    slow = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    assert plan_digest(tables.select(slow("id"))).n_python_evals >= 1
    def arrow_fn(it):
        for b in it:
            yield b
    assert plan_digest(tables.select("id").mapInArrow(arrow_fn, "id long")
                       ).n_python_evals >= 1


def test_digest_nested_aqe_subquery(spark, tmp_path):
    """A scalar subquery embeds its own '== Final/Initial Plan ==' marker
    pair INSIDE the main final section; only the top-level unindented echo
    may be stripped — the scan below the subquery must stay visible."""
    p = str(tmp_path / "sq.parquet")
    spark.range(10_000).selectExpr("id", "id % 20 AS k").write.mode("overwrite").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("_sqt")
    q = spark.sql("SELECT k, count(*) AS n FROM _sqt "
                  "WHERE id > (SELECT avg(id) FROM _sqt) GROUP BY k")
    q.collect()
    d = plan_digest(q)
    assert d.n_scans >= 1                    # the scan survives the strip
    assert d.pushed_filters                  # the pushed dynamic filter too
    assert d.n_exchanges >= 1
    # codegen stages counted per AQE scope, not collapsed across scopes
    assert d.n_wholestage_spans >= 2
