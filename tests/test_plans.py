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


# --- forced-broadcast audit over the relational suite -----------------------

_RELATIONAL_KEYS = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts", "q12_ship_delay_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_qty_revenue", "q18_large_orders",
    "q19_discounted_revenue", "q20_part_shippers", "q21_waiting_suppliers",
    "q22_sales_opportunity", "rolling_user_spend", "rollup_pricing",
    "top3_orders_per_customer", "distinct_parts_per_returnflag",
    "customers_without_orders",
]


def test_relational_queries_have_no_unsafe_broadcast_hints(spark):
    # the 100×-scale killer class: an explicit broadcast hint overrides
    # autoBroadcastJoinThreshold, so a hint on an SF-proportional table
    # (customer/orders/lineitem, or part/supplier without a narrow equality
    # slice) OOMs at scale instead of degrading.  Walks EVERY relational
    # query's analyzed plan through the library's own guard.
    import __spark_entry__ as entry
    from sparksketch.plans import assert_broadcast_scale_safe, forced_broadcasts
    qs = entry.queries()
    checked = 0
    for key in _RELATIONAL_KEYS:
        df = qs[key](spark, "/root/testdata/sf0.001")
        assert_broadcast_scale_safe(df)
        checked += len(forced_broadcasts(df))
    # non-vacuity: the suite still CARRIES hints (nation/region/aggregates/
    # narrow slices) — the guard is exercising real subtrees, not skipping
    assert checked >= 10


def test_broadcast_guard_catches_unsafe_hints(spark):
    # positive control: the guard must actually fire on each unsafe class
    import pytest as _pytest
    from pyspark.sql import functions as F
    from sparksketch.plans import assert_broadcast_scale_safe
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    bad = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    with _pytest.raises(AssertionError, match="customer"):
        assert_broadcast_scale_safe(bad)
    # filtered customer is STILL unsafe (no filter credit for customer)
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING")
    with _pytest.raises(AssertionError, match="customer"):
        assert_broadcast_scale_safe(
            orders.join(F.broadcast(seg), orders.o_custkey == seg.c_custkey))
    # aggregate over a growing table IS safe (cardinality collapsed)
    top = cust.groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    ok = orders.crossJoin(F.broadcast(top.limit(1)))
    assert_broadcast_scale_safe(ok)
    # ...but grouping ON THE TABLE KEY collapses nothing — still unsafe
    perkey = cust.groupBy("c_custkey").agg(F.sum("c_acctbal").alias("s"))
    with _pytest.raises(AssertionError, match="customer"):
        assert_broadcast_scale_safe(
            orders.join(F.broadcast(perkey), orders.o_custkey == perkey.c_custkey))
    # an equality filter on a DIFFERENT (bounded) table cannot launder an
    # unfiltered part/supplier broadcast
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    laundered = part.crossJoin(nation.filter(F.col("n_name") == "NATION_1"))
    with _pytest.raises(AssertionError, match="part"):
        assert_broadcast_scale_safe(
            li.join(F.broadcast(laundered), li.l_partkey == laundered.p_partkey))
    # while a genuine equality slice of part itself stays allowed
    sliced = part.filter((F.col("p_size") == 10) & (F.col("p_type") == "LARGE"))
    assert_broadcast_scale_safe(
        li.join(F.broadcast(sliced), li.l_partkey == sliced.p_partkey))
    # an aggregate on a SIBLING branch cannot launder a raw fact branch
    # (credits are path-scoped per relation)
    nagg = nation.groupBy("n_name").agg(F.count("*").alias("n"))
    sib = orders.crossJoin(nagg)
    with _pytest.raises(AssertionError, match="orders"):
        assert_broadcast_scale_safe(
            li.join(F.broadcast(sib), li.l_orderkey == sib.o_orderkey))
    # a NEGATION prints as NOT(col = lit) — it must NOT earn equality credit
    neg = part.filter(F.col("p_type") != "LARGE")
    with _pytest.raises(AssertionError, match="part"):
        assert_broadcast_scale_safe(
            li.join(F.broadcast(neg), li.l_partkey == neg.p_partkey))
    # grouping on a FOREIGN key of an SF-proportional table collapses
    # nothing (orders-per-customer has customer cardinality)
    percust = orders.groupBy("o_custkey").agg(F.count("*").alias("n"))
    with _pytest.raises(AssertionError, match="orders"):
        assert_broadcast_scale_safe(
            cust.join(F.broadcast(percust), cust.c_custkey == percust.o_custkey))


def test_queries_window_rotation_invariant():
    # the driver gate truncates at 50 — ordering must be least-recently-
    # driver-checked first, computed from CORRECTNESS_r*.json history
    import glob
    import json
    import re

    import __spark_entry__ as entry
    keys = list(entry.queries())
    last = {}
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        rnd = int(re.search(r"_r(\d+)", p).group(1))
        for k in json.load(open(p)):
            last[k] = max(last.get(k, 0), rnd)
    # a result-changing edit retires the old driver rows (the registry is
    # self-clearing once a newer CORRECTNESS file records the key)
    for k, rnd in entry._RESULT_CHANGED_IN_ROUND.items():
        if last.get(k, 0) < rnd:
            last[k] = 0
    rounds = [last.get(k, 0) for k in keys]
    # non-decreasing: a later entry is never LESS recently checked
    assert rounds == sorted(rounds)
    # every stale key (not checked in the latest recorded round) is inside
    # the 50-slot window, as long as there are slots for them
    latest = max(rounds) if rounds else 0
    stale = [k for k in keys if last.get(k, 0) < latest]
    assert all(k in keys[:max(50, len(stale))] for k in stale)
