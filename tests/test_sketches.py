"""HLL / CMS / t-digest / KLL: estimate bounds vs exact Spark aggregates,
merge laws, group-by sketch pattern (SURVEY.md §5.2 item 4)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.cms import CMS, cms_build, cms_topk
from sparksketch.hll import HLL, hll_by_group, hll_distinct
from sparksketch.kll import KLL, kll_build
from sparksketch.sketch import estimate_col
from sparksketch.tdigest import TDigest, tdigest_build, tdigest_by_group

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


# ---------------- HLL ----------------

def test_hll_global_within_bound(events):
    exact = events.select(F.countDistinct("user_id")).collect()[0][0]
    est = hll_distinct(events, "user_id", p=14)
    assert abs(est - exact) / exact <= 3 * HLL(14).rel_error()


def test_hll_by_group_within_bound(spark, events):
    states = hll_by_group(events, "event_type", "user_id", p=12)
    got = {r.group: r.est for r in states.withColumn("est", estimate_col(HLL)("state")).collect()}
    exact = {r.event_type: r.d for r in
             events.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()}
    assert set(got) == set(exact)
    for g, e in exact.items():
        assert abs(got[g] - e) / e <= 3 * HLL(12).rel_error(), g


def test_hll_merge_byte_identical_any_order():
    rng = np.random.default_rng(0)
    parts = []
    for i in range(6):
        h = HLL(12)
        h.update_hashes(rng.integers(0, 2**64, 5000, dtype=np.uint64))
        parts.append(h.to_bytes())

    def fold(order):
        acc = HLL.from_bytes(parts[order[0]])
        for i in order[1:]:
            acc = acc.merge(HLL.from_bytes(parts[i]))
        return acc.to_bytes()

    base = fold(list(range(6)))
    r = random.Random(1)
    for _ in range(4):
        order = list(range(6))
        r.shuffle(order)
        assert fold(order) == base


# ---------------- CMS ----------------

def test_cms_exact_for_small_key_space(documents):
    sk = cms_build(documents, "source", d=5, w=8192)
    exact = {r.source: r["count"] for r in documents.groupBy("source").count().collect()}
    # few distinct sources in 8192 columns → collisions in all 5 rows are
    # essentially impossible → CMS == exact (and never under)
    for key, cnt in exact.items():
        q = sk.query(key)
        assert q >= cnt
        assert q == cnt, f"{key}: {q} != {cnt}"
    top = cms_topk(sk, list(exact), k=3)
    true_top = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert top == true_top


def test_cms_overestimate_bounded(events):
    sk = cms_build(events, "user_id", d=5, w=2048)
    exact = {str(r.user_id): r["count"] for r in events.groupBy("user_id").count().limit(200).collect()}
    for key, cnt in exact.items():
        q = sk.query(key)
        assert q >= cnt
        assert q - cnt <= sk.error_bound()


def test_cms_merge_commutative():
    rng = np.random.default_rng(3)
    parts = []
    for _ in range(4):
        c = CMS(4, 512)
        c.update_hashes(rng.integers(0, 2**64, 2000, dtype=np.uint64),
                        rng.integers(0, 2**64, 2000, dtype=np.uint64))
        parts.append(c.to_bytes())
    a = CMS.from_bytes(parts[0]).merge(CMS.from_bytes(parts[1])).merge(
        CMS.from_bytes(parts[2])).merge(CMS.from_bytes(parts[3]))
    b = CMS.from_bytes(parts[3]).merge(CMS.from_bytes(parts[2])).merge(
        CMS.from_bytes(parts[1])).merge(CMS.from_bytes(parts[0]))
    assert a.to_bytes() == b.to_bytes()


# ---------------- t-digest ----------------

def test_tdigest_rank_error(events):
    sk = tdigest_build(events, "value", delta=200)
    vals = np.sort(np.array([r.value for r in events.select("value").collect()]))
    assert sk.n == len(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = sk.quantile(q)
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - q) <= 0.02, f"q={q} rank={rank}"


def test_tdigest_by_group(events):
    states = tdigest_by_group(events, "event_type", "value", delta=100)
    got = {r.group: r.med for r in
           states.withColumn("med", estimate_col(TDigest, "quantile", (0.5,))("state")).collect()}
    pdf = events.select("event_type", "value").toPandas()
    for g, med in got.items():
        vals = np.sort(pdf[pdf.event_type == g].value.values)
        rank = np.searchsorted(vals, med) / len(vals)
        assert abs(rank - 0.5) <= 0.05, g


# ---------------- KLL ----------------

def test_kll_rank_error(documents):
    sk = kll_build(documents, "n_chars", k=200)
    vals = np.sort(np.array([r.n_chars for r in documents.select("n_chars").collect()], dtype=float))
    assert sk.n == len(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = sk.quantile(q)
        rank = np.searchsorted(vals, est, side="right") / len(vals)
        assert abs(rank - q) <= 0.035, f"q={q} rank={rank}"


def test_kll_merge_bounds():
    rng = np.random.default_rng(5)
    vals = rng.normal(0, 1, 60_000)
    a, b, c = KLL(200, 1), KLL(200, 2), KLL(200, 3)
    a.update_values(vals[:20000])
    b.update_values(vals[20000:40000])
    c.update_values(vals[40000:])
    m = a.merge(b).merge(c)
    assert m.n == 60_000
    sv = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(sv, m.quantile(q), side="right") / len(sv)
        assert abs(rank - q) <= 0.035


def test_kll_rng_state_roundtrips_full_128_bits():
    """Serde must restore the exact PCG64 stream (state AND inc are 128-bit):
    resumed updates on the restored sketch reproduce the original exactly."""
    rng = np.random.default_rng(5)
    vals = rng.normal(0, 1, 30_000)
    a = KLL(200, seed=123)
    a.update_values(vals[:15000])
    b = KLL.from_bytes(a.to_bytes())
    assert b.rng.bit_generator.state == a.rng.bit_generator.state
    a.update_values(vals[15000:])
    b.update_values(vals[15000:])
    assert a.to_bytes() == b.to_bytes()  # identical compaction coin flips


def test_kll_by_group(spark, events):
    from sparksketch.kll import KLL, kll_by_group
    states = kll_by_group(events, "event_type", "value", k=200)
    got = {r.group: KLL.from_bytes(bytes(r.state)) for r in states.collect()}
    pdf = events.select("event_type", "value").toPandas()
    for g, sk in got.items():
        vals = np.sort(pdf[pdf.event_type == g].value.values)
        assert sk.n == len(vals)
        rank = np.searchsorted(vals, sk.quantile(0.5), side="right") / len(vals)
        assert abs(rank - 0.5) <= 0.05, g


def test_merge_geometry_mismatches_raise():
    from sparksketch.kll import KLL
    a, b = KLL(100), KLL(200)
    with pytest.raises(ValueError):
        a.merge(b)
    c, d = CMS(4, 512), CMS(5, 512)
    with pytest.raises(ValueError):
        c.merge(d)
    e, f = HLL(10), HLL(12)
    with pytest.raises(ValueError):
        e.merge(f)


def test_kll_bucketize(spark):
    from sparksketch.kll import bucketize
    import pytest
    n = 20_000
    df = spark.range(n).select((F.col("id") * 7919 % n).cast("double").alias("v"))
    out, bounds = bucketize(df, "v", n_buckets=8)
    assert len(bounds) == 7 and bounds == sorted(bounds)
    counts = {r.bucket: r["count"] for r in out.groupBy("bucket").count().collect()}
    assert set(counts) == set(range(8))
    # equi-depth within the sketch's rank error (eps ~ 1.7/200*sqrt(L))
    for b, c in counts.items():
        assert abs(c - n / 8) < 0.05 * n, (b, c)
    # NULL value -> NULL bucket
    wnull = spark.createDataFrame([(None,), (1.0,)], "v double")
    got = bucketize(wnull, "v", n_buckets=4, sk=None)[0].collect()
    assert any(r.bucket is None for r in got)
    with pytest.raises(ValueError, match="buckets"):
        bucketize(df, "v", n_buckets=1)


def test_theta_set_operations(spark):
    from sparksketch.theta import (
        Theta,
        difference_estimate,
        intersection_estimate,
        theta_build,
        union_estimate,
    )
    import pytest
    a = spark.range(0, 20_000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(12_000, 30_000).select(F.col("id").cast("string").alias("k"))
    ta = theta_build(a, "k", k=2048)
    tb = theta_build(b, "k", k=2048)
    assert abs(ta.estimate() - 20_000) < 0.1 * 20_000
    inter = intersection_estimate(ta, tb)        # true 8000
    union = union_estimate(ta, tb)               # true 30000
    diff = difference_estimate(ta, tb)           # true 12000
    assert abs(inter - 8_000) < 0.15 * 8_000
    assert abs(union - 30_000) < 0.1 * 30_000
    assert abs(diff - 12_000) < 0.15 * 12_000
    # merge == build-on-union, byte-identical (order-invariant bottom-k)
    tm = theta_build(a, "k", k=2048).merge(theta_build(b, "k", k=2048))
    tu = theta_build(a.union(b), "k", k=2048)
    assert tm.to_bytes() == tu.to_bytes()
    # below capacity the sketch is exact
    small = theta_build(a.limit(500), "k", k=2048)
    assert small.estimate() == 500.0
    # serde roundtrip
    assert Theta.from_bytes(tm.to_bytes()).to_bytes() == tm.to_bytes()
    with pytest.raises(ValueError, match="k"):
        Theta(4)
    with pytest.raises(ValueError, match="different k"):
        Theta(16).merge(Theta(32))


def test_tdigest_weighted(spark):
    """Weighted t-digest: integer-multiplicity weights match an explicit
    row-expansion build, quantiles track the exact weighted quantiles,
    and weighted partials merge like any sketch."""
    import numpy as np

    from sparksketch.tdigest import TDigest, tdigest_weighted_build
    rng = np.random.default_rng(7)
    x = rng.normal(size=50_000)
    w = rng.integers(1, 20, size=50_000).astype(float)
    t = TDigest(200.0)
    t.update_weighted(x, w)
    expanded = TDigest(200.0)
    expanded.update_values(np.repeat(x, w.astype(int)))
    order = np.argsort(x)
    cw = np.cumsum(w[order])
    for q in (0.05, 0.5, 0.95):
        exact = x[order][np.searchsorted(cw, cw[-1] * q)]
        assert abs(t.rank(exact) - q) < 0.02
        assert abs(expanded.rank(exact) - q) < 0.02
    assert t.n == cw[-1]
    # NaN values / non-positive weights dropped
    t2 = TDigest()
    t2.update_weighted(np.array([1.0, np.nan, 3.0, 4.0]),
                       np.array([2.0, 5.0, -1.0, np.nan]))
    assert t2.n == 2.0
    # distributed build == driver build on the same data
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x[:5000], w[:5000])], "v double, w double")
    dist = tdigest_weighted_build(df, "v", "w")
    drv = TDigest(200.0)
    drv.update_weighted(x[:5000], w[:5000])
    # both digests are approximate with different merge orders — compare
    # each against the EXACT weighted rank, not against each other
    o5 = np.argsort(x[:5000])
    cw5 = np.cumsum(w[:5000][o5])
    def exact_rank(v):
        return cw5[np.searchsorted(x[:5000][o5], v, side="right") - 1] / cw5[-1]
    assert abs(exact_rank(dist.quantile(0.5)) - 0.5) < 0.03
    assert abs(exact_rank(drv.quantile(0.5)) - 0.5) < 0.03
    assert dist.n == drv.n


def test_tdigest_weighted_by_group(spark):
    from sparksketch.tdigest import TDigest, tdigest_weighted_by_group
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    states = tdigest_weighted_by_group(
        docs.selectExpr("source", "CAST(n_chars AS DOUBLE) v",
                        "CAST(n_chars % 7 + 1 AS DOUBLE) w"),
        "source", "v", "w")
    sks = {r.group: TDigest.from_bytes(bytes(r.state)) for r in states.collect()}
    import numpy as np
    rows = docs.selectExpr("source", "CAST(n_chars AS DOUBLE) v",
                           "CAST(n_chars % 7 + 1 AS DOUBLE) w").collect()
    for g in list(sks)[:3]:
        vals = np.array([r.v for r in rows if r.source == g])
        ws = np.array([r.w for r in rows if r.source == g])
        o = np.argsort(vals)
        cw = np.cumsum(ws[o])
        exact = vals[o][np.searchsorted(cw, cw[-1] * 0.5)]
        assert abs(sks[g].rank(exact) - 0.5) < 0.05
        assert sks[g].n == cw[-1]
