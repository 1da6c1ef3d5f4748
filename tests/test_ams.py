"""AMS/Count-Sketch: unbiased F2 + join-size estimates, byte-identical
integer merges, and the zero-shuffle Spark build against exact SQL."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.ams import AMS, ams_build, ams_by_group

SF = "/root/testdata/sf0.01"


def _hashes_for(keys):
    """64-bit hashes for a synthetic integer multiset (plain splitmix — the
    pure-numpy tests don't need Spark's xxhash64, only a good 64-bit mix)."""
    from sparksketch.hashing import splitmix64
    return splitmix64(np.asarray(keys, dtype=np.uint64))


def test_single_key_exact():
    # one distinct key: every row puts all n updates in one column -> each
    # row estimate is exactly n^2, so the median is exact
    sk = AMS(d=5, w=256)
    sk.update_hashes(_hashes_for([7] * 1000))
    assert sk.f2_estimate() == 1000.0 ** 2
    assert sk.n == 1000


def test_f2_accuracy_zipf():
    rng = np.random.default_rng(29)
    keys = rng.zipf(1.3, size=200_000) % 10_000
    counts = np.bincount(keys)
    exact = float((counts.astype(np.float64) ** 2).sum())
    sk = AMS(d=5, w=8192)
    sk.update_hashes(_hashes_for(keys))
    est = sk.f2_estimate()
    assert abs(est - exact) <= sk.rel_error() * exact
    assert sk.median_fail_prob() < 0.03


def test_merge_byte_identical_any_order():
    rng = np.random.default_rng(31)
    keys = rng.integers(0, 5000, size=50_000)
    h = _hashes_for(keys)
    ref = AMS(d=5, w=1024)
    ref.update_hashes(h)
    for seed in (0, 1):
        order = np.random.default_rng(seed).permutation(7)
        parts = np.array_split(h, 7)
        sketches = []
        for p in parts:
            s = AMS(d=5, w=1024)
            s.update_hashes(p)
            sketches.append(s)
        acc = sketches[order[0]]
        for j in order[1:]:
            acc = acc.merge(sketches[j])
        assert acc.to_bytes() == ref.to_bytes()


def test_serde_roundtrip():
    sk = AMS(d=3, w=64)
    sk.update_hashes(_hashes_for([1, 2, 3, 3, 3]))
    back = AMS.from_bytes(sk.to_bytes())
    assert back.to_bytes() == sk.to_bytes()
    assert (back.d, back.w, back.n) == (3, 64, 5)
    assert np.array_equal(back.table, sk.table)


def test_inner_product_join_size():
    rng = np.random.default_rng(37)
    a = rng.integers(0, 2000, size=100_000)
    b = rng.integers(1000, 3000, size=80_000)     # half-overlapping key space
    fa = np.bincount(a, minlength=3000).astype(np.float64)
    fb = np.bincount(b, minlength=3000).astype(np.float64)
    exact = float(fa @ fb)
    sa = AMS(d=5, w=8192)
    sb = AMS(d=5, w=8192)
    sa.update_hashes(_hashes_for(a))
    sb.update_hashes(_hashes_for(b))
    est = sa.inner_product(sb)
    margin = 4.0 * np.sqrt((fa @ fa) * (fb @ fb)) / np.sqrt(8192)
    assert abs(est - exact) <= margin
    # disjoint key spaces -> inner product is small relative to the margin
    c = rng.integers(100_000, 101_000, size=50_000)
    sc = AMS(d=5, w=8192)
    sc.update_hashes(_hashes_for(c))
    fc = np.bincount(c, minlength=101_000).astype(np.float64)
    m2 = 4.0 * np.sqrt((fa @ fa) * (fc @ fc)) / np.sqrt(8192)
    assert abs(sa.inner_product(sc)) <= m2


def test_validation():
    with pytest.raises(ValueError):
        AMS(d=4, w=64)          # even d has no median row
    with pytest.raises(ValueError):
        AMS(d=5, w=8)
    with pytest.raises(ValueError):
        AMS(d=5, w=64).merge(AMS(d=5, w=128))
    with pytest.raises(ValueError):
        AMS(d=5, w=64).inner_product(AMS(d=3, w=64))


def test_ams_build_spark_vs_exact(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = ams_build(ev, "user_id", d=5, w=8192)
    exact = (ev.filter("user_id IS NOT NULL").groupBy("user_id").count()
             .agg(F.sum(F.col("count") * F.col("count"))).first()[0])
    assert sk.n == ev.filter("user_id IS NOT NULL").count()
    assert abs(sk.f2_estimate() - exact) <= sk.rel_error() * exact


def test_ams_join_size_spark(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.filter("event_type = 'click'").select("user_id")
    views = ev.filter("event_type = 'view'").select("user_id")
    sc = ams_build(clicks, "user_id", w=8192)
    sv = ams_build(views, "user_id", w=8192)
    exact = clicks.join(views, "user_id").count()
    margin = 4.0 * np.sqrt(sc.f2_estimate() * sv.f2_estimate()) / np.sqrt(8192)
    assert abs(sc.inner_product(sv) - exact) <= margin


def test_ams_by_group(spark):
    from sparksketch.sketch import estimate_col
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = (ams_by_group(ev, "event_type", "user_id", w=4096)
           .withColumn("f2", estimate_col(AMS, "f2_estimate")("state")))
    got = {r.group: r.f2 for r in out.collect()}
    exact = {r.event_type: float(r.f2) for r in
             ev.filter("user_id IS NOT NULL").groupBy("event_type", "user_id")
               .count().groupBy("event_type")
               .agg(F.sum(F.col("count") * F.col("count")).alias("f2")).collect()}
    assert set(got) == set(exact)
    for g, e in exact.items():
        assert abs(got[g] - e) <= (4.0 / np.sqrt(4096)) * e


def test_f2_float64_no_int64_wrap():
    # a 4e9-update hot key squares past 2^63; float64 accumulation must not wrap
    sk = AMS(d=3, w=16)
    sk.table[:, 0] = 4_000_000_000
    assert sk.f2_estimate() == pytest.approx(1.6e19, rel=1e-12)
    assert sk.inner_product(sk) == pytest.approx(1.6e19, rel=1e-12)
