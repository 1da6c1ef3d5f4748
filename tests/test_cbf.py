"""Counting Bloom filter: deletable membership with merge/subtract algebra."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.cbf import CountingBloom, cbf_build, cbf_delete, with_cbf_membership

SF_DIR = "/root/testdata/sf0.01"


def test_cbf_build_zero_fn_and_fp_bound(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    st = cbf_build(docs, "text", k=8, m=1 << 18)
    assert st.inserts == docs.filter("text IS NOT NULL").count()
    flagged = with_cbf_membership(docs.select("text"), "text", st)
    assert flagged.filter(~F.col("is_member")).count() == 0  # zero FN
    absent = spark.range(20_000).select(
        F.concat(F.lit("never-inserted-"), F.col("id").cast("string")).alias("text"))
    fp = with_cbf_membership(absent, "text", st).filter("is_member").count()
    n_distinct = docs.select("text").distinct().count()
    assert fp <= max(10, 3 * st.fpr_bound(n_distinct) * 20_000)


def test_cbf_delete_restores_absence(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter("event_type = 'click' AND user_id IS NOT NULL")
    st = cbf_build(clicks, "user_id", k=8, m=1 << 18)
    # delete a row-predicate sub-multiset of the SAME source
    removed_rows = clicks.filter("value IS NOT NULL AND value < 50")
    st = cbf_delete(st, removed_rows, "user_id")
    remaining = clicks.filter("value IS NULL OR value >= 50")
    # zero FN on users with a remaining click
    rem_users = remaining.select("user_id").distinct()
    fn = with_cbf_membership(rem_users, "user_id", st).filter("NOT is_member").count()
    assert fn == 0
    # users whose every click was deleted: membership may only survive as a
    # bounded FP
    gone = (clicks.select("user_id").distinct()
            .join(rem_users, "user_id", "left_anti"))
    n_gone = gone.count()
    assert n_gone > 0  # the scenario is non-vacuous at sf0.01
    fp = with_cbf_membership(gone, "user_id", st).filter("is_member").count()
    assert fp <= max(2, 0.05 * n_gone)


def test_cbf_merge_equals_single_build(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = cbf_build(docs.filter("doc_id % 2 = 0"), "text")
    b = cbf_build(docs.filter("doc_id % 2 = 1"), "text")
    whole = cbf_build(docs, "text")
    assert a.merge(b).to_bytes() == whole.to_bytes()  # associative byte-exact


def test_cbf_subtract_guards_non_subset():
    a = CountingBloom(k=4, m=1 << 10)
    b = CountingBloom(k=4, m=1 << 10)
    h = np.array([123456789], dtype=np.uint64)
    h2 = np.array([987654321], dtype=np.uint64)
    b.update_hashes(h, h2)
    with pytest.raises(ValueError, match="sub-multiset"):
        a.subtract(b)


def test_cbf_roundtrip_and_geometry_checks():
    st = CountingBloom(k=5, m=1 << 12)
    h1 = np.arange(100, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h2 = np.arange(100, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(7)
    st.update_hashes(h1, h2)
    rt = CountingBloom.from_bytes(st.to_bytes())
    assert np.array_equal(rt.counts, st.counts)
    assert (rt.inserts, rt.deletes) == (100, 0)
    assert rt.contains_hashes(h1[:5], h2[:5]).all()
    with pytest.raises(ValueError, match="power of two"):
        CountingBloom(m=1000)
    with pytest.raises(ValueError, match="geometry"):
        st.merge(CountingBloom(k=5, m=1 << 13))


def test_cbf_by_group(spark):
    from sparksketch.cbf import CountingBloom, cbf_by_group
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    states = cbf_by_group(docs, "source", "text", m=1 << 14)
    filters = {r.group: CountingBloom.from_bytes(bytes(r.state))
               for r in states.collect()}
    counts = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    for g, f in filters.items():
        assert f.inserts == counts[g]
    sample = docs.select("source", "text").limit(100).collect()
    assert all(filters[r.source].contains(r.text) for r in sample)


def test_cbf_signed_hash_inputs_and_net_delete_accounting():
    # driver-side callers hand Spark's SIGNED int64 hash arrays — update/
    # delete must normalize exactly like contains (to_u64 view), and
    # subtract must credit the subtrahend's NET mass (inserts − deletes)
    h1 = (np.arange(50, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    h2 = (np.arange(50, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(7))
    signed1, signed2 = h1.view(np.int64), h2.view(np.int64)
    a, b = CountingBloom(k=4, m=1 << 10), CountingBloom(k=4, m=1 << 10)
    a.update_hashes(signed1, signed2)          # int64 must not raise
    b.update_hashes(h1, h2)
    assert a.to_bytes() == b.to_bytes()        # same filter either dtype
    a.delete_hashes(signed1[:10], signed2[:10])
    b.delete_hashes(h1[:10], h2[:10])
    assert a.to_bytes() == b.to_bytes()
    # net-mass accounting: subtrahend carrying its own deletions removes
    # inserts − deletes occurrences, and the minuend's bookkeeping agrees
    big = CountingBloom(k=4, m=1 << 10)
    big.update_hashes(h1, h2)                  # 50 inserts
    sub = CountingBloom(k=4, m=1 << 10)
    sub.update_hashes(h1[:30], h2[:30])        # 30 in
    sub.delete_hashes(h1[:10], h2[:10])        # 10 back out → net 20
    big.subtract(sub)
    assert (big.inserts, big.deletes) == (50, 20)
    assert big.inserts - big.deletes == 30     # fpr_bound's default n
    # counters equal a fresh build of exactly the surviving multiset
    # (keys 0..9 came back via sub's own deletions; 30..49 never left)
    exact = CountingBloom(k=4, m=1 << 10)
    exact.update_hashes(h1[:10], h2[:10])
    exact.update_hashes(h1[30:], h2[30:])
    big._flush(); exact._flush()
    assert np.array_equal(big.counts, exact.counts)
    # and zero FN over the survivors
    assert big.contains_hashes(h1[:10], h2[:10]).all()
    assert big.contains_hashes(h1[30:], h2[30:]).all()


def test_cbf_single_pass_build_with_deletes(spark):
    # one-pass "build minus tombstones" is BYTE-identical to the two-pass
    # build-then-delete (cbf_delete of a sub-multiset of the same source)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter("event_type = 'click' AND user_id IS NOT NULL")
    tomb = F.col("value").isNotNull() & (F.col("value") < 95)
    one_pass = cbf_build(clicks, "user_id", k=8, m=1 << 16, delete_when=tomb)
    two_pass = cbf_delete(
        cbf_build(clicks, "user_id", k=8, m=1 << 16),
        clicks.filter(tomb), "user_id")
    assert one_pass.to_bytes() == two_pass.to_bytes()
    assert one_pass.inserts == clicks.count()
    assert one_pass.deletes == clicks.filter(tomb).count()
    # zero FN over the surviving users, like the two-pass path
    rem = (clicks.filter("value IS NULL OR value >= 95")
           .select("user_id").distinct())
    fn = with_cbf_membership(rem, "user_id", one_pass).filter("NOT is_member").count()
    assert fn == 0
    # NULL predicate rows are inserts (coalesced to false), so the NULL-
    # keeping variant retracts the same tombstones and keeps the rest
    withnull = cbf_build(clicks, "user_id", k=8, m=1 << 16,
                         delete_when=F.col("value") < 95)
    assert withnull.to_bytes() == one_pass.to_bytes()
