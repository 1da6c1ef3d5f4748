"""Misra-Gries heavy hitters: guarantees, merges, Zipf skew, framework glue."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.topk import MisraGries, heavy_hitters, heavy_hitters_by_group

SF_DIR = "/root/testdata/sf0.01"


def test_mg_exact_when_under_k():
    sk = MisraGries(k=16)
    keys = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    rng = np.random.default_rng(3)
    keys = list(rng.permutation(np.array(keys, dtype=object)))
    sk.update_keys(keys)
    assert sk.error_bound() == 0
    assert sk.topk(3) == [("a", 50), ("b", 30), ("c", 20)]
    assert sk.estimate("a") == (50, 50) and sk.estimate("zz") == (0, 0)


def test_mg_guarantees_under_eviction():
    rng = np.random.default_rng(7)
    # Zipf-ish: 3 heavy keys + a long tail
    keys = (["hot0"] * 3000 + ["hot1"] * 2000 + ["hot2"] * 1500
            + [f"t{i}" for i in rng.integers(0, 4000, 8000)])
    true = {}
    for x in keys:
        true[x] = true.get(x, 0) + 1
    sk = MisraGries(k=32)
    perm = rng.permutation(np.array(keys, dtype=object))
    for i in range(0, len(perm), 1000):  # batched updates
        sk.update_keys(perm[i : i + 1000])
    assert sk.n == len(keys)
    assert sk.error_bound() <= sk.n // (sk.k + 1)
    # every key above n/(k+1) must be tracked; bounds must bracket the truth
    thr = sk.n / (sk.k + 1)
    tracked = dict(sk.topk())
    for key, cnt in true.items():
        if cnt > thr:
            assert key in tracked, key
        lo, hi = sk.estimate(key)
        assert lo <= cnt <= hi, (key, lo, cnt, hi)
    assert [k for k, _ in sk.topk(3)] == ["hot0", "hot1", "hot2"]


def test_mg_merge_and_serde():
    rng = np.random.default_rng(11)
    all_keys = (["x"] * 900 + ["y"] * 600
                + [f"t{i}" for i in rng.integers(0, 500, 3000)])
    parts = np.array_split(rng.permutation(np.array(all_keys, dtype=object)), 5)
    sks = []
    for p in parts:
        s = MisraGries(k=24)
        s.update_keys(p)
        sks.append(MisraGries.from_bytes(s.to_bytes()))  # serde each partial
    acc = sks[0]
    for s in sks[1:]:
        acc = acc.merge(s)
    assert acc.n == len(all_keys)
    assert acc.error_bound() <= acc.n // (acc.k + 1)  # mergeability bound
    lo, hi = acc.estimate("x")
    assert lo <= 900 <= hi
    assert [k for k, _ in acc.topk(2)] == ["x", "y"]
    back = MisraGries.from_bytes(acc.to_bytes())
    assert back.topk() == acc.topk() and back.n == acc.n and back.dec == acc.dec


def test_heavy_hitters_distributed_zipf_hosts(spark):
    """The webtext Zipf corpus: 3 hot hosts (~30% of rows) out of 1000 must
    surface from a k=8 sketch over 20k pages."""
    from sparksketch.webtext import host_of, webpages
    wp = webpages(spark, 20_000, seed=42, partitions=8)
    hosts = wp.select(host_of("url").alias("host"))
    sk = heavy_hitters(hosts, "host", k=8)
    assert sk.n == 20_000
    top3 = {k for k, _ in sk.topk(3)}
    assert top3 == {"h0000.example.com", "h0001.example.com", "h0002.example.com"}
    exact = {r.host: r["count"] for r in hosts.groupBy("host").count().collect()}
    for key in top3:
        lo, hi = sk.estimate(key)
        assert lo <= exact[key] <= hi


def test_heavy_hitters_by_group(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    states = heavy_hitters_by_group(ev, "event_type", "user_id", k=2048)
    got = {r.group: MisraGries.from_bytes(bytes(r.state)) for r in states.collect()}
    exact = {(r.event_type, str(r.user_id)): r["count"] for r in
             ev.groupBy("event_type", "user_id").count().collect()}
    for (et, uid), cnt in list(exact.items())[:200]:
        lo, hi = got[et].estimate(uid)
        assert lo <= cnt <= hi


def test_topk_by_group_dataframe(spark):
    from sparksketch.topk import topk_by_group
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    states = heavy_hitters_by_group(ev, "event_type", "user_id", k=4096)
    rows = topk_by_group(states, j=3).collect()
    assert {r.group for r in rows} == {"click", "view", "purchase", "signup", "error"}
    exact = {(r.event_type, str(r.user_id)): r["count"] for r in
             ev.groupBy("event_type", "user_id").count().collect()}
    for r in rows:
        assert r.cnt_lo <= exact[(r.group, r.key)] <= r.cnt_lo + r.err_bound


def test_mg_update_keys_drops_nulls():
    """Direct public use with null keys: value_counts counts null as a group
    — it must not enter the counters or the total (ADVICE r2)."""
    import pyarrow as pa
    mg = MisraGries(k=4)
    mg.update_keys(pa.array(["a", None, "b", "a", None]))
    assert mg.n == 3
    assert set(mg.counters.index) == {"a", "b"}
    assert "None" not in set(str(x) for x in MisraGries.from_bytes(mg.to_bytes()).counters.index)
