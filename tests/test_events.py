"""Sessionization + as-of join: window formulations vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.events import asof_join, sessionize

SF_DIR = "/root/testdata/sf0.01"


def test_sessionize_brute_force(spark):
    rng = np.random.default_rng(5)
    rows = []
    for u in range(20):
        t = 0
        for _ in range(rng.integers(1, 15)):
            t += int(rng.integers(1, 5000))
            rows.append((u, t))
    df = spark.createDataFrame(rows, "user long, ts long") \
        .select("user", F.col("ts").cast("timestamp").alias("ts"))
    out = sessionize(df, "user", "ts", gap_seconds=1800)
    got = {(r.user, int(r.ts.timestamp())): r.session_id for r in out.collect()}
    # brute force
    by_user: dict = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    want = {}
    for u, ts in by_user.items():
        k = 0
        prev = None
        for t in sorted(ts):
            if prev is None or t - prev > 1800:
                k += 1
            want[(u, t)] = f"{u}#{k}"
            prev = t
    assert got == want


def test_asof_join_brute_force(spark):
    rng = np.random.default_rng(9)
    lrows = [(int(rng.integers(0, 10)), int(rng.integers(0, 1000)), i) for i in range(300)]
    rrows = [(int(rng.integers(0, 10)), int(rng.integers(0, 1000)), float(i)) for i in range(80)]
    left = spark.createDataFrame(lrows, "k long, ts long, lid long")
    right = (spark.createDataFrame(rrows, "k long, ts long, v double")
             .groupBy("k", "ts").agg(F.max("v").alias("v")))  # disambiguate ties
    got = {r.lid: r.v for r in asof_join(left, right, "k", "ts").collect()}
    rmap: dict = {}
    for r in right.collect():
        rmap.setdefault(r.k, []).append((r.ts, r.v))
    want = {}
    for k, ts, lid in lrows:
        cands = [(t, v) for t, v in rmap.get(k, []) if t <= ts]
        want[lid] = max(cands)[1] if cands else None
    assert got == want
    assert len(got) == len(lrows)  # left-preserving


def test_asof_join_clash_guard(spark):
    left = spark.createDataFrame([(1, 1, 2.0)], "k long, ts long, v double")
    right = spark.createDataFrame([(1, 1, 3.0)], "k long, ts long, v double")
    with pytest.raises(ValueError):
        asof_join(left, right, "k", "ts")


def test_asof_join_preserves_genuine_nulls(spark):
    """A matched right row whose value is NULL must yield NULL — not fall
    back to an older row; multi-column values never stitch across rows."""
    left = spark.createDataFrame([(1, 3, 100), (1, 1, 101)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 1, 5.0, "x"), (1, 2, None, "y")],
        "k long, ts long, v double, tag string")
    got = {r.lid: (r.v, r.tag) for r in
           asof_join(left, right, "k", "ts", ["v", "tag"]).collect()}
    assert got[101] == (5.0, "x")      # matched the ts=1 row whole
    assert got[100] == (None, "y")     # latest row taken whole, NULL kept


def test_asof_join_null_keys_never_match(spark):
    left = spark.createDataFrame([(None, 10, 1), (1, 10, 2)], "k long, ts long, lid long")
    right = spark.createDataFrame([(None, 5, 7.0), (1, 5, 9.0)], "k long, ts long, v double")
    got = {r.lid: r.v for r in asof_join(left, right, "k", "ts", ["v"]).collect()}
    assert got == {1: None, 2: 9.0}  # NULL key matches nothing, row preserved


def test_asof_join_null_right_ts_never_matches(spark):
    """A right row with NULL ts sorts first (NULLS FIRST) in the window —
    without the right-side ts filter its values would attach to left rows
    that have no true ts<=left.ts match (ADVICE r2)."""
    left = spark.createDataFrame([(1, 10, 1), (1, None, 2)], "k long, ts long, lid long")
    right = spark.createDataFrame([(1, None, 666.0), (1, 5, 9.0)], "k long, ts long, v double")
    got = {r.lid: r.v for r in asof_join(left, right, "k", "ts", ["v"]).collect()}
    # lid=1 matches ts=5 (never the NULL-ts row); NULL-ts left row matches nothing
    assert got == {1: 9.0, 2: None}


def test_funnel_depth(spark):
    import datetime as dt
    import pytest
    from sparksketch.events import funnel_depth
    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # u1: full funnel in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: click before view -> only reaches depth 1 via the later view
        (2, t(1), "click"), (2, t(2), "view"),
        # u3: view and click at the SAME ts -> strict > blocks chaining
        (3, t(5), "view"), (3, t(5), "click"),
        # u4: no step events at all (only noise)
        (4, t(1), "error"),
        # u5: repeated views then a late purchase without click
        (5, t(1), "view"), (5, t(2), "view"), (5, t(9), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r.depth for r in
           funnel_depth(df, "user_id", "ts", "event_type",
                        ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 1, 3: 1, 5: 1}   # u4 filtered out (no step events)
    with pytest.raises(ValueError, match="step"):
        funnel_depth(df, "user_id", "ts", "event_type", [])


def test_range_join_matches_naive(spark):
    import datetime as dt
    from sparksketch.events import range_join
    base = dt.datetime(2024, 1, 1)
    rows = [(i % 7, base + dt.timedelta(seconds=(i * 37) % 5000,
                                        microseconds=(i * 13) % 1000000), i)
            for i in range(400)]
    left = spark.createDataFrame(rows, "k long, ts timestamp_ntz, lv long")
    right = spark.createDataFrame(
        [(r[0], r[1] + dt.timedelta(seconds=(r[2] * 11) % 900 - 450), r[2] + 1000)
         for r in rows], "k long, ts timestamp_ntz, rv long")
    out = range_join(left, right, "k", "ts", delta_seconds=120)
    got = sorted((r.lv, r.rv) for r in out.collect())
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & (F.abs(F.unix_micros(F.col("l.ts").cast("timestamp"))
                 - F.unix_micros(F.col("r.ts").cast("timestamp"))) <= 120_000_000))
    want = sorted((r["lv"], r["rv"]) for r in naive.collect())
    assert got == want and len(got) > 0
    # right columns that clash carry the suffix; right key is dropped
    assert out.columns == ["k", "ts", "lv", "ts_r", "rv"]


def test_range_join_boundary_exact(spark):
    import datetime as dt
    from sparksketch.events import range_join
    t0 = dt.datetime(2024, 6, 1, microsecond=123456)
    left = spark.createDataFrame([(1, t0, "L")], "k long, ts timestamp_ntz, tag string")
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=60), "at"),       # exactly delta: IN
         (1, t0 + dt.timedelta(seconds=60, microseconds=1), "past"),  # 1us out
         (1, t0 - dt.timedelta(seconds=60), "at-neg"),
         (None, t0, "nullkey"),
         (1, None, "nullts")],
        "k long, ts timestamp_ntz, tag string")
    got = sorted(r.tag_r for r in range_join(left, right, "k", "ts", 60).collect())
    assert got == ["at", "at-neg"]


def test_range_join_plan_no_cross_product(spark, tmp_path):
    from sparksketch.events import range_join
    p = str(tmp_path / "ev.parquet")
    spark.range(20_000).selectExpr(
        "id % 100 AS k",
        "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id % 86400) AS ts",
        "id AS v").write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = range_join(df, df, "k", "ts", delta_seconds=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # any equi-join strategy qualifies (broadcast-hash here; sort-merge at
    # scale) — the point is the (key, cell) equi-join, not the cross product
    assert "SortMergeJoin" in plan or "HashJoin" in plan
    import pytest
    with pytest.raises(ValueError, match="positive"):
        range_join(df, df, "k", "ts", 0)


def test_range_join_input_validation(spark):
    import pytest
    from sparksketch.events import range_join
    df = spark.createDataFrame([(1, None, 2)], "k long, ts timestamp_ntz, ts_r long")
    with pytest.raises(ValueError, match="no column 'k'"):
        range_join(df, df.select("ts"), "k", "ts", 60)
    with pytest.raises(ValueError, match="no column 'ts'"):
        range_join(df, df.select("k"), "k", "ts", 60)
    with pytest.raises(ValueError, match="left side has no column 'ts'"):
        range_join(df.select("k"), df, "k", "ts", 60)
    with pytest.raises(ValueError, match="clashing"):
        # left already owns ts_r, which the right ts would be renamed to
        range_join(df, df.select("k", "ts"), "k", "ts", 60)
    with pytest.raises(ValueError, match="reserved"):
        range_join(df.withColumn("_cell", F.lit(1)), df, "k", "ts", 60)


def test_interval_join_matches_naive(spark):
    import datetime as dt
    from sparksketch.events import interval_join
    base = dt.datetime(2024, 3, 1)
    pts = [(i % 5, base + dt.timedelta(seconds=(i * 61) % 8000,
                                       microseconds=(i * 17) % 1000000), i)
           for i in range(300)]
    ivs = []
    for j in range(80):
        s = base + dt.timedelta(seconds=(j * 97) % 8000)
        ivs.append((j % 5, s, s + dt.timedelta(seconds=(j * 31) % 600), j))
    points = spark.createDataFrame(pts, "k long, ts timestamp_ntz, pid long")
    intervals = spark.createDataFrame(
        ivs, "k long, s timestamp_ntz, e timestamp_ntz, iid long")
    out = interval_join(points, intervals, "k", "ts", "s", "e",
                        max_len_seconds=600)
    got = sorted((r.pid, r.iid) for r in out.collect())
    naive = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.k") == F.col("i.k"))
        & (F.col("p.ts") >= F.col("i.s")) & (F.col("p.ts") <= F.col("i.e")))
    want = sorted((r["pid"], r["iid"]) for r in naive.collect())
    assert got == want and len(got) > 0


def test_interval_join_edges(spark):
    import datetime as dt
    import pytest
    from sparksketch.events import interval_join
    t0 = dt.datetime(2024, 6, 1, microsecond=500000)
    points = spark.createDataFrame(
        [(1, t0, "at-start"), (1, t0 + dt.timedelta(seconds=30), "inside"),
         (1, t0 + dt.timedelta(seconds=60), "at-end"),
         (1, t0 + dt.timedelta(seconds=60, microseconds=1), "past"),
         (1, t0 - dt.timedelta(microseconds=1), "before")],
        "k long, ts timestamp_ntz, tag string")
    intervals = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(seconds=60), "ok"),
         (1, t0, t0 - dt.timedelta(seconds=1), "degenerate"),     # end < start
         (1, t0, t0 + dt.timedelta(seconds=3600), "too-long")],   # > max_len
        "k long, s timestamp_ntz, e timestamp_ntz, name string")
    out = interval_join(points, intervals, "k", "ts", "s", "e", 120)
    got = sorted((r.tag, r.name) for r in out.collect())
    assert got == [("at-end", "ok"), ("at-start", "ok"), ("inside", "ok")]
    with pytest.raises(ValueError, match="positive"):
        interval_join(points, intervals, "k", "ts", "s", "e", 0)
    with pytest.raises(ValueError, match="no column"):
        interval_join(points, intervals.drop("e"), "k", "ts", "s", "e", 120)
