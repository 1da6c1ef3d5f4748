"""Host-graph PageRank: engine-exact integer parity, float parity,
derivation mirror, determinism, iterative-plan hygiene."""

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from sparksketch.graph import (
    derive_host_edges,
    derive_host_edges_sql,
    pagerank,
    pagerank_int,
    pagerank_int_numpy,
    pagerank_int_sql,
)

# a fixed small graph with a hub (0), a chain, parallel-free edges and
# TWO dangling nodes (7 and 9 have no out-edges)
EDGES = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 4), (4, 5), (5, 0),
         (6, 0), (6, 7), (8, 9), (2, 9), (3, 7)]


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_int_matches_exact_simulation(spark):
    got = {r.node: r.rank
           for r in pagerank_int(_edges_df(spark, EDGES), iters=4).collect()}
    want = pagerank_int_numpy(EDGES, iters=4)
    assert got == want
    # dangling nodes exist and got redistributed mass (above base-only)
    n = len(want)
    scale = 10 ** 12
    base = (scale * 15) // (100 * n)
    assert want[9] > base  # in-edges from 8 and 2
    # total mass conserved up to the documented floor loss:
    # iters·(E + 2N + den) + N
    assert abs(sum(want.values()) - scale) <= 4 * (len(EDGES) + 2 * n + 100) + n


def test_pagerank_int_partitioning_invariant(spark):
    df = _edges_df(spark, EDGES)
    a = {r.node: r.rank for r in pagerank_int(df, iters=3).collect()}
    b = {r.node: r.rank
         for r in pagerank_int(df.repartition(13), iters=3).collect()}
    assert a == b


def test_pagerank_int_duckdb_mirror(spark):
    """The unrolled-CTE SQL reproduces every rank bit-for-bit."""
    docs = spark.range(400).select(F.col("id").alias("doc_id"))
    edges = derive_host_edges(docs)
    got = {r.node: r.rank for r in pagerank_int(edges, iters=3).collect()}
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT range AS doc_id "
                "FROM range(400)")
    sql = pagerank_int_sql(derive_host_edges_sql(), iters=3)
    want = {int(n): int(r) for n, r in con.execute(sql).fetchall()}
    assert got == want
    # numpy triple-check
    e = [(r.src, r.dst) for r in edges.collect()]
    assert got == pagerank_int_numpy(e, iters=3)


def test_derive_host_edges_shape(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    edges = derive_host_edges(docs, hosts_per_docs=10)
    rows = edges.collect()
    srcs = {r.src for r in rows}
    dsts = {r.dst for r in rows}
    h = 1000 // 10  # 100 hosts, top 10 dst-only
    hs = h - h // 10
    assert max(srcs) < hs
    assert max(dsts) < h
    assert not any(r.src == r.dst for r in rows)
    assert len(rows) == len({(r.src, r.dst) for r in rows})  # distinct
    # squared-mix skew (P(dst < h/2) = sqrt(1/2) per link): the low half
    # of the host space receives clearly more than half the in-edges —
    # needs an UNSATURATED pair space, hence 100 hosts for 3000 links
    low = sum(1 for r in rows if r.dst < h // 2)
    assert low > int(0.55 * len(rows))


def test_pagerank_float_matches_numpy_power_iteration(spark):
    df = _edges_df(spark, EDGES)
    got = {r.node: r.rank for r in pagerank(df, iters=25).collect()}
    # dense float64 reference
    nodes = sorted({s for s, _ in EDGES} | {d for _, d in EDGES})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    od = {}
    for s, _ in EDGES:
        od[s] = od.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(25):
        m = np.zeros(n)
        d = sum(r[idx[v]] for v in nodes if v not in od) / n
        for s, t in EDGES:
            m[idx[t]] += r[idx[s]] / od[s]
        r = (1.0 - 0.85) / n + 0.85 * (m + d)
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_float_tol_early_stop(spark):
    df = _edges_df(spark, EDGES)
    loose = {r.node: r.rank for r in pagerank(df, iters=50, tol=1e-12).collect()}
    assert sum(loose.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_plan_stays_bounded(spark):
    """localCheckpoint per iteration keeps the logical plan O(1) — the
    connected-components lineage lesson applied here."""
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    edges = derive_host_edges(docs)
    r3 = pagerank_int(edges, iters=2)
    r8 = pagerank_int(edges, iters=7)
    plan3 = r3._jdf.queryExecution().optimizedPlan().toString()
    plan8 = r8._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan8) < 2 * len(plan3) + 2000


def test_pagerank_validation(spark):
    df = _edges_df(spark, EDGES)
    with pytest.raises(ValueError, match="iters"):
        pagerank_int(df, iters=0)
    with pytest.raises(ValueError, match="src, dst"):
        pagerank_int(df.withColumnRenamed("src", "u"))
    with pytest.raises(ValueError, match="damping"):
        pagerank_int(df, damping_num=0)


def test_pagerank_int_parallel_edges_weighted(spark):
    """Out-degree counts ROWS: a duplicated edge carries two shares, and
    the numpy reference simulates the same multi-edge semantics."""
    multi = EDGES + [(0, 1), (0, 1), (6, 0)]
    got = {r.node: r.rank
           for r in pagerank_int(_edges_df(spark, multi), iters=3).collect()}
    assert got == pagerank_int_numpy(multi, iters=3)
    # and it genuinely differs from the collapsed graph (weighting matters)
    assert got != pagerank_int_numpy(sorted(set(multi)), iters=3)


def test_derive_host_edges_overflow_guard(spark):
    import pytest as _pt
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    with _pt.raises(ValueError, match="overflows"):
        derive_host_edges(docs, hosts_per_docs=1, min_hosts=2 ** 33)


# -- triangle counting ---------------------------------------------------

def _brute_triangles(edges):
    from itertools import combinations
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per = {v: 0 for v in adj}
    for v, ns in adj.items():
        for x, y in combinations(sorted(ns), 2):
            if (min(x, y), max(x, y)) in und:
                per[v] += 1
    return {v: (len(adj[v]), t) for v, t in per.items()}


def test_triangles_k4_and_isolated_path(spark):
    from sparksketch.graph import triangle_counts
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {r.node: (r.deg, r.tri)
           for r in triangle_counts(_edges_df(spark, k4 + [(4, 5)])).collect()}
    assert all(out[v] == (3, 3) for v in range(4))  # K4: every vertex in 3
    assert out[4] == (1, 0) and out[5] == (1, 0)    # pendant edge: none


def test_triangles_brute_parity_and_direction_invariance(spark):
    from sparksketch.graph import triangle_counts
    # deterministic pseudo-random graph with hubs, reciprocal edges,
    # self-loops and parallel duplicates
    edges = [((i * 7919) % 23, (i * i * 104729 + i) % 23) for i in range(160)]
    edges += edges[:20] + [(5, 5), (0, 0)]
    want = _brute_triangles(edges)
    got = {r.node: (r.deg, r.tri)
           for r in triangle_counts(_edges_df(spark, edges)).collect()}
    assert got == want
    rev = {r.node: (r.deg, r.tri)
           for r in triangle_counts(
               _edges_df(spark, [(b, a) for a, b in edges])).collect()}
    assert rev == got  # undirected: orientation of the input is irrelevant


def test_triangles_sql_mirror_and_host_graph(spark):
    from sparksketch.graph import triangle_counts, triangle_counts_sql
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted((r.node, r.deg, r.tri)
                 for r in triangle_counts(derive_host_edges(docs)).collect())
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(map(tuple, con.sql(
        triangle_counts_sql(derive_host_edges_sql())).fetchall()))
    assert got == want
    assert sum(t for _, _, t in got) > 0  # non-vacuous on the host graph


def test_triangles_validation(spark):
    from sparksketch.graph import triangle_counts
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="src"):
        triangle_counts(df)


def test_triangle_estimate_full_rate_equals_exact(spark):
    from sparksketch.graph import triangle_counts, triangle_estimate
    edges = _edges_df(spark, [(a, b) for a in range(6) for b in range(6) if a < b])
    r = triangle_estimate(edges, keep_ppm=10 ** 6).first()
    exact = triangle_counts(edges).agg(F.expr("sum(tri) div 3")).first()[0]
    assert r.n_kept == r.n_edges == 15
    assert r.tri_sampled == exact == 20  # K6: C(6,3)
    assert r.est == 20.0


def test_triangle_estimate_sampled_scaling_and_mirror(spark):
    import duckdb as _dk
    from sparksketch.graph import triangle_estimate, triangle_estimate_sql
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = triangle_estimate(derive_host_edges(docs), keep_ppm=500000).first()
    # estimate is exactly the fixed chain tri * 2 * 2 * 2 at p = 1/2
    assert got.est == ((got.tri_sampled * 1e6 / 500000) * 1e6 / 500000) \
        * 1e6 / 500000
    assert 0 < got.n_kept < got.n_edges  # the sample genuinely sampled
    con = _dk.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = con.sql(triangle_estimate_sql(
        derive_host_edges_sql(), keep_ppm=500000)).fetchone()
    assert (got.n_edges, got.n_kept, got.tri_sampled, got.est) == want


def test_triangle_estimate_validation(spark):
    from sparksketch.graph import triangle_estimate
    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="keep_ppm"):
        triangle_estimate(df, keep_ppm=0)
    with pytest.raises(ValueError, match="keep_ppm"):
        triangle_estimate(df, keep_ppm=10 ** 6 + 1)


# -- label propagation ---------------------------------------------------

def _brute_lpa(edges, iters):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, ns in adj.items():
            cnt = {}
            for n in ns:
                cnt[lab[n]] = cnt.get(lab[n], 0) + 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    return lab


def test_lpa_brute_parity_and_two_cliques(spark):
    from sparksketch.graph import label_propagation
    # two 5-cliques joined by one bridge edge
    cl = [(a, b) for a in range(5) for b in range(5) if a < b]
    cl += [(a + 10, b + 10) for a, b in cl] + [(4, 10)]
    for iters in (1, 4):
        want = _brute_lpa(cl, iters)
        got = {r.node: r.label
               for r in label_propagation(_edges_df(spark, cl), iters).collect()}
        assert got == want
    # after 4 rounds the cliques are internally uniform, distinct labels
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v + 10] for v in range(5)}) == 1
    assert got[0] != got[10]


def test_lpa_messy_graph_parity_and_determinism(spark):
    from sparksketch.graph import label_propagation
    edges = [((i * 7919) % 23, (i * i * 104729 + i) % 23) for i in range(120)]
    edges += edges[:15] + [(3, 3)]
    want = _brute_lpa(edges, 3)
    df = _edges_df(spark, edges)
    got = {r.node: r.label for r in label_propagation(df, 3).collect()}
    assert got == want
    rep = {r.node: r.label
           for r in label_propagation(df.repartition(7), 3).collect()}
    assert rep == got


def test_lpa_sql_mirror_host_graph(spark):
    from sparksketch.graph import label_propagation, label_propagation_sql
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted((r.node, r.label)
                 for r in label_propagation(derive_host_edges(docs), 3).collect())
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(map(tuple, con.sql(
        label_propagation_sql(derive_host_edges_sql(), 3)).fetchall()))
    assert got == want
    assert len({l for _, l in got}) >= 1 and len(got) == 20


def test_lpa_validation(spark):
    from sparksketch.graph import label_propagation
    with pytest.raises(ValueError, match="iters"):
        label_propagation(_edges_df(spark, [(0, 1)]), iters=0)
    with pytest.raises(ValueError, match="src"):
        label_propagation(spark.createDataFrame([(1, 2)], "x long, y long"))


# -- BFS seed distances ----------------------------------------------------

def _brute_bfs(edges, seeds, max_hops, directed=True):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_hops + 1):
        frontier = {n for v in frontier for n in adj.get(v, ())
                    if n not in dist}
        for n in frontier:
            dist[n] = d
    return dist


def test_bfs_brute_parity_directed_and_not(spark):
    from sparksketch.graph import bfs_distances
    df = _edges_df(spark, EDGES)
    for directed in (True, False):
        for hops in (0, 2, 5):
            want = _brute_bfs(EDGES, [6], hops, directed)
            got = {r.node: r.dist for r in bfs_distances(
                df, [6], max_hops=hops, directed=directed).collect()}
            assert got == want, (directed, hops)
    # node 8 is upstream of 6 in EDGES: only the undirected walk reaches it
    assert 8 not in _brute_bfs(EDGES, [6], 5) and \
        8 in _brute_bfs(EDGES, [6], 5, directed=False)


def test_bfs_sql_mirror_host_graph(spark):
    from sparksketch.graph import bfs_distances, bfs_distances_sql
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted((r.node, r.dist) for r in bfs_distances(
        derive_host_edges(docs), [0, 1], max_hops=3).collect())
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(map(tuple, con.sql(bfs_distances_sql(
        derive_host_edges_sql(),
        "SELECT 0 AS node UNION ALL SELECT 1 AS node",
        max_hops=3)).fetchall()))
    assert got == want
    assert {d for _, d in got} >= {0, 1}  # non-trivial frontier


def test_bfs_seeds_df_and_validation(spark):
    from sparksketch.graph import bfs_distances
    df = _edges_df(spark, EDGES)
    seeds = spark.createDataFrame([(6,), (6,)], "node long")
    got = {r.node: r.dist
           for r in bfs_distances(df, seeds, max_hops=1).collect()}
    assert got == _brute_bfs(EDGES, [6], 1)
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(df, [0], max_hops=-1)
