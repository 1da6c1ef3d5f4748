"""Host-graph centrality: distributed PageRank over a link graph.

A web-scale training pipeline ranks *hosts* (crawl prioritization, spam
demotion, quality weighting — the link-authority signal behind curated
crawls) from the page link graph.  This module ships two formulations:

- :func:`pagerank_int` — an **engine-exact integer** power iteration: every
  arithmetic step is +,·,``div``,``%`` on non-negative BIGINTs, so a DuckDB
  oracle (unrolled CTEs) reproduces each rank bit-for-bit.  Same rationale
  as ``textstats.lm_bigram_score``: float PageRank sums in engine-dependent
  order and is unverifiable; the integer form is order-independent.
- :func:`pagerank` — the textbook float64 variant (for callers who want the
  classical values), certified in pytest against a numpy power iteration.

Plan shape (100-TB story): edges are joined with out-degrees ONCE and
checkpointed; each iteration is one ``src``-keyed join (ranks are small —
one row per host, not per page), one ``dst``-keyed map-side-combined sum
(skewed hub in-degrees partial-aggregate before the shuffle), and one
broadcast one-row dangling-mass aggregate — no driver collect inside the
loop, so all ``iters`` rounds run under a single action.  Ranks ``localCheckpoint`` per
iteration — the iterative-lineage lesson from ``dedup.connected_components``
(self-referencing plans grow ~16×/round and OOM the planner first).

Reference parity: beyond the reference (``/root/reference/src/filter.rs``
is membership only); standard pipeline surface (Page et al. 1999;
Common-Crawl-style host ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mixing constants for the deterministic synthetic host graph — arbitrary
# well-known odd multipliers; P is the Mersenne prime 2^31 - 1 so every
# product below stays under 2^63 on BIGINTs (see derive_host_edges).
_MIX_A = 1315423911
_MIX_B = 2654435761
_MIX_C = 97531
_MIX_P = 2147483647


def derive_host_edges(df: DataFrame, id_col: str = "doc_id",
                      links: int = 3, hosts_per_docs: int = 50,
                      min_hosts: int = 20) -> DataFrame:
    """Deterministic synthetic host link graph from a document table —
    the test/bench stand-in for a real ``(src_host, dst_host)`` edge set
    (the sandbox corpus has no link column; a real crawl derives edges
    from hrefs with ``webtext.canonical_url``).

    Every step is integer +,·,``div``,``%`` so any engine derives the
    IDENTICAL edge set (mirror: :func:`derive_host_edges_sql`):

    - ``h`` hosts = ``max(n_docs div hosts_per_docs, min_hosts)``;
    - each doc hashes to one source host in the first 90% of the host
      space (``u_0 % (h - h div 10)``) — the top tenth of hosts is
      dst-only, i.e. **dangling**, so the redistribution path is live;
    - each doc emits ``links`` destination hosts via the squared-mix skew
      map ``((u_k² div P) · h) div P`` — the density ∝ 1/√x of ``u² div P``
      makes low-id hosts hubs (realistic skewed in-degree);
    - self-loops drop, parallel edges collapse (``distinct``).

    ``u_k = ((id % P)·A + k·B + C) % P`` keeps the mixing products < 2^63
    at ANY id; the skew map's ``(u² div P)·h`` product additionally bounds
    the HOST count to ``(2^63−1) div P`` ≈ 4.29e9 (≈ 2.1e11 docs at the
    default ratio) — guarded with a ValueError rather than an engine
    overflow."""
    n_docs = df.count()
    h = max(n_docs // hosts_per_docs, min_hosts)
    if h * _MIX_P >= 2 ** 63:
        raise ValueError(
            f"host count {h} overflows the int64 skew map "
            f"(max {(2 ** 63 - 1) // _MIX_P}); raise hosts_per_docs")
    hs = h - h // 10  # source-host space; hosts [hs, h) are dangling
    m = f"(CAST({id_col} AS BIGINT) % {_MIX_P})"
    src = f"(({m} * {_MIX_A} + {_MIX_C}) % {_MIX_P}) % {hs}"
    outs = []
    for k in range(1, links + 1):
        u = f"(({m} * {_MIX_A} + {k} * {_MIX_B} + {_MIX_C}) % {_MIX_P})"
        dst = f"((({u} * {u}) div {_MIX_P}) * {h}) div {_MIX_P}"
        outs.append(F.expr(f"named_struct('src', {src}, 'dst', {dst})"))
    edges = (df.select(F.explode(F.array(*outs)).alias("_e"))
             .select(F.col("_e.src").cast("long").alias("src"),
                     F.col("_e.dst").cast("long").alias("dst"))
             .filter(F.col("src") != F.col("dst"))
             .distinct())
    return edges


def derive_host_edges_sql(table: str = "documents", id_col: str = "doc_id",
                          links: int = 3, hosts_per_docs: int = 50,
                          min_hosts: int = 20) -> str:
    """DuckDB mirror of :func:`derive_host_edges` — a CTE body (named
    ``edges``) deriving the identical edge set (``//`` ≡ Spark ``div`` on
    non-negative longs).  ``hh`` carries the data-driven host counts."""
    m = f"(CAST({id_col} AS BIGINT) % {_MIX_P})"
    arms = []
    for k in range(1, links + 1):
        u = f"(({m} * {_MIX_A} + {k} * {_MIX_B} + {_MIX_C}) % {_MIX_P})"
        arms.append(
            f"SELECT (({m} * {_MIX_A} + {_MIX_C}) % {_MIX_P}) % hh.hs AS src, "
            f"((({u} * {u}) // {_MIX_P}) * hh.h) // {_MIX_P} AS dst "
            f"FROM {table}, hh")
    union = " UNION ALL ".join(arms)
    return (
        f"hh AS (SELECT h, h - h // 10 AS hs FROM (SELECT "
        f"greatest(count(*) // {hosts_per_docs}, {min_hosts}) AS h "
        f"FROM {table})), "
        f"edges AS (SELECT DISTINCT src, dst FROM ({union}) WHERE src <> dst)")


def _validate_edges(edges: DataFrame) -> None:
    cols = set(edges.columns)
    if not {"src", "dst"} <= cols:
        raise ValueError(f"edges needs (src, dst) columns, got {sorted(cols)}")


def pagerank_int(edges: DataFrame, iters: int = 3, scale: int = 10 ** 12,
                 damping_num: int = 85, damping_den: int = 100) -> DataFrame:
    """Engine-exact integer PageRank over ``(src, dst)`` edges.

    Rank unit: ``scale`` = total initial mass.  Update rule (all BIGINT,
    all non-negative, order-independent — bit-identical in any engine)::

        r_0(v)     = scale div N
        D_t        = Σ_{outdeg(u)=0} r_t(u)                 (dangling mass)
        r_{t+1}(v) = (scale·(den−num)) div (den·N)
                     + (num · (Σ_{u→v} r_t(u) div outdeg(u) + D_t div N))
                       div den

    Mass bound: contribution floors shed at most one unit per EDGE
    (``od·(r div od) > r − od``), the ``div den`` and dangling floors at
    most one per node, so Σr stays within ``iters·(E + 2N + den) + N`` of
    ``scale`` (pytest asserts the brute-force integer simulation EXACTLY;
    the scale script certifies this bound at 48M edges).  Parallel edges must
    be pre-collapsed (``derive_host_edges`` does) — each distinct edge
    carries one ``r div outdeg`` share.

    Returns ``(node, rank)``; rank is the scaled BIGINT.  100-TB plan: per
    iteration one src-keyed join (ranks ≪ edges), one map-side-combined
    dst sum, one scalar dangling aggregate; ranks are checkpointed so the
    logical plan stays O(1) across iterations."""
    if not 0 < damping_num < damping_den:
        raise ValueError("need 0 < damping_num < damping_den")
    num, den = damping_num, damping_den

    def update(n: int):
        base = (scale * (den - num)) // (den * n)
        return (F.lit(base) + F.expr(
            f"({num} * (coalesce(m, CAST(0 AS BIGINT)) "
            f"+ _d div {n})) div {den}")).cast("long")

    return _pagerank_run(
        edges, iters,
        od_type="long",
        empty_rank=F.lit(0).cast("long"),
        init_rank=lambda n: F.lit(scale // n).cast("long"),
        d_mass=lambda n: F.coalesce(F.sum("rank"), F.lit(0)).cast("long"),
        contrib=F.expr("rank div od"),
        fold_c=F.sum("c").cast("long"),
        update=update)


def _pagerank_run(edges: DataFrame, iters: int, *, od_type: str,
                  empty_rank, init_rank, d_mass, contrib, fold_c, update,
                  tol: float | None = None) -> DataFrame:
    """Shared distributed power-iteration driver for the integer and float
    PageRank variants — identical scaffold (node set, out-degrees, eagerly
    checkpointed edge⋈outdeg table, dangling anti-join, per-iteration
    broadcast dangling mass + checkpointed ranks); the variants differ only
    in cell arithmetic, passed as Column builders.

    The returned ranks are EAGERLY materialized: the final localCheckpoint
    truncates lineage, so every intermediate checkpoint (including the big
    e_od table) becomes unreferenced when this returns and the
    ContextCleaner can reclaim its blocks — without it a long session
    accumulates dead cached RDDs across repeated calls."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    _validate_edges(edges)
    # checkpoint the (possibly expensive) edge derivation ONCE — nodes,
    # out-degrees and the reused edge⋈outdeg table each scan it, and
    # without the cut every scan re-runs the upstream plan from source
    edges = (edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
             .localCheckpoint(eager=False))
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", empty_rank)
    odeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast(od_type).alias("od"))
    # edges ⋈ outdeg once, EAGERLY checkpointed: materializing the big
    # table up front lets AQE plan every iteration's join from real sizes
    # (measured at 48M edges / local[32]: eager 19.3 s vs lazy-checkpoint
    # 84 s vs persist 73 s vs repartitioned+sorted persist 36 s for 3
    # iterations — the lazy variants replan each stage against
    # defaultSizeInBytes and keep the big side on the shuffled path)
    e_od = (edges.join(odeg, edges.src == odeg.node)
            .select("src", "dst", "od").localCheckpoint(eager=True))
    dangling = nodes.join(odeg, ["node"], "left_anti")
    ranks = nodes.select("node", init_rank(n).alias("rank"))
    for it in range(iters):
        # dangling mass rides along as a broadcast ONE-ROW cross join (a
        # scalar — always broadcast-safe) instead of a driver collect, so
        # the whole iteration chain materializes in a single action; lazy
        # localCheckpoints still cut the lineage as each round computes
        dm = (dangling.join(ranks, ["node"])
              .agg(d_mass(n).alias("_d")))
        cb = (e_od.join(ranks, e_od.src == ranks.node)
              .select(F.col("dst").alias("node"), contrib.alias("c"))
              .groupBy("node").agg(fold_c.alias("m")))
        new = (nodes.join(cb, ["node"], "left")
               .crossJoin(F.broadcast(dm))
               .select("node", update(n).alias("rank"))
               .localCheckpoint(eager=(tol is None and it == iters - 1)))
        if tol is not None:
            delta = (new.join(ranks.withColumnRenamed("rank", "_prev"),
                              ["node"])
                     .agg(F.sum(F.abs(F.col("rank") - F.col("_prev")))
                          .alias("l1")).first().l1)
            ranks = new
            if delta is not None and delta < tol:
                break
        else:
            ranks = new
    if tol is not None:
        ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_int_sql(edges_cte: str, iters: int = 3, scale: int = 10 ** 12,
                     damping_num: int = 85, damping_den: int = 100,
                     top_k: int | None = None) -> str:
    """DuckDB mirror of :func:`pagerank_int`: a full query string whose
    ``WITH`` head is ``edges_cte`` (must define ``edges(src, dst)``), with
    the power iteration UNROLLED one CTE pair per step.  Sums are wrapped
    ``CAST(... AS BIGINT)`` (DuckDB promotes SUM(BIGINT) to HUGEINT, which
    breaks the driver's value hash).  Emits ``(node, rank)``; with
    ``top_k`` adds the deterministic ``ORDER BY rank DESC, node LIMIT k``."""
    num, den = damping_num, damping_den
    parts = [
        edges_cte,
        "nd AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nd)",
        "og AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS od "
        "FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({scale} // nn.n AS BIGINT) AS rank "
        f"FROM nd, nn)",
    ]
    for t in range(iters):
        parts.append(
            f"d{t} AS (SELECT CAST(coalesce(sum(r.rank), 0) AS BIGINT) AS d "
            f"FROM r{t} r LEFT JOIN og ON og.node = r.node "
            f"WHERE og.od IS NULL)")
        parts.append(
            f"c{t} AS (SELECT e.dst AS node, "
            f"CAST(sum(r.rank // o.od) AS BIGINT) AS m "
            f"FROM edges e JOIN r{t} r ON r.node = e.src "
            f"JOIN og o ON o.node = e.src GROUP BY e.dst)")
        parts.append(
            f"r{t + 1} AS (SELECT nd.node, CAST(({scale} * {den - num}) "
            f"// ({den} * nn.n) + ({num} * (coalesce(c{t}.m, 0) "
            f"+ d{t}.d // nn.n)) // {den} AS BIGINT) AS rank "
            f"FROM nd CROSS JOIN nn CROSS JOIN d{t} "
            f"LEFT JOIN c{t} ON c{t}.node = nd.node)")
    tail = f"SELECT node, rank FROM r{iters}"
    if top_k is not None:
        tail += f" ORDER BY rank DESC, node LIMIT {top_k}"
    return "WITH " + ", ".join(parts) + " " + tail


def pagerank(edges: DataFrame, iters: int = 20, damping: float = 0.85,
             tol: float | None = None) -> DataFrame:
    """Classical float64 PageRank (Page et al. 1999) — same distributed
    shape as :func:`pagerank_int` (one src join + one dst sum + one scalar
    dangling aggregate per iteration, checkpointed ranks), values in
    [0, 1] summing to ~1.  ``tol`` stops early when the driver-observed L1
    delta drops below it (costs one extra scalar aggregate per iteration).
    Float sums are engine/order-dependent — use :func:`pagerank_int` for
    anything that must verify across engines."""
    return _pagerank_run(
        edges, iters,
        od_type="double",
        empty_rank=F.lit(0.0),
        init_rank=lambda n: F.lit(1.0 / n),
        d_mass=lambda n: (F.coalesce(F.sum("rank"), F.lit(0.0))
                          / F.lit(float(n))),
        contrib=F.col("rank") / F.col("od"),
        fold_c=F.sum("c"),
        update=lambda n: (F.lit((1.0 - damping) / n) + F.lit(damping)
                          * (F.coalesce("m", F.lit(0.0)) + F.col("_d"))),
        tol=tol)


def pagerank_int_numpy(edges: list[tuple[int, int]], iters: int = 3,
                       scale: int = 10 ** 12, damping_num: int = 85,
                       damping_den: int = 100) -> dict[int, int]:
    """Single-node exact-integer reference simulation of
    :func:`pagerank_int` (Python ints — no overflow, no float) for brute
    parity in tests.  Parallel edges are kept, matching the distributed
    semantics (out-degree counts ROWS; each edge row carries one
    ``r div od`` share) — collapse duplicates upstream if that is what
    the distributed call sees."""
    edges = sorted((int(s), int(d)) for s, d in edges)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    if not nodes:
        return {}
    n = len(nodes)
    od: dict[int, int] = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    base = (scale * (damping_den - damping_num)) // (damping_den * n)
    for _ in range(iters):
        d_share = sum(r[v] for v in nodes if v not in od) // n
        m = {v: 0 for v in nodes}
        for s, t in edges:
            m[t] += r[s] // od[s]
        r = {v: base + (damping_num * (m[v] + d_share)) // damping_den
             for v in nodes}
    return r


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle counts over the undirected simple graph of
    ``(src, dst)`` — the other classic web-graph primitive next to
    PageRank (local clustering / link-farm detection: spam hosts sit in
    dense mutual-link pockets, so high ``tri`` relative to ``deg`` is the
    signal).  Returns ``(node, deg, tri)``: undirected simple degree and
    the number of triangles containing the node (isolated nodes don't
    appear — they have no edges).

    Degree-ordered adjacency intersection (the node-iterator++ family,
    Suri & Vassilvitskii 2011 orientation): orient every undirected edge
    from the endpoint that is earlier in the total order ``(deg, id)`` to
    the later one — the oriented out-degree is then O(√m) even at hub
    nodes — and for each oriented edge ``(u, v)`` emit
    ``N⁺(u) ∩ N⁺(v)``: ``w`` closes iff both ``u→w`` and ``v→w``, which
    finds every triangle exactly once, at its (lowest, middle) edge.  The
    intersection runs as an ``array_intersect`` per edge row, so the
    Σ d⁺(v)² wedge candidates are hash probes inside one pipelined JVM
    stage — never rows, never transferred.  Alternatives measured on the
    2M-page host graph (6M edges, 512M wedge candidates, local[32]):
    wedge self-join + (v, w) semi-join 398 s (the candidates become
    shuffled rows); a vectorized numpy/Arrow searchsorted kernel 285 s
    (the per-row probes are fast but the joined adjacency arrays must
    serialize JVM→Python — the transfer dwarfs what the kernel saves);
    this formulation 92 s cold / 43 s warm.  Its known wart: the JVM set
    expression allocates per row, so the intersect stage is GC-bound and
    gains little from extra local threads (17.7 s at local[8] vs 50.8 s
    at local[32] on a shared JVM; separate executors on a real cluster
    don't share a heap).  Triangles themselves DO materialize (one row
    each) for the per-node explode — triangles ≤ wedges always.  Every
    step is integer equi-join / set membership — no floats — so a SQL
    engine reproduces the counts exactly (:func:`triangle_counts_sql`).

    Plan: one distinct on canonical pairs, one degree groupBy, two
    vertex-keyed joins to attach degrees (AQE broadcasts the host-sized
    degree table under a corpus-sized edge set), one groupBy building the
    oriented adjacency arrays (max array O(√m) ≈ 54 KB at 45M edges), two
    joins attaching them to edges, then explode + groupBy.
    """
    _validate_edges(edges)
    return _triangle_counts_canonical(_canonical_und(edges))


def _canonical_und(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edge set ``(a < b)`` — the shared first
    step of every undirected graph operator here (self-loops dropped,
    direction and parallel duplicates collapsed)."""
    return (edges.select(F.least("src", "dst").alias("a"),
                         F.greatest("src", "dst").alias("b"))
            .filter(F.col("a") != F.col("b")).distinct())


def _wedge_closures(und: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Degree-ordered closure enumeration over an ALREADY-canonical
    ``(a, b)`` edge set: returns ``(deg, tris)`` where ``deg`` is the
    undirected simple degree table and ``tris`` has one row ``(u, v, w)``
    per triangle (found exactly once, at its (lowest, middle) oriented
    edge) — the shared core of the per-node counter and the DOULION total
    estimator."""
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    e = (und
         .join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")),
               "a")
         .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")),
               "b"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("x"))
    adj = o.groupBy("u").agg(F.collect_list("x").alias("nu"))
    # inner joins: an edge whose endpoint has no out-neighbours closes
    # nothing, so dropping it is exact
    tris = (o.join(adj, "u")
            .join(adj.select(F.col("u").alias("x"), F.col("nu").alias("nx")),
                  "x")
            .select(F.col("u"), F.col("x").alias("v"),
                    F.explode(F.array_intersect("nu", "nx")).alias("w")))
    return deg, tris


def _triangle_counts_canonical(und: DataFrame) -> DataFrame:
    """:func:`triangle_counts` body over an ALREADY-canonical ``(a, b)``
    edge set — lets :func:`triangle_estimate` feed its sampled subgraph in
    without a redundant canonicalize pass."""
    deg, tris = _wedge_closures(und)
    per = (tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("tri")))
    return (deg.join(per, "node", "left")
            .select("node", "deg",
                    F.coalesce("tri", F.lit(0)).cast("long").alias("tri")))


def _und_cte_sql(src_table: str, name: str = "und") -> str:
    """SQL mirror of :func:`_canonical_und` as a named CTE over
    ``src_table`` — the one definition every undirected mirror shares."""
    return (f"{name} AS (SELECT DISTINCT least(src, dst) AS a, "
            f"greatest(src, dst) AS b FROM {src_table} WHERE src <> dst)")


# deg/orientation/wedge CTE chain over a CTE named `und` — shared verbatim
# by the exact and sampled triangle mirrors so the formulations can never
# drift apart
_TRI_WEDGE_CTES = (
    "deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM "
    "(SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) "
    "GROUP BY node), "
    "o AS (SELECT CASE WHEN (da < db) OR (da = db AND a < b) THEN a ELSE b END AS u, "
    "CASE WHEN (da < db) OR (da = db AND a < b) THEN b ELSE a END AS x, "
    "CASE WHEN (da < db) OR (da = db AND a < b) THEN db ELSE da END AS dx "
    "FROM und "
    "JOIN (SELECT node, deg AS da FROM deg) d1 ON und.a = d1.node "
    "JOIN (SELECT node, deg AS db FROM deg) d2 ON und.b = d2.node), "
    "wg AS (SELECT o1.u AS u, o1.x AS v, o2.x AS w FROM o o1 JOIN o o2 "
    "ON o1.u = o2.u WHERE (o1.dx < o2.dx) OR (o1.dx = o2.dx AND o1.x < o2.x))")


def triangle_counts_sql(edges_cte: str) -> str:
    """DuckDB mirror of :func:`triangle_counts`: the identical degree
    orientation, wedge join and closure semi-join over an ``edges`` CTE
    (pass e.g. :func:`derive_host_edges_sql`).  All integer equi-joins —
    counts are exact, so the driver gate hash-compares them directly."""
    return (
        f"WITH {edges_cte}, "
        + _und_cte_sql("edges") + ", "
        + _TRI_WEDGE_CTES + ", "
        "t AS (SELECT wg.u, wg.v, wg.w FROM wg WHERE EXISTS "
        "(SELECT 1 FROM o WHERE o.u = wg.v AND o.x = wg.w)), "
        "per AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM "
        "(SELECT u AS node FROM t UNION ALL SELECT v AS node FROM t "
        "UNION ALL SELECT w AS node FROM t) GROUP BY node) "
        "SELECT deg.node, deg.deg, CAST(coalesce(per.tri, 0) AS BIGINT) AS tri "
        "FROM deg LEFT JOIN per USING (node)")


def _tri_total(und: DataFrame):
    """One-row aggregate (edges, triangles) of an ALREADY-canonical
    undirected simple edge set.  Each closure row IS one triangle (found
    once, at its (lowest, middle) edge) and each input row one edge, so
    both are direct COUNTs — the old detour through the per-node counter
    (3-way node explode + groupBy + degree join, then Σtri/3 and Σdeg/2)
    computed the identical values with two extra exchanges; the DuckDB
    mirror (:func:`triangle_estimate_sql`) has always counted closures
    directly.  Empty graphs count to 0 on both sides."""
    _deg, tris = _wedge_closures(und)
    return und.agg(F.count(F.lit(1)).alias("m")).crossJoin(
        tris.agg(F.count(F.lit(1)).alias("t")))


def _edge_keep_pred(keep_ppm: int, salt: str):
    """Deterministic DOULION keep-predicate on canonical pair (a, b):
    md5 hex prefix ``<=`` the fixed-width hex threshold
    ``floor(keep_ppm·2^32/10^6) - 1`` — the repo's engine-portable split
    idiom (``decontam.split_expr``): identical sample in any engine, any
    run, any partitioning.  ``<=`` against the inclusive top value (not
    ``<`` against the count) keeps the threshold 8 hex chars wide at
    keep_ppm = 10^6, where the exclusive bound 2^32 needs 9."""
    key = F.concat(F.col("a").cast("string"), F.lit("_"),
                   F.col("b").cast("string"), F.lit(f"|{salt}|"))
    return (F.substring(F.md5(F.encode(key, "UTF-8")), 1, 8)
            <= F.lit(_keep_hex_top(keep_ppm)))


def _keep_hex_top(keep_ppm: int) -> str:
    """Inclusive 8-hex-char top value for a keep_ppm/10^6 fraction of the
    2^32 prefix space (exactly floor(keep_ppm·2^32/10^6) values kept)."""
    return format((keep_ppm << 32) // 10 ** 6 - 1, "08x")


def triangle_estimate(edges: DataFrame, keep_ppm: int = 500000,
                      salt: str = "tri") -> DataFrame:
    """DOULION approximate global triangle count (Tsourakakis et al.
    2009): keep each undirected edge with probability
    ``p = keep_ppm/10^6``, count triangles exactly on the sampled
    subgraph, scale by ``p^-3`` — an unbiased estimator whose wedge work
    drops by ~``p²`` (the 100-TB dense-graph path: exact counting's
    Σd⁺² candidate probes are the scale bottleneck, and sampling attacks
    them quadratically while the estimate's relative error shrinks as
    triangles grow).

    The sample is DETERMINISTIC (md5-prefix thresholding of the canonical
    pair — :func:`_edge_keep_pred`), so ``tri_sampled`` and the estimate
    are bit-identical in any engine: the DuckDB oracle
    (:func:`triangle_estimate_sql`) reproduces them exactly, which is
    what lets the driver gate hash-compare a "randomized" algorithm.

    Returns one row ``(n_edges, n_kept, tri_sampled, est)``; ``est`` is
    the fixed-order IEEE chain ``((tri·10^6/ppm)·10^6/ppm)·10^6/ppm``.

    The canonical edge set is eagerly ``localCheckpoint``-ed: n_edges and
    the sampled count are separate jobs, and without the cut each re-runs
    the full canonicalize shuffle (same rationale as ``_pagerank_run``'s
    eager e⋈outdeg checkpoint — lazy variants leave AQE planning against
    defaultSizeInBytes).
    """
    _validate_edges(edges)
    if not 0 < keep_ppm <= 10 ** 6:
        raise ValueError(f"keep_ppm must be in (0, 10^6], got {keep_ppm}")
    und = _canonical_und(edges).localCheckpoint(eager=True)
    full = und.agg(F.count(F.lit(1)).alias("n_edges"))
    samp = _tri_total(und.filter(_edge_keep_pred(keep_ppm, salt)))
    return (full.crossJoin(samp)
            .select("n_edges", F.col("m").alias("n_kept"),
                    F.col("t").alias("tri_sampled"))
            .withColumn("est", (((F.col("tri_sampled").cast("double")
                                  * 1000000.0 / keep_ppm)
                                 * 1000000.0 / keep_ppm)
                                * 1000000.0 / keep_ppm)))


def triangle_estimate_sql(edges_cte: str, keep_ppm: int = 500000,
                          salt: str = "tri") -> str:
    """DuckDB mirror of :func:`triangle_estimate`: identical md5 sample,
    the wedge-formulation triangle count on the sampled subgraph, and the
    identical fixed-order estimate chain."""
    thr = _keep_hex_top(keep_ppm)
    return (
        f"WITH {edges_cte}, "
        + _und_cte_sql("edges", name="undf") + ", "
        "und AS (SELECT a, b FROM undf WHERE "
        f"substring(md5(CAST(a AS VARCHAR) || '_' || CAST(b AS VARCHAR) || "
        f"'|{salt}|'), 1, 8) <= '{thr}'), "
        + _TRI_WEDGE_CTES + ", "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tri_sampled FROM wg "
        "WHERE EXISTS (SELECT 1 FROM o WHERE o.u = wg.v AND o.x = wg.w)), "
        "f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM undf), "
        "k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept FROM und) "
        "SELECT f.n_edges, k.n_kept, t.tri_sampled, "
        f"(((CAST(t.tri_sampled AS DOUBLE) * 1000000.0 / {keep_ppm}) "
        f"* 1000000.0 / {keep_ppm}) * 1000000.0 / {keep_ppm}) AS est "
        "FROM f, k, t")


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over the undirected simple graph of ``(src, dst)`` — the third leg of
    the web-graph suite next to PageRank and triangles (mirror farms and
    template networks surface as dense same-label pockets).  Returns
    ``(node, label)`` after ``iters`` rounds; connected same-label nodes
    are one community.

    Made ENGINE-EXACT by pinning the classic's two unspecified choices:
    updates are synchronous (round t+1 reads only round t), and
    ``label_{t+1}(v)`` = the most frequent label among v's neighbours with
    ties to the SMALLEST label — counts and min are order-independent, so
    any engine reproduces every round bit-for-bit
    (:func:`label_propagation_sql`; same verifiability rationale as
    ``pagerank_int``).  The argmax-with-tie-break is one aggregate,
    ``min(struct(-count, label))`` — no window, so a label shared by a
    node's every neighbour partial-aggregates map-side instead of landing
    on one reducer.

    Plan per round: one n-keyed join (labels are node-sized, ≪ edges —
    AQE broadcasts them when small), one map-side-combined (v, label)
    count, one map-side-combined argmax; labels ``localCheckpoint`` per
    round (the iterative-lineage lesson).  Fixed ``iters`` bounds cost —
    synchronous LPA can oscillate on bipartite structure rather than
    converge, so a fixed horizon is the deterministic semantic, not a
    shortcut."""
    _validate_edges(edges)
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    und = _canonical_und(edges)
    sym = (und.select(F.col("a").alias("v"), F.col("b").alias("n"))
           .unionAll(und.select(F.col("b").alias("v"), F.col("a").alias("n")))
           ).localCheckpoint(eager=True)
    labels = (sym.select(F.col("v").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(iters):
        nbr = (sym.join(labels.withColumnRenamed("node", "n"), "n")
               .select("v", "label"))
        cnt = nbr.groupBy("v", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (cnt.groupBy("v")
                  .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                      F.col("label").alias("l"))).alias("m"))
                  .select(F.col("v").alias("node"),
                          F.col("m.l").alias("label"))
                  .localCheckpoint(eager=True))
    return labels


def label_propagation_sql(edges_cte: str, iters: int = 4,
                          edges_table: str = "edges") -> str:
    """DuckDB mirror of :func:`label_propagation` — ``iters`` unrolled
    rounds; the argmax-with-min-tie-break is a ``row_number() OVER
    (ORDER BY c DESC, label ASC)`` window, a deterministic total order.
    ``edges_table`` lets the caller chain a filtered CTE after the base
    edge derivation."""
    parts = [
        edges_cte,
        _und_cte_sql(edges_table),
        "sym AS (SELECT a AS v, b AS n FROM und "
        "UNION ALL SELECT b AS v, a AS n FROM und)",
        "lab0 AS (SELECT DISTINCT v AS node, v AS label FROM sym)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"cnt{t} AS (SELECT s.v, l.label, CAST(COUNT(*) AS BIGINT) AS c "
            f"FROM sym s JOIN lab{t - 1} l ON s.n = l.node GROUP BY s.v, l.label)")
        parts.append(
            f"lab{t} AS (SELECT v AS node, label FROM (SELECT v, label, "
            f"row_number() OVER (PARTITION BY v ORDER BY c DESC, label ASC) "
            f"AS rn FROM cnt{t}) WHERE rn = 1)")
    return "WITH " + ", ".join(parts) + f" SELECT node, label FROM lab{iters}"


def bfs_distances(edges: DataFrame, seeds: DataFrame | list[int],
                  max_hops: int = 6, directed: bool = True) -> DataFrame:
    """Hop distance from a seed set over ``(src, dst)`` edges — the crawl
    frontier metric (how many link hops from the trusted/seed hosts is
    each host? TrustRank-style spam triage caps crawl depth on it).
    Returns ``(node, dist)`` for every node reached within ``max_hops``;
    unreached nodes are absent (their distance is not 0 — a LEFT join
    default would conflate them with seeds).

    Engine-exact by construction: each round is
    ``dist_t(v) = min(dist_{t-1}(v), 1 + min over in-neighbours)`` — min
    and +1 are order-independent, so :func:`bfs_distances_sql` reproduces
    every round bit-for-bit in any engine.  ``directed=False``
    symmetrizes first.

    Plan per round: one src-keyed join of the frontier-so-far against
    edges (distances are node-sized, ≪ edges), one map-side-combined min
    per dst, one union + min consolidation; distances ``localCheckpoint``
    per round (iterative-lineage lesson).  ``max_hops`` bounds rounds —
    web-graph diameters are small (the classic six-ish hops), and a fixed
    horizon is what a crawl scheduler actually asks for."""
    _validate_edges(edges)
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionAll(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    if isinstance(seeds, list):
        seeds = spark.createDataFrame([(int(s),) for s in seeds],
                                      "node long")
    dist = (seeds.select(F.col("node").cast("long"))
            .distinct().withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    for _ in range(max_hops):
        step = (e.join(dist.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"),
                        (F.col("dist") + 1).alias("dist")))
        dist = (dist.unionAll(step)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
    return dist


def bfs_distances_sql(edges_cte: str, seeds_sql: str, max_hops: int = 6,
                      directed: bool = True) -> str:
    """DuckDB mirror of :func:`bfs_distances`; ``seeds_sql`` is a query
    returning a ``node`` column (e.g. ``SELECT 0 AS node UNION ALL …``)."""
    sym = ("eds AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges "
           "UNION ALL SELECT dst AS src, src AS dst FROM edges) "
           "WHERE src <> dst)" if not directed else
           "eds AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)")
    parts = [
        edges_cte, sym,
        f"d0 AS (SELECT DISTINCT CAST(node AS BIGINT) AS node, "
        f"CAST(0 AS BIGINT) AS dist FROM ({seeds_sql}))",
    ]
    for t in range(1, max_hops + 1):
        parts.append(
            f"d{t} AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM ("
            f"SELECT node, dist FROM d{t - 1} UNION ALL "
            f"SELECT e.dst AS node, d.dist + 1 AS dist "
            f"FROM eds e JOIN d{t - 1} d ON e.src = d.node) GROUP BY node)")
    return "WITH " + ", ".join(parts) + \
        f" SELECT node, dist FROM d{max_hops}"
