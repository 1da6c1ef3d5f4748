"""One-pass table profiler — ANALYZE TABLE as a library call.

Partition sizing, join-strategy choice, skew handling and data-quality
gates all start from per-column statistics; at 100 TB nobody runs one
``COUNT(DISTINCT …)`` job per column.  ``profile_table`` computes every
column's stats in **one scan**: a single JVM ``agg`` whose expression list
holds, per column, the exact counters (rows, nulls, min, max, avg length)
plus ``approx_count_distinct`` — Spark's native HLL++ — for the
distinct-count estimate.  Everything stays inside whole-stage codegen;
no Python touches a row.

Why the engine's HLL++ and not this library's ``HLL``: a GROUPED_AGG
pandas UDAF cannot share an aggregation with built-in functions
(INVALID_PANDAS_UDF_PLACEMENT), so using our sketch here would cost a
second full scan *and* an Arrow transfer — the "UDFs are the slow path"
rule applies to our own sketches too.  ``sparksketch.hll`` remains the
right tool when the *state* must be mergeable/persistable/groupable; the
profiler only needs the number.

Output: one row per profiled column —

    column, n_rows, n_nulls, null_frac, ndv_est, min, max, avg_len

``min``/``max`` are stringified (a profile mixes types); ``ndv_est``
carries HLL++'s relative-error guarantee (``rsd``, default 1.5%).
NULL-only columns profile to ndv_est=0 and NULL min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  rsd: float = 0.015) -> DataFrame:
    """Profile ``columns`` (default: all) in one scan; returns a small
    DataFrame of per-column stats (see module docstring)."""
    cols = df.columns if columns is None else columns
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"profile_table: no such columns {sorted(missing)}")
    if not cols:
        raise ValueError("profile_table: nothing to profile")
    from pyspark.sql.types import MapType
    exprs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        if isinstance(df.schema[c].dataType, MapType):
            # maps are unorderable (no min/max) and unhashable for HLL++ —
            # profile their counts and NULL the rest instead of aborting
            null_d = F.lit(None).cast("double")
            exprs += [F.count(col).alias(f"_nn{i}"),
                      null_d.alias(f"_ndv{i}"),
                      F.lit(None).cast("string").alias(f"_min{i}"),
                      F.lit(None).cast("string").alias(f"_max{i}"),
                      null_d.alias(f"_len{i}")]
            continue
        exprs += [
            F.count(col).alias(f"_nn{i}"),           # non-null count
            F.approx_count_distinct(c, rsd=rsd).alias(f"_ndv{i}"),
            F.min(col).cast("string").alias(f"_min{i}"),
            F.max(col).cast("string").alias(f"_max{i}"),
            F.avg(F.length(col.cast("string"))).alias(f"_len{i}"),
        ]
    r = df.agg(*exprs).first()
    n = r["_n"]
    rows = [Row(column=c,
                n_rows=int(n),
                n_nulls=int(n - r[f"_nn{i}"]),
                null_frac=float((n - r[f"_nn{i}"]) / n) if n else 0.0,
                ndv_est=(float(r[f"_ndv{i}"])
                         if r[f"_ndv{i}"] is not None else None),
                min=r[f"_min{i}"], max=r[f"_max{i}"],
                avg_len=float(r[f"_len{i}"]) if r[f"_len{i}"] is not None else None)
            for i, c in enumerate(cols)]
    schema = ("column string, n_rows long, n_nulls long, null_frac double, "
              "ndv_est double, min string, max string, avg_len double")
    return df.sparkSession.createDataFrame(rows, schema)


def chi2_cells(df: DataFrame, group_col: str, cat_col: str,
               min_expected: float = 0.0) -> DataFrame:
    """Chi-square contingency cells between two categoricals — the
    distribution-drift / independence screen for corpus slices ("is source
    X's language mix shifting?", "does the new crawl's length profile match
    last month's?").  Returns one row per ``(group, cat)`` cell:

        group_col, cat_col, o (observed count), e (expected under
        independence = row_total·col_total/grand_total), contrib
        ((o−e)²/e — the cell's chi-square term)

    Large ``contrib`` cells ARE the drift diagnosis (which slice, which
    category); the scalar statistic is :func:`chi2_stat`.  Cells with
    ``e < min_expected`` can be dropped (the classic validity rule of
    thumb is 5).

    Scale shape: ONE groupBy shuffle on the (group, cat) pair reduces the
    corpus to the cell table; row/column/grand totals are window sums over
    THAT table (bounded by the category cardinalities G·C, not the corpus
    — re-aggregating through joins instead would recompute the corpus
    groupBy per total: Spark's ReuseExchange does not fire across the
    broadcast subtrees, measured 4 scans).  The unpartitioned grand-total
    window is a single-task sort of G·C rows — fine for categoricals,
    which is what a contingency table is; this is not a high-cardinality
    operator.  Every arithmetic step is exact-int until the single
    ``(r·k)/T`` division and the ``(o−e)²/e`` chain, each an IEEE op in a
    fixed order — so an independent SQL engine reproduces the doubles
    bit-for-bit (the driver-gate oracle relies on this).
    """
    from pyspark.sql import Window

    cells = df.groupBy(group_col, cat_col).agg(F.count("*").alias("o"))
    r = F.sum("o").over(Window.partitionBy(group_col)).cast("double")
    k = F.sum("o").over(Window.partitionBy(cat_col)).cast("double")
    t = F.sum("o").over(Window.partitionBy()).cast("double")
    d = F.col("o").cast("double") - F.col("e")
    out = (cells.withColumn("e", (r * k) / t)
           .withColumn("contrib", (d * d) / F.col("e"))
           .select(group_col, cat_col, "o", "e", "contrib"))
    if min_expected > 0:
        out = out.filter(F.col("e") >= float(min_expected))
    return out


def chi2_stat(df: DataFrame, group_col: str, cat_col: str) -> tuple[float, int]:
    """Scalar chi-square statistic and degrees of freedom
    ``(G−1)·(C−1)`` for the :func:`chi2_cells` table.  The cell table is
    small (category cardinalities), so the sum happens driver-side in a
    DETERMINISTIC order (sorted by group, cat) — a distributed ``SUM`` over
    doubles has engine-dependent addend order and is not reproducible."""
    rows = (chi2_cells(df, group_col, cat_col)
            .orderBy(group_col, cat_col).collect())
    groups = {r[0] for r in rows}
    cats = {r[1] for r in rows}
    stat = 0.0
    for row in rows:
        stat += row["contrib"]
    dof = (len(groups) - 1) * (len(cats) - 1)
    return stat, dof


def diversity_by_group(df: DataFrame, group_col: str,
                       cat_col: str) -> DataFrame:
    """Concentration / diversity of a categorical mix per group — the
    complement of :func:`chi2_cells` ("how one-sided is source X's
    language mix?").  Returns per group:

        n (rows), sumsq (Σ c² over category counts — exact BIGINT),
        hhi (Herfindahl index Σ share² = sumsq/n², ∈ (0, 1]),
        gini (impurity 1 − hhi, 0 = single category)

    Engine-exactness is the design driver: Σ share² as a float SUM would
    be addend-order-dependent and unverifiable; Σ c² is an INTEGER sum
    (order-independent), and hhi/gini are then a fixed 3-op IEEE chain —
    bit-identical in any engine.  Overflow note: a single (group,
    category) cell above ~3.04e9 rows overflows c² on int64 — ANSI mode
    raises rather than wrapping; pre-shard such groups.

    Plan: one (group, cat) groupBy on the corpus, one group-level
    re-aggregation of the small cell table — both map-side combined."""
    cells = (df.groupBy(group_col, cat_col)
             .agg(F.count(F.lit(1)).alias("_cnt")))
    per = (cells.groupBy(group_col)
           .agg(F.sum("_cnt").alias("n"),
                F.sum(F.col("_cnt") * F.col("_cnt")).alias("sumsq")))
    hhi = (F.col("sumsq").cast("double")
           / (F.col("n").cast("double") * F.col("n").cast("double")))
    return (per.withColumn("hhi", hhi)
            .withColumn("gini", F.lit(1.0) - F.col("hhi")))
