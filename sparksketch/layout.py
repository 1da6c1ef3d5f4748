"""Z-order (Morton) data layout: multi-dimensional clustering for
min/max data skipping.

The write-side counterpart of the library's read-side pruning work
(`similarity.write_lsh_index`, `textstats.write_bm25_index` prune on ONE
key via `partitionBy`).  A 100-TB web corpus is queried along *several*
axes at once — host, fetch time, document length, language — and a layout
sorted by any single key gives tight parquet row-group min/max statistics
on that key only; every other column's ranges stay as wide as the corpus,
so predicates on them skip nothing.  Interleaving the bits of the (bucketed)
key columns into one Morton code and range-partitioning + sorting by that
code bounds every file/row group to a small hyper-rectangle of the key
space: min/max get tight on EVERY interleaved dimension, and the stock
parquet reader (Spark's or anyone's) skips row groups for a predicate on
any of them — no index structure, no reader changes, just a write-time
sort.  This is the standard lakehouse technique (Delta/Iceberg `ZORDER BY`
re-expressed as plain DataFrame ops).

Scale shape: one `repartitionByRange` shuffle on the z-column (sampled
range boundaries = balanced output files even under skew) + an in-partition
sort — exactly the cost of any sorted write, independent of corpus width.
The z-value itself is a pure JVM bit-expression (codegen, no UDF).

Bucketing: z-ordering needs each dimension as a small non-negative int.
`det_bucket` is the deterministic linear map for dimensions with known
bounds (timestamps, lengths); for skewed/unbounded dimensions use the
equi-depth `kll.bucketize` (quantile sketch pass) so every bucket carries
comparable row mass — unbalanced buckets waste interleave bits.

`rowgroup_ranges` / `pruned_fraction` read parquet footer statistics
(pyarrow) and measure exactly what a reader may skip for a box predicate —
the evidence metric used by tests and `scripts/zorder_scale.py`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def zvalue(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton code of ``len(cols)`` pre-bucketed dimensions, ``bits`` bits
    each: bit ``b`` of dimension ``d`` lands at z-bit ``b*D + d`` (later
    columns are the slightly-more-significant tie-break within each bit
    group).  Inputs must already be non-negative ints ``< 2**bits`` — use
    :func:`det_bucket` / ``kll.bucketize`` first; out-of-range bits are
    masked off (the value is clamped modulo ``2**bits``), never an error.

    Pure bit arithmetic on longs — whole-stage-codegen'd, no UDF.  The
    disjoint-bit terms are summed (equivalent to OR) so the DuckDB mirror
    in ``zvalue_sql`` is plain ``+``/``//``/``%`` integer arithmetic.
    """
    ndims = len(cols)
    if not 1 <= ndims * bits <= 62:
        raise ValueError(f"zvalue needs 1 <= dims*bits <= 62, got {ndims}*{bits}")
    terms = []
    for d, c in enumerate(cols):
        cc = _as_col(c).cast("long")
        for b in range(bits):
            terms.append(F.shiftleft(
                F.shiftright(cc, b).bitwiseAND(F.lit(1)), b * ndims + d))
    return reduce(lambda a, b: a + b, terms)


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The exact-integer ANSI/DuckDB mirror of :func:`zvalue` (``//`` int
    division, ``%``, ``*``, ``+`` — no engine-specific bit operators), for
    oracle queries and portability tests."""
    ndims = len(cols)
    terms = []
    for d, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c}) // {1 << b}) % 2) * {1 << (b * ndims + d)}")
    return "(" + " + ".join(terms) + ")"


def _bucket_shift(lo: int, hi: int, bits: int) -> int:
    """Right-shift that maps the clamped, zero-based range onto ``bits``
    bits: the smallest ``s`` with ``(hi - lo) >> s < 2**bits``."""
    if hi < lo:
        raise ValueError(f"det_bucket bounds reversed: [{lo}, {hi}]")
    s = 0
    while (hi - lo) >> s >= (1 << bits):
        s += 1
    return s


def det_bucket(col: str | Column, lo: int, hi: int, bits: int) -> Column:
    """Deterministic bucket of an integer dimension with known inclusive
    bounds ``[lo, hi]`` into ``[0, 2**bits)``: clamp to the bounds (a late
    outlier must not wrap), zero-base, then right-shift just enough to fit
    ``bits`` bits.  Pure bit arithmetic — Spark long ``/`` is DOUBLE
    (unsafe past 2^53) and the Column API has no integer ``div``, so the
    power-of-two shift is the exact, codegen'd form; when the range is not
    a power of two the top buckets are simply unused (a bounded waste of
    interleave resolution, documented here).  For skewed dimensions prefer
    equi-depth ``kll.bucketize``.  Mirror: :func:`det_bucket_sql`."""
    s = _bucket_shift(lo, hi, bits)
    c = _as_col(col).cast("long")
    clamped = F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
    return F.shiftright(clamped - F.lit(lo), s)


def det_bucket_sql(col: str, lo: int, hi: int, bits: int) -> str:
    """DuckDB/ANSI mirror of :func:`det_bucket` (``//`` by a power of two
    == the shift: operands are non-negative after clamping)."""
    s = _bucket_shift(lo, hi, bits)
    return (f"((LEAST(GREATEST(CAST({col} AS BIGINT), {lo}), {hi}) - {lo})"
            f" // {1 << s})")


def zorder_by(df: DataFrame, bucket_cols: list[str | Column], bits: int = 16,
              n_parts: int | None = None, z_col: str = "_z") -> DataFrame:
    """Cluster ``df`` by the Morton code of ``bucket_cols`` (already-bucketed
    int columns / expressions): range-partition on z (sampled boundaries →
    balanced files even when the key space is sparse) and sort within each
    partition, so a subsequent ``.write.parquet`` emits files whose
    row-group min/max are tight on every interleaved dimension.  The helper
    column is dropped — the written schema is unchanged."""
    out = df.withColumn(z_col, zvalue(bucket_cols, bits=bits))
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    return (out.repartitionByRange(n_parts, z_col)
            .sortWithinPartitions(z_col)
            .drop(z_col))


def rowgroup_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-row-group footer statistics ``{file, rg, n_rows, <col>_min,
    <col>_max}`` for a parquet file or directory — what any min/max-skipping
    reader sees.  Driver-side metadata only (footers, not data)."""
    import os

    import pyarrow.parquet as pq

    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if f.endswith(".parquet")] if os.path.isdir(path) else [path])
    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            row = {"file": os.path.basename(f), "rg": rg, "n_rows": g.num_rows}
            for c in cols:
                st = g.column(idx[c]).statistics
                # stats can be absent (disabled at write time, or a type
                # parquet keeps no min/max for) — emit None rather than
                # AttributeError so pruned_fraction degrades gracefully
                if st is None:
                    row[f"{c}_min"] = row[f"{c}_max"] = None
                else:
                    row[f"{c}_min"], row[f"{c}_max"] = st.min, st.max
            out.append(row)
    return out


def pruned_fraction(path: str, box: dict[str, tuple]) -> dict:
    """Fraction of row groups (and of rows) a min/max reader skips for the
    AND-of-ranges predicate ``box = {col: (lo, hi)}`` — a row group is
    skippable iff it provably contains no match, i.e. some column's
    ``[min, max]`` misses its ``[lo, hi]``.  This is the layout-quality
    metric: higher = better clustering for that query shape."""
    groups = rowgroup_ranges(path, list(box))
    skipped = rows_skipped = total_rows = 0
    for g in groups:
        total_rows += g["n_rows"]
        # a column with no stats (None min/max) can never prove a miss —
        # the row group counts as not skippable, matching reader behavior
        if any(g[f"{c}_min"] is not None
               and (g[f"{c}_max"] < lo or g[f"{c}_min"] > hi)
               for c, (lo, hi) in box.items()):
            skipped += 1
            rows_skipped += g["n_rows"]
    return {"row_groups": len(groups), "skipped": skipped,
            "pruned_frac": round(skipped / max(len(groups), 1), 4),
            "rows_total": total_rows, "rows_skipped": rows_skipped}


def dir_bytes(spark, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works on
    local paths here and unchanged on HDFS/S3A (driver-side metadata)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()


def compact_files(spark, src: str, dst: str, target_mb: int = 256,
                  order_by: list[str] | None = None,
                  mode: str = "overwrite") -> int:
    """Rewrite a parquet directory into ~``target_mb``-sized files — the
    small-files compaction every long-running ingest needs (a streaming
    sink or per-batch append leaves thousands of KB-scale files; each
    costs a task, an open, a footer parse, so scans and listings crawl).
    Returns the output file count.

    File count = ``max(1, round(bytes / target))`` from the source's
    actual on-disk size (compression survives the rewrite, so the on-disk
    ratio carries over).  Plain compaction is one round-robin
    ``repartition`` — a single balanced shuffle.  Pass ``order_by``
    (e.g. the bucketed z-order dims) to compact WITHOUT destroying a
    clustered layout: ``repartitionByRange`` + in-partition sort — the
    same write shape as :func:`zorder_by`, because a round-robin shuffle
    would scramble row-group min/max tightness that the layout paid for.
    """
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    total = dir_bytes(spark, src)
    n = max(1, round(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if order_by:
        out = (df.repartitionByRange(n, *order_by)
               .sortWithinPartitions(*order_by))
    else:
        out = df.repartition(n)
    out.write.mode(mode).parquet(dst)
    return n
