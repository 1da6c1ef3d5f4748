"""Table sources/sinks: Iceberg catalog when configured, parquet otherwise.

The target data model (BASELINE.json:input_hint) is an *Iceberg* table of
Common-Crawl-style web pages.  This sandbox has no Iceberg jars, so all code
paths go through this module's ``load_table``/``write_table``: with an
Iceberg catalog configured (``spark.sql.catalog.<name>`` present and the
runtime jar on the classpath) a ``catalog.db.table`` identifier resolves via
``spark.table`` / ``writeTo``; otherwise a path resolves via parquet.  The
rest of the library only sees DataFrames, so swapping the storage layer is a
config change, not a code change.

Why this matters at 10^12 docs: Iceberg gives partition pruning + file-level
min/max skipping on ``warc_ts``/``lang`` predicates and snapshot isolation
for the checkpoint/resume story (re-running a build against the same
snapshot id guarantees the same input — the lineage fingerprint should
include it; see ``input_fingerprint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "iceberg") -> bool:
    """True when an Iceberg catalog is configured AND its classes load."""
    if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


_PATH_FORMATS = (".parquet", ".orc", ".json", ".jsonl", ".csv", ".tsv")


def is_table_identifier(source: str) -> bool:
    """`catalog.db.table` identifiers have no path separators or known
    file-format suffixes."""
    return "/" not in source and not source.endswith(_PATH_FORMATS)


def path_format(source: str) -> str:
    """File format from the path suffix; bare directories default to
    parquet (the lake-native columnar default)."""
    for suffix in _PATH_FORMATS:
        if source.endswith(suffix):
            return {"jsonl": "json", "tsv": "csv"}.get(suffix[1:], suffix[1:])
    return "parquet"


def load_table(spark: SparkSession, source: str, snapshot_id: int | None = None,
               schema: str | None = None) -> DataFrame:
    """Load a table by Iceberg identifier or path (parquet/orc/json/csv by
    suffix; parquet for bare directories).

    CSV/JSON are ingest formats, not the at-rest format: with no schema the
    reader infers one (an extra pass over CSV/JSON); production ingest
    should pass ``schema`` and convert to parquet/Iceberg immediately —
    row-oriented text formats forfeit column pruning and predicate pushdown."""
    if is_table_identifier(source):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(source)
    if snapshot_id is not None:
        raise ValueError("snapshot pinning requires an Iceberg table identifier")
    fmt = path_format(source)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        sep = "\t" if source.endswith(".tsv") else ","
        return reader.option("header", "true").option("sep", sep) \
            .option("inferSchema", str(schema is None).lower()).csv(source)
    return getattr(reader, fmt)(source)


def write_table(df: DataFrame, target: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Write to an Iceberg identifier or path (format by suffix)."""
    if is_table_identifier(target):
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    fmt = path_format(target)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
        if target.endswith(".tsv"):
            w = w.option("sep", "\t")
    getattr(w, fmt)(target)


def input_fingerprint(spark: SparkSession, source: str) -> str:
    """A stable identifier of *what was read* for checkpoint lineage:
    Iceberg → current snapshot id; parquet → the sorted file list hash."""
    from sparksketch.hashing import spark_xxhash64
    if is_table_identifier(source):
        try:
            snap = (spark.sql(f"SELECT snapshot_id FROM {source}.snapshots "
                              "ORDER BY committed_at DESC LIMIT 1").first())
            return f"{source}@{snap[0] if snap else 'empty'}"
        except Exception:
            return source
    files = sorted(load_table(spark, source).inputFiles())
    return f"{source}@{format(spark_xxhash64('|'.join(files), 3), '016x')}"


def parse_json_robust(df: DataFrame, json_col: str, schema,
                      out: str = "rec", bad_col: str = "is_bad") -> DataFrame:
    """Quarantine-style JSON parsing of a string column — the crawl-ingest
    primitive (real JSONL feeds always carry truncated/garbled lines, and
    one of them must never kill a 100-TB job).

    The corrupt-record column rides INSIDE the ``from_json`` schema
    (``columnNameOfCorruptRecord``), which pins the strict semantics: a
    truncated record like ``{"k": 7, "s`` is flagged bad with ALL fields
    nulled — bare PERMISSIVE ``from_json`` without that column returns
    the partial row ``(k=7, s=null)`` and silently accepts corrupt data
    (measured; the pytest pins it).  This is also why the scan-level
    ``spark.read.json`` + ``_corrupt_record`` route is avoided: filtering
    that column requires caching the whole parsed input
    (``AnalysisException`` otherwise) — a non-starter at 100 TB, while
    the from_json expression is one codegen'd projection, and the raw
    line is still present for the quarantine sink.

    Semantics pinned by tests: NULL input → ``bad_col`` false (absent,
    not corrupt) with NULL ``out``; valid JSON missing schema fields →
    good, fields NULL; truncated / garbage / JSON ``null`` / non-object
    → bad, all fields NULL.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    crpt = "_sparksketch_corrupt"
    if isinstance(schema, str):
        aug = f"{schema}, {crpt} string"
    else:
        aug = StructType(list(schema.fields)
                         + [StructField(crpt, StringType())])
    parsed = F.from_json(F.col(json_col), aug,
                         {"columnNameOfCorruptRecord": crpt})
    return (df.withColumn("_p", parsed)
            .withColumn(bad_col, F.col(f"_p.{crpt}").isNotNull())
            .withColumn(out, F.when(F.col(bad_col), F.lit(None))
                        .otherwise(F.col("_p").dropFields(crpt)))
            .drop("_p"))


def read_jsonl_robust(spark: SparkSession, path: str, schema,
                      line_col: str = "line", out: str = "rec",
                      bad_col: str = "is_bad") -> DataFrame:
    """Read a JSONL file/directory as raw text lines and parse with
    :func:`parse_json_robust` — returns ``(line, rec, is_bad)`` rows; feed
    ``.filter(bad_col)`` rows (raw lines intact) to a quarantine sink and
    ``.filter(~bad_col).select(out + ".*")`` downstream."""
    lines = spark.read.text(path).withColumnRenamed("value", line_col)
    return parse_json_robust(lines, line_col, schema, out=out,
                             bad_col=bad_col)


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               compare_cols: list[str] | None = None,
               status_col: str = "status",
               on_duplicate: str = "error") -> DataFrame:
    """Classify every key across two table versions as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` — the incremental-refresh
    primitive (which pages did this crawl add, drop, or rewrite since the
    last snapshot?  the ``changed`` set is what re-enters the dedup /
    quality pipeline; ``removed`` drives tombstones).

    One full-outer equi-join on the key (a shuffle per side, AQE-planned);
    content equality is per-column null-safe ``<=>`` — direct comparison,
    not a hash, so there are no collisions and the SQL mirror is plain
    ``IS NOT DISTINCT FROM``.  ``compare_cols`` defaults to every shared
    non-key column.  Presence is tracked with side literals rather than
    key IS NULL tests, so NULL-valued keys still classify correctly.

    Returns the key columns + ``status_col``; ``changed``/``unchanged``
    rows exist on both sides, ``added`` only in ``new``, ``removed`` only
    in ``old``.

    Duplicate keys: a full-outer join fans out — a key appearing twice on
    a side yields one status row per matched PAIR (possibly contradictory
    statuses for the same key), which silently corrupts per-status counts
    downstream.  The default ``on_duplicate="error"`` therefore spends one
    aggregate per side up front and raises naming an offending key;
    pre-deduplicated callers pass ``on_duplicate="allow"`` to skip the
    check (and accept pair-level semantics)."""
    from functools import reduce

    from pyspark.sql import functions as F

    if not key_cols:
        raise ValueError("table_diff needs at least one key column")
    if on_duplicate not in ("error", "allow"):
        raise ValueError(f"on_duplicate must be 'error' or 'allow', "
                         f"got {on_duplicate!r}")
    if on_duplicate == "error":
        for side, df in (("old", old), ("new", new)):
            dup = (df.groupBy(*key_cols).count()
                   .filter(F.col("count") > 1).limit(1).collect())
            if dup:
                key = {c: dup[0][c] for c in key_cols}
                raise ValueError(
                    f"table_diff: duplicate key on the {side} side "
                    f"(e.g. {key}, {dup[0]['count']} rows) — dedupe first "
                    f"or pass on_duplicate='allow' for pair-level semantics")
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in set(new.columns) and c not in set(key_cols)]
    missing = [c for c in list(key_cols) + list(compare_cols)
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns absent from a side: {missing}")
    o = old.select(*key_cols,
                   *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_old"))
    n = new.select(*key_cols,
                   *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
                   F.lit(True).alias("_in_new"))
    j = o.join(n, list(key_cols), "full_outer")
    same = reduce(lambda a, b: a & b,
                  [F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
                   for c in compare_cols],
                  F.lit(True))
    status = (F.when(F.col("_in_old").isNull(), F.lit("added"))
              .when(F.col("_in_new").isNull(), F.lit("removed"))
              .when(same, F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(*key_cols, status.alias(status_col))


def json_bad_pred_sql(col: str, field: str = "k") -> str:
    """DuckDB predicate mirroring :func:`parse_json_robust`'s ``is_bad``
    for a ``{field} long`` schema — TRUE exactly where Spark's
    from_json-with-corrupt-column flags the record (probed semantics,
    pinned by the parity pytest): malformed, valid-but-not-an-object
    (JSON null / scalar / array), or ``field`` present with a
    non-integer/overflowing value.  DuckDB wrinkles handled here:
    ``json_type``/``json_extract`` THROW on malformed input and a CASE
    guard does NOT reliably protect them (the vectorized executor
    evaluated the guarded branch on a 100k-row input — measured at
    sf0.1), so every access goes through ``TRY_CAST(col AS JSON)``,
    which yields SQL NULL for malformed text and a safe input for every
    json_* call; positive int64s and 2^63+ both type as ``UBIGINT``
    (disambiguated with TRY_CAST to BIGINT), and an absent field types
    as SQL NULL (coalesced to the JSON-null case, which Spark accepts).
    SQL-NULL input is NOT bad (absent, not corrupt — Spark parity)."""
    j = json_safe_sql(col)
    t = f"json_type({j}, '$.{field}')"
    return (
        f"({col} IS NOT NULL AND NOT ({j} IS NOT NULL "
        f"AND json_type({j}) = 'OBJECT' "
        f"AND (coalesce({t}, 'NULL') IN ('BIGINT', 'NULL') "
        f"OR ({t} = 'UBIGINT' AND TRY_CAST(json_extract_string({j}, "
        f"'$.{field}') AS BIGINT) IS NOT NULL))))")


def json_safe_sql(col: str) -> str:
    """``TRY_CAST(col AS JSON)`` — the only DuckDB-safe gateway to json_*
    functions over possibly-malformed text (NULL instead of a throw)."""
    return f"TRY_CAST({col} AS JSON)"
