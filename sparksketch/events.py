"""Event-stream dataflow operators: sessionization, as-of and range joins.

All are single-shuffle formulations — the Spark-first shape for operators
Spark lacks as built-ins:

- **sessionize** — gap-based session ids per user: one shuffle on the user
  key, one ordered window pass (lag → new-session flag → running sum).
- **asof_join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key.  Instead of a per-row range probe (an
  exploding theta-join), both sides UNION into one stream, one window pass
  carries the right side's values forward (``last(..., ignorenulls)``), and
  left rows keep what was in flight — one shuffle on the key, no
  cross-product, works at any right-side size.

Skew note: both operators sort each key's rows inside one task.  A single
pathological key (one user with 10^9 events) is a straggler by definition of
the operation — cap per-key history upstream or pre-bucket by time range;
salting does not apply to order-dependent windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap_seconds: int = 1800, out: str = "session_id") -> DataFrame:
    """Append a session id: a new session starts when the gap to the user's
    previous event exceeds ``gap_seconds``.  ``session_id`` =
    ``"{user}#{k}"`` with k counting the user's sessions in time order."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ timestamps can't cast straight to long; route through timestamp
    # (session tz is UTC) — epoch seconds either way
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(epoch).over(w)
    new_sess = F.when(
        prev.isNull() | (epoch - prev > gap_seconds),
        F.lit(1)).otherwise(F.lit(0))
    idx = F.sum(new_sess).over(
        Window.partitionBy(user_col).orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(out, F.concat(F.col(user_col).cast("string"),
                                       F.lit("#"), idx.cast("string")))


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str] | None = None) -> DataFrame:
    """As-of (latest-≤) join: every ``left`` row gains the ``value_cols`` of
    the most recent ``right`` row with the same ``on`` key and
    ``right.ts <= left.ts`` (NULLs when no such row).

    Tie-break: a right row AT the left row's timestamp matches (inclusive),
    and among right rows sharing (key, ts) the values of the one sorted last
    win — pre-aggregate the right side if that ambiguity matters.

    The right side's value columns travel as ONE struct through the window
    (``last(struct, ignorenulls)`` skips only the left rows' NULL
    placeholder): a matched right row is taken whole — genuine NULLs inside
    its value columns survive, and the output never stitches columns from
    two different right rows.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]
    left_cols = left.columns
    clash = set(value_cols) & set(left_cols)
    if clash:
        raise ValueError(f"value_cols clash with left columns: {sorted(clash)}")
    reserved = {"_is_l", "_rv"} & (set(left_cols) | set(value_cols))
    if reserved:
        raise ValueError(f"columns clash with reserved names: {sorted(reserved)}")
    # NULL keys and NULL timestamps never match (equi/ASOF-join semantics):
    # a window partition would otherwise group the NULL keys together, and a
    # NULL-ts right row would sort FIRST (NULLS FIRST) and leak its values
    # into left rows with no true ts<=left.ts match.  Left rows with NULL ts
    # also sort first and therefore see no carried values → NULL outputs,
    # matching "NULL comparison never matches" on the left side too.
    right = right.filter(F.col(on).isNotNull() & F.col(ts).isNotNull())
    rv = F.struct(*[F.col(c) for c in value_cols])
    null_rv = F.lit(None).cast(
        "struct<" + ", ".join(f"`{c}`: {right.schema[c].dataType.simpleString()}"
                              for c in value_cols) + ">")
    l_tag = left.select("*", F.lit(1).alias("_is_l"), null_rv.alias("_rv"))
    r_tag = right.select(
        F.col(on), F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, ts)],
        F.lit(0).alias("_is_l"), rv.alias("_rv"),
    ).select(*l_tag.columns)  # align column order
    u = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (⇒ inclusive ≤ semantics)
    w = (Window.partitionBy(on).orderBy(F.col(ts), F.col("_is_l"))
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        *left_cols, "_is_l",
        F.last(F.col("_rv"), ignorenulls=True).over(w).alias("_rv"),
    )
    return (filled.filter(F.col("_is_l") == 1)
            .select(*left_cols, *[F.col(f"_rv.{c}").alias(c) for c in value_cols]))


def funnel_depth(df: DataFrame, user_col: str, ts_col: str, type_col: str,
                 steps: list[str], out: str = "depth") -> DataFrame:
    """Funnel analysis: per user, the deepest stage of ``steps`` reached **in
    order with strictly increasing timestamps** (view → click → purchase …).
    Returns one row per user with ``out`` ∈ [0, len(steps)].

    Greedy-earliest matching (take the first event completing each stage) is
    depth-optimal, so the result is well-defined; ties at the same timestamp
    never chain (strict >), and the answer is partitioning-invariant.
    Output has one row per user **with at least one step event** — users
    whose events are all non-step types are absent (left-join the user
    universe back if a depth-0 row per user is needed).

    Plan shape: filter to step events only (pushed to the scan), ONE shuffle
    to group by user, then a single Catalyst ``aggregate`` fold over each
    user's time-sorted (ts, type) structs — whole-stage-codegen'd, no
    Python, state is one (depth, last_ts) struct per user.  Per-user event
    counts bound the array; a user with billions of step events would need
    pre-thinning (keep first occurrence per (user, type, coarse window)),
    documented rather than hidden.
    """
    if not steps:
        raise ValueError("funnel_depth needs at least one step")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    # NULL-ts events are dropped up front (mirroring asof_join): a NULL
    # first-step ts would match stage 1 via the d==0 bypass and then
    # permanently block later stages, diverging from a min(ts)-cascade
    # oracle that ignores NULLs
    evs = (df.filter(F.col(type_col).isin(list(steps))
                     & F.col(ts_col).isNotNull())
           .groupBy(F.col(user_col))
           .agg(F.sort_array(F.collect_list(F.struct(
               F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))).alias("_evs")))
    # null last-ts sentinel (not an arbitrary date floor): the first stage
    # matches unconditionally, later stages need strictly increasing ts
    ts_type = df.schema[ts_col].dataType.simpleString()
    init = F.struct(F.lit(0).alias("d"),
                    F.lit(None).cast(ts_type).alias("t"))
    fold = F.aggregate(
        "_evs", init,
        lambda acc, e: F.when(
            (acc["d"] < n)
            & (e["et"] == F.element_at(steps_arr, acc["d"] + 1))
            & ((acc["d"] == 0) | (e["ts"] > acc["t"])),
            F.struct((acc["d"] + 1).alias("d"), e["ts"].alias("t")),
        ).otherwise(acc),
    )
    return evs.select(user_col, fold["d"].cast("int").alias(out))


_CELL_SHIFT = 1 << 62  # keeps epoch micros positive so `div` == floor


def _checked_suffix_rename(op: str, this: DataFrame, other: DataFrame,
                           need_this: list[str], need_other: list[str],
                           reserved: set[str], rsuffix: str) -> dict[str, str]:
    """Shared validation + rename map for the Δ-cell joins: required
    columns present on both sides, no reserved working names anywhere,
    and the suffixed other-side names collide with nothing."""
    for c in need_this:
        if c not in this.columns:
            raise ValueError(f"{op}: points/left side has no column {c!r}")
    for c in need_other:
        if c not in other.columns:
            raise ValueError(f"{op}: intervals/right side has no column {c!r}")
    bad = reserved & (set(this.columns) | set(other.columns))
    if bad:
        raise ValueError(f"{op}: input columns clash with reserved working "
                         f"names {sorted(bad)}")
    ren = {c: (c + rsuffix if c in this.columns else c) for c in other.columns}
    clash = (set(ren.values()) & set(this.columns)) | (
        set() if len(set(ren.values())) == len(ren) else {rsuffix})
    if clash:
        raise ValueError(f"{op}: rsuffix {rsuffix!r} produces right-side "
                         f"names clashing with the left side: {sorted(clash)}")
    return ren


def range_join(left: DataFrame, right: DataFrame, on: str, ts: str,
               delta_seconds: float, right_ts: str | None = None,
               rsuffix: str = "_r") -> DataFrame:
    """Band join: every (left, right) pair with the same ``on`` key and
    ``|left.ts − right.ts| ≤ delta_seconds`` ("clicks within an hour of a
    purchase").  The naive theta-join is a per-key cross product Spark
    plans as BroadcastNestedLoopJoin — O(n·m) comparisons per key; this
    formulation buckets time into Δ-wide cells: each left row lands in its
    cell, each right row is emitted to its cell and both neighbours, and
    an **equi-join on (key, cell)** meets every qualifying pair exactly
    once (in the left row's cell, since ``|lt−rt| ≤ Δ ⟹ |cell_l − cell_r|
    ≤ 1``).  Plan: explode(3) → SortMergeJoin → integer filter; candidate
    volume is the true band density, never the cross product.

    Timestamps compare as integer epoch **microseconds** on both sides, so
    the boundary is exact and engine-portable (DuckDB mirror:
    ``abs(epoch_us(l.ts) − epoch_us(r.ts)) <= Δ·10⁶``).  Right-side
    columns whose names clash with the left's are suffixed ``rsuffix``;
    NULL keys/timestamps drop (SQL join semantics).
    """
    delta_us = int(round(delta_seconds * 1_000_000))
    if delta_us <= 0:
        raise ValueError("delta_seconds must be positive")
    rt = right_ts or ts
    ren = _checked_suffix_rename(
        "range_join", left, right, [on, ts], [on, rt],
        {"_lus", "_rus", "_cell"}, rsuffix)
    r = right.select(*[F.col(c).alias(n) for c, n in ren.items()])
    r_on, r_ts = ren[on], ren[rt]

    l_us = F.unix_micros(F.col(ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(r_ts).cast("timestamp"))
    lcell = F.expr(f"(_lus + {_CELL_SHIFT}L) div {delta_us}")
    rcell = F.expr(f"(_rus + {_CELL_SHIFT}L) div {delta_us}")

    lf = (left.filter(F.col(on).isNotNull() & F.col(ts).isNotNull())
          .withColumn("_lus", l_us).withColumn("_cell", lcell))
    rf = (r.filter(F.col(r_on).isNotNull() & F.col(r_ts).isNotNull())
          .withColumn("_rus", r_us)
          .withColumn("_cell", F.explode(F.array(rcell - 1, rcell, rcell + 1))))
    joined = lf.join(rf, (lf[on] == rf[r_on]) & (lf["_cell"] == rf["_cell"]))
    return (joined.filter(F.abs(F.col("_lus") - F.col("_rus")) <= delta_us)
            .drop("_lus", "_rus", "_cell", r_on))


def interval_join(points: DataFrame, intervals: DataFrame, on: str, ts: str,
                  start: str, end: str, max_len_seconds: float,
                  rsuffix: str = "_r") -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with the same
    ``on`` key and ``start ≤ point.ts ≤ end`` (inclusive) — "which session
    window does this purchase fall in".  Same Δ-cell trick as
    :func:`range_join` with Δ = ``max_len_seconds``: an interval no longer
    than Δ spans at most two cells, so each interval is emitted to (at
    most) those two distinct cells, each point lands in exactly its own
    cell, and the (key, cell) equi-join meets every qualifying pair
    exactly once.  Boundaries compare as integer epoch microseconds.

    ``max_len_seconds`` is a correctness contract: intervals longer than
    it are DROPPED with their pairs (they would span more cells than they
    are emitted to) — size it to the true maximum (a session cap, an SLA
    window) and enforce upstream.  Degenerate intervals (``end < start``)
    match nothing, like SQL BETWEEN.
    """
    delta_us = int(round(max_len_seconds * 1_000_000))
    if delta_us <= 0:
        raise ValueError("max_len_seconds must be positive")
    ren = _checked_suffix_rename(
        "interval_join", points, intervals, [on, ts], [on, start, end],
        {"_pus", "_sus", "_eus", "_cell"}, rsuffix)
    iv = intervals.select(*[F.col(c).alias(n) for c, n in ren.items()])
    i_on, i_s, i_e = ren[on], ren[start], ren[end]

    p_us = F.unix_micros(F.col(ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(i_s).cast("timestamp"))
    e_us = F.unix_micros(F.col(i_e).cast("timestamp"))
    pcell = F.expr(f"(_pus + {_CELL_SHIFT}L) div {delta_us}")
    scell = F.expr(f"(_sus + {_CELL_SHIFT}L) div {delta_us}")
    ecell = F.expr(f"(_eus + {_CELL_SHIFT}L) div {delta_us}")

    pf = (points.filter(F.col(on).isNotNull() & F.col(ts).isNotNull())
          .withColumn("_pus", p_us).withColumn("_cell", pcell))
    ivf = (iv.filter(F.col(i_on).isNotNull() & F.col(i_s).isNotNull()
                     & F.col(i_e).isNotNull())
           .withColumn("_sus", s_us).withColumn("_eus", e_us)
           # the length contract; degenerate (end<start) intervals match
           # nothing anyway — drop them BEFORE the explode and shuffle
           .filter((F.col("_sus") <= F.col("_eus"))
                   & (F.col("_eus") - F.col("_sus") <= delta_us))
           .withColumn("_cell", F.explode(F.array_distinct(F.array(scell, ecell)))))
    joined = pf.join(ivf, (pf[on] == ivf[i_on]) & (pf["_cell"] == ivf["_cell"]))
    return (joined.filter((F.col("_pus") >= F.col("_sus"))
                          & (F.col("_pus") <= F.col("_eus")))
            .drop("_pus", "_sus", "_eus", "_cell", i_on))
