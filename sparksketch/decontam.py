"""Benchmark decontamination + deterministic dataset splits.

Two operators every LLM training pipeline runs right before materializing a
dataset:

- **decontamination** — flag training docs whose char-n-gram shingles
  overlap an evaluation benchmark.  The benchmark's shingle set becomes a
  Bloom filter (the library's centerpiece): zero false negatives mean a
  contaminated doc can NEVER slip through; false positives only quarantine
  extra docs at the configured FPR.  The probe side never shuffles text —
  shingles explode JVM-side, hashes are JVM columns, the only shuffle is
  the per-doc (id, counts) aggregation with map-side combine.
- **hash_split** — stable train/val/test assignment by content hash, so the
  split survives reshuffles, re-crawls, and engine changes.  Uses md5 hex
  prefix compared as a STRING against fixed-width thresholds (lexicographic
  == numeric for fixed-width hex), which any engine reproduces bit-for-bit
  — the DuckDB oracle runs the same CASE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksketch.bloom import BloomConfig, BloomFilterState, build_bloom, with_membership


def shingle_strings(col: str, shingle: int = 8, max_chars: int = 4096) -> Column:
    """Distinct char-``shingle``-gram array of a text column, JVM-side
    (``col`` is a column NAME — the expression references it twice)."""
    capped = f"substring(`{col}`, 1, {max_chars})"
    return F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(length({capped}) - {shingle - 1}, 1)),"
        f" i -> substring({capped}, i, {shingle}))"))


def benchmark_filter(benchmark: DataFrame, col: str, shingle: int = 8,
                     max_chars: int = 4096, cfg: BloomConfig | None = None,
                     **build_kwargs) -> BloomFilterState:
    """Bloom filter over the benchmark's distinct shingles.  Benchmarks are
    small relative to training corpora, so the filter broadcasts."""
    from sparksketch.config import Accuracy
    from sparksketch.dedup import _parallelize_small
    cfg = cfg or BloomConfig(accuracy=Accuracy.HIGH)
    sh = _parallelize_small(benchmark.select(F.col(col))).select(
        F.explode(shingle_strings(col, shingle, max_chars)).alias("_sh")).distinct()
    return build_bloom(sh, "_sh", cfg, **build_kwargs)


def contamination(df: DataFrame, col: str, id_col: str, state: BloomFilterState,
                  shingle: int = 8, max_chars: int = 4096,
                  threshold: float = 0.5, probe: str = "all") -> DataFrame:
    """Per-doc contamination against the benchmark filter:
    (id, n_shingles, n_hits, ratio, contaminated).

    Zero FN of the filter ⇒ every truly-overlapping shingle counts, so
    ``ratio`` never underestimates; FPs inflate it by at most the filter's
    FPR (drive it down with Accuracy.HIGH — it's a small filter).

    ``probe="all"`` (default) probes every shingle occurrence through the
    shuffle-free broadcast path.  ``probe="distinct"`` probes each
    globally-distinct shingle ONCE and joins the flags back per occurrence
    on the filter's own 128-bit base-hash pair — membership is a pure
    function of (h1, h2), so this is bit-identical to probing every
    occurrence while cutting the Python-UDF volume by the corpus's
    shingle-sharing factor.  It pays two extra 16 B/row shuffles (distinct
    + join), so it only wins when sharing is high (boilerplate n-grams
    repeating across millions of crawl docs — measured on the driver corpus
    sharing is ~1.05× and "all" is 2× faster; on template-heavy corpora the
    sharing factor is 100×+ and "distinct" wins)."""
    from sparksketch.bloom import _membership_probe_udf, hash_probe_cols
    from sparksketch.dedup import _parallelize_small
    # a single-file input would run the whole shingle explode on one core —
    # spread small-partition-count inputs to the cluster's parallelism first
    # (the explode dominates this operator's cost, not the probe)
    sh = _parallelize_small(df.select(F.col(id_col), F.col(col))).select(
        F.col(id_col),
        F.explode(shingle_strings(col, shingle, max_chars)).alias("_sh"))
    if probe == "distinct":
        ha, hb = hash_probe_cols(F.col("_sh").cast("string"))
        hashed = sh.select(F.col(id_col), ha.alias("_ha"), hb.alias("_hb"))
        flags = (hashed.select("_ha", "_hb").distinct()
                 .withColumn("is_member",
                             _membership_probe_udf(df.sparkSession, state)("_ha", "_hb")))
        flagged = hashed.join(flags, ["_ha", "_hb"])
    elif probe == "all":
        flagged = with_membership(sh, "_sh", state)
    else:
        raise ValueError(f"unknown probe mode {probe!r}")
    agg = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.sum(F.col("is_member").cast("long")).alias("n_hits"),
    )
    ratio = F.col("n_hits") / F.col("n_shingles")
    return agg.select(
        id_col, "n_shingles", "n_hits",
        F.round(ratio, 6).alias("ratio"),
        (ratio >= threshold).alias("contaminated"),
    )


def decontaminate(df: DataFrame, col: str, id_col: str, benchmark: DataFrame,
                  bench_col: str | None = None, shingle: int = 8,
                  max_chars: int = 4096, threshold: float = 0.5,
                  **kwargs) -> DataFrame:
    """Drop training docs contaminated against ``benchmark`` (end-to-end).
    ``shingle`` and ``max_chars`` apply to BOTH the benchmark filter and the
    probe side — mismatched shingle sets would silently break the zero-FN
    promise (probe shingles the filter never saw)."""
    state = benchmark_filter(benchmark, bench_col or col, shingle,
                             max_chars=max_chars, **kwargs)
    flags = contamination(df, col, id_col, state, shingle,
                          max_chars=max_chars, threshold=threshold)
    # anti-join on the CONTAMINATED ids: docs with NULL text produce no
    # shingle rows and are absent from `flags` entirely — they cannot be
    # contaminated and must survive (a semi-join on the clean ids would
    # silently drop them)
    bad = flags.filter(F.col("contaminated")).select(id_col)
    return df.join(bad, id_col, "left_anti")


# ====================================================================
# deterministic splits
# ====================================================================

def _hex_threshold(cum: float) -> str:
    """Fixed-width lowercase hex of floor(cum · 2^32) — string comparison
    against an md5 prefix is then exactly the numeric bucket comparison."""
    return format(min(int(cum * 2**32), 2**32 - 1), "08x")


def split_expr(col: str | Column, fractions: dict[str, float], out_default: str | None = None) -> Column:
    """The split-assignment expression: md5-hex-prefix thresholding.
    ``fractions`` preserve insertion order; they must sum to ≤ 1 and the
    remainder (if any) goes to ``out_default`` (error if None and sum < 1)."""
    total = sum(fractions.values())
    if total > 1 + 1e-9:
        raise ValueError("split fractions sum to more than 1")
    if total < 1 - 1e-9 and out_default is None:
        raise ValueError("fractions sum below 1 needs out_default for the remainder")
    c = F.col(col) if isinstance(col, str) else col
    prefix = F.substring(F.md5(F.encode(c.cast("string"), "UTF-8")), 1, 8)
    expr = None
    cum = 0.0
    branches = []
    for name, frac in fractions.items():
        cum += frac
        branches.append((name, _hex_threshold(cum)))
    expr = F.when(prefix < F.lit(branches[0][1]), F.lit(branches[0][0]))
    for name, thr in branches[1:]:
        expr = expr.when(prefix < F.lit(thr), F.lit(name))
    return expr.otherwise(F.lit(out_default if out_default is not None
                                else branches[-1][0]))


def hash_split(df: DataFrame, col: str, fractions: dict[str, float],
               out: str = "split", out_default: str | None = None) -> DataFrame:
    """Append a stable split label keyed on content: the same key lands in
    the same split in any engine, any run, any partitioning (md5 is the
    deliberate choice over xxhash64 here — the oracle and any other system
    can reproduce it)."""
    return df.withColumn(out, split_expr(col, fractions, out_default))


def split_sql_case(col: str, fractions: dict[str, float], out_default: str | None = None) -> str:
    """The ANSI-SQL CASE equivalent of :func:`split_expr` (for oracles and
    other engines)."""
    cum = 0.0
    parts = []
    for name, frac in fractions.items():
        cum += frac
        parts.append(f"WHEN substring(md5({col}), 1, 8) < '{_hex_threshold(cum)}' THEN '{name}'")
    default = out_default if out_default is not None else list(fractions)[-1]
    return "CASE " + " ".join(parts) + f" ELSE '{default}' END"


# ====================================================================
# stratified sampling (training-mix rebalancing)
# ====================================================================

def sample_flag(strata_col: str, key_col: str, fractions: dict[str, float],
                default: float = 1.0, salt: str = "mix") -> Column:
    """Boolean keep-flag for deterministic **stratified sampling**: each
    stratum keeps its configured fraction of rows, decided by an md5-prefix
    threshold over ``stratum|salt|key`` — reshuffle/partition/engine
    invariant (the rebalancing pass that downweights overrepresented
    sources in a training mix).  The stratum and a salt participate in the
    hash so the decision is independent of :func:`hash_split` on the same
    key (same-md5 correlation would otherwise make the sample a biased
    slice of one split).  Unlisted strata keep ``default`` (1.0 = all).
    NULL stratum/key hash as empty strings — deterministic, never NULL."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} outside [0, 1]: {frac}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction outside [0, 1]: {default}")
    sc = F.coalesce(F.col(strata_col).cast("string"), F.lit(""))
    kc = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    prefix = F.substring(
        F.md5(F.encode(F.concat(sc, F.lit(f"|{salt}|"), kc), "UTF-8")), 1, 8)
    def hit_for(frac: float) -> Column:
        # frac >= 1 must keep ALL rows: _hex_threshold clamps to 'ffffffff'
        # and a strict < would silently drop the ~1-in-4.3B rows whose md5
        # prefix is exactly that value
        if frac >= 1.0:
            return F.lit(True)
        return prefix < F.lit(_hex_threshold(frac))

    expr = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        expr = F.when(cond, hit_for(frac)) if expr is None else expr.when(cond, hit_for(frac))
    fallback = hit_for(default)
    return fallback if expr is None else expr.otherwise(fallback)


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      fractions: dict[str, float], default: float = 1.0,
                      salt: str = "mix") -> DataFrame:
    """Filter ``df`` to the deterministic stratified sample (see
    :func:`sample_flag`).  Pure JVM expression — the filter pushes down to
    the scan, no shuffle, no RNG state; at 100 TB this is a predicate, not
    a job."""
    return df.filter(sample_flag(strata_col, key_col, fractions, default, salt))


def sample_sql_pred(strata_col: str, key_col: str, fractions: dict[str, float],
                    default: float = 1.0, salt: str = "mix") -> str:
    """ANSI-SQL predicate mirroring :func:`sample_flag` (for oracles and
    other engines)."""
    sc = f"coalesce(CAST({strata_col} AS VARCHAR), '')"
    kc = f"coalesce(CAST({key_col} AS VARCHAR), '')"
    prefix = f"substring(md5({sc} || '|{salt}|' || {kc}), 1, 8)"

    def hit_for(frac: float) -> str:
        if frac >= 1.0:
            return "TRUE"
        return f"{prefix} < '{_hex_threshold(frac)}'"

    branches = " ".join(
        f"WHEN {strata_col} = '{name}' THEN {hit_for(frac)}"
        for name, frac in fractions.items())
    return (f"CASE {branches} ELSE {hit_for(default)} END"
            if branches else hit_for(default))


def quota_sample(df: DataFrame, strata_col: str, key_col: str,
                 n: int | dict[str, int], default_n: int | None = None,
                 salt: str = "quota", n_buckets: int = 1) -> DataFrame:
    """Deterministic per-stratum **quota** sampling: keep exactly the ``n``
    rows per stratum whose ``md5(stratum|salt|key)`` ranks smallest — a
    uniform-without-replacement sample of fixed size (the absolute-count
    complement to :func:`stratified_sample`'s fractions; "cap every source
    at 1M docs" is this operator).  Reshuffle/engine invariant; strata with
    fewer than ``n`` rows keep everything.  ``n`` may be a per-stratum dict
    (unlisted strata keep ``default_n``; None = unlimited).

    Plan shape: rank-by-hash needs per-group order statistics, i.e. a
    window sort per stratum.  With ``n_buckets > 1`` the sort is two-phase:
    rows first compete inside ``(stratum, hash_bucket)`` sub-groups (all
    buckets sort in parallel), and only the ``n_buckets × n`` survivors
    enter the final per-stratum window — so a 10^9-row hot stratum never
    lands on one reducer.  Phase 1 keeps ``n`` per bucket, which can only
    under-prune (every global winner also wins its bucket), never changes
    the result."""
    reserved = {"_rk", "_rn", "_rn1"} & set(df.columns)
    if reserved:
        raise ValueError(f"quota_sample: input columns clash with reserved "
                         f"working names {sorted(reserved)}")
    sc = F.coalesce(F.col(strata_col).cast("string"), F.lit(""))
    kc = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    rk = F.md5(F.encode(F.concat(sc, F.lit(f"|{salt}|"), kc), "UTF-8"))
    if isinstance(n, dict):
        quota = None
        for name, q in n.items():
            cond = F.col(strata_col) == name
            quota = F.when(cond, q) if quota is None else quota.when(cond, q)
        quota = quota.otherwise(F.lit(default_n))
    else:
        quota = F.lit(int(n))
    from pyspark.sql import Window as _W
    out = df.withColumn("_rk", rk)
    if n_buckets > 1:
        bucket = F.pmod(F.xxhash64("_rk"), F.lit(n_buckets))
        w1 = _W.partitionBy(F.col(strata_col), bucket).orderBy("_rk", key_col)
        out = (out.withColumn("_rn1", F.row_number().over(w1))
               .filter(quota.isNull() | (F.col("_rn1") <= quota)).drop("_rn1"))
    w = _W.partitionBy(strata_col).orderBy("_rk", key_col)
    return (out.withColumn("_rn", F.row_number().over(w))
            .filter(quota.isNull() | (F.col("_rn") <= quota)).drop("_rn", "_rk"))


def uniform_sample_k(df: DataFrame, key_col: str, k: int,
                     salt: str = "unif") -> DataFrame:
    """Deterministic **global** fixed-size-``k`` uniform sample: the ``k``
    rows whose ``md5(salt|key)`` ranks smallest — uniform without
    replacement, reshuffle/engine invariant, no RNG state (the complement to
    :func:`quota_sample`'s per-stratum quotas; "pull 10k docs for a manual
    eval set" is this operator).

    Determinism requires ``key_col`` to be unique and non-null per row
    (the tie-break is the key itself): rows sharing a key — including
    multiple NULLs, which all rank as ``''`` — tie exactly, and which of
    them survives a boundary at rank k is engine/run dependent.

    Plan shape: ``orderBy(rank).limit(k)`` is planned as
    ``TakeOrderedAndProject`` — every partition keeps only its own top-``k``
    and the driver merges ``partitions × k`` candidates; there is never a
    global sort or a rangepartitioning Exchange, so the cost at 100 TB is
    one scan + ``P·k`` tiny rows (proven in-plan by the pytest)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if "_rk" in df.columns:
        raise ValueError("uniform_sample_k: input column clashes with "
                         "reserved working name '_rk'")
    from sparksketch.hashing import rank_key_col
    return (df.withColumn("_rk", rank_key_col(key_col, salt))
            .orderBy("_rk", key_col).limit(int(k)).drop("_rk"))


def uniform_sample_sql(table: str, cols: str, key_col: str, k: int,
                       salt: str = "unif") -> str:
    """ANSI-SQL mirror of :func:`uniform_sample_k` for oracles."""
    from sparksketch.hashing import rank_key_sql
    return (f"SELECT {cols} FROM {table} "
            f"ORDER BY {rank_key_sql(key_col, salt)}, {key_col} LIMIT {int(k)}")


def quota_sql_pred(strata_col: str, key_col: str, n: int,
                   salt: str = "quota") -> str:
    """QUALIFY-style oracle fragment for :func:`quota_sample` with a scalar
    quota: ``row_number() OVER (...) <= n`` over the identical rank key."""
    sc = f"coalesce(CAST({strata_col} AS VARCHAR), '')"
    kc = f"coalesce(CAST({key_col} AS VARCHAR), '')"
    rk = f"md5({sc} || '|{salt}|' || {kc})"
    return (f"row_number() OVER (PARTITION BY {strata_col} "
            f"ORDER BY {rk}, {key_col}) <= {int(n)}")


def pps_flag(weight_col: str, key_col: str, rate: float,
             salt: str = "pps") -> Column:
    """Boolean keep-flag for deterministic **probability-proportional-to-
    size** (Poisson/PPS) sampling: row ``i`` is kept with probability
    ``p_i = min(1, rate · w_i)`` — the token-weighted sampling a training
    mix uses ("sample documents proportional to their token count").

    Deterministic and engine-portable like :func:`sample_flag`: the uniform
    draw is the row's ``md5(salt|key)`` 8-hex prefix; the per-row threshold
    is ``floor(p_i · 2^32)`` rendered as fixed-width lowercase hex, so the
    string comparison IS the numeric one.  ``rate · w`` and the ``· 2^32``
    scaling are single IEEE double operations — bit-identical across
    engines — and ``w ≥ 1/rate`` rows short-circuit to TRUE (a strict
    ``< 'ffffffff'`` would drop the 1-in-4.3B max-prefix rows).

    Rows with NULL or non-positive weight are never kept (p = 0).  At
    100 TB this is a pushed-down predicate: no shuffle, no RNG state, and
    re-running on a reshuffled table keeps the identical rows.
    """
    if rate <= 0:
        raise ValueError(f"rate must be positive, got {rate}")
    kc = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    prefix = F.substring(
        F.md5(F.encode(F.concat(F.lit(f"{salt}|"), kc), "UTF-8")), 1, 8)
    w = F.col(weight_col).cast("double")
    thr_int = F.floor(w * F.lit(float(rate)) * F.lit(4294967296.0)).cast("long")
    thr_hex = F.lower(F.lpad(F.hex(thr_int), 8, "0"))
    return (F.when(w.isNull() | (w <= 0), F.lit(False))
            .when(w * F.lit(float(rate)) >= 1.0, F.lit(True))
            .otherwise(prefix < thr_hex))


def pps_sample(df: DataFrame, weight_col: str, key_col: str, rate: float,
               salt: str = "pps", ht_weight: str | None = None) -> DataFrame:
    """Filter to the deterministic PPS sample (see :func:`pps_flag`).
    ``ht_weight`` optionally appends the Horvitz–Thompson inverse-inclusion
    weight ``1 / p_i`` so downstream sums over the sample stay unbiased
    estimates of population totals.

    Quantization note: the REALIZED inclusion probability is
    ``floor(p_i · 2^32) / 2^32`` (the hex-threshold comparison), while the
    HT weight uses the un-quantized ``1 / p_i`` — a ≤ 2^-32 relative bias
    in downstream population estimates, kept deliberately: the exact-double
    ``1 / min(rate·w, 1)`` is reproducible term-for-term in ANSI SQL (the
    driver's hash gate), whereas the quantized form would thread the 2^32
    scaling through every consumer for a bias far below sampling noise."""
    out = df.filter(pps_flag(weight_col, key_col, rate, salt))
    if ht_weight is not None:
        w = F.col(weight_col).cast("double")
        out = out.withColumn(
            ht_weight, F.lit(1.0) / F.least(w * F.lit(float(rate)), F.lit(1.0)))
    return out


def pps_sql_pred(weight_col: str, key_col: str, rate: float,
                 salt: str = "pps") -> str:
    """ANSI-SQL predicate mirroring :func:`pps_flag` term-for-term (DuckDB
    ``hex`` is uppercase like Spark's — both sides lower-case it)."""
    if rate <= 0:
        raise ValueError(f"rate must be positive, got {rate}")
    kc = f"coalesce(CAST({key_col} AS VARCHAR), '')"
    prefix = f"substring(md5('{salt}|' || {kc}), 1, 8)"
    w = f"CAST({weight_col} AS DOUBLE)"
    thr = (f"lower(lpad(hex(CAST(floor({w} * {rate!r} * 4294967296.0) "
           f"AS BIGINT)), 8, '0'))")
    return (f"CASE WHEN {weight_col} IS NULL OR {w} <= 0 THEN FALSE "
            f"WHEN {w} * {rate!r} >= 1.0 THEN TRUE "
            f"ELSE {prefix} < {thr} END")


# ====================================================================
# data-mixture composition (budget + epochs)
# ====================================================================

def mix_to_budget(df: DataFrame, proportions: dict[str, float], budget: int,
                  source_col: str = "source", key_col: str = "doc_id",
                  weight_col: str | None = None, salt: str = "mixbudget",
                  epoch_col: str = "epoch") -> DataFrame:
    """Compose a training mixture: materialize each listed source at its
    target share of a total ``budget`` (rows, or ``weight_col`` units such
    as tokens), REPEATING under-represented sources across epochs — the
    mixing step of an LLM data pipeline ("web 60%, code 25%, books 15% of
    a 2T-token budget", where books may need 3 epochs).

    Deterministic and engine-exact, no RNG state: for each source,
    ``target = (budget·ppm) div 10^6`` (proportions quantized to ppm),
    ``n_full = target div avail`` whole epochs pass through unconditionally,
    and the one partial epoch keeps rows by the repo's md5-prefix idiom —
    threshold ``(rem·2^32) div avail`` as fixed-width hex, computed in
    EXACT integer arithmetic (driver-side Python here, HUGEINT in the
    DuckDB oracle), so the keep set is reproducible bit-for-bit in any
    engine.  With ``weight_col`` the partial epoch hits the token target in
    expectation (row granularity); rows-mode likewise.  Sources absent from
    ``proportions`` (or absent from the data) are dropped.

    Returns ``df``'s rows replicated with an ``epoch`` column (0-based).
    Plan shape at 100 TB: one tiny per-source aggregate (the only driver
    scalar), then a single scan with a JVM ``explode(sequence)`` + pushed
    filter — no shuffle of data rows at all.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    for s, p in proportions.items():
        if p < 0:
            raise ValueError(f"proportion for {s!r} negative: {p}")
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    avail_rows = (df.groupBy(source_col).agg(F.sum(w).alias("a")).collect())
    avail = {r[0]: int(r.a) for r in avail_rows if r[0] is not None and r.a}
    plan: dict[str, tuple[int, str]] = {}
    for s, p in proportions.items():
        a = avail.get(s, 0)
        ppm = round(p * 1_000_000)
        if a <= 0 or ppm <= 0:
            continue
        target = (budget * ppm) // 1_000_000
        n_full = target // a
        rem = target - n_full * a
        plan[s] = (n_full, f"{(rem << 32) // a:08x}")
    if not plan:
        return (df.withColumn(epoch_col, F.lit(0).cast("long"))
                .filter(F.lit(False)))
    nf = None
    thr = None
    for s, (n_full, thr_hex) in plan.items():
        cond = F.col(source_col) == s
        nf = F.when(cond, n_full) if nf is None else nf.when(cond, n_full)
        thr = F.when(cond, thr_hex) if thr is None else thr.when(cond, thr_hex)
    sc = F.coalesce(F.col(source_col).cast("string"), F.lit(""))
    kc = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    prefix = F.substring(
        F.md5(F.encode(F.concat(sc, F.lit(f"|{salt}|"), kc), "UTF-8")), 1, 8)
    out = (df.filter(F.col(source_col).isin(list(plan)))
           .withColumn("_nf", nf.cast("long"))
           .withColumn("_thr", thr)
           .withColumn(epoch_col,
                       F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nf"))))
           .filter((F.col(epoch_col) < F.col("_nf")) | (prefix < F.col("_thr")))
           .drop("_nf", "_thr"))
    return out
