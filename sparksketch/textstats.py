"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All hot-path expressions are JVM built-ins (codegen'd, pushdown-friendly);
only the rolling-hash fingerprint drops to a vectorized Arrow kernel.
Each operator is deliberately simple and *exactly specified* so the DuckDB
oracle can reproduce it (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "como"],
    "pt": ["o", "que", "não", "uma", "com", "para", "por", "mais", "dos", "como"],
}


def tokens_col(col: str | Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokens_col(col)).cast("long")


def bpe_ish_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation marks each
    count separately (a cheap regex proxy for BPE tokenizers)."""
    c = F.col(col) if isinstance(col, str) else col
    boundary = (r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"
                r"|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])")
    return F.size(
        F.filter(F.split(c, boundary), lambda t: F.trim(t) != "")
    ).cast("long")


# char-class alphabets for translate()-based counting — translate is a plain
# char map, ~10× cheaper than regexp_replace and exactly reproducible in
# DuckDB (same PostgreSQL delete-unmatched semantics)
ALPHA_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
DIGIT_CHARS = "0123456789"
SPACE_CHARS = " \t\n\r\x0b\x0c"
PUNCT_CHARS = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def _class_count(c: Column, chars: str) -> Column:
    return (F.length(c) - F.length(F.translate(c, chars, ""))).cast("long")


def _with_lower_tokens(df: DataFrame, col: str) -> tuple[DataFrame, str]:
    """Append the LOWERCASED whitespace-token array as one named column in
    its own projection, returning ``(df2, tmp_name)``.

    Why a real column instead of inlining the expression per consumer:
    since SPARK-36718 Catalyst's CollapseProject refuses to inline a
    non-cheap alias the upper project references more than once, so every
    downstream use (6 array_intersects + 2 sizes in the quality/lang
    pipeline) reads the SAME materialized array — one regex split + one
    lowercase pass per row instead of one per consumer.  Value-equivalence
    with the previous ``transform(split(trim(text)), lower)`` form:
    lowercasing maps no character to or from ``\\s`` (Java ``\\s`` is the
    six ASCII whitespace chars, all caseless, and no uppercase letter
    lowercases into one), so ``split(lower(x))`` and element-wise
    ``lower(split(x))`` produce identical arrays, and the empty/NULL guard
    fires identically (lower preserves emptiness and NULL)."""
    tmp = "_sk_toks_lower"
    while tmp in df.columns:
        tmp += "_"
    lowered = F.trim(F.lower(F.col(col)))
    toksl = F.when(F.length(lowered) == 0,
                   F.array().cast("array<string>")).otherwise(
        F.split(lowered, r"\s+"))
    return df.withColumn(tmp, toksl), tmp


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Appends deterministic quality-scoring features:

    - n_chars, n_tokens, mean_token_len
    - alpha_ratio / digit_ratio / punct_ratio / space_ratio (char classes,
      translate-counted)
    - stopword_ratio (distinct English stopwords present / tokens)
    - quality_score in [0,1]: penalizes too-short/too-long docs, low alpha
      ratio, missing stopwords
    """
    c = F.col(col)
    d2, tmp = _with_lower_tokens(df, col)
    toks = F.col(tmp)
    n_chars = F.length(c).cast("long")
    n_tokens = F.size(toks).cast("long")
    nz = F.greatest(n_chars, F.lit(1)).cast("double")
    alpha = _class_count(c, ALPHA_CHARS) / nz
    digit = _class_count(c, DIGIT_CHARS) / nz
    space = _class_count(c, SPACE_CHARS) / nz
    punct = _class_count(c, PUNCT_CHARS) / nz
    stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(toks, stops))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1)).cast("double")
    mean_tok = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        F.least(alpha * F.lit(1.25), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * F.lit(0.3)
        + length_ok * F.lit(0.2)
        + F.when((mean_tok >= 3) & (mean_tok <= 12), F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return (
        d2.withColumn("n_chars_t", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", F.round(mean_tok, 4))
        .withColumn("alpha_ratio", F.round(alpha, 4))
        .withColumn("digit_ratio", F.round(digit, 4))
        .withColumn("space_ratio", F.round(space, 4))
        .withColumn("punct_ratio", F.round(punct, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("quality_score", F.round(score, 4))
        .drop(tmp)
    )


def lang_hits(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-language stopword hit counts (h_en, h_de, …): the number of
    *distinct* stopwords of each language present in the lowercased tokens.
    Exact integers, oracle-reproducible (DuckDB list_intersect)."""
    d2, tmp = _with_lower_tokens(df, col)
    toks = F.col(tmp)
    out = d2
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out = out.withColumn(f"h_{lang}", F.size(F.array_intersect(toks, arr)).cast("long"))
    return out.drop(tmp)


def lang_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-vote language heuristic: the language with the most distinct
    stopword hits wins; ties break by fixed priority order (en > de > fr >
    es > pt); zero hits → 'und'.  Deterministic, JVM-only, reproducible in
    ANSI SQL (a CASE chain over the hit counts — see
    __spark_entry__.oracle_sql).

    Implementation notes: a single array_max over (hits, priority) structs —
    a withColumn-per-language CASE chain gets its hit subexpressions inlined
    once per comparison by Catalyst's CollapseProject, blowing the plan up
    ~25×; one expression tree keeps each hit count computed once.  The token
    array itself lives in its own lower projection
    (:func:`_with_lower_tokens`) so the regex split + lowercase run once per
    row, not once per language."""
    langs = list(LANG_STOPWORDS)
    d2, tmp = _with_lower_tokens(df, col)
    toks = F.col(tmp)
    scores = []
    for i, (lang, words) in enumerate(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.array_intersect(toks, arr))
        scores.append(F.struct(hits.alias("hits"), F.lit(len(langs) - i).alias("prio")))
    best = F.array_max(F.array(*scores))
    names = F.array(*[F.lit(l) for l in reversed(langs)])  # prio 1 = last lang
    pred = F.when(best["hits"] > 0, F.element_at(names, best["prio"])).otherwise(F.lit("und"))
    return d2.withColumn(out, pred).drop(tmp)


def char_class_counts(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact integer char-class counts (the features behind the quality
    ratios) — integer-exact, so the DuckDB oracle can reproduce them
    bit-for-bit: (id, n_chars_t, n_alpha, n_digit, n_space, n_punct)."""
    c = F.col(col)
    return df.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_chars_t"),
        _class_count(c, ALPHA_CHARS).alias("n_alpha"),
        _class_count(c, DIGIT_CHARS).alias("n_digit"),
        _class_count(c, SPACE_CHARS).alias("n_space"),
        _class_count(c, PUNCT_CHARS).alias("n_punct"),
    )


def fingerprint_md5(col: str | Column) -> Column:
    """Exact-content fingerprint (md5 hex) — oracle-checkable in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.encode(c, "UTF-8"))


def rolling_fingerprint(df: DataFrame, col: str, id_col: str, window: int = 8,
                        keep: int = 4) -> DataFrame:
    """Winnowing-style robust fingerprint: the ``keep`` smallest of the
    rolling-window polynomial hashes of the byte stream, xor-folded to one
    int64.  Stable under content reordering at window granularity."""

    def fn(batches):
        for batch in batches:
            ids = batch.column("_id")
            arr = batch.column("_t")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[: off[-1]].astype(np.uint64)
            n = len(arr)
            out = np.zeros(n, dtype=np.uint64)
            B = np.uint64(1099511628211)
            # rolling polynomial hash over the flat byte buffer, windows that
            # cross document boundaries are masked out per row below
            if data.size >= window:
                h = np.zeros(data.size - window + 1, dtype=np.uint64)
                for j in range(window):
                    h = h * B + data[j : data.size - window + 1 + j]
                # scoped errstate: the scalar fold's uint64 wraparound is
                # the hash arithmetic, not an error worth warning about
                with np.errstate(over="ignore"):
                    for i in range(n):
                        s, e = off[i], off[i + 1]
                        if e - s >= window:
                            hw = h[s : e - window + 1]
                            k = min(keep, hw.size)
                            sel = np.partition(hw, k - 1)[:k]
                            acc = np.uint64(0xCBF29CE484222325)
                            for v in np.sort(sel):
                                acc = (acc ^ v) * B
                            out[i] = acc
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out.view(np.int64))], names=["_id", "fingerprint"]
            )

    from sparksketch.dedup import _parallelize_small
    proj = _parallelize_small(
        df.select(F.col(id_col).cast("long").alias("_id"), F.col(col).cast("string").alias("_t")))
    return proj.mapInArrow(fn, "_id long, fingerprint bigint").withColumnRenamed("_id", id_col)


# ====================================================================
# repetition features (Gopher/C4-style quality filters)
# ====================================================================

def repetition_features(df: DataFrame, col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition signals — the standard "repetitious document"
    quality filters from the Gopher / C4 data pipelines (Rae et al. 2021
    §A1.1; Raffel et al. 2020 §2.2), exactly specified for oracle parity:

    - ``n_lines`` / ``dup_line_ratio`` — fraction of newline-separated
      lines that repeat an earlier line (1 − distinct/total; 0 for empty
      docs).  Boilerplate nav/footer text shows up here.
    - ``top_2gram_count`` / ``top_2gram_ratio`` — occurrences of the most
      frequent word 2-gram over total 2-grams (mode tie-break:
      lexicographically smallest gram, so the choice is deterministic in
      any engine).  Machine-generated spam shows up here.

    Shapes: the line features are pure JVM array expressions (zero
    shuffle).  The 2-gram mode is explode → groupBy(id, gram) → ONE
    map-side-combined groupBy(id) with the argmax-with-min-tie-break
    aggregate ``min(struct(-count, gram))`` (order-independent, so rank by
    count desc / gram asc without a window's exchange+sort) and the
    per-doc total in the same aggregate.  At 100 TB the explode ships only
    (id, 2-gram) pairs, never documents, and the map-side combine
    collapses repeated grams before the shuffle.
    """
    c = F.col(col)
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("long")
    dup_line_ratio = F.when(
        F.length(c) == 0, F.lit(0.0)
    ).otherwise(1.0 - F.size(F.array_distinct(lines)) / n_lines)
    base = df.select(
        F.col(id_col), n_lines.alias("n_lines"),
        F.round(dup_line_ratio, 4).alias("dup_line_ratio"),
    )

    toks = tokens_col(c)
    grams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                   F.slice(toks, 2, F.size(toks) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)))
    g = df.select(F.col(id_col), F.explode(grams).alias("_g"))
    counts = g.groupBy(id_col, "_g").count()
    top = (counts.groupBy(id_col)
           .agg(F.min(F.struct((-F.col("count")).alias("_nc"),
                               F.col("_g"))).alias("_best"),
                F.sum("count").alias("_total"))
           .select(id_col,
                   (-F.col("_best._nc")).cast("long").alias("top_2gram_count"),
                   F.round((-F.col("_best._nc")) / F.col("_total"), 4)
                   .alias("top_2gram_ratio")))
    return (base.join(top, id_col, "left")
            .na.fill({"top_2gram_count": 0, "top_2gram_ratio": 0.0}))


# ====================================================================
# PII scrubbing
# ====================================================================

# engine-portable patterns: character classes + BOUNDED repetition + \b only
# (no backreferences/lookarounds/possessives, so Java regex (Spark) and RE2
# (DuckDB) match identically).  The email pattern is \b-anchored and
# RFC-bounded ({1,64} local / {1,255} host) deliberately: an UNBOUNDED
# `[class]+@` is O(len²) in a backtracking engine on a long run of
# local-part characters with no '@' (a 1 MiB such page costs ~10^12 char
# ops — measured as a multi-minute stall on this corpus' oversize rows),
# while with \b every in-run start position fails in O(1), making the whole
# scan linear.  RE2 is linear either way; the bounds keep semantics
# identical across engines.
PII_PATTERNS: list[tuple[str, str]] = [
    # email before phone: the local part's digits would otherwise be eaten
    (r"\b[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(col: str | Column) -> Column:
    """Redact emails, IPv4 addresses, and phone-number-shaped digit runs to
    typed placeholders — the standard pre-training scrub pass.  Patterns are
    deliberately RE2-safe (see ``PII_PATTERNS``) so the exact same regexes
    run in Spark's Java engine and the DuckDB oracle with identical
    leftmost-match semantics; all three rewrites are JVM ``regexp_replace``
    (codegen'd, no Python in the path)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_pii_sql(col: str) -> str:
    """The DuckDB-dialect expression mirroring :func:`scrub_pii` (for
    oracles and other engines)."""
    expr = col
    for pat, repl in PII_PATTERNS:
        sq = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sq}', '{repl}', 'g')"
    return expr


# ====================================================================
# tf-idf top terms
# ====================================================================

def top_terms(df: DataFrame, col: str = "text", id_col: str = "doc_id",
              k: int = 5, min_token_len: int = 2,
              idf: str = "ratio") -> DataFrame:
    """Per-document top-``k`` distinguishing terms by tf-idf.  Terms are
    lowercased whitespace tokens of length ≥ ``min_token_len``.

    ``idf='log'`` is the textbook smooth idf ``ln((N+1)/(df+1)) + 1``;
    ``idf='ratio'`` scores ``tf·(N+1)/(df+1)`` instead — chosen for oracle
    work because +,·,/ are IEEE-exactly specified (bit-identical in any
    engine) while ``ln`` is only correctly-rounded-ish and may differ by an
    ulp between libm implementations, which could flip a rank at the k
    boundary.  Both are deterministic within one engine; ties break by term.

    Plan shape: tokens explode to (id, term) pairs (never documents), tf =
    one map-side-combined groupBy, document frequency reuses the tf result
    (second tiny aggregation), one term-keyed join, one per-doc window.
    The corpus size N is the only driver-side scalar.
    """
    if idf not in ("ratio", "log"):
        raise ValueError(f"idf must be 'ratio' or 'log', got {idf!r}")
    n_docs = df.count()
    toks = tokens_col(F.lower(F.col(col)))
    pairs = df.select(F.col(id_col), F.explode(toks).alias("term")) \
              .filter(F.length("term") >= min_token_len)
    tf = pairs.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(dft, "term")
    if idf == "ratio":
        score = F.col("tf") * (F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))
    else:
        score = F.col("tf") * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0))
    from pyspark.sql import Window as _W
    w = _W.partitionBy(id_col).orderBy(F.desc("_score"), F.col("term"))
    return (scored.withColumn("_score", score)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(id_col, "term", F.col("tf").cast("long").alias("tf"), "df",
                    F.round("_score", 4).alias("score"),
                    F.col("_rn").cast("int").alias("rank")))


MAX_WORD_CHARS = 4096  # over-long-token guard shared with sparksketch.bpe


def bm25_topk(df: DataFrame, query_terms: list[str], col: str = "text",
              id_col: str = "doc_id", k: int = 10, k1: float = 1.2,
              b: float = 0.75, idf: str = "ratio") -> DataFrame:
    """BM25 retrieval scoring (Robertson & Zaragoza 2009) of every document
    against a FIXED small query-term set — the ranked-retrieval primitive a
    training pipeline uses for query-based filtering and targeted
    decontamination.  Returns the top-``k`` ``(doc_id, score)`` by
    ``score = Σ_t idf(t) · tf_t·(k1+1) / (tf_t + k1·(1−b+b·len/avglen))``.

    ``idf='ratio'`` scores ``(N−df+0.5)/(df+0.5)`` (the BM25 idf without
    the ``ln``) — same rationale as :func:`top_terms`: +,·,/ are
    IEEE-exactly specified, so ranking cannot flip between engines;
    ``idf='log'`` is the textbook ``ln(1 + ratio)``.  Terms are the
    same lowercased whitespace tokens as every other textstats operator.

    Plan shape (the 100-TB story): query terms are literals in the
    expression tree, never a table.  Pass 1 — ONE map-side-combined
    aggregate row (N, Σlen, per-term document frequency via
    ``array_contains``).  Pass 2 — per-doc score entirely in whole-stage
    codegen (``size(filter(tokens, = t))`` per term, a fixed-size chain of
    +,·,/), then a TakeOrdered top-k.  No explode, no shuffle wider than
    the single stats row and partitions×k winners."""
    if idf not in ("ratio", "log"):
        raise ValueError(f"idf must be 'ratio' or 'log', got {idf!r}")
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    toks = tokens_col(F.lower(F.col(col)))
    base = df.select(F.col(id_col), toks.alias("_t"),
                     F.size(toks).alias("_dl"))
    stats = base.agg(
        F.count("*").alias("n"), F.sum("_dl").alias("total_len"),
        *[F.sum(F.array_contains("_t", t).cast("long")).alias(f"df_{i}")
          for i, t in enumerate(terms)]).first()
    n = int(stats.n)
    avglen = float(stats.total_len) / n if n else 1.0
    dfs = {t: int(stats[f"df_{i}"]) for i, t in enumerate(terms)}
    def _tf(term: str):
        # NB: F.filter dispatches on lambda ARITY (2 params = element+index),
        # so bind the term via a closure, never a default argument
        return F.size(F.filter("_t", lambda x: x == F.lit(term))).cast("double")

    tfs = [_tf(t) for t in terms]
    score = _bm25_score_expr(terms, tfs, F.col("_dl").cast("double"),
                             n, avglen, dfs, k1, b, idf)
    return (base.select(F.col(id_col), F.round(score, 4).alias("score"))
            .orderBy(F.desc("score"), id_col).limit(k))


def _bm25_score_expr(terms: list[str], tfs: list, dl, n: int, avglen: float,
                     dfs: dict[str, int], k1: float, b: float, idf: str):
    """The fixed per-term BM25 accumulation chain, shared by the direct
    scorer (:func:`bm25_topk`) and the persisted-index scorer
    (:func:`bm25_index_topk`) so both produce the IDENTICAL float64
    expression tree — same literals, same term order, same +,·,/ sequence —
    and therefore bit-identical scores.  ``tfs`` are double Columns aligned
    with the sorted ``terms``; ``dl`` is the double doc-length Column."""
    score = F.lit(0.0)
    for t, tf in zip(terms, tfs):
        ratio = (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5)
        w = ratio if idf == "ratio" else math.log1p(ratio)
        score = score + F.lit(float(w)) * (
            tf * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b)
                                 + F.lit(b) * dl / F.lit(avglen))))
    return score


def write_bm25_index(df: DataFrame, path: str, col: str = "text",
                     id_col: str = "doc_id", n_buckets: int = 64,
                     max_word_chars: int = MAX_WORD_CHARS) -> dict[str, int]:
    """Persist an inverted index for repeated BM25 retrieval — the scale
    path when MANY query-term sets run against the same corpus: the direct
    :func:`bm25_topk` scans every document per query batch, the index
    answers from ``|terms|/n_buckets`` of a 30-50× smaller postings table.

    Layout under ``path``:

    - ``postings/`` — ``(term, doc_id, tf)`` partitioned by
      ``bucket = pmod(xxhash64(term), n_buckets)``: a query reads ONLY its
      terms' buckets (``PartitionFilters`` prune the rest unread);
    - ``doclens/`` — ``(doc_id, dl)`` (dl = whitespace token count);
    - ``stats/`` — one row ``(n, total_len)``.

    Terms truncate to ``max_word_chars`` pre-shuffle (the n-gram shuffle-key
    guard; real query terms are far shorter, so scores for them are
    unaffected).  Build cost: one tokenize+explode pass for the postings;
    doclens come from a second column-pruned scan of the corpus with ZERO
    shuffle (``dl = size(tokens)``, which equals the old Σ tf over the
    doc's postings exactly — every token contributes one posting occurrence
    — without re-reading the postings table, its doc-keyed re-shuffle, or
    the id join; zero-token and NULL docs coalesce to ``dl = 0`` as
    before).  The stats row aggregates the tiny doclens table.  Returns
    ``{"n": ..., "total_len": ..., "n_buckets": ...}``."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession
    toks = tokens_col(F.lower(F.col(col)))
    postings = (df.select(F.col(id_col).alias("doc_id"),
                          F.explode(toks).alias("_w"))
                .select("doc_id", _cap_str(F.col("_w"), max_word_chars).alias("term"))
                .groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
                .withColumn("bucket", F.pmod(F.xxhash64("term"),
                                             F.lit(n_buckets)).cast("int")))
    # cluster by bucket BEFORE the dynamic-partition write: without it every
    # write task keeps n_buckets open writers and the fan-out dominates
    # (measured 54 s → 7 s at 50k docs / 1.4M postings).  Write parallelism
    # caps at n_buckets — size n_buckets ≥ cluster parallelism at scale.
    postings.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket").parquet(f"{path}/postings")
    (df.select(F.col(id_col).alias("doc_id"),
               F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("dl"))
     .write.mode("overwrite").parquet(f"{path}/doclens"))
    stats = (spark.read.parquet(f"{path}/doclens")
             .agg(F.count("*").cast("long").alias("n"),
                  F.sum("dl").cast("long").alias("total_len")).first())
    spark.createDataFrame([(int(stats.n), int(stats.total_len or 0))],
                          "n long, total_len long").write.mode(
        "overwrite").parquet(f"{path}/stats")
    return {"n": int(stats.n), "total_len": int(stats.total_len or 0),
            "n_buckets": n_buckets}


def bm25_index_topk(spark, path: str, query_terms: list[str],
                    n_buckets: int = 64, k: int = 10, k1: float = 1.2,
                    b: float = 0.75, idf: str = "ratio") -> DataFrame:
    """BM25 top-k from a persisted :func:`write_bm25_index` — bit-identical
    scores to :func:`bm25_topk` over the same corpus (shared
    :func:`_bm25_score_expr` chain; pytest asserts row-for-row equality),
    but the scan is ONLY the query terms' postings buckets.

    Plan shape: postings read carries ``bucket IN (...)`` as a partition
    filter (pruned at file listing, nothing else read) + ``term IN (...)``
    pushed to parquet; per-term document frequencies come from the same
    pruned read; matched docs pivot to per-term tf columns via conditional
    aggregation, join doclens (id-keyed, only matched ids), score in
    codegen, TakeOrdered.  When fewer than ``k`` docs match any term, the
    remaining slots fill with zero-score docs (smallest ids) exactly like
    the direct ranking's tail."""
    if idf not in ("ratio", "log"):
        raise ValueError(f"idf must be 'ratio' or 'log', got {idf!r}")
    if not query_terms:
        raise ValueError("bm25_index_topk needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    st = spark.read.parquet(f"{path}/stats").first()
    n = int(st.n)
    avglen = float(st.total_len) / n if n else 1.0
    doclens = spark.read.parquet(f"{path}/doclens")
    post = _read_postings(spark, path, terms, n_buckets)
    dfs = {r.term: int(r.df) for r in
           post.groupBy("term").agg(F.count("*").alias("df")).collect()}
    pivoted = post.groupBy("doc_id").agg(
        *[F.coalesce(F.sum(F.when(F.col("term") == t, F.col("tf"))),
                     F.lit(0)).cast("double").alias(f"_tf_{i}")
          for i, t in enumerate(terms)])
    tfs = [F.col(f"_tf_{i}") for i in range(len(terms))]
    score = _bm25_score_expr(terms, tfs, F.col("dl").cast("double"),
                             n, avglen, dfs, k1, b, idf)
    matched = (pivoted.join(doclens, ["doc_id"])
               .select("doc_id", F.round(score, 4).alias("score"))
               .orderBy(F.desc("score"), "doc_id").limit(k))
    rows = matched.collect()  # ≤ k rows — the TakeOrdered result itself
    # re-wrap the collected winners so the returned DataFrame doesn't
    # re-execute the TakeOrdered when the caller materializes it
    matched = spark.createDataFrame(rows, matched.schema)
    if len(rows) < k or any(r.score <= 0.0 for r in rows):
        # zero-score tail: the direct ranking orders ALL zero-score docs by
        # doc_id, so pool the k smallest non-matched ids alongside the
        # matched rows (a matched score can round to 0.0000 and then
        # tie-break by id against non-matched docs) and re-rank the pool —
        # the true top-k is provably inside it
        zeros = (doclens.join(post.select("doc_id").distinct(),
                              ["doc_id"], "left_anti")
                 .select("doc_id", F.lit(0.0).alias("score"))
                 .orderBy("doc_id").limit(k))
        matched = matched.union(zeros)
    return matched.orderBy(F.desc("score"), "doc_id").limit(k)


def _read_postings(spark, path: str, terms: list[str],
                   n_buckets: int) -> DataFrame:
    """The pruned postings read: ``bucket IN (...)`` is a PARTITION filter
    (unmatched buckets never listed, let alone read) and ``term IN (...)``
    pushes to the parquet scan.  Factored out so the plan property is
    directly testable."""
    buckets = sorted({_term_bucket(t, n_buckets) for t in terms})
    return (spark.read.parquet(f"{path}/postings")
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(terms)))


def _term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side mirror of ``pmod(xxhash64(term), n_buckets)`` via the
    shared pure-Python XXH64 replica — bucket routing must match what the
    build wrote.  Spark reports the hash SIGNED; Python ``%`` on the
    sign-converted value is exactly ``pmod``."""
    from sparksketch.hashing import spark_xxhash64
    h = spark_xxhash64(term)
    if h >= 1 << 63:
        h -= 1 << 64
    return h % n_buckets


def _bigrams_col(toks: Column) -> Column:
    """``array<struct<a,b>>`` of adjacent token pairs; <2 tokens → empty.

    ``arrays_zip(slice(toks, 1, n-1), slice(toks, 2, n-1))`` — TWO row-level
    array copies + one zip, not a per-element lambda: higher-order functions
    (``transform`` + ``struct`` + ``element_at``) run INTERPRETED per
    element in Spark, and the lambda formulation measured 33 s vs 2.4 s for
    this zip over 17.5M bigrams at 500k pages (round-5 lesson, same family
    as the substring-in-transform trap)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.arrays_zip(F.slice(toks, 1, n - 1).alias("a"),
                     F.slice(toks, 2, n - 1).alias("b")),
    ).otherwise(F.expr("CAST(array() AS array<struct<a:string,b:string>>)"))


def _cap_str(c: Column, max_word_chars: int | None) -> Column:
    """Truncate a scalar token column to ``max_word_chars`` — real crawls
    carry MB-scale unbroken runs, and an uncapped token becomes an
    MB-sized SHUFFLE KEY in every n-gram table.  Applied post-explode on
    the scalar (whole-stage codegen), never as a per-element array lambda
    (interpreted).  ``substring(t, 1, k)`` from position 1 is one O(k)
    scan, not the O(len²) mid-string trap.  No-op at or under the cap."""
    if not max_word_chars:
        return c
    return F.substring(c, 1, int(max_word_chars))


def bigram_counts(df: DataFrame, col: str = "text",
                  max_word_chars: int = MAX_WORD_CHARS) -> DataFrame:
    """Corpus-wide adjacent-token-pair counts ``(a, b, c_ab)`` — the
    sufficient statistic of an MLE bigram language model.  One map-side-
    combined aggregation over exploded (a, b) pairs; shuffle volume is the
    distinct-bigram set, never documents.  Tokens truncate to
    ``max_word_chars`` pre-shuffle (:func:`_cap_str` — keeps junk runs
    from becoming MB-sized shuffle keys; documented deviation, exactly
    mirrored by the oracle's ``t[1:k]``)."""
    toks = tokens_col(F.lower(F.col(col)))
    return (df.select(F.explode(_bigrams_col(toks)).alias("_bg"))
            .select(_cap_str(F.col("_bg.a"), max_word_chars).alias("a"),
                    _cap_str(F.col("_bg.b"), max_word_chars).alias("b"))
            .groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab")))


def pmi_top_pairs(df: DataFrame, col: str = "text", k: int = 20,
                  min_count: int = 5,
                  max_word_chars: int = MAX_WORD_CHARS) -> DataFrame:
    """Top-``k`` adjacent word associations by PMI — the collocation /
    multi-word-expression mining step of a text pipeline (Church & Hanks
    1990), ranked ENGINE-EXACTLY: instead of ``ln`` (not IEEE-specified
    cross-engine), the rank key is the raw probability ratio

        lift(a, b) = p(a,b) / (p(a,·)·p(·,b)) = (c_ab·T) / (c_a·c_b)

    which is monotone in PMI and uses only ·,/ on doubles cast from exact
    BIGINTs — bit-identical in any engine (the ``top_terms`` idf='ratio'
    rationale).  ``c_a``/``c_b`` are the left/right marginal totals and
    ``T`` the total bigram count, all derived FROM the bigram table — no
    second corpus scan.  Pairs below ``min_count`` occurrences drop (rare
    pairs have unreliable, explosively-large lifts).

    Returns ``(a, b, c_ab, lift)`` ordered by (lift desc, a, b), ``lift``
    rounded to 6 places.  100-TB plan: the only doc-wide shuffle is
    :func:`bigram_counts`' distinct-bigram aggregation; the marginals are
    two map-side-combined aggs over that far smaller table; ``T`` rides as
    a broadcast one-row cross join; winners via TakeOrdered."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    cab = bigram_counts(df, col, max_word_chars=max_word_chars)
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    cb = cab.groupBy("b").agg(F.sum("c_ab").cast("long").alias("c_b"))
    tot = cab.agg(F.sum("c_ab").cast("long").alias("_T"))
    lift = ((F.col("c_ab").cast("double") * F.col("_T").cast("double"))
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double")))
    return (cab.filter(F.col("c_ab") >= min_count)
            .join(ca, ["a"]).join(cb, ["b"])
            .crossJoin(F.broadcast(tot))
            .select("a", "b", "c_ab", F.round(lift, 6).alias("lift"))
            .orderBy(F.desc("lift"), "a", "b").limit(k))


def lm_bigram_score(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                    train_df: DataFrame | None = None,
                    scale: int = 1_000_000,
                    max_word_chars: int = MAX_WORD_CHARS) -> DataFrame:
    """Bigram-LM quality score per document — the perplexity-style filter a
    training pipeline runs over a crawl (score against a trusted corpus,
    drop the tail), with an **engine-exact integer formulation**: no ``ln``,
    no cross-row float sums (both are how LM scores usually go
    oracle-unverifiable; cf. ``top_terms`` idf='ratio').

    The model is MLE: ``p(b|a) = c_ab / c_a`` with ``c_a = Σ_b c_ab``
    (predecessor mass, so probabilities normalize), trained on
    ``train_df`` (default: ``df`` itself — self-perplexity).  Each bigram
    position contributes the integer cell ``(scale·c_ab) div c_a`` — Spark
    ``div`` ≡ DuckDB ``//`` on non-negative longs, so the floor is
    bit-identical in any engine — and a document's ``lm_score`` is the
    plain BIGINT sum of its cells (order-independent, unlike float sums).
    Unseen bigrams/predecessors contribute 0.  Returns one row per input
    document: ``(doc_id, n_bigrams, lm_score)``; callers rank by the exact
    ratio ``lm_score / (scale·n_bigrams)`` (mean transition probability;
    higher = more predictable text).

    Plan shape (100 TB story): bigram extraction is a linear JVM
    ``transform`` (array indexing, not the O(len²) substring trap); doc
    pairs collapse to ``(doc_id, a, b, cnt)`` BEFORE joining (map-side
    combine bounds the join fanout by distinct-bigrams-per-doc); the model
    is two map-side-combined aggregations; scoring is one (a, b)-keyed
    shuffle join — bigram keys are finer than unigrams, so stopword skew
    is bounded — plus one a-keyed join of the far smaller predecessor
    table, then one doc_id aggregation.  Nothing shuffles document text,
    and tokens truncate to ``max_word_chars`` pre-shuffle (:func:`_cap_str`)
    so junk runs cannot become MB-sized shuffle keys — the oracle mirrors
    the truncation with ``t[1:k]``.
    Reference parity: beyond the reference (filter.rs is membership only);
    standard pipeline surface (quality filtering, Wenzek et al. 2020
    CCNet's LM filter, here with an exactly-checkable score)."""
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    toks = tokens_col(F.lower(F.col(col)))
    doc_pairs = (df.select(F.col(id_col), F.explode(_bigrams_col(toks)).alias("_bg"))
                 .select(id_col,
                         _cap_str(F.col("_bg.a"), max_word_chars).alias("a"),
                         _cap_str(F.col("_bg.b"), max_word_chars).alias("b"))
                 .groupBy(id_col, "a", "b").agg(F.count("*").cast("long").alias("_cnt")))
    cab = bigram_counts(train_df if train_df is not None else df, col,
                        max_word_chars=max_word_chars)
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    cell = F.expr(f"({scale} * c_ab) div c_a")
    scored = (doc_pairs.join(cab, ["a", "b"], "left").join(ca, ["a"], "left")
              .groupBy(id_col)
              .agg(F.sum("_cnt").cast("long").alias("n_bigrams"),
                   F.sum(F.col("_cnt") * F.coalesce(cell, F.lit(0)))
                   .cast("long").alias("lm_score")))
    return (df.select(id_col).join(scored, [id_col], "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
                    F.coalesce("lm_score", F.lit(0)).cast("long").alias("lm_score")))
