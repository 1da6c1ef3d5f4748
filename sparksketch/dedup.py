"""Deduplication operators for large-scale training-data pipelines.

Five dedup families over a document table, each designed for the 100 TB
shape (minimal shuffles, JVM-side hashing, blob-sized intermediates):

- **exact** — one ``groupBy(content_hash)`` with ``min(id)`` (single shuffle
  of (hash, id) pairs, never the text).
- **MinHash + LSH** — char-shingle hashes JVM-side (``transform`` +
  ``xxhash64``), affine permutations + banding in a vectorized Arrow kernel
  (uint64 wrap-around, which ANSI-mode JVM arithmetic would reject),
  candidates via band-bucket groupBy, estimated Jaccard via signature join.
- **SimHash** — 64-bit token-weighted signature, Hamming-ball candidates via
  4×16-bit block banding.
- **n-gram Jaccard** — exact verification on candidate pairs (the expensive
  step, run only on the LSH-filtered set).
- **embedding cosine** — see sparksketch.similarity (sign-LSH buckets +
  exact rerank).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksketch.hashing import to_u64

_MERSENNE61 = (1 << 61) - 1


def _parallelize_small(df: DataFrame, min_bytes: int = 128 * 1024) -> DataFrame:
    """Heavy Arrow kernels run one task per input partition, so a
    single-file input would serialize the whole kernel on one core.  Spread
    it to the cluster's parallelism when (a) there are fewer partitions than
    cores AND (b) the optimizer's size estimate says there is enough data to
    amortize the extra tasks (tiny test tables stay single-task — spreading
    500 rows over 32 workers costs more in task/worker spin-up than the
    kernel saves).  At scale (thousands of input splits) this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = min_bytes  # unknown → assume worth spreading
    return df.repartition(target) if size >= min_bytes else df


def _flat_list(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ListArray → (flat uint64 values sliced to the array's window,
    per-row start offsets, per-row lengths). Handles sliced arrays whose
    offset buffers are absolute into the child."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values
    import pyarrow.compute as pc
    values = pc.fill_null(values, 0)
    flat_all = to_u64(values.to_numpy(zero_copy_only=False))
    flat = flat_all[offsets[0] : offsets[-1]]
    starts = offsets[:-1] - offsets[0]
    lengths = np.diff(offsets)
    return flat, starts, lengths


def _as_list_array(mat: np.ndarray, width: int) -> pa.ListArray:
    """(n, width) uint64 matrix → array<bigint> column."""
    n = mat.shape[0]
    flat = np.ascontiguousarray(mat).ravel().view(np.int64)
    offs = pa.array(np.arange(0, (n + 1) * width, width, dtype=np.int32))
    return pa.ListArray.from_arrays(offs, pa.array(flat, pa.int64()))


# ====================================================================
# exact dedup
# ====================================================================

def exact_dedup_ids(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Representative (min id) per distinct content → DataFrame(id).
    One shuffle of (fingerprint, id); text never moves.  The fingerprint is
    128-bit md5 — at 10^12 docs a 64-bit hash would silently delete tens of
    thousands of non-duplicates (birthday bound n²/2^65); 128 bits makes
    collisions negligible (~10^-15)."""
    return (
        df.select(F.md5(F.encode(F.col(col).cast("string"), "UTF-8")).alias("_ch"), F.col(id_col))
        .groupBy("_ch").agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def exact_dedup(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Full rows, one representative per distinct content (lowest id)."""
    keep = exact_dedup_ids(df, col, id_col)
    return df.join(keep, id_col, "left_semi")


# ====================================================================
# MinHash + LSH
# ====================================================================

def _shingle_hash_col(col: str, shingle: int, max_chars: int) -> F.Column:
    """Char-``shingle``-gram xxhash64 array, computed entirely JVM-side.
    Docs are capped at ``max_chars`` for shingling (standard practice; a
    1 MB doc would otherwise produce 10^6 shingles per row)."""
    capped = f"substring({col}, 1, {max_chars})"
    return F.expr(
        f"transform(sequence(1, greatest(length({capped}) - {shingle - 1}, 1)),"
        f" i -> xxhash64(substring({capped}, i, {shingle})))"
    )


def _shingle_window_hashes(arr: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """String column → (window-hash uint64 array gathered per row, per-row
    start offsets into it, per-row window counts).

    Byte-level n-gram hashing as one vectorized polynomial roll over the
    column's flat UTF-8 buffer + a splitmix64 finalizer — zero per-shingle
    JVM string allocations (a `transform(sequence, xxhash64(substring))`
    formulation allocates one JVM String per shingle; at 20M shingles the
    GC pressure dominated the whole pipeline)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    # slice the value buffer to this array's window BEFORE rebasing offsets
    # (a sliced array has off[0] > 0; keeping absolute data with relative
    # offsets would hash bytes shifted off[0] to the left)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]].astype(np.uint64)
    off = off - off[0]
    lens = np.diff(off)
    B = np.uint64(0x100000001B3)
    if data.size >= n:
        W = np.zeros(data.size - n + 1, dtype=np.uint64)
        for j in range(n):
            W = W * B + data[j : data.size - n + 1 + j]
    else:
        W = np.zeros(0, dtype=np.uint64)
    win_counts = np.where(lens >= n, lens - n + 1, np.where(lens > 0, 1, 0)).astype(np.int64)
    g_starts = np.concatenate(([0], np.cumsum(win_counts)))
    total = int(g_starts[-1])
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), win_counts)
    pos = np.arange(total, dtype=np.int64) - g_starts[row_of] + off[:-1][row_of]
    sel = W[np.minimum(pos, max(W.size - 1, 0))] if W.size else np.zeros(total, dtype=np.uint64)
    # rows shorter than the window: hash their own bytes (window would cross
    # into the next row); rare, so a scalar loop is fine.  uint64 wraparound
    # is the hash's modular arithmetic — scoped errstate keeps the intended
    # overflow silent so a REAL numeric regression elsewhere stays loud
    short = np.flatnonzero((lens > 0) & (lens < n))
    with np.errstate(over="ignore"):
        for i in short:
            h = np.uint64(0)
            for byte in data[off[i] : off[i + 1]]:
                h = h * B + byte
            sel[g_starts[i]] = h
    from sparksketch.hashing import splitmix64
    return splitmix64(sel), g_starts[:-1], win_counts


def _minhash_kernel(num_perm: int, bands: int, seed: int, shingle: int):
    rows_per_band = num_perm // bands
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE61, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE61, num_perm, dtype=np.uint64)

    def fn(batches):
        for batch in batches:
            ids = batch.column("_id")
            flat, starts, counts = _shingle_window_hashes(batch.column("_t"), shingle)
            n = batch.num_rows
            sig = np.zeros((num_perm, n), dtype=np.uint64)
            if flat.size:
                # affine permutation per hash function; wrap-around mod 2^64
                # over splitmix64-finalized window hashes
                nonempty = counts > 0
                ne_starts = starts[nonempty]
                for p in range(num_perm):
                    perm = flat * a[p] + b[p]
                    sig[p, nonempty] = np.minimum.reduceat(perm, ne_starts)
            # band keys: mix the band's rows into one uint64
            band_keys = np.empty((bands, n), dtype=np.uint64)
            for bi in range(bands):
                acc = np.full(n, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
                for r in range(bi * rows_per_band, (bi + 1) * rows_per_band):
                    acc = (acc ^ sig[r]) * np.uint64(0x100000001B3)
                band_keys[bi] = acc
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    _as_list_array(sig.T, num_perm),
                    _as_list_array(band_keys.T, bands),
                ],
                names=["_id", "sig", "band_keys"],
            )

    return fn


def minhash_signatures(df: DataFrame, col: str, id_col: str, num_perm: int = 64,
                       bands: int = 8, shingle: int = 5, max_chars: int = 4096,
                       seed: int = 1) -> DataFrame:
    """(id, sig array<bigint>[num_perm], band_keys array<bigint>[bands])."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    proj = _parallelize_small(df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.substring(F.col(col).cast("string"), 1, max_chars).alias("_t"),
    ))
    out = proj.mapInArrow(
        _minhash_kernel(num_perm, bands, seed, shingle),
        "_id long, sig array<bigint>, band_keys array<bigint>",
    )
    return out.withColumnRenamed("_id", id_col)


def lsh_candidates(sig_df: DataFrame, id_col: str, max_bucket: int = 256) -> DataFrame:
    """Candidate pairs (id_a < id_b) from band-bucket collisions.

    Buckets are capped at ``max_bucket`` ids BEFORE aggregation (window
    row_number, so a degenerate corpus — millions of identical docs in one
    bucket — never materializes an unbounded collect_list buffer in a single
    task).  Truncation trades recall inside pathological buckets for bounded
    memory; exact-duplicate clusters that large are better handled by
    exact_dedup first."""
    from pyspark.sql import Window as _W
    exploded = sig_df.select(
        id_col, F.posexplode("band_keys").alias("band", "key")
    )
    w = _W.partitionBy("band", "key").orderBy(id_col)
    capped = (exploded.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    buckets = capped.groupBy("band", "key").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids"),
    ).filter(F.size("ids") > 1)
    pairs = buckets.select(
        F.explode(F.expr(
            "flatten(transform(ids, (x, i) ->"
            " transform(slice(ids, i + 2, size(ids)), y -> named_struct('a', x, 'b', y))))"
        )).alias("p")
    ).select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")).distinct()
    return pairs


def signature_jaccard(pairs: DataFrame, sig_df: DataFrame, id_col: str) -> DataFrame:
    """Estimated Jaccard = fraction of equal signature positions."""
    sa = sig_df.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig_df.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    ) / F.size("sig_a")
    return joined.select("id_a", "id_b", est.cast("double").alias("est_jaccard"))


def minhash_dedup_pairs(df: DataFrame, col: str, id_col: str, threshold: float = 0.7,
                        num_perm: int = 64, bands: int = 8, shingle: int = 5,
                        seed: int = 1) -> DataFrame:
    """End-to-end near-dup pairs with estimated Jaccard ≥ threshold."""
    sig = minhash_signatures(df, col, id_col, num_perm, bands, shingle, seed=seed).cache()
    pairs = lsh_candidates(sig, id_col)
    return signature_jaccard(pairs, sig, id_col).filter(F.col("est_jaccard") >= threshold)


# ====================================================================
# n-gram Jaccard (exact, for verification of candidates)
# ====================================================================

def exact_jaccard(pairs: DataFrame, df: DataFrame, col: str, id_col: str,
                  shingle: int = 5, max_chars: int = 4096) -> DataFrame:
    """Exact char-n-gram Jaccard on candidate pairs only — the expensive
    step runs on the (tiny) LSH-filtered set, never all-pairs."""
    sh = df.select(
        F.col(id_col).cast("long").alias("_jid"),
        F.array_distinct(_shingle_hash_col(col, shingle, max_chars)).alias("_set"),
    )
    a = sh.select(F.col("_jid").alias("id_a"), F.col("_set").alias("set_a"))
    b = sh.select(F.col("_jid").alias("id_b"), F.col("_set").alias("set_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    return joined.select(
        "id_a", "id_b",
        (inter / F.greatest(union, F.lit(1))).cast("double").alias("jaccard"),
    )


# ====================================================================
# cross-document shared-substring detection
# ====================================================================

def shared_kgram_pairs(df: DataFrame, col: str = "text",
                       id_col: str = "doc_id", k: int = 24,
                       max_gram_docs: int = 64,
                       gram_key: str = "hash") -> DataFrame:
    """EXACT cross-document substring overlap: every pair of documents
    sharing at least one character ``k``-gram, with the count of distinct
    shared grams — the "memorized span" dedup case (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") that
    whole-document and near-dup operators miss: two different pages
    embedding the same 50-token boilerplate or quoted passage.

    Plan shape (all linear scans + key shuffles, no cross product):

    1. gram extraction is pure JVM — ``transform(sequence(...), i →
       substring(col, i, k))`` with ``array_distinct`` applied per doc
       BEFORE the explode, so the shuffle carries each (doc, gram) once;
    2. a frequency pass drops grams in fewer than 2 or more than
       ``max_gram_docs`` documents — the hot-gram cap bounds the self-join
       fanout at ``max_gram_docs²`` per gram (the same role as LSH's
       ``max_bucket``: site-wide boilerplate would otherwise square), and
       singleton grams (the vast majority) never reach the join;
    3. a self-equi-join on the gram key with ``id_a < id_b`` and a pair
       groupBy.

    ``gram_key="hash"`` (default) shuffles 8-byte ``xxhash64(gram)`` keys
    — the 100 TB path (a collision can only merge two gram groups, adding
    a spurious shared-gram count with probability ~pairs·2⁻⁶⁴);
    ``gram_key="exact"`` shuffles the gram strings themselves, making the
    result collision-free and exactly reproducible in ANSI SQL (the
    driver-gate mode — Spark ``substring(t, i, k)`` ≡ DuckDB
    ``t[i:i+k−1]``).  A pytest pins hash-mode ≡ exact-mode on the test
    corpus.  Returns ``(doc_a, doc_b, n_shared)``.

    Output-size envelope: the pair list is ``Σ_gram C(n_docs, 2)`` — on
    template-heavy corpora that squares even under the cap.  Use this for
    candidate inspection and targeted joins; corpus-wide duplicated-span
    ACCOUNTING (flag/trim decisions over every document) is
    :func:`kgram_dup_stats`, whose output is one row per document.

    Cost model note: the gram extraction re-runs once per consumer branch
    of the plan (the frequency pass, the semi-joined sides) — DELIBERATE:
    at corpus scale the gram set is ~16 B × total-chars rows, and
    persisting it costs more storage than re-running one vectorized
    byte-roll per scan; callers on small corpora who prefer one extraction
    can pre-materialize ``df`` themselves.
    """
    if max_gram_docs < 2:
        raise ValueError(f"max_gram_docs must be >= 2, got {max_gram_docs}")
    grams = _kgram_rows(df, col, id_col, k, gram_key)
    # the frequency pass is a COUNT groupBy (map-side combinable — a gram
    # occurring in 10⁹ docs partial-aggregates per mapper and never lands
    # as raw rows on one reducer, unlike a collect_list); survivors gate
    # the self-join via a semi-join on the gram key
    counts = grams.groupBy("_gram").agg(F.count("*").alias("_n"))
    live = (counts.filter((F.col("_n") >= 2) & (F.col("_n") <= max_gram_docs))
            .select("_gram"))
    g2 = grams.join(live, "_gram", "left_semi")
    aa = g2.select(F.col("_gram"), F.col("_id").alias("doc_a"))
    bb = g2.select(F.col("_gram"), F.col("_id").alias("doc_b"))
    pairs = (aa.join(bb, "_gram")
             .filter(F.col("doc_a") < F.col("doc_b")))
    return (pairs.groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_shared")))


def _kgram_rows(df: DataFrame, col: str, id_col: str, k: int,
                gram_key: str, sample_mod: int = 1) -> DataFrame:
    """(doc id, distinct gram) rows — shared extraction for the k-gram
    operators; distinct is applied per doc INSIDE the array before the
    explode, so each (doc, gram) ships once.

    ``sample_mod > 1`` keeps only grams whose own hash ≡ 0 (mod
    sample_mod) — CONTENT-DEFINED sampling (the winnowing/MOSES family):
    because selection depends on the gram bytes alone, two documents
    sharing a run agree on which of its grams are selected regardless of
    where the run sits in each document (absolute-position striding has no
    such guarantee).  Volume drops ×sample_mod; a shared run of length L
    is missed with probability (1 − 1/sample_mod)^(L−k+1) — e.g. mod 8
    and L ≥ k+30 ⟹ ~2% miss.  ``sample_mod=1`` is exact.  Sampling is
    hash-mode only: the selection hash is the kernel's byte-roll, and the
    exact-string mode (whose point is an ANSI-SQL-mirrorable result on
    small corpora) would select a DIFFERENT gram population — rejected
    rather than silently diverging.

    Preconditions shared by the k-gram operators: one row per document id
    (duplicate ids double-count grams against the per-doc distinct
    semantics — run exact dedup first), and the returned rows are
    recomputed per downstream consumer (see the operator docstrings for
    why that is deliberate)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if gram_key not in ("hash", "exact"):
        raise ValueError(f"unknown gram_key {gram_key!r}")
    if sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    if sample_mod > 1 and gram_key == "exact":
        raise ValueError(
            "sample_mod > 1 requires gram_key='hash': exact mode selects by "
            "xxhash64(gram) while the kernel selects by its byte-roll hash "
            "— the two sample different gram populations")
    proj = df.filter(F.length(F.col(col)) >= k).select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(col).cast("string").alias("_t"))
    if gram_key == "exact":
        # JVM string grams — collision-free and ANSI-SQL-mirrorable (the
        # oracle-gate mode).  NOTE the cost model: Spark's UTF8String
        # substring scans from byte 0 to find the char offset, so this
        # formulation is O(len²) per document — fine for the short-doc
        # gate corpus, NOT the corpus-scale path (that is "hash" below,
        # one vectorized O(len) roll per partition).
        arr = (f"transform(sequence(1, length(_t) - {k} + 1), "
               f"i -> substring(_t, i, {k}))")
        return proj.select(
            "_id", F.explode(F.expr(f"array_distinct({arr})")).alias("_gram"))

    # hash mode: byte-level k-gram rolling hashes over the Arrow buffer —
    # the minhash shingle kernel's roll (one vectorized polynomial pass +
    # splitmix64 finalizer, zero per-gram string allocations).  Byte
    # windows ≡ char windows on ASCII text (the equality pytest corpus);
    # multi-byte text hashes byte-grams — a documented deviation, the
    # operator's guarantees (same-content ⟹ same hash) are unaffected.
    mod = np.uint64(sample_mod)

    def fn(batches):
        for batch in batches:
            ids = batch.column("_id").to_numpy(zero_copy_only=False)
            hashes, starts, counts = _shingle_window_hashes(batch.column("_t"), k)
            row_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
            g = hashes
            if sample_mod > 1:
                keep = (g % mod) == 0
                g, row_of = g[keep], row_of[keep]
            if g.size:
                order = np.lexsort((g, row_of))
                rg, gg = row_of[order], g[order]
                first = np.ones(rg.size, dtype=bool)
                first[1:] = (rg[1:] != rg[:-1]) | (gg[1:] != gg[:-1])
                rg, gg = rg[first], gg[first]
            else:
                rg = np.zeros(0, dtype=np.int64)
                gg = np.zeros(0, dtype=np.uint64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[rg], pa.int64()),
                 pa.array(gg.view(np.int64), pa.int64())],
                names=["_id", "_gram"])

    return proj.mapInArrow(fn, "_id long, _gram long")


def _kgram_doc_counts(df: DataFrame, col: str, id_col: str, k: int,
                      sample_mod: int) -> DataFrame:
    """(doc_id, n_grams) for the hash-mode gram population — the per-doc
    branch of :func:`kgram_dup_stats` WITHOUT materializing gram rows: the
    kernel already computes each row's distinct sampled grams for the
    explode path, so counting them per row and emitting ONE row per doc
    ships ~n_docs rows to the (trivial) downstream sum instead of the full
    ~total-chars/sample_mod gram stream (explode + 16 B/gram shuffle +
    groupBy).  Docs with zero sampled grams are omitted, exactly as they
    are absent from the exploded rows."""
    proj = df.filter(F.length(F.col(col)) >= k).select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(col).cast("string").alias("_t"))
    mod = np.uint64(sample_mod)

    def fn(batches):
        for batch in batches:
            ids = batch.column("_id").to_numpy(zero_copy_only=False)
            hashes, starts, counts = _shingle_window_hashes(batch.column("_t"), k)
            row_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
            g = hashes
            if sample_mod > 1:
                keep = (g % mod) == 0
                g, row_of = g[keep], row_of[keep]
            if g.size:
                order = np.lexsort((g, row_of))
                rg, gg = row_of[order], g[order]
                first = np.ones(rg.size, dtype=bool)
                first[1:] = (rg[1:] != rg[:-1]) | (gg[1:] != gg[:-1])
                cnt = np.bincount(rg[first], minlength=len(ids))
            else:
                cnt = np.zeros(len(ids), dtype=np.int64)
            nz = np.flatnonzero(cnt)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[nz], pa.int64()),
                 pa.array(cnt[nz].astype(np.int64), pa.int64())],
                names=["_id", "_n"])

    # the sum-regroup keeps the degenerate duplicate-id shape identical to
    # the exploded formulation (counts add); it shuffles ~n_docs rows only
    return (proj.mapInArrow(fn, "_id long, _n long")
            .groupBy(F.col("_id").alias("doc_id"))
            .agg(F.sum("_n").alias("n_grams")))


def kgram_dup_stats(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                    k: int = 24, gram_key: str = "hash",
                    sample_mod: int = 1) -> DataFrame:
    """Corpus-scale duplicated-span accounting — the LINEAR-output
    counterpart of :func:`shared_kgram_pairs` (whose pair list is
    ``Σ_gram C(n_docs, 2)`` and squares on template-heavy corpora).

    Every distinct ``k``-gram has one WINNER (the smallest doc id
    containing it — the first-occurrence rule paragraph_dedup uses); for
    each document, ``n_dup_grams`` counts its grams whose winner is some
    other document, i.e. spans seen earlier in the corpus (Lee et al.
    2022's duplicated-span measure at gram granularity).  Emitted as
    ``(doc_id, n_grams, n_dup_grams)`` — drop or trim docs above a
    ``n_dup_grams / n_grams`` threshold downstream.

    100-TB shape — NO gram-keyed join anywhere: ``n_dup_grams = n_grams −
    n_wins`` where per-gram winners come from a map-side-combinable MIN
    aggregate and ``n_wins`` from a COUNT over the (already tiny) winner
    table, so a boilerplate gram in 10⁹ documents costs one partial-min
    cell per mapper, never a hot reducer.  Docs shorter than ``k`` have no
    grams and are omitted, as in :func:`shared_kgram_pairs`.  At corpus
    scale set ``sample_mod`` (content-defined gram sampling, see
    :func:`_kgram_rows`) — counts then cover the sampled gram population,
    an unbiased duplicated-FRACTION estimate per doc.

    The extraction runs twice (the per-doc branch and the winner branch)
    — deliberate, as in :func:`shared_kgram_pairs`: materializing the
    gram rows (~16 B × total-chars) costs more than repeating the
    vectorized roll, and at 10¹² documents far more.
    """
    grams = _kgram_rows(df, col, id_col, k, gram_key, sample_mod)
    if gram_key == "hash":
        # hash mode counts per-doc grams inside the kernel (one row per
        # doc) instead of re-shuffling the exploded gram stream — same
        # values, ~total-grams fewer shuffled rows (see _kgram_doc_counts)
        per_doc = _kgram_doc_counts(df, col, id_col, k, sample_mod)
    else:
        per_doc = grams.groupBy(F.col("_id").alias("doc_id")).agg(
            F.count("*").alias("n_grams"))
    winners = grams.groupBy("_gram").agg(F.min("_id").alias("_win"))
    wins_per_doc = winners.groupBy(F.col("_win").alias("doc_id")).agg(
        F.count("*").alias("_n_wins"))
    return (per_doc.join(wins_per_doc, "doc_id", "left")
            .select("doc_id", "n_grams",
                    (F.col("n_grams")
                     - F.coalesce(F.col("_n_wins"), F.lit(0)))
                    .alias("n_dup_grams")))

def _simhash_kernel():
    def fn(batches):
        for batch in batches:
            ids = batch.column("_id")
            flat, starts, lengths = _flat_list(batch.column("_th"))
            n = batch.num_rows
            lengths = lengths.astype(np.float64)
            acc = np.full((n, 64), -1.0, dtype=np.float64)
            if flat.size:
                nonempty = lengths > 0
                ne_starts = starts[nonempty]
                for j in range(64):
                    bit = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.float64)
                    # sum of bits per row → #ones; ±1 weighting = 2·ones − len
                    ones = np.add.reduceat(bit, ne_starts)
                    acc[nonempty, j] = 2.0 * ones - lengths[nonempty]
            bits = (acc > 0).astype(np.uint64)
            sig = np.zeros(n, dtype=np.uint64)
            for j in range(64):
                sig |= bits[:, j] << np.uint64(j)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(sig.view(np.int64))], names=["_id", "simhash"]
            )

    return fn


def simhash(df: DataFrame, col: str, id_col: str, max_chars: int = 8192) -> DataFrame:
    """(id, simhash bigint): token-weighted 64-bit signature."""
    proj = _parallelize_small(df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.expr(
            f"transform(split(lower(trim(substring({col}, 1, {max_chars}))), '\\\\s+'),"
            f" t -> xxhash64(t))"
        ).alias("_th"),
    ))
    out = proj.mapInArrow(_simhash_kernel(), "_id long, simhash bigint")
    return out.withColumnRenamed("_id", id_col)


def simhash_candidates(sim_df: DataFrame, id_col: str, max_hamming: int = 3,
                       n_blocks: int = 4, max_bucket: int = 1024) -> DataFrame:
    """Near-dup candidates: by pigeonhole, two signatures within Hamming
    distance ``n_blocks - 1`` agree on at least one of ``n_blocks`` equal
    bit-blocks → bucket per (block, value), then exact Hamming filter
    (``bit_count(a ^ b)``, JVM-side).

    Shape: ONE posexplode → window cap → bucket pair-generation, so the
    (block, value) partitioning from the cap window is reused by the
    grouped collect (no second exchange) and pairs carry both signatures —
    no join back onto the signature table.

    Bucket safety (the round-2 scale-killer): each (block, value) bucket is
    capped at ``max_bucket`` ids (deterministic — lowest ids win, same
    window-row_number pattern as :func:`lsh_candidates`).  Uncapped, a
    10^9-doc corpus puts ~n/2^(64/n_blocks) docs in every bucket and the
    pre-filter candidate volume goes O(n²/2^(64/n_blocks)).  Capped, peak
    per-bucket work is O(max_bucket²) regardless of corpus shape.
    Truncation trades recall only inside pathological buckets; duplicate
    clusters that large are exact-dup territory — run exact_dedup first.
    Sizing at scale: expect ~n/2^(64/n_blocks) docs per bucket; if that
    exceeds ``max_bucket`` for ordinary (non-degenerate) buckets, use fewer,
    wider blocks (``n_blocks=2`` covers ``max_hamming=1`` with a 2^32 value
    space) rather than a bigger cap.
    """
    if 64 % n_blocks:
        raise ValueError("n_blocks must divide 64")
    if max_hamming >= n_blocks:
        raise ValueError(
            f"pigeonhole needs n_blocks > max_hamming: {max_hamming} flipped "
            f"bits can touch all {n_blocks} blocks")
    from pyspark.sql import Window as _W
    width = 64 // n_blocks
    mask = (1 << width) - 1
    exploded = sim_df.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(F.array(
            *[F.expr(f"(simhash >> {width * i}) & {mask}") for i in range(n_blocks)]
        )).alias("blk", "val"),
    )
    w = _W.partitionBy("blk", "val").orderBy(id_col)
    capped = (exploded.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    buckets = capped.groupBy("blk", "val").agg(
        F.sort_array(F.collect_list(
            F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s"))
        )).alias("xs"),
    ).filter(F.size("xs") > 1)
    pairs = buckets.select(
        F.explode(F.expr(
            "flatten(transform(xs, (x, i) -> transform(slice(xs, i + 2, size(xs)),"
            " y -> named_struct('id_a', x.i, 'sh_a', x.s, 'id_b', y.i, 'sh_b', y.s))))"
        )).alias("p")
    ).select("p.*")
    # strict < (not the sorted-position <=): duplicate ids in sim_df would
    # otherwise enumerate as degenerate (id, id, 0) self-pairs
    return (pairs.filter(F.col("id_a") < F.col("id_b")).distinct()
            .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ====================================================================
# connected components (dedup-cluster resolution)
# ====================================================================

def connected_components(pairs: DataFrame, nodes: DataFrame | None = None,
                         max_iter: int = 50) -> DataFrame:
    """Resolve candidate pairs into duplicate clusters: (id, component) with
    ``component`` = the minimum id reachable from ``id``.

    The missing last step of every dedup pipeline — LSH/SimHash emit PAIRS,
    but "keep one doc per duplicate CLUSTER" needs the transitive closure.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    standard shuffle-based formulation that converges in O(log n) rounds on
    any graph shape (a naive neighbor-min propagation needs O(diameter)
    rounds, which on a 10^9-doc duplicate chain is the difference between
    ~30 shuffles and millions).  Each round is two grouped aggregations over
    the edge list; no driver-side graph state, edges only ever shrink toward
    the star graph (node → component min).

    ``pairs``: DataFrame with columns (id_a, id_b), long ids.
    ``nodes``: optional DataFrame of all node ids (first column) so isolated
    nodes appear as singleton components; defaults to the ids present in
    ``pairs``.

    Every round is cut with ``localCheckpoint(eager=True)``: each star
    references its input ~4× (symmetrize + center-min + re-link), so an
    uncheckpointed loop grows the LOGICAL PLAN ~16× per round and the
    planner OOMs before the data does (measured at round 4 on a 2k-node
    graph).  On a real cluster prefer ``sc.setCheckpointDir`` + reliable
    checkpoints if executor loss during the loop must be survivable.
    """
    from pyspark.sql import functions as F

    edges = (pairs.select(F.col("id_a").cast("long").alias("u"),
                          F.col("id_b").cast("long").alias("v"))
             .filter(F.col("u") != F.col("v")))

    def star(e: DataFrame, large: bool, dedup: bool) -> DataFrame:
        # symmetric adjacency; for each center u: m = min(N(u) ∪ {u});
        # large-star re-links strictly-larger neighbors to m, small-star
        # re-links the ≤-neighbors (and u itself) to m.  m comes from a
        # window min (ONE exchange on u) rather than groupBy + self-join
        # (which shuffles the adjacency twice); dedup (another exchange)
        # runs only at round end — duplicate edges don't change any window
        # min, they only inflate one intermediate.
        from pyspark.sql import Window as _W
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        adj = sym.withColumn("m", F.least(F.min("v").over(_W.partitionBy("u")), F.col("u")))
        if large:
            out = adj.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v"))
        else:
            out = adj.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
                adj.select(F.col("u"), F.col("m").alias("v")))
        out = out.filter(F.col("u") != F.col("v"))
        return out.distinct() if dedup else out

    def checksum(e: DataFrame):
        # bit_xor, not sum: summing int64 hashes overflows under ANSI mode
        row = e.agg(F.count("*").alias("n"),
                    F.bit_xor(F.xxhash64("u", "v")).alias("h")).first()
        return row.n, row.h

    prev = None
    cur = edges.distinct().localCheckpoint(eager=True)
    for _it in range(max_iter):
        # LAZY checkpoint: the checksum action right below materializes it,
        # so each round costs ONE job instead of two (eager materialize +
        # checksum) — local-mode round latency is the operator's floor
        nxt = star(star(cur, large=True, dedup=False),
                   large=False, dedup=True).localCheckpoint(eager=False)
        sig = checksum(nxt)
        cur = nxt
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # after convergence the edge set is the star graph (node → component
    # min); nodes that were only ever centers map through u, components'
    # minima and isolated nodes map to themselves.  The min-agg is a no-op
    # at the fixpoint but keeps the output one-row-per-id by construction.
    membership = (cur.groupBy("u").agg(F.min("v").alias("component"))
                  .withColumnRenamed("u", "id"))
    base = (nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))
            if nodes is not None else
            membership.select("id").unionByName(membership.select(F.col("component").alias("id"))))
    return (base.distinct()
            .join(membership, "id", "left")
            .select("id", F.coalesce("component", F.col("id")).alias("component")))


def dedup_representatives(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Keep one row per duplicate cluster (the minimum id): resolve ``pairs``
    into components, keep rows whose id IS its component."""
    from pyspark.sql import functions as F
    comp = connected_components(pairs, nodes=df.select(id_col))
    keep = comp.filter(F.col("id") == F.col("component")).select(F.col("id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ====================================================================
# paragraph-level dedup (sub-document exact dedup)
# ====================================================================

def paragraph_dedup(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                    sep: str = "\n", join_sep: str = "\n") -> DataFrame:
    """Corpus-level **paragraph** dedup (the RefinedWeb/CCNet pass that
    doc-level dedup can't express): split every document on ``sep``, keep
    only the globally FIRST occurrence of each paragraph — "first" =
    smallest ``(doc_id, position)``, fully deterministic — and reassemble
    each document from its surviving paragraphs in original order.
    Boilerplate (nav bars, footers, license blurbs) collapses to one copy
    corpus-wide.  Empty paragraphs dedup like any other (documented).

    Returns ``(id_col, text_dedup, n_paras, n_removed)`` — one row per input
    document (a fully-deduped doc survives with ``text_dedup = ''``).

    Plan shape (the 100-TB story): winners are found with
    ``groupBy(md5(para)).agg(min(struct(doc_id, pos)))`` — a map-side
    combined aggregation, so a footer occurring 10^9 times collapses to one
    row per mapper BEFORE the shuffle (a ``row_number`` window over the
    paragraph hash would ship all 10^9 copies to one reducer).  Paragraph
    text crosses the wire once for the winners join (AQE splits the hot
    hash keys; the join is 1-row-per-key on the winner side), and the
    rebuild groups by ``doc_id`` with ``sort_array`` for order stability
    under any partitioning.  ``sep`` is a Java regex; ``join_sep`` is the literal used to reassemble (default: newline for both).
    """
    pos = F.col("_pos")
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col), sep)).alias("_pos", "_para"),
    )
    h = F.md5("_para").alias("_h")
    wins = (paras.select(h, F.struct(F.col(id_col), pos).alias("_o"))
            .groupBy("_h").agg(F.min("_o").alias("_w")))
    kept = (paras.join(wins, F.md5("_para") == F.col("_h"))
            .filter((F.col("_w")[id_col] == F.col(id_col)) & (F.col("_w")["_pos"] == pos))
            .select(id_col, "_pos", "_para"))
    rebuilt = (kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                        lambda s: s["_para"]),
            join_sep).alias("text_dedup"),
        F.count("*").alias("_n_kept")))
    totals = df.select(F.col(id_col),
                       F.size(F.split(F.col(col), sep)).cast("long").alias("n_paras"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
                    "n_paras",
                    (F.col("n_paras") - F.coalesce("_n_kept", F.lit(0)))
                    .cast("long").alias("n_removed")))


# ====================================================================
# exact set-similarity join (prefix filtering)
# ====================================================================

def token_sets(df: DataFrame, col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """``(_id, _ts, _n)`` — the distinct lowercased whitespace tokens of
    each document (the same tokenization as every textstats operator) plus
    the set size; empty token sets are dropped (they can match nothing)."""
    from sparksketch.textstats import tokens_col
    ts = F.array_distinct(tokens_col(F.lower(F.col(col))))
    return (df.select(F.col(id_col).cast("long").alias("_id"), ts.alias("_ts"))
            .filter(F.size("_ts") > 0)
            .withColumn("_n", F.size("_ts").cast("long")))


def set_sim_pairs(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8) -> DataFrame:
    """EXACT token-set-similarity self-join: every document pair whose
    distinct-token Jaccard is ≥ ``threshold``, via prefix filtering
    (Chaudhuri et al. 2006 SSJoin / Bayardo et al. 2007 AllPairs) — the
    exact counterpart of :func:`minhash_dedup_pairs`, with no candidate the
    filter is allowed to miss.

    Plan shape (linear scans + key shuffles; the only quadratic term is the
    true result size):

    1. distinct tokens per doc (JVM ``array_distinct`` over the shared
       whitespace tokenizer);
    2. a document-frequency pass (map-side-combinable ``groupBy(token)``)
       gives the canonical global token order **rarest-first** — prefix
       tokens are by construction the lowest-fanout join keys;
    3. per-doc ordering by ``(df, token)`` (one window sort per doc group —
       no hot keys: group size = tokens/doc) keeps only the **prefix**:
       the first ``n − ⌈τ·n⌉ + 1`` tokens.  Two sets with Jaccard ≥ τ must
       overlap by ≥ ⌈τ·max(n_a, n_b)⌉ tokens, so their prefixes must share
       at least one token (pigeonhole); using the longer "probe" prefix on
       both sides is a superset of AllPairs' asymmetric scheme, hence
       complete — a brute-force pytest and the driver's full-join DuckDB
       oracle both re-prove it;
    4. candidates = prefix-token self-equi-join with ``id_a < id_b`` and the
       length filter ``τ·n_a ≤ n_b ≤ n_a/τ``, deduped;
    5. exact verification joins the candidate pairs back to the full token
       arrays: ``inter = size(array_intersect)``,
       ``union = n_a + n_b − inter``.

    The threshold is quantized to 1/1000 and compared by **integer
    cross-multiplication** (``inter·1000 ≥ τ‰·union``) — no float boundary
    can disagree between engines.  Returns
    ``(id_a, id_b, n_inter, n_union)``, all BIGINT; Jaccard is the caller's
    exact ratio ``n_inter / n_union``.

    100 TB notes: everything shuffles (token, id) pairs or candidate id
    pairs, never text; rarest-first ordering keeps prefix buckets small on
    natural corpora, but a boilerplate corpus where *every* pair truly
    exceeds τ has a quadratic RESULT — cap that with a higher τ or use the
    banded :func:`minhash_dedup_pairs` screen first.  Reference parity:
    the reference has no set-similarity join (filter.rs is membership
    only); this is pipeline surface beyond it.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from pyspark.sql.window import Window
    tau = int(round(threshold * 1000))
    d = token_sets(df, col, id_col)
    t = d.select("_id", "_n", F.explode("_ts").alias("_tok"))
    freq = t.groupBy("_tok").agg(F.count("*").alias("_df"))
    tf = t.join(freq, "_tok")
    w = Window.partitionBy("_id").orderBy("_df", "_tok")
    # prefix length p = n − ceil(τ·n/1000) + 1, all-integer arithmetic
    p = F.col("_n") - F.expr(f"(({tau} * _n + 999) div 1000)") + F.lit(1)
    prefix = (tf.withColumn("_pos", F.row_number().over(w))
              .filter(F.col("_pos") <= p)
              .select("_tok", "_id", "_n"))
    a = prefix.select("_tok", F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    b = prefix.select("_tok", F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    cand = (a.join(b, "_tok")
            .filter((F.col("id_a") < F.col("id_b"))
                    & (F.col("_nb") * 1000 >= F.col("_na") * tau)
                    & (F.col("_na") * 1000 >= F.col("_nb") * tau))
            .select("id_a", "id_b").distinct())
    fa = d.select(F.col("_id").alias("id_a"), F.col("_ts").alias("_tsa"),
                  F.col("_n").alias("_na"))
    fb = d.select(F.col("_id").alias("id_b"), F.col("_ts").alias("_tsb"),
                  F.col("_n").alias("_nb"))
    ver = cand.join(fa, "id_a").join(fb, "id_b")
    inter = F.size(F.array_intersect("_tsa", "_tsb")).cast("long")
    return (ver.withColumn("n_inter", inter)
            .withColumn("n_union", (F.col("_na") + F.col("_nb") - inter).cast("long"))
            .filter(F.col("n_inter") * 1000 >= F.col("n_union") * F.lit(tau))
            .select("id_a", "id_b", "n_inter", "n_union"))


def set_sim_doc_stats(df: DataFrame, col: str = "text",
                      id_col: str = "doc_id",
                      threshold: float = 0.8) -> DataFrame:
    """Per-document exact near-neighbor accounting over
    :func:`set_sim_pairs` — the linear-output corpus-scale form (one row
    per document that has ≥1 similar neighbor): ``(doc_id, n_neighbors,
    sum_inter)``.  This is the number a dedup policy acts on ("drop docs
    with > k τ-similar peers"), without materializing the pair list."""
    pairs = set_sim_pairs(df, col, id_col, threshold)
    both = (pairs.select(F.col("id_a").alias("doc_id"), "n_inter")
            .unionAll(pairs.select(F.col("id_b").alias("doc_id"), "n_inter")))
    return (both.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_neighbors"),
                 F.sum("n_inter").cast("long").alias("sum_inter")))
