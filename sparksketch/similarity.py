"""Similarity search over embedding columns (``array<float>``).

Two paths, per the training-pipeline contract:

- **brute-force cosine top-k** — the exactness baseline: per-partition
  vectorized numpy scores + local top-k, then a driver merge of
  (partitions × k) candidates.  Linear scan, zero shuffles; at 10^12 rows
  this is the "score everything once" pattern (still the right tool for
  one-off queries over a column-pruned parquet scan).
- **sign-LSH buckets** — the scale path for repeated queries / all-pairs
  near-dup: random-hyperplane signatures bucket vectors so probes only scan
  their bucket (+ multi-probe neighbors); exact rerank inside the bucket.

Kernels consume the Arrow list buffers directly (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mat_of(batch_col, dim: int) -> np.ndarray:
    """list<float> column → (n, dim) float32 matrix via the flat buffer."""
    arr = batch_col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float32)
    flat = flat[offsets[0] : offsets[-1]]
    return flat.reshape(-1, dim)


def infer_dim(df: DataFrame, vec_col: str) -> int:
    return df.select(F.size(vec_col).alias("d")).first().d


def cosine_topk(df: DataFrame, vec_col: str, id_col: str, query: np.ndarray,
                k: int = 10, dim: int | None = None) -> list[tuple[int, float]]:
    """Exact top-k by cosine similarity to ``query``. One scan, no shuffle:
    each partition emits its local top-k, the driver merges P·k rows."""
    dim = dim or infer_dim(df, vec_col)
    q = np.asarray(query, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-30)

    def fn(batches):
        best_ids: list[np.ndarray] = []
        best_sims: list[np.ndarray] = []
        for batch in batches:
            ids = batch.column("_id").to_numpy(zero_copy_only=False)
            mat = _mat_of(batch.column("_v"), dim)
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ qn) / np.maximum(norms, 1e-30)
            if sims.shape[0] > k:
                part = np.argpartition(-sims, k)[:k]
            else:
                part = np.arange(sims.shape[0])
            best_ids.append(ids[part])
            best_sims.append(sims[part])
        if best_ids:
            ids = np.concatenate(best_ids)
            sims = np.concatenate(best_sims)
            if ids.shape[0] > k:
                part = np.argpartition(-sims, k)[:k]
                ids, sims = ids[part], sims[part]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sims.astype(np.float64))],
                names=["_id", "sim"],
            )

    proj = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
    local = proj.mapInArrow(fn, "_id long, sim double").collect()
    rows = sorted(((r._id, r.sim) for r in local), key=lambda t: (-t[1], t[0]))[:k]
    return [(int(i), float(s)) for i, s in rows]


def cosine_topk_df(df: DataFrame, vec_col: str, id_col: str, query: np.ndarray,
                   k: int = 10, dim: int | None = None, round_to: int | None = None) -> DataFrame:
    """Same exact top-k but fully declarative (JVM expressions only) —
    the oracle-checkable variant: dot product via ``zip_with``+``aggregate``
    (whole-stage codegen), then a global ``orderBy().limit(k)`` which Spark
    executes as per-partition TakeOrdered + driver merge (no full sort)."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qarr = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col).cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    sim = dot / (norm * F.lit(qn))
    out = df.select(F.col(id_col), sim.alias("sim"))
    if round_to is not None:
        out = out.select(id_col, F.round("sim", round_to).alias("sim"))
    return out.orderBy(F.desc("sim"), F.col(id_col)).limit(k)


# ====================================================================
# sign-LSH (random hyperplanes)
# ====================================================================

def lsh_planes(dim: int, n_planes: int = 16, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng((0x51617, seed))
    return rng.standard_normal((dim, n_planes)).astype(np.float32)


def with_lsh_bucket(df: DataFrame, vec_col: str, planes: np.ndarray,
                    out: str = "bucket") -> DataFrame:
    """Append the sign-LSH bucket id (int64 of packed sign bits)."""
    dim, n_planes = planes.shape
    pl = planes  # closure-captured; small (dim × planes)

    def fn(batches):
        for batch in batches:
            mat = _mat_of(batch.column(vec_col), dim)
            signs = (mat @ pl) > 0
            bucket = np.zeros(mat.shape[0], dtype=np.uint64)
            for j in range(n_planes):
                bucket |= signs[:, j].astype(np.uint64) << np.uint64(j)
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, pa.array(bucket.view(np.int64))],
                names=[*batch.schema.names, out],
            )

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInArrow(fn, f"{out_schema}, `{out}` bigint")


def write_lsh_index(df: DataFrame, vec_col: str, id_col: str, target: str,
                    n_planes: int = 16, seed: int = 7,
                    dim: int | None = None) -> np.ndarray:
    """Persist a sign-LSH index as a table partitioned by ``bucket``, so a
    probe's ``bucket IN (...)`` filter becomes PARTITION PRUNING — repeated
    queries scan ~(1 + n_planes·multiprobe)/2^n_planes of the data instead
    of re-scanning the full table (the same layout contract as IVF's
    ``partitionBy(ivf_list)``).  Alongside the data, a ``<target>_meta``
    table records (dim, n_planes, seed) — the planes are a pure function of
    those three, so the index is re-openable with no binary sidecars.
    Returns the plane matrix for immediate probing."""
    from sparksketch.sources import write_table
    dim = dim or infer_dim(df, vec_col)
    planes = lsh_planes(dim, n_planes, seed)
    bucketed = with_lsh_bucket(df.select(F.col(id_col), F.col(vec_col)), vec_col, planes)
    write_table(bucketed, target, mode="overwrite", partition_by=["bucket"])
    meta = df.sparkSession.createDataFrame(
        [(int(dim), int(n_planes), int(seed))], "dim int, n_planes int, seed int")
    write_table(meta, _lsh_meta_target(target), mode="overwrite")
    return planes


def _lsh_meta_target(target: str) -> str:
    if target.endswith(".parquet"):
        return target[: -len(".parquet")] + "_meta.parquet"
    return target.rstrip("/") + "_meta"


def read_lsh_index(spark, target: str) -> tuple[DataFrame, np.ndarray]:
    """Re-open a persisted sign-LSH index: (bucketed DataFrame, planes).
    ``bucket`` is a partition directory on disk, so Spark re-infers its type
    from the path names (int for small values) — cast back to the bigint
    that ``with_lsh_bucket`` produces so round-tripped and fresh DataFrames
    union cleanly."""
    from sparksketch.sources import load_table
    m = load_table(spark, _lsh_meta_target(target)).first()
    df = load_table(spark, target).withColumn("bucket", F.col("bucket").cast("long"))
    return df, lsh_planes(m.dim, m.n_planes, m.seed)


def lsh_query(df_bucketed: DataFrame, vec_col: str, id_col: str, query: np.ndarray,
              planes: np.ndarray, k: int = 10, multiprobe: int = 1) -> list[tuple[int, float]]:
    """ANN probe: scan only the query's bucket (plus buckets within
    ``multiprobe`` sign flips), exact cosine rerank inside."""
    q = np.asarray(query, dtype=np.float32)
    signs = (q @ planes) > 0
    n_planes = planes.shape[1]
    base = 0
    for j in range(n_planes):
        base |= int(signs[j]) << j
    buckets = {base}
    if multiprobe >= 1:
        for j in range(n_planes):
            buckets.add(base ^ (1 << j))
    if multiprobe >= 2:
        for j in range(n_planes):
            for i in range(j + 1, n_planes):
                buckets.add(base ^ (1 << j) ^ (1 << i))
    cand = df_bucketed.filter(F.col("bucket").isin([b - (1 << 64) if b >= (1 << 63) else b for b in buckets]))
    return cosine_topk(cand, vec_col, id_col, q, k=k, dim=planes.shape[0])


def with_lsh_table_buckets(df: DataFrame, vec_col: str, planes: np.ndarray,
                           n_planes: int, n_tables: int,
                           out: str = "bucket") -> DataFrame:
    """One row per (input row, hash table): bucket id = table index in the
    high bits | that table's packed sign bits.  ``planes`` has
    ``n_tables * n_planes`` columns (one plane set per table).

    This is standard LSH amplification (L independent hash tables OR-ed):
    collision probability for a pair at angle θ rises from ``p^r`` to
    ``1 − (1 − p^r)^L`` with ``p = 1 − θ/π``.  The cost is explicit: the
    vector column is duplicated ``n_tables``× through the bucket shuffle —
    choose L for the recall you need, not more."""
    dim = planes.shape[0]
    pl = planes

    def fn(batches):
        for batch in batches:
            mat = _mat_of(batch.column(vec_col), dim)
            signs = (mat @ pl) > 0
            n = mat.shape[0]
            buckets = np.zeros((n, n_tables), dtype=np.uint64)
            for t in range(n_tables):
                acc = np.full(n, np.uint64(t) << np.uint64(n_planes), dtype=np.uint64)
                for j in range(n_planes):
                    acc |= signs[:, t * n_planes + j].astype(np.uint64) << np.uint64(j)
                buckets[:, t] = acc
            from sparksketch.dedup import _as_list_array
            blist = _as_list_array(buckets, n_tables)
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, blist], names=[*batch.schema.names, "_buckets"])

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    multi = df.mapInArrow(fn, f"{out_schema}, `_buckets` array<bigint>")
    return multi.select(*df.columns, F.explode("_buckets").alias(out))


def embedding_near_dup_pairs(df: DataFrame, vec_col: str, id_col: str,
                             threshold: float = 0.95, n_planes: int = 12,
                             n_tables: int = 1,
                             seed: int = 7, dim: int | None = None,
                             max_bucket: int = 65536, block: int = 2048) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold: bucket by sign-LSH, exact
    cosine only within buckets (vectorized per bucket group).

    ``n_tables`` > 1 amplifies recall with independent hash tables (see
    :func:`with_lsh_table_buckets`); emitted pairs are deduped across
    tables by the final ``distinct()``.

    Hot-bucket safety (crawl corpora routinely have clusters of
    near-identical embeddings that all land in one bucket):

    - within-bucket rerank is **tiled** in ``block``-row squares, so peak
      memory is O(block²) no matter the bucket size;
    - buckets are **capped** at ``max_bucket`` vectors (deterministic: the
      lowest ids win), bounding a degenerate bucket's O(b²) compute the same
      way :func:`sparksketch.dedup.lsh_candidates` caps its band buckets.
      Truncation trades recall inside pathological buckets only; clusters
      that large are exact-dup territory — run exact/minhash dedup first.
    """
    dim = dim or infer_dim(df, vec_col)
    proj = df.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
    if n_tables == 1:
        planes = lsh_planes(dim, n_planes, seed)
        bucketed = with_lsh_bucket(proj, "_v", planes)
    else:
        planes = lsh_planes(dim, n_planes * n_tables, seed)
        bucketed = with_lsh_table_buckets(proj, "_v", planes, n_planes, n_tables)
    return exact_pairs_within_buckets(bucketed, dim, threshold,
                                      max_bucket=max_bucket, block=block)


def exact_pairs_within_buckets(bucketed: DataFrame, dim: int, threshold: float,
                               max_bucket: int = 65536, block: int = 2048) -> DataFrame:
    """Exact cosine-≥-threshold pairs WITHIN each bucket of a pre-bucketed
    frame (columns ``_id long, _v array<float>, bucket``) — the shared
    rerank stage behind both LSH near-dup (:func:`embedding_near_dup_pairs`)
    and k-means semantic dedup (:func:`sparksketch.clustering.
    semantic_dedup_pairs`).  One shuffle on ``bucket``; within-bucket
    compute is tiled ``block``-row GEMMs (peak memory O(block²)) and capped
    at ``max_bucket`` rows per bucket (deterministic: lowest ids win)."""
    bucketed = bucketed.repartition(F.col("bucket"))

    def pairs_fn(batches):
        # a bucket never spans partitions (repartition on bucket) but can
        # span Arrow batches within one — gather the whole partition first
        id_chunks, bucket_chunks, mat_chunks = [], [], []
        for batch in batches:
            id_chunks.append(batch.column("_id").to_numpy(zero_copy_only=False))
            bucket_chunks.append(batch.column("bucket").to_numpy(zero_copy_only=False))
            mat_chunks.append(_mat_of(batch.column("_v"), dim))
        if id_chunks:
            ids = np.concatenate(id_chunks)
            buckets = np.concatenate(bucket_chunks)
            mat = np.concatenate(mat_chunks)
            norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
            unit = mat / norms[:, None]
            order = np.argsort(buckets, kind="stable")
            sb = buckets[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(sb)) + 1, [len(sb)]))
            out_a, out_b, out_s = [], [], []
            for gi in range(len(bounds) - 1):
                rows = order[bounds[gi] : bounds[gi + 1]]
                if rows.shape[0] < 2:
                    continue
                rows = rows[np.argsort(ids[rows], kind="stable")]
                if rows.shape[0] > max_bucket:
                    rows = rows[:max_bucket]
                nb = rows.shape[0]
                for tb in range(0, nb, block):
                    ra = rows[tb : tb + block]
                    ua = unit[ra]
                    for tj in range(tb, nb, block):
                        rb = rows[tj : tj + block]
                        sims = ua @ unit[rb].T
                        if tj == tb:
                            ai, bi = np.triu_indices(ra.shape[0], k=1)
                            hit = sims[ai, bi] >= threshold
                            ai, bi, sv = ai[hit], bi[hit], sims[ai[hit], bi[hit]]
                        else:
                            ai, bi = np.nonzero(sims >= threshold)
                            sv = sims[ai, bi]
                        if ai.size:
                            out_a.append(ids[ra[ai]])
                            out_b.append(ids[rb[bi]])
                            out_s.append(sv.astype(np.float64))
            if out_a:
                a = np.concatenate(out_a)
                b = np.concatenate(out_b)
                s = np.concatenate(out_s)
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(lo, pa.int64()), pa.array(hi, pa.int64()), pa.array(s)],
                    names=["id_a", "id_b", "cosine"],
                )

    # group whole buckets per task: mapInArrow sees each repartitioned
    # partition; grouping within the kernel handles multiple buckets/task.
    # Dedup across tables on the PAIR KEY (not the full row): the same pair
    # scored in two tables can carry float32 cosines that differ in the last
    # ulp (BLAS blocking), which a distinct() would keep as two rows.
    return (bucketed.mapInArrow(pairs_fn, "id_a long, id_b long, cosine double")
            .groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine")))


# ====================================================================
# IVF (inverted-file) ANN — the clustered-data scale path
# ====================================================================

def ivf_centroids(df: DataFrame, vec_col: str, n_lists: int = 16, dim: int | None = None,
                  sample: int = 4096, iters: int = 10, seed: int = 11) -> np.ndarray:
    """k-means-lite centroids from a driver-side sample (Lloyd iterations in
    numpy).  The sample is tiny relative to the table; the expensive part —
    assignment — stays distributed (:func:`with_ivf_list`).  Deterministic
    for a fixed input partitioning: seeded ``df.sample`` (a Bernoulli draw
    across ALL partitions — a ``limit(sample)`` would take the first rows of
    the first partition, biasing centroids to one corner of any sorted or
    time-clustered table), seeded init, fixed iteration count."""
    dim = dim or infer_dim(df, vec_col)
    vecs = df.select(vec_col)
    # row count for the sample fraction: prefer the optimizer's estimate
    # (free when catalog/CBO stats exist — ANALYZE TABLE at scale) over an
    # extra count() job; the exact value only scales the fraction
    from sparksketch.session import estimated_row_count
    n = estimated_row_count(df)
    if n is None:
        n = df.count()
    if n > sample:
        # 1.25× oversample, then downselect driver-side — a `.limit(sample)`
        # would take the FIRST partitions' rows (LocalLimit), reintroducing
        # the sorted-table bias the Bernoulli sample exists to remove
        frac = min(1.0, (sample * 1.25 + 64.0) / n)
        vecs = vecs.sample(fraction=frac, seed=seed)
    rows = vecs.collect()
    mat = np.array([r[0] for r in rows], dtype=np.float32)
    if mat.shape[0] > sample:
        pick = np.random.default_rng((0x1BF, seed)).choice(
            mat.shape[0], size=sample, replace=False)
        mat = mat[np.sort(pick)]
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    # farthest-point (maximin) init: greedy pick of the point least similar
    # to the chosen set — unlike uniform-random init it never seeds two
    # centroids in one tight cluster while leaving another cluster unserved
    k = min(n_lists, mat.shape[0])
    chosen = [0]
    best_sim = mat @ mat[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, mat @ mat[nxt])
    cents = mat[chosen].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = mat[assign == c]
            if members.shape[0]:
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-30)
    return cents


def with_ivf_list(df: DataFrame, vec_col: str, centroids: np.ndarray,
                  out: str = "ivf_list") -> DataFrame:
    """Assign each vector to its nearest centroid (cosine) — the inverted
    list id.  Persist/partition by this column so probes scan one list."""
    dim = centroids.shape[1]
    cents = centroids  # (n_lists, dim), unit norm

    def fn(batches):
        for batch in batches:
            mat = _mat_of(batch.column(vec_col), dim)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            assign = np.argmax((mat / norms) @ cents.T, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, pa.array(assign, pa.int32())],
                names=[*batch.schema.names, out],
            )

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInArrow(fn, f"{schema}, `{out}` int")


def ivf_query(df_listed: DataFrame, vec_col: str, id_col: str, query: np.ndarray,
              centroids: np.ndarray, k: int = 10, n_probe: int = 2) -> list[tuple[int, float]]:
    """ANN probe: exact cosine rerank over the ``n_probe`` nearest inverted
    lists only — scans n_probe/n_lists of the data (with partition pruning
    when the table is written ``partitionBy(ivf_list)``)."""
    q = np.asarray(query, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-30)
    order = np.argsort(-(centroids @ qn))[:n_probe]
    cand = df_listed.filter(F.col("ivf_list").isin([int(x) for x in order]))
    return cosine_topk(cand, vec_col, id_col, q, k=k, dim=centroids.shape[1])


# ====================================================================
# k-NN join (batch top-k: every query's k nearest neighbors)
# ====================================================================

def knn_join(corpus: DataFrame, vec_col: str, id_col: str,
             queries: DataFrame | None = None, k: int = 10,
             dim: int | None = None, include_self: bool = False,
             max_queries: int = 100_000, q_block: int = 512) -> DataFrame:
    """Exact cosine k-NN **join**: for every query vector, its ``k`` nearest
    corpus neighbors — the batch counterpart of :func:`cosine_topk` (which
    takes one query) and the standard primitive behind near-dup clustering /
    retrieval eval.  ``queries=None`` means self-join over the corpus
    (``include_self=False`` drops the trivial q==neighbor hit).

    Plan shape (the 100-TB story): the query set is collected and
    **broadcast** (gated at ``max_queries`` — beyond that, brute-force is the
    wrong tool and the LSH/IVF paths are the answer), then one corpus scan
    where each partition computes a numpy ``(q_block × batch)`` GEMM and
    keeps a running per-query top-k; only ``partitions × n_q × k`` candidate
    rows ever shuffle, never the vectors.  The global winner set is one
    window pass (rank by sim desc, id asc — fully deterministic).  Scores
    are float64 so ranking agrees with a declarative/SQL recomputation.
    """
    dim = dim or infer_dim(corpus, vec_col)
    qsrc = queries if queries is not None else corpus
    qrows = (qsrc.select(F.col(id_col).cast("long"), F.col(vec_col))
             .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
             .limit(max_queries + 1).collect())
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_join broadcasts the query set; got >{max_queries} queries — "
            "use the sign-LSH / IVF paths for query sets this large")
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "q_id long, nb_id long, sim double")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    if len(set(qids.tolist())) != len(qids):
        raise ValueError(
            "knn_join query ids must be unique — duplicate q_id values would "
            "silently merge the neighbor lists of different vectors")
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((qids, qmat))

    # one extra slot when self-hits are filtered downstream, so a
    # single-partition corpus still yields k survivors per query
    kk = k + 1 if (queries is None and not include_self) else k

    def fn(batches):
        ids_b, mat_b = bc.value
        nq = ids_b.shape[0]
        best_sim = np.full((nq, kk), -np.inf)
        best_id = np.full((nq, kk), np.iinfo(np.int64).max, dtype=np.int64)
        for batch in batches:
            cids = batch.column("_id").to_numpy(zero_copy_only=False)
            mat = _mat_of(batch.column("_v"), dim).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sel = kk + 64
            for q0 in range(0, nq, q_block):
                q1 = min(q0 + q_block, nq)
                sims = mat_b[q0:q1] @ mat.T                      # (bq, n)
                # deterministic top-k per query: (-sim, id) lexicographic,
                # so boundary ties always resolve to the lower neighbor id.
                # Sorting (or even materializing ids for) the full batch
                # width would dominate the GEMM (measured 3× total runtime
                # at 200k-corpus scale), so: O(n) argpartition of THIS
                # batch's sims down to kk+64, then a small lexsorted merge
                # with the carried best.  Exact whenever ≤ kk+64 batch
                # candidates tie at or above the kth boundary value; the
                # rare mass-tie rows (huge duplicate clusters) are detected
                # and re-done with a full-width sort, so the deterministic
                # tie-break is never lost.
                n = sims.shape[1]
                if n > sel:
                    pidx = np.argpartition(-sims, sel - 1, axis=1)[:, :sel]
                    bsim = np.take_along_axis(sims, pidx, axis=1)
                    bid = cids[pidx]
                else:
                    bsim = sims
                    bid = np.broadcast_to(cids, (q1 - q0, n))
                cand_sim = np.concatenate([best_sim[q0:q1], bsim], axis=1)
                cand_id = np.concatenate([best_id[q0:q1], bid], axis=1)
                order = np.lexsort((cand_id, -cand_sim), axis=1)[:, :kk]
                best_sim[q0:q1] = np.take_along_axis(cand_sim, order, axis=1)
                best_id[q0:q1] = np.take_along_axis(cand_id, order, axis=1)
                if n > sel:
                    v = best_sim[q0:q1, kk - 1]                  # kth boundary sim
                    bad = (sims >= v[:, None]).sum(axis=1) > sel
                    for r in np.nonzero(bad)[0]:
                        fs = np.concatenate([cand_sim[r, :kk], sims[r]])
                        fi = np.concatenate([cand_id[r, :kk], cids])
                        o = np.lexsort((fi, -fs))[:kk]
                        best_sim[q0 + r] = fs[o]
                        best_id[q0 + r] = fi[o]
        mask = np.isfinite(best_sim).ravel()
        yield pa.RecordBatch.from_arrays(
            [pa.array(np.repeat(ids_b, kk)[mask]),
             pa.array(best_id.ravel()[mask]),
             pa.array(best_sim.ravel()[mask])],
            names=["q_id", "nb_id", "sim"],
        )

    # size filter matches fd_build/fd_project: a ragged row would otherwise
    # silently misalign _mat_of's flat reshape against the id pairing
    proj = (corpus.select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_v"))
            .filter(F.col("_v").isNotNull() & (F.size("_v") == dim)))
    local = proj.mapInArrow(fn, "q_id long, nb_id long, sim double")
    if queries is None and not include_self:
        local = local.filter(F.col("q_id") != F.col("nb_id"))
    from pyspark.sql import Window as _W
    w = _W.partitionBy("q_id").orderBy(F.desc("sim"), F.col("nb_id"))
    return (local.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))
