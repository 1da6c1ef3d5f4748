"""Product quantization (PQ) — compressed embeddings for ANN at scale.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split each ``dim``-vector into ``m_sub`` contiguous
subvectors, learn an independent k-means codebook per subspace, and store
each vector as ``m_sub`` uint8 code indices — 64-dim float32 → 8 bytes is
a 32× compression, which is what makes a 100 TB embedding column scannable
(3 TB of codes) and cacheable.  Queries score compressed vectors WITHOUT
decompression via the asymmetric distance computation (ADC): a per-query
``(m_sub × k)`` lookup table of exact subspace distances, then each code's
distance is ``m_sub`` table lookups — no FLOPs per candidate.

Spark-first shape (the same partial/final discipline as
``clustering.kmeans_fit``):

- **pq_train** — Lloyd iterations for ALL subspaces jointly in ONE
  ``mapInArrow`` pass per iteration: each partition emits one
  ``(m_sub × k × dsub)`` float64 sufficient-statistics partial (zero
  shuffle, no growth with n); the driver folds partials in sorted-partition
  order (deterministic for a fixed input partitioning) and updates every
  codebook.  L2 Lloyd: assignment by min squared distance, update = mean —
  the per-iteration total quantization error is monotone non-increasing.
- **pq_encode** — one scan emitting an ``m_sub``-byte ``binary`` code per
  row (codebooks broadcast in the closure).
- **pq_topk** — ADC top-k: per-partition table-lookup scoring + local
  top-k, then a driver merge of ``partitions × k`` candidates — the same
  TakeOrdered-style plan as :func:`sparksketch.similarity.cosine_topk`.

Composes with the rest of the ANN family: IVF lists for pruning which
codes to scan (IVF-ADC), exact rerank of the ADC top-k' against the raw
vectors for recall (the standard two-stage pipeline).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksketch.similarity import _mat_of, infer_dim


@dataclass(frozen=True)
class PQModel:
    codebooks: np.ndarray   # (m_sub, k, dsub) float32
    costs: list[float]      # total squared quantization error per iteration
    n: int                  # vectors folded

    @property
    def m_sub(self) -> int:
        return int(self.codebooks.shape[0])

    @property
    def k(self) -> int:
        return int(self.codebooks.shape[1])

    @property
    def dim(self) -> int:
        return int(self.codebooks.shape[0] * self.codebooks.shape[2])

    def monotone(self, rel_tol: float = 1e-6) -> bool:
        return all(b <= a + rel_tol * max(1.0, abs(a))
                   for a, b in zip(self.costs, self.costs[1:]))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(n, m_sub) uint8 codes → (n, dim) float32 reconstruction."""
        parts = [self.codebooks[j, codes[:, j]] for j in range(self.m_sub)]
        return np.concatenate(parts, axis=1)


def _assign_subspaces(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) → (n, m_sub) argmin-squared-distance code indices.
    argmin ||x - c||² == argmax (x·c − ||c||²/2), one GEMM per subspace."""
    m_sub, k, dsub = books.shape
    n = mat.shape[0]
    codes = np.empty((n, m_sub), dtype=np.uint8)
    for j in range(m_sub):
        X = mat[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        scores = X @ C.T - 0.5 * np.einsum("ij,ij->i", C, C, dtype=np.float32)
        codes[:, j] = np.argmax(scores, axis=1).astype(np.uint8)
    return codes


def _maximin_subspace_init(sample: np.ndarray, m_sub: int, k: int) -> np.ndarray:
    """Per-subspace farthest-point init from a driver-side sample — the
    same greedy as similarity.ivf_centroids, under squared L2."""
    n, dim = sample.shape
    dsub = dim // m_sub
    books = np.empty((m_sub, k, dsub), dtype=np.float32)
    for j in range(m_sub):
        X = sample[:, j * dsub : (j + 1) * dsub].astype(np.float64)
        chosen = [0]
        d = np.sum((X - X[0]) ** 2, axis=1)
        for _ in range(1, min(k, n)):
            nxt = int(np.argmax(d))
            chosen.append(nxt)
            d = np.minimum(d, np.sum((X - X[nxt]) ** 2, axis=1))
        B = X[chosen]
        if B.shape[0] < k:  # fewer sample points than centroids: pad by cycling
            reps = -(-k // B.shape[0])
            B = np.tile(B, (reps, 1))[:k]
        books[j] = B.astype(np.float32)
    return books


def pq_train(df: DataFrame, vec_col: str, m_sub: int = 8, k: int = 256,
             iters: int = 8, seed: int = 11, dim: int | None = None,
             init_sample: int = 4096, cache: bool = True) -> PQModel:
    """Train all ``m_sub`` subspace codebooks jointly (module docstring).
    ``k`` ≤ 256 (codes are uint8); ``dim`` must divide evenly by ``m_sub``."""
    dim = dim or infer_dim(df, vec_col)
    if dim % m_sub:
        raise ValueError(f"dim={dim} not divisible by m_sub={m_sub}")
    if k > 256:
        raise ValueError("k > 256 does not fit a uint8 code")
    dsub = dim // m_sub

    # seeded Bernoulli sample for init (same rationale as ivf_centroids:
    # never limit(), which would bias toward the first partitions)
    from sparksketch.session import estimated_row_count
    proj = (df.select(F.col(vec_col).alias("_v"))
            .filter(F.col("_v").isNotNull() & (F.size("_v") == dim)))
    n_est = estimated_row_count(df) or df.count()
    vecs = proj
    if n_est > init_sample:
        frac = min(1.0, (init_sample * 1.25 + 64.0) / n_est)
        vecs = vecs.sample(fraction=frac, seed=seed)
    sample = np.array([r[0] for r in vecs.collect()], dtype=np.float32)
    if sample.shape[0] > init_sample:
        pick = np.random.default_rng((0x709, seed)).choice(
            sample.shape[0], size=init_sample, replace=False)
        sample = sample[np.sort(pick)]
    books = _maximin_subspace_init(sample, m_sub, k)

    cached = bool(cache and iters > 1)
    if cached:
        from pyspark import StorageLevel
        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        costs: list[float] = []
        total_n = 0
        for _ in range(iters):
            rows = _pq_partials_frame(proj, books, dsub).collect()
            rows.sort(key=lambda r: r.part)
            S = np.zeros((m_sub, k, dsub), dtype=np.float64)
            counts = np.zeros((m_sub, k), dtype=np.int64)
            cost = 0.0
            total_n = 0
            for r in rows:
                S += np.frombuffer(r.sums, dtype=np.float64).reshape(m_sub, k, dsub)
                counts += np.frombuffer(r.counts, dtype=np.int64).reshape(m_sub, k)
                cost += r.cost
                total_n += r.n
            costs.append(cost)
            new = books.astype(np.float64).copy()
            nz = counts > 0
            new[nz] = S[nz] / counts[nz][:, None]
            books = new.astype(np.float32)
    finally:
        if cached:
            proj.unpersist()
    return PQModel(codebooks=books, costs=costs, n=total_n)


def _pq_partials_frame(proj: DataFrame, books: np.ndarray, dsub: int) -> DataFrame:
    """ONE training iteration's sufficient statistics for every subspace:
    input -> MapInArrow, one row per partition, no Exchange (plan pytest)."""
    m_sub, k, _ = books.shape
    B = books.astype(np.float32)
    dim = m_sub * dsub

    def fn(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        S = np.zeros((m_sub, k, dsub), dtype=np.float64)
        counts = np.zeros((m_sub, k), dtype=np.int64)
        cost = 0.0
        n = 0
        for batch in batches:
            mat = _mat_of(batch.column("_v"), dim)
            if mat.shape[0] == 0:
                continue
            n += mat.shape[0]
            codes = _assign_subspaces(mat, B)
            for j in range(m_sub):
                X = mat[:, j * dsub : (j + 1) * dsub].astype(np.float64)
                a = codes[:, j].astype(np.int64)
                for t in range(dsub):
                    S[j, :, t] += np.bincount(a, weights=X[:, t], minlength=k)
                counts[j] += np.bincount(a, minlength=k)
                cost += float(np.sum((X - B[j, a].astype(np.float64)) ** 2))
        if n:
            yield pa.RecordBatch.from_arrays(
                [pa.array([pid], pa.int32()),
                 pa.array([S.tobytes()], pa.binary()),
                 pa.array([counts.tobytes()], pa.binary()),
                 pa.array([cost], pa.float64()),
                 pa.array([n], pa.int64())],
                names=["part", "sums", "counts", "cost", "n"])

    return proj.mapInArrow(
        fn, "part int, sums binary, counts binary, cost double, n long")


def pq_encode(df: DataFrame, vec_col: str, model: PQModel,
              out: str = "pq_code",
              keep: list[str] | None = None) -> DataFrame:
    """One scan emitting the ``m_sub``-byte code per row (same null/ragged
    guard as the trainer).  ``keep`` limits the passthrough columns — when
    writing a code TABLE, ``keep=[id_col]`` avoids shipping the raw vector
    back Python→JVM just to drop it (halves the encode's Arrow traffic)."""
    dim = model.dim
    m_sub = model.m_sub
    B = model.codebooks
    passthrough = keep if keep is not None else [
        f.name for f in df.schema.fields]

    def fn(batches):
        for batch in batches:
            mat = _mat_of(batch.column(vec_col), dim)
            codes = _assign_subspaces(mat, B)
            raw = codes.tobytes()
            yield pa.RecordBatch.from_arrays(
                [*(batch.column(c) for c in passthrough),
                 pa.array([raw[i * m_sub:(i + 1) * m_sub]
                           for i in range(codes.shape[0])], pa.binary())],
                names=[*passthrough, out])

    guarded = df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
    by_name = {f.name: f for f in df.schema.fields}
    schema = ", ".join(f"`{c}` {by_name[c].dataType.simpleString()}"
                       for c in passthrough)
    return guarded.mapInArrow(fn, f"{schema}, `{out}` binary")


def adc_table(model: PQModel, query: np.ndarray) -> np.ndarray:
    """(m_sub, k) float32 lookup table: exact squared L2 distance of each
    query subvector to every centroid — ADC's one-off per-query cost."""
    q = np.asarray(query, dtype=np.float32)
    m_sub, k, dsub = model.codebooks.shape
    table = np.empty((m_sub, k), dtype=np.float32)
    for j in range(m_sub):
        diff = model.codebooks[j] - q[j * dsub : (j + 1) * dsub]
        table[j] = np.einsum("ij,ij->i", diff, diff)
    return table


def pq_topk(df_encoded: DataFrame, id_col: str, model: PQModel,
            query: np.ndarray, k: int = 10,
            code_col: str = "pq_code") -> list[tuple[int, float]]:
    """ADC top-k nearest (smallest approximate squared L2): per-partition
    table-lookup scoring + local top-k, driver merge of partitions × k —
    no shuffle, no per-candidate FLOPs, codes never decompressed."""
    table = adc_table(model, query)
    m_sub = model.m_sub

    def fn(batches):
        best_ids, best_d = [], []
        for batch in batches:
            ids = batch.column("_id").to_numpy(zero_copy_only=False)
            code_arr = batch.column("_c")
            if isinstance(code_arr, pa.ChunkedArray):
                code_arr = code_arr.combine_chunks()
            buf = np.frombuffer(code_arr.buffers()[2], dtype=np.uint8)
            offs = np.frombuffer(code_arr.buffers()[1], dtype=np.int32)[
                code_arr.offset : code_arr.offset + len(code_arr) + 1]
            flat = buf[offs[0]:offs[-1]]
            codes = flat.reshape(-1, m_sub)  # raises if any code is ragged
            # ADC: one table lookup per subspace, summed
            d = table[np.arange(m_sub)[None, :], codes].sum(axis=1)
            if d.shape[0] > k:
                part = np.argpartition(d, k)[:k]
            else:
                part = np.arange(d.shape[0])
            best_ids.append(ids[part])
            best_d.append(d[part])
        if best_ids:
            ids = np.concatenate(best_ids)
            d = np.concatenate(best_d)
            if ids.shape[0] > k:
                part = np.argpartition(d, k)[:k]
                ids, d = ids[part], d[part]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(d.astype(np.float64))],
                names=["_id", "dist"])

    proj = df_encoded.select(F.col(id_col).cast("long").alias("_id"),
                             F.col(code_col).alias("_c"))
    local = proj.mapInArrow(fn, "_id long, dist double").collect()
    rows = sorted(((r._id, r.dist) for r in local), key=lambda t: (t[1], t[0]))[:k]
    return [(int(i), float(s)) for i, s in rows]


def pq_topk_rerank(df_encoded: DataFrame, vec_col: str, id_col: str,
                   model: PQModel, query: np.ndarray, k: int = 10,
                   shortlist: int = 100,
                   code_col: str = "pq_code") -> DataFrame:
    """The standard two-stage PQ pipeline: ADC over the compressed codes
    produces a ``shortlist``-size candidate set (the only full scan, codes
    only), then the exact squared distance is computed for just those
    candidates from the raw vectors — recall approaches exact search at a
    ``shortlist/n`` fraction of the raw-vector reads.  Returns the
    ``(id, dist)`` top-k as a DataFrame (exact arithmetic in doubles, JVM
    expressions, TakeOrdered plan)."""
    ids = [i for i, _ in pq_topk(df_encoded, id_col, model, query,
                                 k=shortlist, code_col=code_col)]
    q = np.asarray(query, dtype=np.float64)
    qarr = F.array(*[F.lit(float(x)) for x in q])
    dist = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr,
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)
    return (df_encoded.filter(F.col(id_col).isin(ids))
            .select(F.col(id_col), dist.alias("dist"))
            .orderBy("dist", id_col).limit(k))
