"""Distributed spherical k-means and semantic (cluster-then-compare) dedup.

The reference engine has no clustering (its surface ends at membership,
``/root/reference/src/filter.rs``); these operators extend the library's
LLM-training-pipeline tier the same way similarity/dedup do.

**kmeans_fit** — Lloyd iterations over the full table.  Spark-first shape:
the E-step (cosine assignment) and the M-step's sufficient statistics
(per-cluster vector sums + counts + total cost) are computed in ONE
``mapInArrow`` pass per iteration, each partition emitting a single
``k x d`` float64 partial — ZERO shuffle, the same partial/final discipline
as every sketch in this repo (``sketch.build_sketch``).  The driver folds
the P partials in sorted-partition order and renormalizes, so the fit is
deterministic for a fixed input partitioning (same contract as
:func:`sparksketch.similarity.ivf_centroids`, which remains the cheap
sampled-init path — this is the full-data refinement).

Spherical variant (Dhillon & Modha, Machine Learning 42, 2001): rows are
unit-normalized, assignment maximizes cosine, the centroid update is the
normalized mean — each step is the exact arg-max/arg-min of the objective
``cost = sum_i (1 - cos(x_i, c_assign(i)))``, so the per-iteration cost
sequence is monotone non-increasing in exact arithmetic (the driver
certificate checks it with a 1e-6 relative float tolerance).

At 100 TB: per iteration one column-pruned scan (vec column only), a
``k x d x 8``-byte partial per partition (64-dim, k=1024 -> 512 KiB), and a
driver fold over P partials — no all-pairs, no shuffle, no growth with n.
Iterations are sequential scans by design; cache/checkpoint the projected
input between iterations on a real cluster.

**semantic_dedup_pairs / semantic_dedup** — SemDeDup (Abbas et al. 2023,
arXiv:2303.09540 shape): k-means-cluster the embeddings, then exact
pairwise cosine WITHIN clusters only, dropping all but one representative
per duplicate component.  Complements the sign-LSH near-dup path
(:func:`sparksketch.similarity.embedding_near_dup_pairs`): LSH buckets by
random hyperplanes (data-independent, recall from table amplification),
SemDeDup buckets by learned structure (data-dependent — tight semantic
clusters land together even when far apart in raw sign-pattern space).
Both reuse the same tiled within-bucket rerank kernel
(:func:`sparksketch.similarity.exact_pairs_within_buckets`) and the same
documented contract: pairs are exact within buckets (soundness
unconditional), cross-bucket pairs are the recall tradeoff.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksketch.similarity import (_mat_of, exact_pairs_within_buckets,
                                    infer_dim, ivf_centroids, with_ivf_list)


@dataclass(frozen=True)
class KMeansResult:
    centroids: np.ndarray          # (k, dim) float32, unit rows
    costs: list[float] = field(default_factory=list)  # one per iteration
    n: int = 0                     # total vectors folded

    @property
    def k(self) -> int:
        return int(self.centroids.shape[0])

    def monotone(self, rel_tol: float = 1e-6) -> bool:
        """Lloyd's descent property, with float slack: each iteration's
        assignment cost is <= the previous (plateaus allowed)."""
        return all(b <= a + rel_tol * max(1.0, abs(a))
                   for a, b in zip(self.costs, self.costs[1:]))


def kmeans_fit(df: DataFrame, vec_col: str, k: int, iters: int = 8,
               seed: int = 11, dim: int | None = None,
               init: np.ndarray | None = None,
               init_sample: int = 4096, cache: bool = True) -> KMeansResult:
    """Fit spherical k-means over the full table (module docstring).

    ``init`` defaults to :func:`ivf_centroids`'s seeded-sample maximin
    init (``iters=0`` — Lloyd refinement happens here, distributed).
    Empty clusters keep their previous centroid (documented: with maximin
    init this is a plateau case, not a collapse).

    ``cache`` persists the single-column projection across iterations
    (MEMORY_AND_DISK, unpersisted before returning) — iterations re-scan
    the input by construction, and at 4M×64 the scan+decode is the
    measured bottleneck (scripts/kmeans_scale.py), not the GEMM.  Caching
    does not change partitioning, so determinism is unaffected.
    """
    dim = dim or infer_dim(df, vec_col)
    if init is None:
        cents = ivf_centroids(df, vec_col, n_lists=k, dim=dim,
                              sample=init_sample, iters=0, seed=seed)
    else:
        cents = np.asarray(init, dtype=np.float32)
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
    k = int(cents.shape[0])  # ivf_centroids clamps k to the sample size
    # size filter matches knn_join/fd_build: a ragged row would otherwise
    # silently misalign _mat_of's flat reshape (null rows would crash it)
    proj = (df.select(F.col(vec_col).alias("_v"))
            .filter(F.col("_v").isNotNull() & (F.size("_v") == dim)))
    cached = bool(cache and iters > 1)
    if cached:
        from pyspark import StorageLevel
        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)

    costs: list[float] = []
    total_n = 0
    try:
        cents, costs, total_n = _lloyd_loop(proj, cents, k, dim, iters)
    finally:
        if cached:
            proj.unpersist()
    return KMeansResult(centroids=cents, costs=costs, n=total_n)


def _partials_frame(proj: DataFrame, cents: np.ndarray, k: int,
                    dim: int) -> DataFrame:
    """ONE iteration's sufficient-statistics pass as a DataFrame: input ->
    MapInArrow, one (k x d sums, counts, cost) row per partition, no
    Exchange anywhere (pinned by the plan pytest)."""
    C = cents.astype(np.float32)

    def partials_fn(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        S = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        cost = 0.0
        seen = False
        for batch in batches:
            mat = _mat_of(batch.column("_v"), dim)
            if mat.shape[0] == 0:
                continue
            seen = True
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            unit = (mat / norms).astype(np.float32)
            sims = unit @ C.T
            assign = np.argmax(sims, axis=1)
            cost += float(np.sum(
                1.0 - sims[np.arange(assign.shape[0]), assign],
                dtype=np.float64))
            # per-dim bincount scatter: sequential input-order accumulation
            # like np.add.at but buffered (~10x faster in the hot kernel)
            unit64 = unit.astype(np.float64)
            for j in range(dim):
                S[:, j] += np.bincount(assign, weights=unit64[:, j],
                                       minlength=k)
            counts += np.bincount(assign, minlength=k)
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([pid], pa.int32()),
                 pa.array([S.tobytes()], pa.binary()),
                 pa.array([counts.tobytes()], pa.binary()),
                 pa.array([cost], pa.float64()),
                 pa.array([int(counts.sum())], pa.int64())],
                names=["part", "sums", "counts", "cost", "n"])

    return proj.mapInArrow(
        partials_fn, "part int, sums binary, counts binary, cost double, n long")


def _lloyd_loop(proj: DataFrame, cents: np.ndarray, k: int, dim: int,
                iters: int) -> tuple[np.ndarray, list[float], int]:
    costs: list[float] = []
    total_n = 0
    for _ in range(iters):
        rows = _partials_frame(proj, cents, k, dim).collect()
        # sorted-partition fold: float64 addition is order-sensitive, so pin
        # the order for run-to-run determinism (fixed input partitioning)
        rows.sort(key=lambda r: r.part)
        S = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        cost = 0.0
        for r in rows:
            S += np.frombuffer(r.sums, dtype=np.float64).reshape(k, dim)
            counts += np.frombuffer(r.counts, dtype=np.int64)
            cost += r.cost
        total_n = int(counts.sum())
        costs.append(cost)
        nonempty = counts > 0
        norms = np.linalg.norm(S, axis=1)
        new = cents.astype(np.float64).copy()
        new[nonempty] = S[nonempty] / np.maximum(norms[nonempty, None], 1e-30)
        cents = new.astype(np.float32)
    return cents, costs, total_n


def with_cluster(df: DataFrame, vec_col: str, centroids: np.ndarray,
                 out: str = "cluster") -> DataFrame:
    """Assign each row to its max-cosine centroid — one ``mapInArrow`` pass
    with the (tiny) centroid matrix captured in the closure.  Same kernel
    as IVF list assignment; re-exported under the clustering vocabulary."""
    return with_ivf_list(df, vec_col, np.asarray(centroids, np.float32), out=out)


def semantic_dedup_pairs(df: DataFrame, vec_col: str, id_col: str,
                         threshold: float = 0.95, k: int = 64,
                         iters: int = 6, seed: int = 11,
                         dim: int | None = None,
                         centroids: np.ndarray | None = None,
                         max_cluster: int = 65536,
                         block: int = 2048) -> DataFrame:
    """SemDeDup candidate stage: exact cosine-≥-threshold pairs within
    k-means clusters (module docstring).  Returns ``(id_a, id_b, cosine)``
    with ``id_a < id_b``; pass precomputed ``centroids`` to reuse a fit.

    Soundness is unconditional (every emitted pair's cosine really is
    ≥ threshold — exact rerank); recall misses only pairs the clustering
    separates, which at the intended operating point (near-identical
    vectors, threshold ≥ ~0.9) requires the pair to straddle a centroid
    decision boundary despite being nearly coincident."""
    dim = dim or infer_dim(df, vec_col)
    if centroids is None:
        centroids = kmeans_fit(df, vec_col, k, iters=iters, seed=seed,
                               dim=dim).centroids
    # same ragged/null guard as kmeans_fit — see the comment there
    proj = (df.select(F.col(id_col).cast("long").alias("_id"),
                      F.col(vec_col).alias("_v"))
            .filter(F.col("_v").isNotNull() & (F.size("_v") == dim)))
    bucketed = with_cluster(proj, "_v", centroids, out="bucket")
    return exact_pairs_within_buckets(bucketed, dim, threshold,
                                      max_bucket=max_cluster, block=block)


def semantic_dedup(df: DataFrame, vec_col: str, id_col: str,
                   threshold: float = 0.95, k: int = 64, iters: int = 6,
                   seed: int = 11, dim: int | None = None,
                   centroids: np.ndarray | None = None,
                   max_cluster: int = 65536) -> DataFrame:
    """Keep one representative (minimum id) per semantic-duplicate cluster:
    :func:`semantic_dedup_pairs` → transitive closure → min-id winners —
    the same resolve step as every other dedup family here
    (:func:`sparksketch.dedup.dedup_representatives`)."""
    from sparksketch.dedup import dedup_representatives
    pairs = semantic_dedup_pairs(df, vec_col, id_col, threshold=threshold,
                                 k=k, iters=iters, seed=seed, dim=dim,
                                 centroids=centroids, max_cluster=max_cluster)
    return dedup_representatives(df, pairs, id_col)
