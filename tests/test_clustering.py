"""Distributed spherical k-means + SemDeDup-style semantic dedup."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.clustering import (kmeans_fit, semantic_dedup,
                                    semantic_dedup_pairs, with_cluster)

DIM = 16


def _planted(spark, n=400, k=5, noise=0.05, seed=7, parts=4):
    """n points around k well-separated unit centers, labelled."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % k
        v = (centers[c] + noise * rng.normal(size=DIM)).astype(np.float32)
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    return df.repartition(parts), centers


def test_kmeans_monotone_cost_and_conservation(spark):
    df, _ = _planted(spark)
    res = kmeans_fit(df, "embedding", k=5, iters=6, seed=3)
    assert res.n == 400
    assert len(res.costs) == 6
    assert res.monotone()
    # planted clusters are tight (noise 0.05 around unit centers): the
    # converged cost must be far below the first-assignment cost
    assert res.costs[-1] < 0.6 * res.costs[0]


def test_kmeans_recovers_planted_clusters(spark):
    df, _ = _planted(spark)
    res = kmeans_fit(df, "embedding", k=5, iters=6, seed=3)
    assigned = with_cluster(df, "embedding", res.centroids)
    agg = assigned.groupBy("cluster", "label").count().collect()
    by_cluster = {}
    for r in agg:
        by_cluster.setdefault(r.cluster, {})[r.label] = r["count"]
    purity = sum(max(d.values()) for d in by_cluster.values()) / 400
    assert purity == 1.0
    assert len(by_cluster) == 5  # all clusters non-empty


def test_kmeans_deterministic_for_fixed_partitioning(spark):
    df, _ = _planted(spark)
    a = kmeans_fit(df, "embedding", k=5, iters=4, seed=3)
    b = kmeans_fit(df, "embedding", k=5, iters=4, seed=3)
    assert np.array_equal(a.centroids, b.centroids)
    assert a.costs == b.costs


def test_kmeans_matches_single_node_lloyd(spark):
    """The distributed partial/final fold computes EXACTLY Lloyd's update:
    same init + same data => same assignments as a numpy reference (float64
    sums commute across partitions up to 1e-6, which cannot flip the
    well-separated argmax here)."""
    df, _ = _planted(spark, n=200, parts=3)
    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    mat = np.array([r.embedding for r in rows], dtype=np.float32)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    init = unit[:5].astype(np.float32).copy()
    res = kmeans_fit(df, "embedding", k=5, iters=3, seed=3, init=init)

    cents = init.copy()
    costs = []
    for _ in range(3):
        sims = unit.astype(np.float32) @ cents.T
        assign = np.argmax(sims, axis=1)
        costs.append(float(np.sum(1.0 - sims[np.arange(200), assign],
                                  dtype=np.float64)))
        for c in range(5):
            m = unit[assign == c].astype(np.float64)
            if m.shape[0]:
                s = m.sum(axis=0)
                cents[c] = (s / max(np.linalg.norm(s), 1e-30)).astype(np.float32)
    # partition order changes the float64 summation order => ~1e-7 noise;
    # anything larger would mean a different ALGORITHM (wrong assignment,
    # wrong sufficient statistics), which is what this test pins
    assert np.allclose(res.centroids, cents, atol=1e-4)
    assert np.allclose(res.costs, costs, rtol=1e-6)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k larger than the number of distinct directions: surplus centroids
    keep their previous value instead of collapsing to NaN."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(10)]
    rows += [(10 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    init = np.eye(4, dtype=np.float32)[:3]
    res = kmeans_fit(df, "embedding", k=3, iters=2, init=init)
    assert not np.isnan(res.centroids).any()
    assert np.allclose(res.centroids[2], init[2])  # never assigned => kept
    assert res.monotone()


def _with_dups(spark, df, rng, n_dups=20, jitter=1e-3):
    rows = sorted(df.collect(), key=lambda r: r.vec_id)[:n_dups]
    dup_rows = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float32)
        v = (v + jitter * rng.normal(size=v.shape)).astype(np.float32)
        dup_rows.append((1000 + r.vec_id, [float(x) for x in v], r.label))
    return df.unionByName(spark.createDataFrame(dup_rows, df.schema)), \
        {(r.vec_id, 1000 + r.vec_id) for r in rows}


def test_semantic_dedup_pairs_sound_and_planted_complete(spark):
    df, _ = _planted(spark)
    dfd, planted = _with_dups(spark, df, np.random.default_rng(11))
    pairs = semantic_dedup_pairs(dfd, "embedding", "vec_id",
                                 threshold=0.999, k=5, iters=4, seed=3)
    got = pairs.collect()
    # soundness: exact rerank => every emitted cosine really >= threshold
    vecs = {r.vec_id: np.array(r.embedding, np.float64) for r in dfd.collect()}
    for r in got:
        a, b = vecs[r.id_a], vecs[r.id_b]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= 0.999 - 1e-6
    # completeness on planted near-identical pairs (cos ~ 1 >> threshold):
    # near-coincident vectors share a cluster, so none are missed
    assert planted <= {(r.id_a, r.id_b) for r in got}


def test_semantic_dedup_keeps_min_id_per_component(spark):
    df, _ = _planted(spark)
    dfd, planted = _with_dups(spark, df, np.random.default_rng(11))
    kept = semantic_dedup(dfd, "embedding", "vec_id",
                          threshold=0.999, k=5, iters=4, seed=3)
    ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert len(ids) == 400  # one survivor per planted dup pair
    for a, b in planted:
        assert a in ids and b not in ids  # min id wins


def test_semantic_dedup_pairs_reuses_precomputed_centroids(spark):
    df, _ = _planted(spark)
    dfd, _ = _with_dups(spark, df, np.random.default_rng(11))
    cents = kmeans_fit(dfd, "embedding", k=5, iters=4, seed=3).centroids
    a = semantic_dedup_pairs(dfd, "embedding", "vec_id", threshold=0.999,
                             centroids=cents)
    b = semantic_dedup_pairs(dfd, "embedding", "vec_id", threshold=0.999,
                             k=5, iters=4, seed=3)
    key = lambda r: (r.id_a, r.id_b)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_kmeans_partials_zero_shuffle(spark):
    """THE ACTUAL per-iteration statistics pass (clustering._partials_frame)
    must plan as input -> MapInArrow with no Exchange anywhere (the
    partial/final contract); any repartition slipped into the loop fails
    this, not a stand-in."""
    from sparksketch.clustering import _partials_frame
    from sparksketch.plans import plan_digest

    rows = [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    proj = df.select(F.col("embedding").alias("_v"))
    cents = np.eye(4, dtype=np.float32)[:2]

    digest = plan_digest(_partials_frame(proj, cents, k=2, dim=4))
    assert digest.n_python_evals == 1
    assert digest.n_exchanges == 0
