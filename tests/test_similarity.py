"""Similarity search: brute-force exactness, LSH recall, near-dup pairs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.similarity import (
    cosine_topk,
    cosine_topk_df,
    embedding_near_dup_pairs,
    infer_dim,
    lsh_planes,
    lsh_query,
    with_lsh_bucket,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float32)
    return ids, mat


def _exact_topk(ids, mat, q, k):
    qn = q / np.linalg.norm(q)
    sims = (mat @ qn) / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]


def test_cosine_topk_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    q = mat[0]
    got = cosine_topk(emb, "embedding", "vec_id", q, k=10)
    want = _exact_topk(ids, mat, q, 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-5
    assert got[0][0] == int(ids[0])  # self is its own nearest neighbor


def test_cosine_topk_df_matches_kernel(emb, emb_np):
    ids, mat = emb_np
    q = mat[7]
    via_df = [(r.vec_id, r.sim) for r in
              cosine_topk_df(emb, "embedding", "vec_id", q, k=5).collect()]
    via_kernel = cosine_topk(emb, "embedding", "vec_id", q, k=5)
    assert [a[0] for a in via_df] == [b[0] for b in via_kernel]


def test_lsh_query_recall(emb, emb_np):
    ids, mat = emb_np
    dim = infer_dim(emb, "embedding")
    planes = lsh_planes(dim, n_planes=8)
    bucketed = with_lsh_bucket(
        emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding"),
        "embedding", planes).cache()
    hits = 0
    for probe in range(5):
        qid = int(ids[probe * 11])
        q = mat[probe * 11]
        ann = lsh_query(bucketed, "embedding", "vec_id", q, planes, k=5, multiprobe=2)
        assert ann[0][0] == qid  # the query's own vector is always recalled
        exact = {t[0] for t in _exact_topk(ids, mat, q, 5)}
        hits += len({a for a, _ in ann} & exact)
    # these embeddings are near-random 64-dim (NN cosine ≈ 0.37), the
    # adversarial case for sign-LSH; deterministic seeds → stable recall
    assert hits >= 10  # ≥40% recall@5 with multiprobe=2 on 8 planes


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        if i < 10:  # 10 engineered near-dups
            noisy = v + rng.standard_normal(16).astype(np.float32) * 0.01
            rows.append((100 + i, noisy.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.98,
                                     n_planes=6, dim=16).cache()
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    found = sum((i, 100 + i) in got for i in range(10))
    assert found >= 8  # sign-LSH recall on ~0.9999-cosine dupes
    # every reported pair really is above threshold (no false positives)
    vecs = dict(rows)
    for (a, b) in got:
        va, vb = np.array(vecs[a]), np.array(vecs[b])
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert cos >= 0.98 - 1e-4, (a, b, cos)


def test_embedding_near_dup_hot_bucket_bounded(spark):
    """A degenerate hot bucket (10⁴ near-identical vectors) must complete in
    bounded memory (tiled rerank) and honor the deterministic max_bucket cap
    (lowest ids kept)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float32)
    rows = [(i, (base + rng.standard_normal(16).astype(np.float32) * 1e-4).tolist())
            for i in range(10_000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cap = 128
    pairs = embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.99,
                                     n_planes=4, dim=16, max_bucket=cap, block=50)
    got = pairs.collect()
    # tiling must not duplicate or miss pairs: with the cap, each bucket
    # reranks only its `cap` lowest ids → at most C(cap,2) pairs per bucket,
    # and every surviving id pair is below the cap boundary of its bucket
    ids_seen = {r.id_a for r in got} | {r.id_b for r in got}
    assert len(got) > 0
    assert len(got) == len({(r.id_a, r.id_b) for r in got})
    # near-identical vectors: nearly all land in ONE bucket → ids capped low
    assert max(ids_seen) < 4 * cap
    for r in got[:100]:
        assert r.id_a < r.id_b and r.cosine >= 0.99


def test_embedding_near_dup_multi_table_amplifies_recall(spark):
    """L independent hash tables OR-ed: recall on moderate-cosine pairs must
    rise with n_tables, emitted pairs stay sound (≥ threshold), and the same
    pair found in several tables appears once."""
    rng = np.random.default_rng(17)
    base = rng.standard_normal((60, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        # moderate-similarity partner (~cos 0.85): single-table recall is low
        noisy = 0.85 * v / np.linalg.norm(v) + 0.55 * rng.standard_normal(16).astype(np.float32) / 4
        rows.append((100 + i, noisy.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def engineered_found(n_tables):
        pairs = embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.6,
                                         n_planes=8, n_tables=n_tables, dim=16)
        got = [(r.id_a, r.id_b) for r in pairs.collect()]
        assert len(got) == len(set(got))  # cross-table dedup on the pair key
        return sum((i, 100 + i) in set(got) for i in range(60)), set(got)

    f1, _ = engineered_found(1)
    f8, got8 = engineered_found(8)
    assert f8 > f1  # amplification is real
    assert f8 >= 45  # 1-(1-p^8)^8 at cos>=0.6 keeps most engineered pairs
    vecs = dict(rows)
    for (a, b) in got8:
        va, vb = np.array(vecs[a]), np.array(vecs[b])
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert cos >= 0.6 - 1e-4, (a, b, cos)


def test_embedding_near_dup_tiling_matches_untiled(spark):
    """Tiny block size must produce exactly the untiled pair set."""
    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    rows += [(100 + i, (base[i] + 1e-3 * rng.standard_normal(16).astype(np.float32)).tolist())
             for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    big = embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.98,
                                   n_planes=5, dim=16, block=4096)
    small = embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.98,
                                     n_planes=5, dim=16, block=3)
    assert ({(r.id_a, r.id_b) for r in big.collect()}
            == {(r.id_a, r.id_b) for r in small.collect()})


def test_ivf_centroids_unbiased_on_sorted_table(spark):
    """A table sorted by cluster must still yield centroids covering every
    cluster (df.sample, not limit-first-rows)."""
    from sparksketch.similarity import ivf_centroids
    rng = np.random.default_rng(21)
    means = np.eye(4, 16, dtype=np.float32) * 10
    rows = []
    for c in range(4):  # sorted: all of cluster 0, then 1, ...
        for i in range(800):
            v = means[c] + rng.standard_normal(16).astype(np.float32)
            rows.append((c * 800 + i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(4)
    cents = ivf_centroids(df, "embedding", n_lists=4, sample=400, seed=5)
    # every cluster mean must have a distinct nearest centroid
    mu = means / np.linalg.norm(means, axis=1, keepdims=True)
    nearest = np.argmax(mu @ cents.T, axis=1)
    assert len(set(nearest.tolist())) == 4


def test_sketch_agg_hashes_jvm_side_guard():
    """No per-row Python hashing in the library hot paths: sketch.py must not
    reference the driver-side scalar hasher at all."""
    import pathlib
    src = pathlib.Path("/root/repo/sparksketch/sketch.py").read_text()
    assert "spark_xxhash64" not in src


def test_sketch_agg_udf_null_keys(spark):
    """NULL keys are dropped (SQL aggregate semantics) and 64-bit hashes
    survive the Arrow transfer exactly (no float64 rounding)."""
    from sparksketch.hll import HLL, HLL_SEED
    from sparksketch.sketch import sketch_agg_udf
    rows = [("g", f"k{i}") for i in range(500)] + [("g", None)] * 50
    df = spark.createDataFrame(rows, "g string, k string")
    agg = sketch_agg_udf(lambda pid: HLL(12), seeds=(HLL_SEED,))
    est = df.groupBy("g").agg(agg(F.col("k")).alias("e")).first().e
    assert abs(est - 500) / 500 <= 3 * HLL(12).rel_error()


def test_ivf_ann(spark, emb, emb_np):
    from sparksketch.similarity import ivf_centroids, ivf_query, with_ivf_list
    ids, mat = emb_np
    cents = ivf_centroids(emb, "embedding", n_lists=8, sample=500)
    assert cents.shape == (8, mat.shape[1])
    listed = with_ivf_list(emb, "embedding", cents).cache()
    # every vector gets a list; lists are reasonably balanced
    sizes = [r["count"] for r in listed.groupBy("ivf_list").count().collect()]
    assert sum(sizes) == len(ids)
    assert max(sizes) < len(ids) * 0.6
    # probing more lists monotonically improves recall; self always found
    hits_by_probe = []
    for n_probe in (1, 4, 8):
        hits = 0
        for p in range(5):
            q = mat[p * 13]
            ann = ivf_query(listed, "embedding", "vec_id", q, cents, k=5, n_probe=n_probe)
            exact = {t[0] for t in _exact_topk(ids, mat, q, 5)}
            hits += len({a for a, _ in ann} & exact)
            if n_probe == 8:
                assert ann[0][0] == int(ids[p * 13])
        hits_by_probe.append(hits)
    assert hits_by_probe[-1] == 25  # n_probe = n_lists → exact
    assert hits_by_probe[0] <= hits_by_probe[1] <= hits_by_probe[2]


def test_ivf_partitioned_table_prunes(spark, emb, tmp_path):
    """The IVF scale claim: a table written partitionBy(ivf_list) serves a
    probe by scanning ONLY the probed lists (partition pruning visible in
    the plan, not just the result)."""
    import io
    from contextlib import redirect_stdout

    from sparksketch.similarity import ivf_centroids, with_ivf_list
    cents = ivf_centroids(emb, "embedding", n_lists=8, sample=500)
    listed = with_ivf_list(emb, "embedding", cents)
    out = str(tmp_path / "ivf_table")
    listed.write.partitionBy("ivf_list").parquet(out)
    back = spark.read.parquet(out)
    probe = back.filter(F.col("ivf_list").isin([1, 3]))
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "ivf_list" in plan
    # pruned scan reads only the probed lists' rows
    full_counts = {r.ivf_list: r["count"] for r in back.groupBy("ivf_list").count().collect()}
    assert probe.count() == full_counts.get(1, 0) + full_counts.get(3, 0)


def test_lsh_index_partitioned_table_prunes(spark, emb, emb_np, tmp_path):
    """The persisted sign-LSH layout: a table written partitionBy(bucket)
    serves a probe by scanning only the probed buckets (partition pruning
    visible in the plan), and the meta sidecar round-trips the planes."""
    import io
    from contextlib import redirect_stdout

    from sparksketch.similarity import lsh_query, read_lsh_index, write_lsh_index
    ids, mat = emb_np
    target = str(tmp_path / "lsh_index")
    planes = write_lsh_index(emb, "embedding", "vec_id", target, n_planes=4, seed=7)
    back, planes2 = read_lsh_index(spark, target)
    assert np.array_equal(planes, planes2)  # planes reconstruct exactly
    assert back.count() == len(ids)
    # the probe path: bucket IN (...) over the partitioned table prunes
    probe = back.filter(F.col("bucket").isin([0, 3]))
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan
    counts = {r.bucket: r["count"] for r in back.groupBy("bucket").count().collect()}
    assert probe.count() == counts.get(0, 0) + counts.get(3, 0)
    # end-to-end probe through the persisted index finds the query itself
    q = mat[7]
    got = lsh_query(back, "embedding", "vec_id", q, planes2, k=5, multiprobe=1)
    assert got and got[0][0] == int(ids[7])


def test_knn_join_self_matches_bruteforce(spark):
    import numpy as np
    from sparksketch.similarity import knn_join
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    vecs[7] = vecs[3]  # exact duplicate -> sim-1.0 tie, id tie-break
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vid long, v array<float>").repartition(7)

    got = knn_join(df, "v", "vid", k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.nb_id, r.sim))
    assert set(by_q) == set(range(40))
    assert all(len(v) == 3 for v in by_q.values())
    assert all(nb != q for q, v in by_q.items() for nb, _ in v)

    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    for q in range(40):
        order = sorted(((-sims[q, j], j) for j in range(40) if j != q))[:3]
        want = [j for _, j in order]
        assert [nb for nb, _ in by_q[q]] == want, f"query {q}"
    # duplicate pair: each is the other's top hit at sim ~1.0
    assert by_q[3][0][0] == 7 and by_q[7][0][0] == 3
    assert abs(by_q[3][0][1] - 1.0) < 1e-12

    # partitioning-invariant (deterministic tie-breaks in the kernel)
    got1 = sorted((r.q_id, r.nb_id) for r in knn_join(df.coalesce(1), "v", "vid", k=3).collect())
    assert got1 == sorted((r.q_id, r.nb_id) for r in got)


def test_knn_join_external_queries_and_gate(spark):
    import numpy as np
    import pytest
    from sparksketch.similarity import knn_join
    rng = np.random.default_rng(5)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(4)]) for i in range(30)],
        "vid long, v array<float>")
    queries = corpus.filter("vid < 4")
    got = knn_join(corpus, "v", "vid", queries=queries, k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    # external queries keep the self hit: rank-1 is the query itself at ~1.0
    for q, rows in by_q.items():
        top = max(rows, key=lambda r: r.sim)
        assert top.nb_id == q and abs(top.sim - 1.0) < 1e-12
    with pytest.raises(ValueError, match="broadcasts the query set"):
        knn_join(corpus, "v", "vid", k=2, max_queries=10)


def test_knn_join_empty_and_duplicate_queries(spark):
    import numpy as np
    import pytest
    from sparksketch.similarity import knn_join
    rng = np.random.default_rng(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(4)]) for i in range(10)],
        "vid long, v array<float>")
    empty = knn_join(corpus, "v", "vid", queries=corpus.filter(F.lit(False)), k=3)
    assert empty.count() == 0
    assert empty.columns == ["q_id", "nb_id", "sim"]
    dup = corpus.union(corpus.limit(1))
    with pytest.raises(ValueError, match="unique"):
        knn_join(corpus, "v", "vid", queries=dup, k=3)


def test_knn_join_preselect_path_matches_bruteforce(spark):
    """Corpora large enough to trigger the argpartition fast path (batch >
    kk+64) and the mass-tie full-width redo must still produce the exact
    deterministic (sim desc, id asc) result."""
    import numpy as np
    from sparksketch.similarity import knn_join
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vid long, v array<float>").coalesce(1)
    got = {r.q_id: [] for r in []}
    for r in knn_join(df, "v", "vid", queries=df.filter("vid < 5"), k=4).collect():
        got.setdefault(r.q_id, []).append((r.sim, r.nb_id))
    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for q in range(5):
        sims = m @ m[q]
        want = [j for _, j in sorted(((-sims[j], j) for j in range(300)))[:4]]
        assert [nb for _, nb in sorted(got[q], key=lambda t: (-t[0], t[1]))] == want

    # mass-tie: 400 identical vectors in ONE partition (cluster >> kk+64);
    # the redo path must keep the LOWEST neighbor ids
    dup = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(400)], "vid long, v array<float>").coalesce(1)
    got2 = knn_join(dup, "v", "vid", queries=dup.filter("vid = 399"), k=5).collect()
    assert sorted(r.nb_id for r in got2) == [0, 1, 2, 3, 4]
