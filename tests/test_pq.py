"""Product quantization: joint subspace training, encode, ADC top-k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.pq import adc_table, pq_encode, pq_topk, pq_train

M_SUB, K, DSUB = 4, 4, 4
DIM = M_SUB * DSUB


def _representable(spark, n=300, seed=3, parts=3):
    """Corpus whose vectors ARE concatenations of k atoms per subspace —
    the analytic ground truth: perfect training reaches zero quantization
    error and ADC equals the exact squared distance."""
    rng = np.random.default_rng(seed)
    atoms = rng.normal(size=(M_SUB, K, DSUB)).astype(np.float32)
    choice = rng.integers(0, K, size=(n, M_SUB))
    vecs = np.concatenate([atoms[j, choice[:, j]] for j in range(M_SUB)], axis=1)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts), vecs


def test_pq_train_monotone_and_exact_on_representable(spark):
    df, _ = _representable(spark)
    model = pq_train(df, "embedding", m_sub=M_SUB, k=K, iters=8, seed=3)
    assert model.n == 300
    assert model.monotone()
    # representable corpus => Lloyd converges to the atoms, zero error
    assert model.costs[-1] < 1e-6


def test_pq_adc_equals_exact_distance_on_representable(spark):
    df, vecs = _representable(spark)
    model = pq_train(df, "embedding", m_sub=M_SUB, k=K, iters=8, seed=3)
    enc = pq_encode(df, "embedding", model).cache()
    assert enc.count() == 300
    q = vecs[7]
    top = pq_topk(enc, "vec_id", model, q, k=5)
    exact = np.sum((vecs - q) ** 2, axis=1)
    order = np.argsort(exact, kind="stable")[:5]
    assert [i for i, _ in top] == [int(i) for i in order]
    for (_, d), i in zip(top, order):
        assert abs(d - float(exact[i])) < 1e-4


def test_pq_decode_roundtrip_on_representable(spark):
    df, vecs = _representable(spark)
    model = pq_train(df, "embedding", m_sub=M_SUB, k=K, iters=8, seed=3)
    enc = pq_encode(df, "embedding", model)
    rows = sorted(enc.collect(), key=lambda r: r.vec_id)
    codes = np.array([list(r.pq_code) for r in rows], dtype=np.uint8)
    rec = model.decode(codes)
    assert np.allclose(rec, vecs, atol=1e-5)


def test_pq_code_is_m_sub_bytes(spark):
    df, _ = _representable(spark)
    model = pq_train(df, "embedding", m_sub=M_SUB, k=K, iters=4, seed=3)
    lengths = (pq_encode(df, "embedding", model)
               .select(F.length("pq_code").alias("l")).distinct().collect())
    assert [r.l for r in lengths] == [M_SUB]


def test_pq_deterministic_for_fixed_partitioning(spark):
    df, _ = _representable(spark)
    a = pq_train(df, "embedding", m_sub=M_SUB, k=K, iters=4, seed=3)
    b = pq_train(df, "embedding", m_sub=M_SUB, k=K, iters=4, seed=3)
    assert np.array_equal(a.codebooks, b.codebooks)
    assert a.costs == b.costs


def test_pq_recall_on_noisy_corpus(spark):
    """Non-representable data: ADC top-10 must still largely agree with the
    exact top-10 (16^4 cells over 300 clustered points)."""
    rng = np.random.default_rng(9)
    base = rng.normal(size=(20, DIM)).astype(np.float32)
    vecs = (base[np.arange(300) % 20] +
            0.1 * rng.normal(size=(300, DIM)).astype(np.float32))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(3)
    model = pq_train(df, "embedding", m_sub=M_SUB, k=8, iters=8, seed=3)
    enc = pq_encode(df, "embedding", model).cache()
    q = vecs[0]
    top = {i for i, _ in pq_topk(enc, "vec_id", model, q, k=10)}
    exact = np.sum((vecs - q) ** 2, axis=1)
    true10 = set(np.argsort(exact, kind="stable")[:10].tolist())
    assert len(top & true10) >= 6


def test_pq_rerank_full_shortlist_is_exact(spark):
    """Two-stage query with shortlist == n degenerates to exact search:
    the rerank stage must return the true top-k regardless of code quality."""
    from sparksketch.pq import pq_topk_rerank
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(200, DIM)).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(3)
    model = pq_train(df, "embedding", m_sub=M_SUB, k=4, iters=2, seed=3)
    enc = pq_encode(df, "embedding", model).cache()
    q = vecs[42]
    got = pq_topk_rerank(enc, "embedding", "vec_id", model, q,
                         k=10, shortlist=200).collect()
    exact = np.sum((vecs.astype(np.float64) - q.astype(np.float64)) ** 2, axis=1)
    order = np.argsort(exact, kind="stable")[:10]
    assert [r.vec_id for r in got] == [int(i) for i in order]
    for r, i in zip(got, order):
        assert abs(r.dist - float(exact[i])) < 1e-9


def test_pq_validation_errors(spark):
    df, _ = _representable(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, "embedding", m_sub=5, k=4, iters=1)
    with pytest.raises(ValueError, match="uint8"):
        pq_train(df, "embedding", m_sub=4, k=300, iters=1)


def test_pq_adc_table_matches_bruteforce(spark):
    df, vecs = _representable(spark)
    model = pq_train(df, "embedding", m_sub=M_SUB, k=K, iters=4, seed=3)
    q = vecs[11]
    table = adc_table(model, q)
    for j in range(M_SUB):
        sub = q[j * DSUB : (j + 1) * DSUB]
        d = np.sum((model.codebooks[j] - sub) ** 2, axis=1)
        assert np.allclose(table[j], d, atol=1e-5)


def test_pq_partials_zero_shuffle(spark):
    """The per-iteration joint-subspace statistics pass must plan as
    input -> MapInArrow with no Exchange (the partial/final contract)."""
    from sparksketch.pq import _pq_partials_frame
    from sparksketch.plans import plan_digest

    rows = [(i, [float(i)] * DIM) for i in range(32)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    proj = df.select(F.col("embedding").alias("_v"))
    books = np.zeros((M_SUB, K, DSUB), dtype=np.float32)
    digest = plan_digest(_pq_partials_frame(proj, books, DSUB))
    assert digest.n_python_evals == 1
    assert digest.n_exchanges == 0
