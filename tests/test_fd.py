"""Frequent Directions: exactness below capacity, the spectral-error
certificate, merge-order-invariant guarantees, and the zero-shuffle Spark
build against the exact Gram."""

import numpy as np
import pytest

from sparksketch.fd import FrequentDirections, exact_gram, fd_build

SF = "/root/testdata/sf0.01"


def _spectral_gap(G, B):
    """eigvals of G - BᵀB, ascending (symmetric, so eigvalsh)."""
    return np.linalg.eigvalsh(G - B.cov())


def test_exact_below_capacity():
    # rank(A) <= ell -> every shrink has sigma^2_{ell+1} = 0: lossless
    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 32))          # rank 6
    A = rng.normal(size=(500, 6)) @ base
    fd = FrequentDirections(ell=8, d=32)
    fd.update_vectors(A)
    G = A.T @ A
    assert fd.cov_error_bound() <= 1e-12 * fd.fro2   # zero up to fp roundoff
    assert np.allclose(fd.cov(), G, atol=1e-8 * np.abs(G).max())


def test_spectral_certificate_random():
    rng = np.random.default_rng(11)
    A = rng.normal(size=(3000, 40)) * np.linspace(3.0, 0.1, 40)
    fd = FrequentDirections(ell=12, d=40)
    for i in range(0, 3000, 257):            # uneven batches
        fd.update_vectors(A[i : i + 257])
    G = A.T @ A
    ev = _spectral_gap(G, fd)
    tol = 1e-8 * fd.fro2
    # 0 <= A'A - B'B <= delta*I, exactly-tracked delta <= ||A||_F^2 / ell
    assert ev[0] >= -tol
    assert ev[-1] <= fd.cov_error_bound() + tol
    assert fd.cov_error_bound() <= fd.worst_case_bound() + tol
    assert fd.n == 3000
    assert np.isclose(fd.fro2, np.einsum("ij,ij->", A, A))


def test_merge_any_order_keeps_guarantee():
    rng = np.random.default_rng(13)
    A = rng.normal(size=(2000, 24))
    G = A.T @ A
    for seed in (0, 1, 2):
        order = np.random.default_rng(seed).permutation(8)
        parts = np.array_split(A, 8)
        sketches = []
        for p in parts:
            fd = FrequentDirections(ell=10, d=24)
            fd.update_vectors(p)
            sketches.append(fd)
        acc = sketches[order[0]]
        for j in order[1:]:
            acc = acc.merge(sketches[j])
        ev = _spectral_gap(G, acc)
        tol = 1e-8 * acc.fro2
        assert ev[0] >= -tol
        assert ev[-1] <= acc.cov_error_bound() + tol
        assert acc.cov_error_bound() <= acc.worst_case_bound() + tol
        assert acc.n == 2000


def test_serde_roundtrip():
    rng = np.random.default_rng(17)
    fd = FrequentDirections(ell=6, d=16)
    fd.update_vectors(rng.normal(size=(100, 16)))
    blob = fd.to_bytes()
    back = FrequentDirections.from_bytes(blob)
    assert back.to_bytes() == blob           # idempotent after shrink
    assert (back.ell, back.d, back.n) == (6, 16, 100)
    assert back.fro2 == fd.fro2 and back.delta == fd.delta
    assert np.array_equal(back.buf[: back.n_buf], fd.buf[: fd.n_buf])


def test_top_directions_recovers_planted_subspace():
    # strongly planted 3-dim signal + weak noise: FD's top-3 basis must
    # capture almost all of the planted energy
    rng = np.random.default_rng(19)
    basis, _ = np.linalg.qr(rng.normal(size=(32, 3)))
    A = rng.normal(size=(4000, 3)) @ (basis.T * 10.0) + 0.1 * rng.normal(size=(4000, 32))
    fd = FrequentDirections(ell=8, d=32)
    fd.update_vectors(A)
    V = fd.top_directions(3)                 # (3, 32)
    # projection of the planted basis onto the recovered span
    overlap = np.linalg.norm(V @ basis, ord="fro") ** 2 / 3.0
    assert overlap > 0.99


def test_input_validation():
    fd = FrequentDirections(ell=4, d=8)
    with pytest.raises(ValueError):
        fd.update_vectors(np.zeros((3, 5)))
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(ell=4, d=9))
    with pytest.raises(ValueError):
        FrequentDirections(ell=1, d=8)
    with pytest.raises(ValueError):
        fd.top_directions(0)


def test_fd_build_spark_vs_exact_gram(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    fd = fd_build(emb, "embedding", ell=16)
    G = exact_gram(emb, "embedding")
    n = emb.filter("embedding IS NOT NULL").count()
    assert fd.n == n
    ev = np.linalg.eigvalsh(G - fd.cov())
    tol = 1e-6 * fd.fro2
    assert ev[0] >= -tol
    assert ev[-1] <= fd.cov_error_bound() + tol
    assert fd.cov_error_bound() <= fd.worst_case_bound() + tol
    # fro2 matches the exact trace (both are plain sums of squares)
    assert np.isclose(fd.fro2, np.trace(G), rtol=1e-9)


def test_fd_by_group_per_group_guarantee(spark):
    import pandas as pd
    from sparksketch.fd import fd_by_group
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    states = {r.group: FrequentDirections.from_bytes(bytes(r.state))
              for r in fd_by_group(emb, "label", "embedding", ell=12).collect()}
    pdf = emb.filter("embedding IS NOT NULL AND label IS NOT NULL").toPandas()
    by_label = pdf.groupby(pdf["label"].astype(str))
    assert set(states) == set(by_label.groups)
    for g, rows in by_label:
        A = np.array([np.asarray(v, dtype=np.float64) for v in rows["embedding"]])
        fd = states[g]
        assert fd.n == len(A)
        ev = np.linalg.eigvalsh(A.T @ A - fd.cov())
        tol = 1e-6 * max(fd.fro2, 1.0)
        assert ev[0] >= -tol
        assert ev[-1] <= fd.cov_error_bound() + tol


def test_fd_project(spark):
    import pytest
    from sparksketch.fd import fd_build, fd_project
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    fd = fd_build(emb, "embedding", ell=16)
    out = fd_project(emb, "embedding", fd, k=4)
    assert out.columns == ["vec_id", "embedding", "label", "projection"]
    rows = out.orderBy("vec_id").limit(50).collect()
    assert all(len(r.projection) == 4 for r in rows)
    # the projection is exactly x . Vk' for each row
    vk = fd.top_directions(4)
    for r in rows:
        want = np.asarray(r.embedding, dtype=np.float64) @ vk.T
        assert np.allclose(np.array(r.projection), want, atol=1e-9)
    with pytest.raises(ValueError, match="already exists"):
        fd_project(out, "embedding", fd, k=2, out_col="projection")


def test_d_smaller_than_ell():
    # d < ell: shrink keeps min(ell, #singular values) rows, delta stays 0
    # (rank <= d <= ell makes every compaction lossless)
    rng = np.random.default_rng(23)
    A = rng.normal(size=(300, 4))
    fd = FrequentDirections(ell=8, d=4)
    fd.update_vectors(A)
    assert fd.cov_error_bound() <= 1e-12 * fd.fro2
    assert np.allclose(fd.cov(), A.T @ A, atol=1e-8 * fd.fro2)
    blob = fd.to_bytes()
    assert FrequentDirections.from_bytes(blob).to_bytes() == blob


def test_top_directions_pads_below_rank():
    # a 2-vector sketch still returns a full (k, d) basis: rank rows from
    # the SVD, zero rows beyond — fixed-width consumers stay well-defined
    fd = FrequentDirections(ell=6, d=16)
    fd.update_vectors(np.eye(16)[:2] * 3.0)
    V = fd.top_directions(3)
    assert V.shape == (3, 16)
    assert np.allclose(np.abs(V[:2]), np.eye(16)[:2])
    assert np.allclose(V[2], 0.0)
