"""Frequent Directions — the mergeable MATRIX sketch.

The scalar sketches summarize one column; a training-data pipeline also
needs the second-moment structure of the **embedding** column — the Gram /
covariance matrix ``AᵀA`` that drives PCA whitening, IVF coarse-quantizer
seeding, spectral near-dup analysis and drift monitoring.  At 10¹² rows
``AᵀA`` cannot be formed exactly without shuffling every vector; Frequent
Directions (Liberty, KDD 2013; Ghashami–Liberty–Phillips–Woodruff, SICOMP
2016) maintains an ``ℓ×d`` matrix ``B`` such that

    0  ⪯  AᵀA − BᵀB  ⪯  Δ·I,    with    Δ ≤ ‖A‖_F² / ℓ,

i.e. the sketch *underestimates* every direction's energy by at most Δ —
deterministic, no randomness, and the sketch of a stacked matrix is the
shrink of the stacked sketches, so it is mergeable in any order with the
same bound (SICOMP 2016, Thm 7.1 mergeability).

Unlike the randomized sketches there is no seed: the certificate is the
exactly-tracked shrinkage total ``Δ = Σₜ δₜ``.  Each shrink subtracts
``δₜ`` from every squared singular value, and because at least ``ℓ+1``
of them are ≥ δₜ at that moment, the Frobenius mass drops by ≥ ℓ·δₜ per
shrink — hence ``Σ δₜ ≤ ‖A‖_F²/ℓ`` and, per unit vector ``x``,
``‖Ax‖² − ‖Bx‖² ∈ [0, Σ δₜ]``.  Both invariants survive merges because a
merge IS a stack-then-shrink.  ``cov_error_bound()`` exposes the exact
data-dependent Δ; tests check the spectral gap against it directly.

Library pattern as everywhere else: per-partition numpy kernels over the
flat Arrow buffer (one SVD per 2ℓ rows, amortized O(dℓ) per row), byte-blob
serde, order-invariant-guarantee merges, zero shuffle — the partial states
are ``2ℓ·d`` floats regardless of row count.
"""

from __future__ import annotations

import struct
from typing import Callable

import numpy as np
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksketch.similarity import _mat_of, infer_dim

_MAGIC = b"FRD1"


class FrequentDirections:
    """Deterministic ℓ-row sketch of a tall (n×d) matrix.

    ``ell`` is the guarantee parameter: spectral error ≤ ‖A‖_F²/ell.  The
    working buffer holds up to ``2·ell`` rows (the standard doubled-space
    fast variant: one rank-2ℓ SVD per ℓ appended rows).
    """

    def __init__(self, ell: int, d: int):
        if ell < 2:
            raise ValueError("ell must be >= 2")
        if d < 1:
            raise ValueError("d must be >= 1")
        self.ell = ell
        self.d = d
        self.buf = np.zeros((2 * ell, d), dtype=np.float64)
        self.n_buf = 0          # filled rows in buf
        self.n = 0              # total vectors absorbed
        self.fro2 = 0.0         # exact ‖A‖_F² (running sum of squares)
        self.delta = 0.0        # Σ δₜ — the exact spectral-error certificate

    # ---- updates ----

    def update_vectors(self, X: np.ndarray) -> None:
        """Absorb an (n, d) float block."""
        X = np.ascontiguousarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != self.d:
            raise ValueError(f"expected (n, {self.d}) matrix, got {X.shape}")
        self.n += X.shape[0]
        self.fro2 += float(np.einsum("ij,ij->", X, X))
        pos = 0
        while pos < X.shape[0]:
            take = min(2 * self.ell - self.n_buf, X.shape[0] - pos)
            self.buf[self.n_buf : self.n_buf + take] = X[pos : pos + take]
            self.n_buf += take
            pos += take
            if self.n_buf == 2 * self.ell:
                self._shrink()

    def _shrink(self) -> None:
        """SVD the buffer, subtract δ = σ²_{ℓ+1} from every σ², keep top ℓ.

        When ``d < ℓ`` the SVD yields only ``min(n_buf, d)`` singular
        values, so δ = 0 and the compaction is lossless (rank ≤ d ≤ ℓ) —
        the kept row count is ``min(ℓ, #singular values)``, never more.
        """
        if self.n_buf <= self.ell:
            return
        # right singular vectors of the filled rows; σ sorted descending
        _, s, vt = np.linalg.svd(self.buf[: self.n_buf], full_matrices=False)
        s2 = s * s
        dlt = float(s2[self.ell]) if s2.size > self.ell else 0.0
        keep = np.sqrt(np.maximum(s2[: self.ell] - dlt, 0.0))
        r = keep.shape[0]              # = min(ell, s2.size) <= ell
        self.buf[:] = 0.0
        self.buf[:r] = keep[:, None] * vt[:r]
        self.n_buf = r
        self.delta += dlt

    # ---- merge / serde ----

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        """Stack-then-shrink; Δ adds, so the merged certificate stays exact."""
        if (other.ell, other.d) != (self.ell, self.d):
            raise ValueError("cannot merge FD sketches with different (ell, d)")
        self.n += other.n
        self.fro2 += other.fro2
        self.delta += other.delta
        rows = other.buf[: other.n_buf]
        pos = 0
        while pos < rows.shape[0]:
            take = min(2 * self.ell - self.n_buf, rows.shape[0] - pos)
            self.buf[self.n_buf : self.n_buf + take] = rows[pos : pos + take]
            self.n_buf += take
            pos += take
            if self.n_buf == 2 * self.ell:
                self._shrink()
        return self

    def to_bytes(self) -> bytes:
        self._shrink()  # ship ≤ ℓ rows, not the raw buffer
        return (_MAGIC
                + struct.pack("<IIIQdd", self.ell, self.d, self.n_buf,
                              self.n, self.fro2, self.delta)
                + self.buf[: self.n_buf].tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrequentDirections":
        assert data[:4] == _MAGIC
        ell, d, n_buf, n, fro2, delta = struct.unpack_from("<IIIQdd", data, 4)
        fd = cls(ell, d)
        fd.n_buf, fd.n, fd.fro2, fd.delta = n_buf, n, fro2, delta
        fd.buf[:n_buf] = np.frombuffer(
            data, dtype=np.float64, count=n_buf * d,
            offset=4 + struct.calcsize("<IIIQdd")).reshape(n_buf, d)
        return fd

    # ---- estimates ----

    def cov(self) -> np.ndarray:
        """BᵀB — the sketched Gram matrix (d×d)."""
        b = self.buf[: self.n_buf]
        return b.T @ b

    def cov_error_bound(self) -> float:
        """Exact data-dependent Δ: 0 ⪯ AᵀA − BᵀB ⪯ Δ·I (≤ worst_case_bound)."""
        return self.delta

    def worst_case_bound(self) -> float:
        """The a-priori FD guarantee ‖A‖_F² / ℓ."""
        return self.fro2 / self.ell

    def singular_values(self) -> np.ndarray:
        """Sketch singular values, descending (≤ the true ones per-direction)."""
        return np.linalg.svd(self.buf[: self.n_buf], compute_uv=False)

    def top_directions(self, k: int) -> np.ndarray:
        """Top-k right singular vectors, always (k×d) — the PCA basis
        estimate.  Directions beyond the sketch's rank (a sketch built over
        fewer than k vectors) are zero rows, so downstream fixed-width
        consumers (``fd_project``) stay well-defined."""
        if not 1 <= k <= min(self.ell, self.d):
            raise ValueError("k must be in [1, min(ell, d)]")
        _, _, vt = np.linalg.svd(self.buf[: self.n_buf], full_matrices=False)
        out = np.zeros((k, self.d), dtype=np.float64)
        r = min(k, vt.shape[0])
        out[:r] = vt[:r]
        return out


def fd_build(df: DataFrame, vec_col: str, ell: int = 64,
             dim: int | None = None, tree_depth: int | None = None,
             factory: Callable | None = None) -> FrequentDirections:
    """Global FD sketch over an ``array<float>`` column.  Zero shuffles:
    one 2ℓ×d partial per scan partition, blobs folded on the driver (or
    treeAggregate past 256 partitions, mirroring ``sketch.build_sketch``).
    """
    d = dim if dim is not None else infer_dim(df, vec_col)
    proj = (df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == d))
              .select(F.col(vec_col).alias("_v")))
    make = factory or (lambda pid: FrequentDirections(ell, d))

    def fn(batches):
        ctx = TaskContext.get()
        fd = make(ctx.partitionId() if ctx else 0)
        for batch in batches:
            fd.update_vectors(_mat_of(batch.column("_v"), d).astype(np.float64))
        yield pa.RecordBatch.from_pydict(
            {"state": pa.array([fd.to_bytes()], pa.binary())})

    states = proj.mapInArrow(fn, "state binary")
    from sparksketch.sketch import fold_states
    return fold_states(states, FrequentDirections, make, tree_depth)


def fd_by_group(df: DataFrame, group_col: str, vec_col: str, ell: int = 64,
                dim: int | None = None) -> DataFrame:
    """Per-group FD sketches → ``(group string, state binary)`` — the
    second-moment structure of each source/language/shard's embeddings
    ("is source X's embedding distribution drifting?").

    Same skew-robust shape as ``sketch.sketch_by_group``: phase 1 builds one
    sketch per (scan-partition × group) so a hot group combines locally
    everywhere (at most ``partitions`` 2ℓ·d-float blobs per group reach the
    phase-2 shuffle no matter the skew); phase 2 merges blobs per group.
    """
    import pyarrow.compute as pc
    d = dim if dim is not None else infer_dim(df, vec_col)
    proj = (df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == d)
                      & F.col(group_col).isNotNull())
              .select(F.col(group_col).cast("string").alias("_g"),
                      F.col(vec_col).alias("_v")))

    def partial(batches):
        local: dict[str, FrequentDirections] = {}
        for batch in batches:
            mat = _mat_of(batch.column("_v"), d).astype(np.float64)
            enc = pc.dictionary_encode(batch.column("_g"))
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            groups = enc.dictionary.to_pylist()
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            starts = np.concatenate(([0], np.flatnonzero(np.diff(sc)) + 1, [len(sc)]))
            for si in range(len(starts) - 1):
                rows = order[starts[si] : starts[si + 1]]
                g = groups[sc[starts[si]]]
                fd = local.get(g)
                if fd is None:
                    fd = FrequentDirections(ell, d)
                    local[g] = fd
                fd.update_vectors(mat[rows])
        if local:
            yield pa.RecordBatch.from_pydict({
                "group": pa.array(list(local.keys()), pa.string()),
                "state": pa.array([fd.to_bytes() for fd in local.values()],
                                  pa.binary())})

    partials = proj.mapInArrow(partial, "group string, state binary")

    def merge_group(pdf):
        import pandas as pd
        acc = None
        for blob in pdf["state"]:
            nxt = FrequentDirections.from_bytes(bytes(blob))
            acc = nxt if acc is None else acc.merge(nxt)
        return pd.DataFrame({"group": [pdf["group"].iloc[0]],
                             "state": [acc.to_bytes()]})

    return partials.groupBy("group").applyInPandas(
        merge_group, "group string, state binary")


def fd_project(df: DataFrame, vec_col: str, fd: FrequentDirections, k: int,
               out_col: str = "projection") -> DataFrame:
    """Append the k-dim PCA projection ``x · Vₖᵀ`` of each vector onto the
    sketch's top-k directions (dimensionality reduction before ANN /
    clustering / drift scoring).  ``Vₖ`` is k·d floats — driver-computed
    once, closure-shipped; the per-row work is one GEMM per Arrow batch.

    Rows with a NULL or wrong-length vector are DROPPED from the output
    (same row contract as the build ops) — keep the id column and join
    back if the full table is needed."""
    if out_col in df.columns:
        raise ValueError(f"fd_project: output column {out_col!r} already exists")
    vk = fd.top_directions(k)          # (k, d), tiny
    d = fd.d
    passthrough = df.columns

    def fn(batches):
        for batch in batches:
            mat = _mat_of(batch.column(vec_col), d).astype(np.float64)
            proj = mat @ vk.T          # (n, k)
            out = pa.FixedSizeListArray.from_arrays(
                pa.array(proj.ravel(), pa.float64()), k)
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in passthrough] + [out.cast(pa.list_(pa.float64()))],
                passthrough + [out_col])

    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes) + f", {out_col} array<double>"
    ok = df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == d))
    return ok.mapInArrow(fn, schema)


def exact_gram(df: DataFrame, vec_col: str, dim: int | None = None) -> np.ndarray:
    """Exact AᵀA via per-partition XᵀX partials (d×d each) + driver sum —
    the ground truth for FD certificates; one pass, zero shuffles."""
    d = dim if dim is not None else infer_dim(df, vec_col)
    proj = (df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == d))
              .select(F.col(vec_col).alias("_v")))

    def fn(batches):
        g = np.zeros((d, d), dtype=np.float64)
        for batch in batches:
            m = _mat_of(batch.column("_v"), d).astype(np.float64)
            g += m.T @ m
        yield pa.RecordBatch.from_pydict(
            {"g": pa.array([g.tobytes()], pa.binary())})

    parts = [np.frombuffer(bytes(r[0]), dtype=np.float64).reshape(d, d)
             for r in proj.mapInArrow(fn, "g binary").collect()]
    return sum(parts, np.zeros((d, d), dtype=np.float64))
