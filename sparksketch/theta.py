"""Theta / KMV (k-minimum-values) — the set-OPERATION sketch.

HLL answers "how many distinct?" but two HLLs can only be unioned; a Theta
sketch additionally estimates **intersections and differences** between
independently-built sketches ("users who clicked AND viewed", "new urls in
this crawl vs the last"), which no register sketch can do.  This is the
bottom-k formulation (Bar-Yossef et al. 2002; the same estimator family as
Apache DataSketches' Theta): keep the ``k`` smallest distinct 64-bit hash
values; the k-th smallest, normalized, is an unbiased density threshold θ,
and any set expression evaluated on the kept sample scaled by 1/θ estimates
the true cardinality with RSE ≈ 1/√(k−2).

Library pattern as everywhere else: one JVM ``xxhash64`` per row, numpy
``np.unique`` bottom-k per Arrow batch, order-invariant merges, byte-blob
serde — mergeable partial/final aggregation with zero shuffle.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame

from sparksketch import sketch as _sk

THETA_SEED = 0x7E7A0001  # fixed stream so independently-built sketches align

_MAGIC = b"THE1"
_U64 = float(1 << 64)


class Theta:
    def __init__(self, k: int = 4096):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.vals = np.empty(0, dtype=np.uint64)  # sorted distinct bottom-k

    # ---- updates ----

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        cand = np.unique(np.concatenate([self.vals, h.astype(np.uint64)]))
        self.vals = cand[: self.k]

    # ---- merge / serde ----

    def merge(self, other: "Theta") -> "Theta":
        if other.k != self.k:
            raise ValueError("cannot merge Theta sketches with different k")
        self.update_hashes(other.vals)
        return self

    def to_bytes(self) -> bytes:
        return (_MAGIC + struct.pack("<II", self.k, self.vals.size)
                + self.vals.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "Theta":
        assert data[:4] == _MAGIC
        k, n = struct.unpack_from("<II", data, 4)
        t = cls(k)
        t.vals = np.frombuffer(data[12 : 12 + 8 * n], dtype=np.uint64).copy()
        return t

    # ---- estimates ----

    def theta(self) -> float:
        """Inclusive sampling threshold θ ∈ (0, 1]: every kept hash is < θ·2⁶⁴."""
        if self.vals.size < self.k:
            return 1.0
        return float(self.vals[self.k - 1]) / _U64

    def estimate(self) -> float:
        if self.vals.size < self.k:
            return float(self.vals.size)  # exact below capacity
        return (self.k - 1) / self.theta()

    def rel_error(self) -> float:
        return 1.0 / math.sqrt(max(self.k - 2, 1))

    def _sample(self, theta: float) -> np.ndarray:
        """Kept hashes strictly below a (possibly tighter) threshold."""
        if theta >= 1.0:
            return self.vals
        # float -> uint64 is safe; a Python int > 2^63-1 would overflow
        # numpy's scalar constructor
        cut = np.uint64(theta * _U64)
        return self.vals[self.vals < cut]


def _pairwise(a: Theta, b: Theta) -> tuple[float, np.ndarray, np.ndarray]:
    theta = min(a.theta(), b.theta())
    return theta, a._sample(theta), b._sample(theta)


def intersection_estimate(a: Theta, b: Theta) -> float:
    """|A ∩ B| — the operation HLL cannot do."""
    theta, sa, sb = _pairwise(a, b)
    return np.intersect1d(sa, sb, assume_unique=True).size / theta


def union_estimate(a: Theta, b: Theta) -> float:
    theta, sa, sb = _pairwise(a, b)
    return np.union1d(sa, sb).size / theta


def difference_estimate(a: Theta, b: Theta) -> float:
    """|A \\ B| — e.g. "urls in this crawl not seen in the last"."""
    theta, sa, sb = _pairwise(a, b)
    return np.setdiff1d(sa, sb, assume_unique=True).size / theta


def theta_build(df: DataFrame, col: str, k: int = 4096) -> Theta:
    """Global Theta sketch over a column.  Zero shuffles."""
    return _sk.build_sketch(df, col, lambda pid: Theta(k), seeds=(THETA_SEED,))


def theta_by_group(df: DataFrame, group_col: str, col: str, k: int = 4096) -> DataFrame:
    """Per-group Theta sketches → (group, state binary); estimate with
    ``sketch.estimate_col(Theta)``, combine groups with the set estimators."""
    return _sk.sketch_by_group(df, group_col, col, lambda pid: Theta(k),
                               seeds=(THETA_SEED,))
