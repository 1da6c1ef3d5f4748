"""AMS / Count-Sketch — the second-moment and JOIN-SIZE sketch.

HLL counts distinct keys; CMS bounds individual frequencies; neither can
answer "how big is the self-join?" (``F₂ = Σₖ fₖ²`` — the skew statistic
that decides whether a key is broadcastable or needs salting) or "how big
is the join between THESE two tables?" (``Σₖ fₖ·gₖ`` — the cardinality a
query planner needs before picking a join strategy).  The AMS sketch
(Alon–Matias–Szegedy, STOC 1996) in its Count-Sketch form (Charikar–Chen–
Farach-Colton, ICALP 2002) answers both from a fixed ``d×w`` table of
signed counters:

    table[i][hᵢ(k)] += sᵢ(k)        (sᵢ ∈ {±1}, one (hᵢ, sᵢ) pair per row)

Each row's ``Σⱼ table[i][j]²`` is an **unbiased** estimate of F₂ with
``Var ≤ 2·F₂²/w``; the median over the ``d`` independent rows gives
``|est − F₂| ≤ 4·F₂/√w`` except with probability ≤ Σ_{j≥⌈d/2⌉} C(d,j)/8ʲ
(Chebyshev per row + median amplification — ~2% at d=5, <0.1% at d=9).
Row-wise dot products between two sketches built with the SAME seeds
estimate the inner product ``Σₖ fₖ·gₖ`` (join size) with the analogous
``4·√(F₂(f)·F₂(g))/√w`` bound.

Counters are exact int64s, so merges are **byte-identical** under any
order/partitioning (integer adds commute) — stronger than the estimate-
level guarantees of the float sketches.  Library pattern as everywhere
else: one JVM ``xxhash64`` per row, per-row (column, sign) derived
in-kernel via splitmix64, ``np.bincount`` scatter-adds per Arrow batch,
byte-blob serde, zero-shuffle partial/final build.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame

from sparksketch import sketch as _sk
from sparksketch.hashing import splitmix64

AMS_SEED = 0xA5C0FFEE  # fixed stream: sketches over different tables align

_MAGIC = b"AMS1"


class AMS:
    """d×w Count-Sketch table of exact signed int64 counters."""

    def __init__(self, d: int = 5, w: int = 8192):
        if d < 1 or d % 2 == 0:
            raise ValueError("d must be odd and >= 1 (median of rows)")
        if w < 16:
            raise ValueError("w must be >= 16")
        self.d = d
        self.w = w
        self.table = np.zeros((d, w), dtype=np.int64)
        self.n = 0  # total updates (stream length, not distinct keys)

    # ---- updates ----

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        self.n += int(h.size)
        h = h.astype(np.uint64)
        for i in range(self.d):
            # one independent (column, sign) pair per row: remix the base
            # hash with a per-row constant; top bit -> sign, low bits -> col
            row_c = np.uint64(((i + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            m = splitmix64(h ^ row_c)
            cols = (m % np.uint64(self.w)).astype(np.int64)
            signs = (m >> np.uint64(63)).astype(bool)
            pos = np.bincount(cols[signs], minlength=self.w)
            neg = np.bincount(cols[~signs], minlength=self.w)
            self.table[i] += pos - neg

    # ---- merge / serde ----

    def merge(self, other: "AMS") -> "AMS":
        if (other.d, other.w) != (self.d, self.w):
            raise ValueError("cannot merge AMS sketches with different (d, w)")
        self.table += other.table
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        return (_MAGIC + struct.pack("<IIQ", self.d, self.w, self.n)
                + self.table.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "AMS":
        assert data[:4] == _MAGIC
        d, w, n = struct.unpack_from("<IIQ", data, 4)
        sk = cls(d, w)
        sk.n = n
        sk.table = np.frombuffer(
            data, dtype=np.int64, count=d * w,
            offset=4 + struct.calcsize("<IIQ")).reshape(d, w).copy()
        return sk

    # ---- estimates ----

    def f2_estimate(self) -> float:
        """Self-join size Σₖ fₖ² — median of the per-row unbiased estimates.

        Accumulated in float64: squared counters pass 2⁶³ once a stream
        exceeds ~3·10⁹ occurrences of one key, where int64 einsum would
        silently wrap; float64 keeps the estimate sane at any scale (its
        2⁻⁵³ rounding is negligible against the 4/√w sketch band)."""
        t = self.table.astype(np.float64)
        return float(np.median(np.einsum("ij,ij->i", t, t)))

    def inner_product(self, other: "AMS") -> float:
        """Join size Σₖ fₖ·gₖ against a sketch built with the same (d, w)
        and seed over another table's key column (float64 accumulation —
        see :meth:`f2_estimate`)."""
        if (other.d, other.w) != (self.d, self.w):
            raise ValueError("sketches must share (d, w)")
        return float(np.median(np.einsum(
            "ij,ij->i", self.table.astype(np.float64),
            other.table.astype(np.float64))))

    def rel_error(self) -> float:
        """The certificate margin: |est − F₂| ≤ rel_error()·F₂ w.h.p.
        (per-row Chebyshev at 4/√w, amplified by the d-row median)."""
        return 4.0 / math.sqrt(self.w)

    def median_fail_prob(self) -> float:
        """Upper bound on P(median outside the rel_error band): the median
        misses only if ≥ ⌈d/2⌉ of the d rows miss, each with prob ≤ 1/8."""
        half = (self.d + 1) // 2
        return sum(math.comb(self.d, j) * (1 / 8) ** j * (7 / 8) ** (self.d - j)
                   for j in range(half, self.d + 1))


def ams_build(df: DataFrame, col: str, d: int = 5, w: int = 8192) -> AMS:
    """Global AMS sketch over a column (NULLs dropped like SQL aggregates).
    Zero shuffles: one d×w table per scan partition, blobs merged."""
    return _sk.build_sketch(df, col, lambda pid: AMS(d, w), seeds=(AMS_SEED,))


def ams_by_group(df: DataFrame, group_col: str, col: str,
                 d: int = 5, w: int = 8192) -> DataFrame:
    """Per-group AMS sketches → (group, state binary); estimate with
    ``sketch.estimate_col(AMS, "f2_estimate")``."""
    return _sk.sketch_by_group(df, group_col, col, lambda pid: AMS(d, w),
                               seeds=(AMS_SEED,))
