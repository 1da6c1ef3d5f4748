"""Count-min sketch — d×w counter matrix, element-wise-add merge.

Frequency sketch in the library's partial/final pattern: two JVM ``xxhash64``
base hashes per row, d row-indices via Kirsch–Mitzenmacher (same double-
hashing scheme the reference uses for its Bloom indices,
/root/reference/src/filter.rs:303-311), per-batch ``bincount`` adds.

Guarantees (Cormode & Muthukrishnan 2005): point estimates never
underestimate; overestimate ≤ εN with probability ≥ 1−δ for w = ⌈e/ε⌉,
d = ⌈ln(1/δ)⌉.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame

from sparksketch import sketch as _sk
from sparksketch.hashing import spark_xxhash64

CMS_SEEDS = (0xC4150001, 0xC4150002)

_MAGIC = b"CMS1"


class CMS:
    def __init__(self, d: int = 5, w: int = 8192):
        self.d = d
        self.w = w
        self.counts = np.zeros((d, w), dtype=np.int64)
        self.total = 0

    def _indices(self, h1: np.ndarray, h2: np.ndarray, j: int) -> np.ndarray:
        return ((h1 + np.uint64(j) * h2) % np.uint64(self.w)).astype(np.int64)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        for j in range(self.d):
            idx = self._indices(h1, h2, j)
            self.counts[j] += np.bincount(idx, minlength=self.w)
        self.total += int(h1.shape[0])

    def merge(self, other: "CMS") -> "CMS":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("cannot merge CMS with different geometry")
        self.counts += other.counts
        self.total += other.total
        return self

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<HIq", self.d, self.w, self.total) + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CMS":
        assert data[:4] == _MAGIC
        d, w, total = struct.unpack_from("<HIq", data, 4)
        c = cls(d, w)
        off = 4 + struct.calcsize("<HIq")
        c.counts = np.frombuffer(data[off : off + d * w * 8], dtype=np.int64).reshape(d, w).copy()
        c.total = total
        return c

    # ---- queries ----

    def query_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        est = np.full(h1.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(self.d):
            est = np.minimum(est, self.counts[j, self._indices(h1, h2, j)])
        return est

    def query(self, key: str | bytes) -> int:
        h1 = np.array([spark_xxhash64(key, CMS_SEEDS[0])], dtype=np.uint64)
        h2 = np.array([spark_xxhash64(key, CMS_SEEDS[1])], dtype=np.uint64)
        return int(self.query_hashes(h1, h2)[0])

    def epsilon(self) -> float:
        return math.e / self.w

    def error_bound(self) -> float:
        """Additive overestimate bound εN (holds per query w.p. ≥ 1−δ)."""
        return self.epsilon() * self.total


def cms_build(df: DataFrame, col: str, d: int = 5, w: int = 8192) -> CMS:
    """Global frequency sketch over a column. Zero shuffles."""
    return _sk.build_sketch(df, col, lambda pid: CMS(d, w), seeds=CMS_SEEDS)


def cms_by_group(df: DataFrame, group_col: str, col: str, d: int = 5, w: int = 8192) -> DataFrame:
    """Per-group frequency sketches → DataFrame (group, state binary)."""
    return _sk.sketch_by_group(df, group_col, col, lambda pid: CMS(d, w), seeds=CMS_SEEDS)


def cms_topk(sketch: CMS, candidates: list[str], k: int = 10) -> list[tuple[str, int]]:
    """Heavy hitters over a candidate key set (e.g. the distinct hosts)."""
    ests = [(c, sketch.query(c)) for c in candidates]
    ests.sort(key=lambda t: (-t[1], t[0]))
    return ests[:k]
