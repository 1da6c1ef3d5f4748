"""KLL — compactor-based quantile sketch (Karnin, Lang, Liberty 2016).

Levels of buffers; level h holds items of weight 2^h.  When total size
exceeds capacity, the lowest over-full level is sorted and every other item
(random even/odd offset) is promoted — rank error ε ≈ O(1/k) with the
(2/3)^depth capacity schedule.  Randomness is seeded per partition id, so a
given build is reproducible run-to-run.
Merge: concatenate levels pairwise, then compact — associative in
distribution (estimates, not bytes, are the contract; cf. bloom's
byte-identical merges).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksketch import sketch as _sk

_MAGIC = b"KLL2"
_MAGIC_V1 = b"KLL1"  # legacy: rng state truncated to low 64 bits
_C = 2.0 / 3.0
_U64 = (1 << 64) - 1


class KLL:
    def __init__(self, k: int = 200, seed: int = 0):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.rng = np.random.default_rng((0x6B6C6C, seed))

    # ---- capacity schedule ----

    def _cap(self, h: int) -> int:
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (_C ** depth))))

    def _total(self) -> int:
        return sum(lv.size for lv in self.levels)

    def _capacity(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    # ---- updates ----

    def update_values(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], x])
        self.n += int(x.size)
        self._compact_all()

    def _compact_all(self) -> None:
        while self._total() > self._capacity():
            for h in range(len(self.levels)):
                if self.levels[h].size > self._cap(h):
                    self._compact(h)
                    break
            else:
                break

    def _compact(self, h: int) -> None:
        buf = np.sort(self.levels[h], kind="stable")
        off = int(self.rng.integers(0, 2))
        promoted = buf[off::2]
        self.levels[h] = np.empty(0, dtype=np.float64)
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # ---- merge / serde ----

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("cannot merge KLLs with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compact_all()
        return self

    def to_bytes(self) -> bytes:
        parts = [_MAGIC, struct.pack("<IqH", self.k, self.n, len(self.levels))]
        for lv in self.levels:
            parts.append(struct.pack("<I", lv.size))
            parts.append(lv.tobytes())
        # full 128-bit PCG64 (state, inc) travels so resumed updates restore
        # the exact RNG stream (the low-64 truncation of the V1 format
        # restored a different stream; estimates were valid, reproducibility
        # wasn't)
        full = self.rng.bit_generator.state
        st = full["state"]
        parts.append(struct.pack("<QQQQII",
                                 st["state"] & _U64, (st["state"] >> 64) & _U64,
                                 st["inc"] & _U64, (st["inc"] >> 64) & _U64,
                                 full["uinteger"], full["has_uint32"]))
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        magic = data[:4]
        assert magic in (_MAGIC, _MAGIC_V1)
        k, n, n_levels = struct.unpack_from("<IqH", data, 4)
        sk = cls(k)
        sk.n = n
        off = 4 + struct.calcsize("<IqH")
        sk.levels = []
        for _ in range(n_levels):
            (sz,) = struct.unpack_from("<I", data, off)
            off += 4
            sk.levels.append(np.frombuffer(data[off : off + 8 * sz], dtype=np.float64).copy())
            off += 8 * sz
        s = sk.rng.bit_generator.state
        if magic == _MAGIC:
            s_lo, s_hi, i_lo, i_hi, uinteger, has32 = struct.unpack_from("<QQQQII", data, off)
            state, inc = (s_hi << 64) | s_lo, (i_hi << 64) | i_lo
            # the buffered half-draw travels too (PCG64 serves 32-bit
            # requests from a 64-bit draw in halves)
            s["uinteger"] = uinteger
            s["has_uint32"] = has32
        else:
            state, inc = struct.unpack_from("<QQ", data, off)
        s["state"]["state"] = state
        s["state"]["inc"] = inc
        sk.rng.bit_generator.state = s
        return sk

    # ---- queries ----

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, 1 << h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(i, v.size - 1)])

    def rank(self, x: float) -> float:
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        i = np.searchsorted(v, x, side="right")
        return float(w[:i].sum() / w.sum())

    def eps(self) -> float:
        """Rough rank-error guideline for the (2/3)-schedule: ~1.7/k·√levels."""
        return 1.7 / self.k * max(1.0, np.sqrt(max(1, len(self.levels) - 1)))


def kll_build(df: DataFrame, col: str, k: int = 200) -> KLL:
    """Global KLL over a numeric column. Zero shuffles; per-partition seeds."""
    return _sk.build_sketch(df, col, lambda pid: KLL(k, seed=pid), numeric=True)


def kll_by_group(df: DataFrame, group_col: str, col: str, k: int = 200) -> DataFrame:
    return _sk.sketch_by_group(df, group_col, col, lambda pid: KLL(k, seed=pid), numeric=True)


def bucket_boundaries(sk: KLL, n_buckets: int) -> list[float]:
    """The ``n_buckets − 1`` interior equi-depth boundaries of a KLL sketch
    (quantiles at i/B)."""
    if n_buckets < 2:
        raise ValueError("need at least 2 buckets")
    return [sk.quantile(i / n_buckets) for i in range(1, n_buckets)]


def bucketize(df: DataFrame, col: str, n_buckets: int = 10,
              out: str = "bucket", k: int = 200,
              sk: KLL | None = None) -> tuple[DataFrame, list[float]]:
    """Equi-depth bucketing: append the quantile-bucket index of ``col`` —
    bucket ``i`` covers values in ``(q_{i/B}, q_{(i+1)/B}]``, so every
    bucket holds ≈ N/B rows (within the sketch's rank error ε: the
    population of any bucket is N/B ± 2εN).  The consumption counterpart of
    the quantile sketches — feeds equi-depth histograms, length-balanced
    batch packing, and skew-aware range partitioning.

    One sketch pass (zero shuffle) + one pure-JVM assignment expression
    (``size(filter(boundaries, b -> col > b))`` — codegen'd, no UDF, no
    second shuffle).  Pass ``sk`` to reuse an existing sketch (e.g. built
    on yesterday's data) so the assignment is the only work.

    Returns ``(df_with_bucket, boundaries)``; NULL values get bucket NULL.
    """
    sk = sk if sk is not None else kll_build(df, col, k=k)
    bounds = bucket_boundaries(sk, n_buckets)
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    c = F.col(col).cast("double")
    bucket = F.when(c.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(F.filter(barr, lambda b: c > b)).cast("int"))
    return df.withColumn(out, bucket), bounds
