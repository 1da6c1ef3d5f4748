"""Misra–Gries heavy hitters — approximate top-k WITHOUT a candidate set.

Complements the CMS (sparksketch.cms), which answers point queries only for
keys you already know; Misra–Gries *surfaces* the frequent keys.  Classic
guarantees (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012):

- at most ``k`` counters survive;
- every key with true frequency > n/(k+1) is present;
- for any tracked key: ``est ≤ true ≤ est + decrement_total`` where
  ``decrement_total ≤ n/(k+1)`` — preserved under merges.

Distributed shape: the one sketch in the library that must see the raw key
strings (it returns them), so the Arrow transfer ships exactly one
string column; batch updates are a vectorized value-counts + a pandas
Series add (no per-row Python), and the per-partition states are k-sized.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

from sparksketch import sketch as _sk

_MAGIC = b"MGK1"


class MisraGries:
    def __init__(self, k: int = 64):
        self.k = int(k)
        self.counters = pd.Series(dtype=np.int64)
        self.n = 0          # total keys seen
        self.dec = 0        # total decrement applied (the error bound)

    # ---- updates ----

    def update_keys(self, keys) -> None:
        """``keys``: a pyarrow string array (or anything value_counts-able)."""
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            # drop nulls BEFORE counting: value_counts counts null as a
            # group, which would enter the counters and serialize as the
            # literal string "None", corrupting topk()/estimate()
            vc = pc.value_counts(pc.drop_null(keys))
            batch = pd.Series(vc.field("counts").to_numpy(zero_copy_only=False),
                              index=vc.field("values").to_pylist(), dtype=np.int64)
        else:
            batch = pd.Series(np.asarray(keys, dtype=object)).value_counts(dropna=True)
        self.n += int(batch.sum())
        self.counters = batch.add(self.counters, fill_value=0).astype(np.int64)
        self._prune()

    def _prune(self) -> None:
        if len(self.counters) <= self.k:
            return
        # subtract the (k+1)-th largest count from everyone, drop ≤ 0 —
        # the batched equivalent of k+1 repeated MG decrements
        t = int(np.partition(self.counters.to_numpy(), -(self.k + 1))[-(self.k + 1)])
        self.dec += t
        kept = self.counters[self.counters > t] - t
        self.counters = kept.astype(np.int64)

    # ---- merge / serde ----

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("cannot merge MisraGries with different k")
        self.counters = self.counters.add(other.counters, fill_value=0).astype(np.int64)
        self.n += other.n
        self.dec += other.dec
        self._prune()
        return self

    def to_bytes(self) -> bytes:
        keys = [str(x).encode("utf-8") for x in self.counters.index]
        cnts = self.counters.to_numpy(dtype=np.int64)
        head = struct.pack("<IqqI", self.k, self.n, self.dec, len(keys))
        lens = np.fromiter((len(b) for b in keys), dtype=np.int32, count=len(keys))
        return b"".join([_MAGIC, head, lens.tobytes(), cnts.tobytes(), *keys])

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        assert data[:4] == _MAGIC
        k, n, dec, m = struct.unpack_from("<IqqI", data, 4)
        off = 4 + struct.calcsize("<IqqI")
        lens = np.frombuffer(data[off : off + 4 * m], dtype=np.int32)
        off += 4 * m
        cnts = np.frombuffer(data[off : off + 8 * m], dtype=np.int64)
        off += 8 * m
        keys = []
        for ln in lens:
            keys.append(data[off : off + ln].decode("utf-8"))
            off += int(ln)
        sk = cls(k)
        sk.n, sk.dec = n, dec
        sk.counters = pd.Series(cnts.copy(), index=keys, dtype=np.int64)
        return sk

    # ---- queries ----

    def estimate(self, key: str) -> tuple[int, int]:
        """(lower, upper) bound on the true count: est ≤ true ≤ est + dec."""
        lo = int(self.counters.get(key, 0))
        return lo, lo + self.dec

    def error_bound(self) -> int:
        """Max undercount of any tracked key (and max true count of an
        untracked one); ≤ n/(k+1) by the MG analysis."""
        return self.dec

    def topk(self, j: int | None = None) -> list[tuple[str, int]]:
        """Keys by estimated count desc (ties by key asc) — lower bounds."""
        items = sorted(self.counters.items(), key=lambda t: (-t[1], t[0]))
        return [(str(a), int(b)) for a, b in (items if j is None else items[:j])]


def heavy_hitters(df: DataFrame, col: str, k: int = 64) -> MisraGries:
    """Global heavy-hitters sketch over a column. Zero shuffles: one k-sized
    partial per scan partition, driver/tree merge (sketch framework)."""
    return _sk.build_sketch(df, col, lambda pid: MisraGries(k), keyed=True)


def heavy_hitters_by_group(df: DataFrame, group_col: str, col: str, k: int = 64) -> DataFrame:
    """Per-group heavy hitters → DataFrame (group, state binary)."""
    return _sk.sketch_by_group(df, group_col, col, lambda pid: MisraGries(k), keyed=True)


def topk_by_group(states: DataFrame, j: int = 10) -> DataFrame:
    """Expand (group, state) rows into (group, key, cnt_lo, err_bound) —
    no shuffle (mapInPandas over the already-merged group states)."""
    def fn(pdfs):
        for pdf in pdfs:
            out = []
            for _, r in pdf.iterrows():
                sk = MisraGries.from_bytes(bytes(r["state"]))
                err = sk.error_bound()
                for key, c in sk.topk(j):
                    out.append((r["group"], key, c, err))
            yield pd.DataFrame(out, columns=["group", "key", "cnt_lo", "err_bound"])

    return states.mapInPandas(fn, "group string, key string, cnt_lo long, err_bound long")
