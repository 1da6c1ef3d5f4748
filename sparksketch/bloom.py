"""The centerpiece: a hybrid dynamically-scalable cascading multidimensional
Bloom filter as a mergeable byte-array sketch over Spark DataFrames.

Architecture (Spark-first re-derivation of /root/reference/src/filter.rs):

- **Shard routing** — every key is routed to one of ``n_shards`` logical
  shards by a seeded JVM hash (``pmod(xxhash64(key, seed[0]), n_shards)``),
  the Spark analogue of the reference's shard vector + jump-hash routing
  (filter.rs:120-137).  Jump consistent hash is only needed to *resize a live
  shard vector*, which the reference never does (shard count is fixed after
  init, filter.rs:190), so ``pmod`` is equivalent for fixed n — documented
  deviation.  All rows of a shard land in one partition
  (``repartition(P, shard_id)``), so each shard is built by exactly one task
  with exact local capacities and no atomics (the reference needs
  ``AtomicU64::fetch_or`` because shards are concurrently written,
  filter.rs:323; a Spark partition is single-threaded).
- **Tiers** — each shard holds ``cfg.tiers`` (default 2) independent cascades
  with disjoint (h1, h2) seed families: *cartographer* and *inheritor*
  (filter.rs:20-21, 444-458).  A key must match in **every** tier
  (AND-cascade, filter.rs:45-55) — the reference's signature accuracy
  mechanism; effective FPR ≈ product of tier FPRs.
- **Cascading levels** — instead of the reference's in-place rebuild-at-2m
  rehash (filter.rs:227-274), which is hostile to distributed merging, a
  shard-tier grows by *freezing* its active level and opening the next with
  ``m_{l+1} = 2·m_l`` when fill reaches the reference's rehash threshold
  (``m/n <= threshold``, filter.rs:373-375).  Deterministic geometry
  ``m_l = m0·2^l`` with ``k_l = optimal_k(m_l, expected_n(m_l))``
  (filter.rs:377-389) makes same-level arrays always OR-compatible, so merges
  are associative + commutative and never clear bits → zero false negatives
  survive any merge order.
- **Hashing** — Kirsch–Mitzenmacher double hashing (filter.rs:303-311) off
  two JVM-computed ``xxhash64`` base hashes per tier (xxh3_128 → xxh64 is a
  documented deviation; zero-FN and the FPR bound are seed-family-agnostic).
  The shuffle carries only two int64 base hashes per row (16 B) — shard id
  and per-tier KM pairs are derived in-kernel via splitmix64 — never the
  key text; at 100 TB input the shuffle is ~GBs.
- **Merge** — ``treeReduce`` OR-merges per-shard byte blobs in log depth.
  Disjoint shards concatenate; same-shard same-level bitsets OR and their
  key counts add.  A merged level whose fill exceeds capacity is flagged
  (``overflowed``) — compaction = re-aggregating the source table, which is
  the distributed replacement for the reference's per-shard WAL
  (filter.rs:347-371, 490-524): the immutable input table *is* the key log.

Query paths:

- :func:`with_membership` — broadcast the (small) filter blob, probe with a
  vectorized pandas UDF over JVM-precomputed hash columns.
- :func:`membership_join` — at 10^12-doc scale the filter itself is TBs and
  must stay distributed: keep the builder's per-shard state DataFrame and
  join probes to it on ``shard_id`` (co-partitioned equi-join), checking
  membership per shard group.  No driver collection anywhere.
"""

from __future__ import annotations

import io
import json
import math
import os
import struct
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksketch.config import BloomConfig, expected_n, optimal_k
from sparksketch.hashing import (
    HASH_SEED_SELECTION,
    derive_shard,
    derive_tier_hashes,
    hash_col,
    km_indices,
    set_bits,
    spark_xxhash64,
    splitmix64,
    test_bits,
    to_u64,
)

_MAGIC = b"SKBF"
_VERSION = 2        # flags byte == 0 (the original pad byte)
_VERSION_FLAGS = 3  # same layout, nonzero flags byte (bit 0 = strict_parity)


@dataclass
class Level:
    """One frozen-or-active Bloom bit-array of a shard-tier cascade.

    Mirrors the reference's ``Shard`` bit state (filter.rs:279-288):
    ``m`` bits (power of two), ``k`` hash functions, ``n`` keys inserted,
    packed into a uint64 word array (filter.rs:403-407)."""

    idx: int
    m: int
    k: int
    n: int
    bits: np.ndarray  # uint64[m // 64]

    @classmethod
    def fresh(cls, idx: int, m0: int, threshold: float) -> "Level":
        m = m0 << idx
        return cls(idx=idx, m=m, k=optimal_k(m, expected_n(m, threshold)), n=0,
                   bits=np.zeros(m // 64, dtype=np.uint64))

    def capacity(self, threshold: float) -> int:
        return expected_n(self.m, threshold)

    def fill_fpr(self) -> float:
        """(1 - e^{-kn/m})^k for the *actual* fill — the standard Bloom FPR."""
        if self.n == 0:
            return 0.0
        return (1.0 - math.exp(-self.k * self.n / self.m)) ** self.k

    def copy(self) -> "Level":
        return Level(self.idx, self.m, self.k, self.n, self.bits.copy())


def _merge_levels(a: list[Level], b: list[Level]) -> list[Level]:
    """OR same-index levels, keep extras. Associative + commutative."""
    out: dict[int, Level] = {lv.idx: lv.copy() for lv in a}
    for lv in b:
        if lv.idx in out:
            tgt = out[lv.idx]
            assert tgt.m == lv.m and tgt.k == lv.k, "geometry mismatch"
            tgt.bits |= lv.bits
            tgt.n += lv.n
        else:
            out[lv.idx] = lv.copy()
    return [out[i] for i in sorted(out)]


@dataclass
class BloomFilterState:
    """Driver-side value object for a (possibly partial) filter: a map of
    shard_id → per-tier level cascades, plus the frozen geometry."""

    tiers: int
    n_shards: int
    m0: int
    threshold: float
    rehash: bool
    shards: dict[int, list[list[Level]]] = field(default_factory=dict)
    # strict_parity: the reference's 2-shards-per-tier redundancy
    # (filter.rs:120-137) — tier t routes by base hash t, keys insert into
    # p1 and p2=(p1+mask/2)&mask, probes AND all four shard-tier checks
    strict: bool = False

    # ---------------- construction ----------------

    @classmethod
    def empty(cls, cfg: BloomConfig, n_shards: int, m0: int | None = None) -> "BloomFilterState":
        return cls(tiers=cfg.tiers, n_shards=n_shards, m0=m0 or cfg.m0,
                   threshold=cfg.threshold, rehash=cfg.rehash,
                   strict=cfg.strict_parity)

    # ---------------- serialization ----------------

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        buf.write(_MAGIC)
        # the flags byte occupies what was the V2 pad byte; blobs with any
        # flag set are stamped V3 so a pre-flags reader REJECTS them instead
        # of silently decoding strict=False and probing with default routing
        # (a zero-FN contract break under reader/writer version skew)
        flags = int(self.strict)
        ver = _VERSION_FLAGS if flags else _VERSION
        buf.write(struct.pack("<BBBBIId", ver, self.tiers, int(self.rehash),
                              flags, self.n_shards, len(self.shards),
                              self.threshold))
        buf.write(struct.pack("<Q", self.m0))
        for sid in sorted(self.shards):
            buf.write(struct.pack("<I", sid))
            for tier_levels in self.shards[sid]:
                buf.write(struct.pack("<H", len(tier_levels)))
                for lv in tier_levels:
                    buf.write(struct.pack("<IQHQ", lv.idx, lv.m, lv.k, lv.n))
                    buf.write(lv.bits.tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilterState":
        if data[:4] != _MAGIC:
            raise ValueError("not a sparksketch bloom blob")
        off = 4
        ver, tiers, rehash, flags, n_shards, n_entries, threshold = struct.unpack_from("<BBBBIId", data, off)
        off += struct.calcsize("<BBBBIId")
        if ver not in (_VERSION, _VERSION_FLAGS):
            raise ValueError(f"unsupported blob version {ver}")
        if ver == _VERSION and flags:
            raise ValueError("v2 blob with nonzero flags byte (corrupt or "
                             "written by a skewed writer) — refusing to guess")
        if flags & ~1:
            raise ValueError(f"unknown blob flag bits 0x{flags & ~1:x} — "
                             "written by a newer sparksketch; refusing to "
                             "probe with incompatible routing")
        (m0,) = struct.unpack_from("<Q", data, off)
        off += 8
        st = cls(tiers=tiers, n_shards=n_shards, m0=m0, threshold=threshold,
                 rehash=bool(rehash), strict=bool(flags & 1))
        for _ in range(n_entries):
            (sid,) = struct.unpack_from("<I", data, off)
            off += 4
            tiers_levels = []
            for _t in range(tiers):
                (n_levels,) = struct.unpack_from("<H", data, off)
                off += 2
                levels = []
                for _l in range(n_levels):
                    idx, m, k, n = struct.unpack_from("<IQHQ", data, off)
                    off += struct.calcsize("<IQHQ")
                    nbytes = m // 8
                    if off + nbytes > len(data):
                        raise ValueError("truncated sparksketch bloom blob")
                    bits = np.frombuffer(data[off : off + nbytes], dtype=np.uint64).copy()
                    off += nbytes
                    levels.append(Level(idx, m, k, n, bits))
                tiers_levels.append(levels)
            st.shards[sid] = tiers_levels
        return st

    # ---------------- merge (associative + commutative) ----------------

    def merge(self, other: "BloomFilterState") -> "BloomFilterState":
        if (self.tiers, self.n_shards, self.m0, self.threshold, self.strict) != (
            other.tiers, other.n_shards, other.m0, other.threshold, other.strict
        ):
            raise ValueError("cannot merge filters with different geometry")
        out = BloomFilterState(self.tiers, self.n_shards, self.m0, self.threshold,
                               self.rehash, strict=self.strict)
        for sid in set(self.shards) | set(other.shards):
            a = self.shards.get(sid)
            b = other.shards.get(sid)
            if a is None:
                out.shards[sid] = [[lv.copy() for lv in t] for t in b]
            elif b is None:
                out.shards[sid] = [[lv.copy() for lv in t] for t in a]
            else:
                out.shards[sid] = [_merge_levels(a[t], b[t]) for t in range(self.tiers)]
        return out

    def merge_into(self, other: "BloomFilterState") -> "BloomFilterState":
        """In-place OR-merge of ``other`` into self — O(|other|) instead of
        O(|self| + |other|); the right fold primitive for collect-and-merge
        (a copying fold over P partials is quadratic in filter size)."""
        if (self.tiers, self.n_shards, self.m0, self.threshold, self.strict) != (
            other.tiers, other.n_shards, other.m0, other.threshold, other.strict
        ):
            raise ValueError("cannot merge filters with different geometry")
        for sid, cascade in other.shards.items():
            mine = self.shards.get(sid)
            if mine is None:
                # copy on adopt (one copy per NEW shard over the whole fold):
                # aliasing other's arrays would let later merges OR into the
                # donor's bits in place, silently corrupting a reused `other`
                self.shards[sid] = [[lv.copy() for lv in t] for t in cascade]
                continue
            for t in range(self.tiers):
                levels = {lv.idx: lv for lv in mine[t]}
                for lv in cascade[t]:
                    tgt = levels.get(lv.idx)
                    if tgt is None:
                        # copy, like the shard-adopt branch: appending the
                        # donor's Level object by reference would let a later
                        # merge OR into the donor's own bits in place
                        mine[t].append(lv.copy())
                    else:
                        tgt.bits |= lv.bits
                        tgt.n += lv.n
                mine[t].sort(key=lambda l: l.idx)
        self._stacked = None  # bitsets mutated: invalidate the probe index
        return self

    # ---------------- queries ----------------

    def _base_hashes(self, key: str | bytes) -> tuple[np.ndarray, np.ndarray]:
        h1 = spark_xxhash64(key, HASH_SEED_SELECTION[0])
        h2 = spark_xxhash64(key, HASH_SEED_SELECTION[1])
        return (np.array([h1], dtype=np.uint64).view(np.int64),
                np.array([h2], dtype=np.uint64).view(np.int64))

    def contains(self, key: str | bytes) -> bool:
        """Driver-side single-key probe (tests / point lookups) — exact
        replica of the distributed path via the Spark-parity XXH64.
        Counterpart of ``contains`` filter.rs:45-55."""
        h1, h2 = self._base_hashes(key)
        return bool(self.contains_hashes(h1, h2)[0])

    # cache for the stacked probe index (uniform-geometry fast path)
    _stacked: dict | None = None

    def _build_stacked(self) -> dict | None:
        """When every shard-tier has the same level geometry (the common
        case with an expected_keys hint), stack each level's bitsets into a
        (n_shards, words) matrix so probes of ANY mix of shards become one
        flat gather — no per-shard Python loop.  At the reference-default
        4096 shards a 10k-row batch touches ~2400 shards; per-shard grouping
        costs more than the bit tests themselves."""
        sig = None
        for cascade in self.shards.values():
            s = tuple(tuple((lv.idx, lv.m, lv.k) for lv in tier) for tier in cascade)
            if sig is None:
                sig = s
            elif s != sig:
                return None
        if sig is None:
            return None
        slot = np.full(self.n_shards, -1, dtype=np.int64)
        sids = sorted(self.shards)
        for i, sid in enumerate(sids):
            slot[sid] = i
        stacked = []  # per tier: list of (m, k, words, matrix)
        for t in range(self.tiers):
            levels = []
            for li, (idx, m, k) in enumerate(sig[t]):
                mat = np.stack([self.shards[sid][t][li].bits for sid in sids])
                levels.append((m, k, m // 64, mat.reshape(-1)))
            stacked.append(levels)
        return {"slot": slot, "tiers": stacked}

    def _tier_stacked(self, cache, shard, t: int, h1, h2,
                      active: np.ndarray | None = None) -> np.ndarray:
        """Stacked flat-gather membership for ONE tier against a per-row
        shard vector — rows whose shard is absent (or outside ``active``)
        come back False."""
        slot = cache["slot"][shard]
        base_mask = slot >= 0
        if active is not None:
            base_mask = base_mask & active
        tier_ok = np.zeros(shard.shape[0], dtype=bool)
        for m, k, words, flat in cache["tiers"][t]:
            pending = base_mask & ~tier_ok
            if not pending.any():
                break
            rows = np.flatnonzero(pending)
            idx = km_indices(h1[rows], h2[rows], k, m)
            base = (slot[rows] * words).astype(np.uint64)[:, None]
            got = (flat[(idx >> np.uint64(6)) + base] >> (idx & np.uint64(63))) & np.uint64(1)
            tier_ok[rows] = got.all(axis=1)
        return tier_ok

    def _tier_grouped(self, shard, t: int, h1, h2,
                      active: np.ndarray | None = None) -> np.ndarray:
        """Per-shard-grouped membership for ONE tier (mixed-geometry path)."""
        n = shard.shape[0]
        tier_ok = np.zeros(n, dtype=bool)
        order = np.argsort(shard, kind="stable")
        sorted_sid = shard[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sorted_sid)) + 1, [n]))
        for si in range(len(starts) - 1):
            rows = order[starts[si] : starts[si + 1]]
            if active is not None:
                rows = rows[active[rows]]
                if rows.size == 0:
                    continue
            cascade = self.shards.get(int(sorted_sid[starts[si]]))
            if cascade is None:
                continue
            ok = np.zeros(rows.shape[0], dtype=bool)
            for lv in cascade[t]:
                pending = ~ok
                if not pending.any():
                    break
                idx = km_indices(h1[rows][pending], h2[rows][pending], lv.k, lv.m)
                ok[pending] = test_bits(lv.bits, idx)
            tier_ok[rows] = ok
        return tier_ok

    def contains_hashes(self, h1_i64: np.ndarray, h2_i64: np.ndarray) -> np.ndarray:
        """Vectorized membership over the two shipped base hashes (int64);
        shard routing and per-tier KM pairs are derived exactly as in the
        build kernel.  Uniform-geometry filters use a stacked flat-gather
        fast path; mixed geometry falls back to per-shard grouping (OR over
        levels, AND over tiers either way).  Strict-parity filters AND over
        *both* shards of each tier (p1 and the reference's
        ``p2=(p1+mask/2)&mask``, filter.rs:120-137)."""
        tier_hashes = derive_tier_hashes(h1_i64, h2_i64, self.tiers)
        if self._stacked is None:
            self._stacked = self._build_stacked() or {}
        if self.strict:
            off = (self.n_shards - 1) // 2
            routes = (derive_shard(h1_i64, self.n_shards),
                      derive_shard(h2_i64, self.n_shards))
            n = routes[0].shape[0]
            result = np.ones(n, dtype=bool)
            for t in range(self.tiers):
                h1, h2 = tier_hashes[t]
                s1 = routes[t]
                for s in (s1, (s1 + off) % self.n_shards):
                    if not result.any():
                        return result
                    if self._stacked:
                        result &= self._tier_stacked(self._stacked, s, t, h1, h2, result)
                    else:
                        result &= self._tier_grouped(s, t, h1, h2, result)
            return result
        shard = derive_shard(h1_i64, self.n_shards)
        result = None
        for t in range(self.tiers):
            h1, h2 = tier_hashes[t]
            if self._stacked:
                ok = self._tier_stacked(self._stacked, shard, t, h1, h2, result)
            else:
                ok = self._tier_grouped(shard, t, h1, h2, result)
            result = ok if result is None else result & ok
            if not result.any():
                break
        return result

    # ---------------- stats ----------------

    @property
    def key_count(self) -> int:
        inserts_per_key = max(self.tiers, 1) * (2 if self.strict else 1)
        return sum(lv.n for c in self.shards.values() for t in c for lv in t) // inserts_per_key

    @property
    def bit_size(self) -> int:
        return sum(lv.m for c in self.shards.values() for t in c for lv in t)

    def fpr_bound(self) -> float:
        """Upper bound on FPR for a probe: worst shard's product over tiers of
        the union bound over levels of per-level fill FPR.  Strict mode
        checks TWO shards per tier, so each tier's worst-shard term squares
        (independent shards — the reference's 4-shard-check FPR shape)."""
        checks = 2 if self.strict else 1
        worst_tier = [0.0] * self.tiers
        for cascade in self.shards.values():
            for t in range(self.tiers):
                worst_tier[t] = max(worst_tier[t],
                                    min(1.0, sum(lv.fill_fpr() for lv in cascade[t])))
        p = 1.0
        for t in range(self.tiers):
            p *= worst_tier[t] ** checks
        return p if self.shards else 0.0

    def estimate_distinct(self) -> float:
        """Distinct-key estimate from the observed bit fill (Swamidass &
        Baldi 2007): n̂ = Σ_levels −(m/k)·ln(1 − X/m) over TIER 0 (each key
        lives in every tier, so one tier carries the full population; a key
        lands in exactly one level of its shard's cascade).  This is what
        ``key_count`` (exact insertion counter) cannot give: the number of
        DISTINCT keys, with no extra pass and no extra state — the filter
        itself is the cardinality sketch.

        Caveats: a key re-inserted AFTER its level froze (cascade growth)
        counts once per level it landed in — size ``expected_keys`` so the
        build stays single-level for an exact-distinct reading; a saturated
        level (X == m) contributes its capacity bound instead of ∞.
        Strict-parity filters insert every key into TWO tier-0 shards
        (p1 and the antipodal p2, filter.rs:120-137), so the tier-0
        aggregate fill reflects 2n placements — divided back out below.
        """
        est = 0.0
        # sorted shard order: the float sum is then byte-identical between a
        # direct build and any merge order of partials with the same bits
        for sid in sorted(self.shards):
            for lv in self.shards[sid][0]:
                x = int(np.unpackbits(lv.bits.view(np.uint8)).sum())
                if x == 0:
                    continue
                if x >= lv.m:
                    # saturated: the formula diverges; report the estimate
                    # at one unset bit (its maximum resolvable value)
                    est += (lv.m / lv.k) * math.log(lv.m)
                else:
                    est += -(lv.m / lv.k) * math.log1p(-x / lv.m)
        return est / 2.0 if self.strict else est

    def configured_fpr_bound(self) -> float:
        """The configured per-probe bound: each tier contributes at most
        (levels)·0.6185^threshold per checked shard; tiers (and, in strict
        mode, the second shard per tier) multiply (filter.rs:373-383
        semantics; see SURVEY.md §1.3)."""
        max_levels = max((len(t) for c in self.shards.values() for t in c), default=1)
        per_tier = min(1.0, max_levels * (0.6185 ** self.threshold))
        checks = 2 if self.strict else 1
        return per_tier ** (self.tiers * checks)

    def overflowed_levels(self) -> list[tuple[int, int, int]]:
        """(shard, tier, level) whose merged key count exceeds capacity —
        signals a compaction (re-aggregation of the source table) is advised."""
        out = []
        for sid, cascade in self.shards.items():
            for t, levels in enumerate(cascade):
                for lv in levels:
                    if lv.n > lv.capacity(self.threshold):
                        out.append((sid, t, lv.idx))
        return out


# ====================================================================
# distributed build
# ====================================================================

_ROUTE = "_skshard"
_STATE_SCHEMA = "shard int, rows long, state binary"


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def resolve_m0(cfg: BloomConfig, n_shards: int, expected_keys: int | None) -> int:
    """Size the initial level from a cardinality hint so the cascade opens
    few levels (the mergeable analogue of pre-sizing the reference's shards).
    Never below the configured m0 (/root/reference/src/filter.rs:149-154).
    Strict parity doubles the per-shard key load (each key inserts into two
    shards per tier)."""
    if not expected_keys:
        return cfg.m0
    copies = 2 if cfg.strict_parity else 1
    per_shard = max(1, expected_keys * copies // n_shards)
    return max(cfg.m0, _next_pow2(int(per_shard * cfg.threshold)))


def hash_probe_cols(col: str | Column, tiers: int = 0, n_shards: int = 0) -> list[Column]:
    """The two JVM-side base-hash columns (16 B/row) — everything else
    (shard id, per-tier KM hash pairs) is derived in the numpy kernels via
    splitmix64, halving the shuffle + Arrow transfer vs shipping per-tier
    columns.  Seed roles: HASH_SEED_SELECTION[0] -> h1 (also routes shards
    via pmod), [1] -> h2, [2..7] -> tier derivation constants."""
    return [
        hash_col(col, HASH_SEED_SELECTION[0]).alias("_skh_a"),
        hash_col(col, HASH_SEED_SELECTION[1]).alias("_skh_b"),
    ]


def route_expr(n_shards: int) -> Column:
    """The repartition expression: pmod of the shipped base hash. Used only
    to co-locate rows of a shard — it is not materialized in the row."""
    return F.pmod(F.col("_skh_a"), F.lit(n_shards).cast("long"))


def strict_targets(n_shards: int) -> Column:
    """The strict-parity 4-way (tier, shard) target array: tier t routes by
    base hash t (reference per-tier seeds filter.rs:120-137), each with its
    antipodal second shard ``p2 = (p1 + mask/2) & mask`` (filter.rs:133-134,
    ``mask/2`` with integer division).  ONE definition shared by the build's
    explode and the strict probe's explode — if they diverged, the build
    would insert and the probe check different shards: false negatives."""
    off = (n_shards - 1) // 2
    nlit = F.lit(n_shards).cast("long")
    p1a = F.pmod(F.col("_skh_a"), nlit)
    p1b = F.pmod(F.col("_skh_b"), nlit)
    return F.array(
        F.struct(F.lit(0).alias("t"), p1a.alias("s")),
        F.struct(F.lit(0).alias("t"), F.pmod(p1a + off, nlit).alias("s")),
        F.struct(F.lit(1).alias("t"), p1b.alias("s")),
        F.struct(F.lit(1).alias("t"), F.pmod(p1b + off, nlit).alias("s")),
    )


def _insert_tier(levels: list[Level], h1: np.ndarray, h2: np.ndarray,
                 m0: int, threshold: float, rehash: bool, cap_div: int = 1) -> None:
    """Insert a batch of (h1,h2) rows into ONE tier's level cascade, opening
    new levels at the reference's fill threshold (filter.rs:92-118: the scale
    trigger; level-open replaces CAS + rehash channel + catch-up)."""
    pos, total = 0, h1.shape[0]
    while pos < total:
        lv = levels[-1]
        if rehash:
            room = max(lv.capacity(threshold) // cap_div, 1) - lv.n
            if room <= 0:
                levels.append(Level.fresh(lv.idx + 1, m0, threshold))
                continue
            take = min(room, total - pos)
        else:
            take = total - pos  # fixed geometry: absorb everything (FPR degrades, flagged)
        idx = km_indices(h1[pos : pos + take], h2[pos : pos + take], lv.k, lv.m)
        set_bits(lv.bits, idx)
        lv.n += take
        pos += take


def _insert_batch(cascade: list[list[Level]], tier_h: list[tuple[np.ndarray, np.ndarray]],
                  m0: int, threshold: float, rehash: bool, cap_div: int = 1) -> None:
    """Insert a batch of (h1,h2) rows into every tier of one shard cascade."""
    for t, (h1, h2) in enumerate(tier_h):
        _insert_tier(cascade[t], h1, h2, m0, threshold, rehash, cap_div)


def _build_partition_fn(cfg: BloomConfig, n_shards: int, m0: int,
                        checkpoint_dir: str | None, fingerprint: str | None,
                        completed: frozenset[int], cap_div: int = 1):
    """``cap_div=1``: routed mode — each shard is owned by one task, level
    capacities are exact.  ``cap_div=P``: scan-local mode — every task may
    touch every shard, so each task gets a 1/P share of each level's
    capacity; the OR-merge then fills levels to ≤ their global capacity.

    Strict-parity batches carry pre-exploded (shard, tier) insert targets
    (``_skshard``/``_sktier`` columns) — each row is one single-tier insert
    event; default batches carry one row per key and insert into every tier
    of the h1-routed shard."""
    tiers, threshold, rehash = cfg.tiers, cfg.threshold, cfg.rehash
    strict = cfg.strict_parity

    def fn(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        if checkpoint_dir and pid in completed:
            # resume: replay the checkpointed state WITHOUT consuming the
            # input iterator — the task finishes without scanning its split
            # (per-partition lineage, north_rule).
            path = os.path.join(checkpoint_dir, f"part-{pid:05d}.bin")
            with open(path, "rb") as f:
                blob = f.read()
            st = BloomFilterState.from_bytes(blob)
            for sid in sorted(st.shards):
                one = BloomFilterState(tiers, n_shards, m0, threshold, rehash, strict=strict)
                one.shards[sid] = st.shards[sid]
                rows = sum(lv.n for lv in st.shards[sid][0])
                yield pa.RecordBatch.from_pydict({
                    "shard": pa.array([sid], pa.int32()),
                    "rows": pa.array([rows], pa.int64()),
                    "state": pa.array([one.to_bytes()], pa.binary()),
                })
            return

        local: dict[int, list[list[Level]]] = {}
        nrows = 0
        for batch in batches:
            h1_i64 = batch.column("_skh_a").to_numpy(zero_copy_only=False).astype(np.int64)
            h2_i64 = batch.column("_skh_b").to_numpy(zero_copy_only=False).astype(np.int64)
            tier_cols = derive_tier_hashes(h1_i64, h2_i64, tiers)
            nrows += batch.num_rows
            if strict:
                sid_arr = batch.column(_ROUTE).to_numpy(zero_copy_only=False).astype(np.int64)
                tier_arr = batch.column("_sktier").to_numpy(zero_copy_only=False).astype(np.int64)
                key = sid_arr * tiers + tier_arr  # group by (shard, tier)
            else:
                sid_arr = derive_shard(h1_i64, n_shards)
                key = sid_arr
            order = np.argsort(key, kind="stable")
            sorted_key = key[order]
            starts = np.concatenate(([0], np.flatnonzero(np.diff(sorted_key)) + 1, [len(sorted_key)]))
            for si in range(len(starts) - 1):
                rows = order[starts[si] : starts[si + 1]]
                k = int(sorted_key[starts[si]])
                sid, t = (divmod(k, tiers)) if strict else (k, 0)
                cascade = local.get(sid)
                if cascade is None:
                    cascade = [[Level.fresh(0, m0, threshold)] for _ in range(tiers)]
                    local[sid] = cascade
                if strict:
                    _insert_tier(cascade[t], tier_cols[t][0][rows], tier_cols[t][1][rows],
                                 m0, threshold, rehash, cap_div)
                else:
                    _insert_batch(cascade, [(h1[rows], h2[rows]) for h1, h2 in tier_cols],
                                  m0, threshold, rehash, cap_div)

        if checkpoint_dir:
            st = BloomFilterState(tiers, n_shards, m0, threshold, rehash, local, strict=strict)
            blob = st.to_bytes()
            tmp = os.path.join(checkpoint_dir, f".part-{pid:05d}.tmp")
            os.makedirs(checkpoint_dir, exist_ok=True)
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(checkpoint_dir, f"part-{pid:05d}.bin"))
            meta = {"pid": pid, "rows": nrows, "fingerprint": fingerprint,
                    "shards": sorted(local), "bytes": len(blob)}
            mtmp = os.path.join(checkpoint_dir, f".part-{pid:05d}.meta.tmp")
            with open(mtmp, "w") as f:
                json.dump(meta, f)
            os.replace(mtmp, os.path.join(checkpoint_dir, f"part-{pid:05d}.meta.json"))

        for sid in sorted(local):
            one = BloomFilterState(tiers, n_shards, m0, threshold, rehash, strict=strict)
            one.shards[sid] = local[sid]
            rows = sum(lv.n for lv in local[sid][0])
            yield pa.RecordBatch.from_pydict({
                "shard": pa.array([sid], pa.int32()),
                "rows": pa.array([rows], pa.int64()),
                "state": pa.array([one.to_bytes()], pa.binary()),
            })

    return fn


def build_fingerprint(cfg: BloomConfig, n_shards: int, m0: int, partitions: int,
                      col: str, input_id: str) -> str:
    payload = (f"{cfg.tiers}|{cfg.threshold}|{cfg.rehash}|{n_shards}|{m0}"
               f"|{partitions}|{col}|{input_id}|strict={int(cfg.strict_parity)}")
    return format(spark_xxhash64(payload, 7), "016x")


def completed_partitions(checkpoint_dir: str | None, fingerprint: str) -> frozenset[int]:
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return frozenset()
    done = set()
    for name in os.listdir(checkpoint_dir):
        if name.endswith(".meta.json"):
            try:
                with open(os.path.join(checkpoint_dir, name)) as f:
                    meta = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if meta.get("fingerprint") == fingerprint and os.path.exists(
                os.path.join(checkpoint_dir, f"part-{meta['pid']:05d}.bin")
            ):
                done.add(int(meta["pid"]))
    return frozenset(done)


def build_bloom_states(df: DataFrame, col: str, cfg: BloomConfig = BloomConfig(),
                       n_shards: int | None = None, partitions: int | None = None,
                       expected_keys: int | None = None,
                       checkpoint_dir: str | None = None, input_id: str = "",
                       enforce_key_limit: bool = True, route: bool = True) -> tuple[DataFrame, dict]:
    """Distributed build → DataFrame of ``(shard int, rows long, state binary)``.

    This is the at-scale product: the filter stays a DataFrame (never
    collected), queryable via :func:`membership_join` and persistable with
    plain ``.write.parquet``.

    Two physical modes:

    - ``route=True`` (default, the 10^12-doc mode): parquet scan → Project
      (key cast, guard filter, JVM hash columns — whole-stage codegen) →
      Exchange on shard id (16 B/row — two base hashes; never the text) →
      MapInArrow (numpy bit kernel).  Each shard is built by exactly one task with exact
      level capacities, and per-task memory is filter_size / n_shards —
      mandatory when the filter is far bigger than one task's memory.
    Checkpointing (``checkpoint_dir``) assumes ONE filesystem visible to the
    driver and every task at the same path — true in local mode and on any
    shared mount (NFS, fuse-mounted object store); on a cluster without one,
    point it at such a mount or leave it off.  If ``input_id`` is empty it
    defaults to a fingerprint of the DataFrame's input files, so checkpoints
    of different source tables never collide; for non-file sources pass an
    explicit ``input_id``.

    - ``route=False`` (scan-local): no shuffle at all — every scan
      partition builds 1/P-capacity sub-levels for the shards it sees and
      the OR-merge aligns them (map-side partial aggregation).  Each task
      may hold the whole filter, so use it when filter_size fits in a task
      (up to ~GBs).  Measured: the post-shuffle row→Arrow conversion has a
      serial component that caps routed-mode scaling on one box; scan-local
      scales with cores until memory bandwidth.
    """
    spark = df.sparkSession
    n_shards = n_shards or cfg.shards
    partitions = partitions or spark.sparkContext.defaultParallelism
    m0 = resolve_m0(cfg, n_shards, expected_keys)
    if checkpoint_dir and not input_id:
        # two different datasets built with identical (config, partitions,
        # col) must not share a checkpoint fingerprint — default the input
        # identity to the source files when the caller didn't supply one
        files = df.inputFiles()
        if files:
            input_id = format(spark_xxhash64("|".join(sorted(files)), 11), "016x")

    keyed = df.select(F.col(col).cast("string").alias("_skkey"))
    if enforce_key_limit:
        # The reference *documents* a 1 MB key cap but never enforces it
        # (README.md:14-15 vs filter.rs:509-510); we make the contract real.
        keyed = keyed.filter(F.octet_length("_skkey") <= cfg.max_key_bytes)
    hashed = keyed.select(*hash_probe_cols("_skkey", cfg.tiers, n_shards))
    if cfg.strict_parity:
        # reference parity (filter.rs:120-137): tier t routes by base hash t;
        # each key inserts into p1 and p2 = (p1 + mask/2) & mask.  Explode to
        # the 2·tiers (shard, tier) insert events JVM-side, then shuffle on
        # shard — still only ~17 B/row × 4, never the key text.
        if n_shards < 4 or n_shards & (n_shards - 1):
            raise ValueError("strict_parity needs a power-of-two n_shards >= 4 "
                             "(the reference's mask arithmetic, filter.rs:133-134)")
        hashed = (hashed.select("_skh_a", "_skh_b", F.explode(strict_targets(n_shards)).alias("_tgt"))
                  .select("_skh_a", "_skh_b",
                          F.col("_tgt.t").alias("_sktier"),
                          F.col("_tgt.s").alias(_ROUTE)))
        shuffle_key = F.col(_ROUTE)
    else:
        shuffle_key = route_expr(n_shards)
    if route:
        routed = hashed.repartition(partitions, shuffle_key)
        cap_div = 1
    else:
        routed = hashed.coalesce(partitions)
        partitions = routed.rdd.getNumPartitions()
        cap_div = max(partitions, 1)

    fingerprint = build_fingerprint(cfg, n_shards, m0, partitions, col,
                                    f"{input_id}|route={int(route)}")
    completed = completed_partitions(checkpoint_dir, fingerprint)
    fn = _build_partition_fn(cfg, n_shards, m0, checkpoint_dir, fingerprint, completed, cap_div)
    states = routed.mapInArrow(fn, _STATE_SCHEMA)
    info = {"n_shards": n_shards, "partitions": partitions, "m0": m0,
            "fingerprint": fingerprint, "resumed_partitions": sorted(completed)}
    return states, info


def build_bloom(df: DataFrame, col: str, cfg: BloomConfig = BloomConfig(),
                n_shards: int | None = None, partitions: int | None = None,
                expected_keys: int | None = None, checkpoint_dir: str | None = None,
                input_id: str = "", enforce_key_limit: bool = True, route: bool = True,
                merge: str = "auto", tree_depth: int | None = None) -> BloomFilterState:
    """Build and OR-merge into a single driver-side filter.

    ``merge='driver'`` collects the per-shard blobs once and folds them on
    the driver — one Spark job total; right whenever the filter fits in
    driver memory.  ``merge='tree'`` is the log-depth distributed
    ``treeReduce`` for filters too large to fold in one process (the
    executors OR blobs pairwise; the driver only sees the final one) — at
    that size also consider never collecting at all
    (:func:`build_bloom_states` + :func:`membership_join`).
    ``'auto'``: driver below 512 shards, tree above."""
    states, info = build_bloom_states(df, col, cfg, n_shards, partitions, expected_keys,
                                      checkpoint_dir, input_id, enforce_key_limit, route)
    if merge == "auto":
        merge = "driver" if info["n_shards"] <= 512 else "tree"
    if merge == "driver":
        blobs = [bytes(r[0]) for r in states.select("state").collect()]
        if not blobs:
            return BloomFilterState.empty(cfg, info["n_shards"], info["m0"])
        acc = BloomFilterState.from_bytes(blobs[0])
        for b in blobs[1:]:
            acc.merge_into(BloomFilterState.from_bytes(b))
        return acc
    rdd = states.select("state").rdd.map(lambda r: bytes(r[0]))
    parts = info["partitions"]
    depth = tree_depth or max(2, int(math.ceil(math.log2(max(parts, 2)))))
    # treeAggregate with an empty-blob zero avoids a separate isEmpty() job
    # (which would re-run the whole build pipeline)
    merged = rdd.treeAggregate(b"", _merge_or_adopt, _merge_or_adopt, depth=min(depth, 5))
    if merged == b"":
        return BloomFilterState.empty(cfg, info["n_shards"], info["m0"])
    return BloomFilterState.from_bytes(merged)


def _merge_or_adopt(a: bytes, b: bytes) -> bytes:
    if a == b"":
        return b
    if b == b"":
        return a
    return merge_blobs(a, b)


def merge_blobs(a: bytes, b: bytes) -> bytes:
    return BloomFilterState.from_bytes(a).merge(BloomFilterState.from_bytes(b)).to_bytes()


# ====================================================================
# membership queries
# ====================================================================

# single-slot worker-side cache: (key, state). One slot, not a dict — each
# with_membership call pins a filter-sized object in every reused Python
# worker, so unbounded growth would OOM workers across repeated calls.
_BC_CACHE: list = [None, None]
_BC_SEQ = [0]  # driver-side counter for cache keys (Broadcast has no .id in PySpark 4)


def with_membership(df: DataFrame, col: str, state: BloomFilterState,
                    out: str = "is_member") -> DataFrame:
    """Append a boolean membership column — broadcast-filter mode.

    Hashes are computed JVM-side; the pandas UDF does only numpy index math
    against the broadcast blob (deserialized once per worker).  Zero false
    negatives by construction *among guarded keys*: the build drops keys
    over ``cfg.max_key_bytes`` (the documented 1 MB cap), so an oversize key
    that exists in the source probes as not-member — treat rejection as
    "guaranteed absent" only for keys within the cap (pre-filter probes with
    :func:`sparksketch.webtext.enforce_key_limit` when in doubt).  False
    positives ≤ the configured bound.

    Cost model: the first probe batch in each Python worker fetches the
    broadcast blob and builds the stacked index (parse+stack is <1 s for a
    128 MiB filter; the fetch dominates — measured ~60 s total for 128 MiB
    × 32 local workers, then cached in the single worker slot).  For
    filters beyond ~100 MiB probed once, or too big for worker memory,
    prefer :func:`membership_join`, which never replicates the filter."""
    hcols = hash_probe_cols(F.col(col).cast("string"))
    return df.withColumn(out, _membership_probe_udf(df.sparkSession, state)(*hcols))


def broadcast_probe_udf(spark, blob: bytes, deserialize):
    """Generic broadcast-probe pandas UDF over two base-hash columns: ship
    ``blob`` once, deserialize once per Python worker (single-slot cache
    keyed by a driver-side sequence — Broadcast has no ``.id`` in PySpark
    4), then call ``.contains_hashes(h1_i64, h2_i64)`` per batch.  Shared
    by the Bloom and counting-Bloom probes so cache/null-handling fixes
    land in one place."""
    bc = spark.sparkContext.broadcast(blob)
    _BC_SEQ[0] += 1
    bc_key = _BC_SEQ[0]

    @F.pandas_udf("boolean")
    def probe(ha, hb):
        if _BC_CACHE[0] == bc_key:
            cached = _BC_CACHE[1]
        else:
            cached = deserialize(bc.value)
            _BC_CACHE[0] = bc_key
            _BC_CACHE[1] = cached
        import pandas as pd
        return pd.Series(cached.contains_hashes(
            ha.to_numpy(dtype=np.int64, na_value=0),
            hb.to_numpy(dtype=np.int64, na_value=0)))

    return probe


def _membership_probe_udf(spark, state: BloomFilterState):
    """The Bloom broadcast probe.  Membership is a pure function of
    (h1, h2) — callers that have already computed the hash columns (e.g.
    to dedup probes) can apply this directly without rehashing."""
    return broadcast_probe_udf(spark, state.to_bytes(), BloomFilterState.from_bytes)


def with_group_membership(df: DataFrame, group_col: str, col: str, states,
                          out: str = "is_member",
                          max_groups: int = 100_000) -> DataFrame:
    """Append per-group membership: each row is probed against ITS group's
    filter (the output of :func:`bloom_by_group`).  Broadcast of the
    (group → blob) map — group filters are blob-sized, so the map is
    broadcastable whenever per-group sketching makes sense at all; rows and
    hashes stay distributed (no driver loop over data rows).

    ``states`` is the (group, state) DataFrame from :func:`bloom_by_group`
    or an equivalent ``{group: blob}`` dict.  The blob map is collected to
    the driver, so the group cardinality is gated at ``max_groups``
    (mirroring :func:`~sparksketch.similarity.knn_join`'s ``max_queries``):
    a million-group build would OOM the driver/broadcast — beyond the gate
    the distributed :func:`membership_join` path is the answer."""
    spark = df.sparkSession
    if isinstance(states, DataFrame):
        rows = states.select("group", "state").limit(max_groups + 1).collect()
        if len(rows) > max_groups:
            raise ValueError(
                f"with_group_membership broadcasts the (group -> blob) map; "
                f"got >{max_groups} groups - use the distributed "
                f"membership_join path for group cardinalities this large, "
                f"or raise max_groups explicitly if the blobs are known-small")
        blobs = {r.group: bytes(r.state) for r in rows}
    else:
        if len(states) > max_groups:
            raise ValueError(
                f"with_group_membership broadcasts the (group -> blob) map; "
                f"got {len(states)} groups > max_groups={max_groups} - use "
                f"membership_join for group cardinalities this large")
        blobs = {g: bytes(b) for g, b in states.items()}
    bc = spark.sparkContext.broadcast(blobs)
    _BC_SEQ[0] += 1
    bc_key = _BC_SEQ[0]

    @F.pandas_udf("boolean")
    def probe(g, ha, hb):
        import pandas as pd
        if _BC_CACHE[0] == bc_key:
            cached = _BC_CACHE[1]
        else:
            cached = {grp: BloomFilterState.from_bytes(b) for grp, b in bc.value.items()}
            _BC_CACHE[0] = bc_key
            _BC_CACHE[1] = cached
        ga = g.to_numpy(dtype=object, na_value=None)
        h1 = ha.to_numpy(dtype=np.int64, na_value=0)
        h2 = hb.to_numpy(dtype=np.int64, na_value=0)
        result = np.zeros(len(ga), dtype=bool)
        for grp in pd.unique(ga):
            st = cached.get(grp)
            if st is not None:
                mask = ga == grp
                result[mask] = st.contains_hashes(h1[mask], h2[mask])
        return pd.Series(result)

    hcols = hash_probe_cols(F.col(col).cast("string"))
    return df.withColumn(out, probe(F.col(group_col).cast("string"), *hcols))


def blob_geometry(blob: bytes) -> tuple[int, int, bool]:
    """(tiers, n_shards, strict) from a state blob header — lets consumers
    of a persisted filter table avoid hard-coding geometry."""
    ver, tiers, rehash, flags, n_shards, _n, _thr = struct.unpack_from("<BBBBIId", blob, 4)
    return tiers, n_shards, bool(flags & 1)


def membership_join(probes: DataFrame, col: str, states: DataFrame,
                    tiers: int | None = None, n_shards: int | None = None,
                    out: str = "is_member", strict: bool | None = None) -> DataFrame:
    """Distributed membership for filters too big to broadcast.

    ``states`` is the output of :func:`build_bloom_states` (or the same
    re-read from parquet).  Probes gain shard + hash columns (JVM), then an
    equi-join on shard id co-locates each probe with exactly the shard blobs
    it needs; a grouped Arrow kernel tests membership. Shuffle cost: probes
    ~40 B/row + the shard states once.  Same oversize-key caveat as
    :func:`with_membership`: zero FN holds among keys within the build's
    ``max_key_bytes`` guard."""
    if tiers is None or n_shards is None or strict is None:
        # geometry unknown → read one blob header; pass all THREE of
        # (tiers, n_shards, strict) to skip this extra evaluation of the
        # states plan (it would re-run an uncached distributed build)
        first = states.select("state").first()
        if first is None:
            return probes.withColumn(out, F.lit(False))
        blob_tiers, blob_shards, blob_strict = blob_geometry(bytes(first[0]))
        tiers = blob_tiers if tiers is None else tiers
        n_shards = blob_shards if n_shards is None else n_shards
        strict = blob_strict if strict is None else strict
    probe_cols = [f.name for f in probes.schema.fields]
    reserved = {"_skh_a", "_skh_b", "_sktier", _ROUTE, "shard", "state", "rows"}
    clash = reserved & set(probe_cols)
    if clash:
        raise ValueError(f"probe columns clash with reserved names: {sorted(clash)}")
    hcols = hash_probe_cols(F.col(col).cast("string"))
    if strict:
        return _membership_join_strict(probes, states, tiers, n_shards, hcols,
                                       probe_cols, out)
    # all probe columns ride through the kernel — evaluating `probes` exactly
    # once (a row-id + re-join design would evaluate it twice, and
    # monotonically_increasing_id is not stable across re-evaluations of a
    # shuffled plan, silently mislabelling rows)
    hashed = probes.select("*", *hcols).withColumn(
        _ROUTE, F.pmod(F.col("_skh_a"), F.lit(n_shards).cast("long")))
    # shard states may be partial (several rows per shard from separate
    # builds); pre-merge them per shard so the join side is one row/shard.
    merged = states.groupBy("shard").applyInPandas(_merge_state_rows, "shard int, state binary")
    joined = hashed.join(merged, hashed[_ROUTE] == merged["shard"], "left")

    def check(batches):
        for batch in batches:
            n = batch.num_rows
            result = np.zeros(n, dtype=bool)
            blobs = batch.column("state")
            shard_col = batch.column(_ROUTE).to_numpy(zero_copy_only=False).astype(np.int64)
            # group rows by shard (same shard → same blob)
            valid = pa.compute.is_valid(blobs).to_numpy(zero_copy_only=False)
            if valid.any():
                order = np.argsort(shard_col, kind="stable")
                s_sorted = shard_col[order]
                starts = np.concatenate(([0], np.flatnonzero(np.diff(s_sorted)) + 1, [n]))
                h1_all = batch.column("_skh_a").to_numpy(zero_copy_only=False).astype(np.int64)
                h2_all = batch.column("_skh_b").to_numpy(zero_copy_only=False).astype(np.int64)
                for si in range(len(starts) - 1):
                    rows = order[starts[si] : starts[si + 1]]
                    i0 = int(rows[0])
                    if not blobs[i0].is_valid:
                        continue
                    st = BloomFilterState.from_bytes(blobs[i0].as_py())
                    result[rows] = st.contains_hashes(h1_all[rows], h2_all[rows])
            passthrough = [batch.column(c) for c in probe_cols]
            yield pa.RecordBatch.from_arrays(
                [*passthrough, pa.array(result, pa.bool_())],
                names=[*probe_cols, out],
            )

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in probes.schema.fields)
    return joined.mapInArrow(check, f"{out_schema}, `{out}` boolean")


def _membership_join_strict(probes: DataFrame, states: DataFrame, tiers: int,
                            n_shards: int, hcols, probe_cols, out: str) -> DataFrame:
    """Distributed membership for STRICT filters: a probe must pass both
    shards of both tiers, which live on 4 different state rows — so probes
    dedupe to distinct (h1, h2) pairs, explode to their 4 (shard, tier)
    checks, equi-join the shard states, AND-reduce per hash pair, and the
    16-B flags join back onto the probe rows.  Shuffle cost: distinct keys
    ×4 ×~28 B + states once + probes once more for the flag join.

    Note: unlike the default path, the flag join evaluates ``probes`` twice;
    keys are matched by their own hashes so this is safe for any
    deterministic probe plan (a nondeterministically-sampled probe side
    should be materialized first)."""
    hashed = probes.select("*", *hcols)
    keys = hashed.select("_skh_a", "_skh_b").distinct()
    exploded = (keys.select("_skh_a", "_skh_b",
                            F.explode(strict_targets(n_shards)).alias("_tgt"))
                .select("_skh_a", "_skh_b",
                        F.col("_tgt.t").alias("_sktier"),
                        F.col("_tgt.s").alias(_ROUTE)))
    merged = states.groupBy("shard").applyInPandas(_merge_state_rows, "shard int, state binary")
    joined = exploded.join(merged, exploded[_ROUTE] == merged["shard"], "left")

    def check(batches):
        for batch in batches:
            n = batch.num_rows
            result = np.zeros(n, dtype=bool)
            blobs = batch.column("state")
            shard_col = batch.column(_ROUTE).to_numpy(zero_copy_only=False).astype(np.int64)
            tier_col = batch.column("_sktier").to_numpy(zero_copy_only=False).astype(np.int64)
            h1_all = batch.column("_skh_a").to_numpy(zero_copy_only=False).astype(np.int64)
            h2_all = batch.column("_skh_b").to_numpy(zero_copy_only=False).astype(np.int64)
            # shard-major grouping: the blob parses ONCE per shard (both its
            # tier groups reuse it), and only the group's own tier hashes
            # are derived
            key = shard_col * tiers + tier_col
            order = np.argsort(key, kind="stable")
            sorted_key = key[order]
            starts = np.concatenate(([0], np.flatnonzero(np.diff(sorted_key)) + 1, [n]))
            st, st_shard = None, None
            for si in range(len(starts) - 1):
                rows = order[starts[si] : starts[si + 1]]
                i0 = int(rows[0])
                if not blobs[i0].is_valid:
                    continue
                sid = int(shard_col[i0])
                if st_shard != sid:
                    st = BloomFilterState.from_bytes(blobs[i0].as_py())
                    st_shard = sid
                t = int(tier_col[i0])
                x1 = np.uint64(HASH_SEED_SELECTION[2 + 2 * t])
                x2 = np.uint64(HASH_SEED_SELECTION[3 + 2 * t])
                h1t = splitmix64(to_u64(h1_all[rows]) ^ x1)
                h2t = splitmix64(to_u64(h2_all[rows]) ^ x2)
                result[rows] = st._tier_grouped(shard_col[rows], t, h1t, h2t)
            yield pa.RecordBatch.from_arrays(
                [batch.column("_skh_a"), batch.column("_skh_b"),
                 pa.array(result, pa.bool_())],
                names=["_skh_a", "_skh_b", "_ok"],
            )

    checks = joined.mapInArrow(check, "_skh_a long, _skh_b long, _ok boolean")
    flags = checks.groupBy("_skh_a", "_skh_b").agg(F.bool_and("_ok").alias(out))
    return (hashed.join(flags, ["_skh_a", "_skh_b"], "left")
            .select(*probe_cols, F.coalesce(F.col(out), F.lit(False)).alias(out)))


def _merge_state_rows(pdf):
    import pandas as pd
    blob = None
    for b in pdf["state"]:
        blob = bytes(b) if blob is None else merge_blobs(blob, bytes(b))
    return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "state": [blob]})


# ====================================================================
# per-group filters (the "group-by sketches" row of SURVEY.md §2.2)
# ====================================================================

class GroupBloom:
    """A single-shard cascading filter as a mergeable group sketch — plugs
    the Bloom cascade into :func:`sparksketch.sketch.sketch_by_group` so
    per-lang / per-host filters come out of the same map-side-combine
    pattern as the other sketches.  Shard routing is pointless inside a
    group sketch (the group IS the shard), so n_shards = 1."""

    def __init__(self, cfg: BloomConfig | None = None, m0: int | None = None,
                 cap_div: int = 1):
        self.cfg = cfg or BloomConfig()
        if self.cfg.strict_parity:
            # strict mode's 2-shards-per-tier placement needs n_shards >= 4;
            # a single-shard group sketch cannot satisfy it — fail loudly
            # rather than silently dropping the user's explicit config
            raise ValueError("strict_parity is incompatible with per-group "
                             "filters (single-shard); use build_bloom for "
                             "reference-parity filters")
        m0 = m0 or self.cfg.m0
        self.cap_div = cap_div
        self.state = BloomFilterState(self.cfg.tiers, 1, m0, self.cfg.threshold, self.cfg.rehash)
        self.state.shards[0] = [[Level.fresh(0, m0, self.cfg.threshold)]
                                for _ in range(self.cfg.tiers)]

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        tier_h = derive_tier_hashes(h1, h2, self.state.tiers)
        _insert_batch(self.state.shards[0], tier_h, self.state.m0,
                      self.state.threshold, self.state.rehash, self.cap_div)

    def merge(self, other: "GroupBloom") -> "GroupBloom":
        self.state.merge_into(other.state)
        return self

    def to_bytes(self) -> bytes:
        return self.state.to_bytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "GroupBloom":
        g = cls.__new__(cls)
        g.state = BloomFilterState.from_bytes(data)
        g.cfg = None
        g.cap_div = 1
        return g

    def contains(self, key: str | bytes) -> bool:
        return self.state.contains(key)  # same 2-base-hash derivation path

    def key_count(self) -> int:
        return self.state.key_count


def bloom_by_group(df: DataFrame, group_col: str, col: str,
                   cfg: BloomConfig = BloomConfig(),
                   expected_keys_per_group: int | None = None) -> DataFrame:
    """Per-group Bloom filters → DataFrame (group, state binary).

    Uses the generic two-phase group-sketch pattern (per-partition partials
    → per-group merge), which is skew-robust by construction: a hot group
    produces at most one partial per partition regardless of its row count.
    Level capacities are split across partitions (scan-local accounting)."""
    from sparksketch import sketch as _sk
    if cfg.strict_parity:
        # validate on the driver: the GroupBloom factory runs inside executor
        # tasks, where the same error would surface as an opaque task failure
        raise ValueError("strict_parity is incompatible with per-group "
                         "filters (single-shard); use build_bloom for "
                         "reference-parity filters")
    spark = df.sparkSession
    cap_div = max(spark.sparkContext.defaultParallelism, 1)
    m0 = None
    if expected_keys_per_group:
        m0 = max(cfg.m0, _next_pow2(int(expected_keys_per_group * cfg.threshold)))
    seeds = (HASH_SEED_SELECTION[0], HASH_SEED_SELECTION[1])
    return _sk.sketch_by_group(df, group_col, col,
                               lambda pid: GroupBloom(cfg, m0, cap_div), seeds=seeds)


def compact_bloom(df: DataFrame, col: str, state: BloomFilterState,
                  cfg: BloomConfig = BloomConfig(), slack: float = 1.25,
                  **build_kwargs) -> BloomFilterState:
    """Offline compaction — the distributed analogue of the reference's
    rehash-to-2m rebuild (filter.rs:227-274, 490-524): instead of replaying
    a per-shard WAL, re-aggregate the *source table* (the immutable input is
    the key log) at a geometry sized for the observed key count, so the new
    filter has a single right-sized level per shard-tier and no overflowed
    levels.  Run it when ``state.overflowed_levels()`` is non-empty after
    merging many builds."""
    expected = int(state.key_count * slack) or None
    return build_bloom(df, col, cfg, expected_keys=expected,
                       n_shards=state.n_shards, **build_kwargs)
