"""Configuration with exact reference knob parity.

Reproduces the reference's builder-pattern ``BloomFilterConfig``
(/root/reference/src/config.rs:1-113) as a frozen dataclass, resolving each
enum to the same numeric values the Rust ``pbf_init`` resolves
(/root/reference/src/filter.rs:139-172):

=================  =======================  ==========================================
knob               enum                     resolved value
=================  =======================  ==========================================
throughput         Low/Medium/High          shard-vector length per tier 2^11/2^12/2^13
                                            (filter.rs:143-147) → our build parallelism
initial_capacity   Low/Medium/High/VeryHigh initial bits per level m0 = 2^11/2^12/2^13/2^15
                                            (filter.rs:149-154)
accuracy           Low/Medium/High          rehash threshold 12.0/15.0/19.0 bits/key
                                            (filter.rs:156-160)
worker_cores       Cores1/4/8/HalfSysMax    rehash workers 1/4/8/half-cores
                                            (filter.rs:162-172) — metadata only here;
                                            Spark's scheduler owns task parallelism
rehash             bool (default true)      dynamic scaling on/off (config.rs:3;
                                            filter.rs:175 sets REHASH_SWITCH). NOTE the
                                            reference *sets but never reads* the switch —
                                            rehash effectively always runs there; we honor
                                            the flag (off → single fixed level per tier)
                                            and document the divergence.
=================  =======================  ==========================================

Defaults match config.rs:49-58: rehash=True, Medium/Medium/Medium, Cores1.

``tiers`` keeps the reference's planned ``cascade_tiers: 1..3`` knob
(config.rs:9, commented-out third tier filter.rs:455); the snapshot hardwires
two tiers (cartographer + inheritor, filter.rs:20-21) so 2 is the default.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from enum import Enum


class Throughput(Enum):
    LOW = "low"        # 2^11 shards/tier (filter.rs:144)
    MEDIUM = "medium"  # 2^12 (filter.rs:145)
    HIGH = "high"      # 2^13 (filter.rs:146)

    @property
    def shards(self) -> int:
        return {Throughput.LOW: 2**11, Throughput.MEDIUM: 2**12, Throughput.HIGH: 2**13}[self]


class InitialCapacity(Enum):
    LOW = "low"             # m0 = 2^11 bits (filter.rs:150)
    MEDIUM = "medium"       # 2^12 (filter.rs:151)
    HIGH = "high"           # 2^13 (filter.rs:152)
    VERY_HIGH = "very_high" # 2^15 (filter.rs:153)

    @property
    def m0(self) -> int:
        return {
            InitialCapacity.LOW: 2**11,
            InitialCapacity.MEDIUM: 2**12,
            InitialCapacity.HIGH: 2**13,
            InitialCapacity.VERY_HIGH: 2**15,
        }[self]


class Accuracy(Enum):
    LOW = "low"        # threshold 12.0 bits/key (filter.rs:157)
    MEDIUM = "medium"  # 15.0 (filter.rs:158)
    HIGH = "high"      # 19.0 (filter.rs:159)

    @property
    def threshold(self) -> float:
        return {Accuracy.LOW: 12.0, Accuracy.MEDIUM: 15.0, Accuracy.HIGH: 19.0}[self]


class WorkerCores(Enum):
    CORES_1 = 1
    CORES_4 = 4
    CORES_8 = 8
    HALF_SYS_MAX = 0  # resolved at runtime (filter.rs:168-171)


def expected_n(m: int, bits_per_key: float) -> int:
    """Keys a filter of m bits may hold at the configured bits/key floor.
    Exact port of the formula at /root/reference/src/filter.rs:377-379."""
    return int(m / bits_per_key)


def optimal_k(m: int, n: int) -> int:
    """Optimal hash-family size ``round((m/n)·ln2)``.
    Exact port of /root/reference/src/filter.rs:381-383."""
    if n <= 0:
        return 1
    return max(1, round((m / n) * math.log(2)))


@dataclass(frozen=True)
class BloomConfig:
    throughput: Throughput = Throughput.MEDIUM
    initial_capacity: InitialCapacity = InitialCapacity.MEDIUM
    accuracy: Accuracy = Accuracy.MEDIUM
    worker_cores: WorkerCores = WorkerCores.CORES_1
    rehash: bool = True
    tiers: int = 2
    max_key_bytes: int = 2**20  # documented 1 MB key cap (reference README.md:14-15);
                                # *claimed but unenforced* in the reference — we enforce it.
    strict_parity: bool = False  # reproduce the reference's 2-shards-per-tier
                                 # probe redundancy (filter.rs:120-137): each key
                                 # inserts into shard p1 AND p2=(p1+mask/2)&mask
                                 # per tier (per-tier routing seeds [0]/[1]),
                                 # membership checks all four.  Bit budget: 2×
                                 # the default's inserts per key for FPR ≈
                                 # (per-shard FPR)² per tier.  p1 itself is
                                 # pmod(xxh64), not jump(xxh3 hi^lo) — the
                                 # library-wide routing-hash deviation applies
                                 # here too (shape parity, not bit-placement
                                 # parity; guarantees are hash-agnostic).

    def __post_init__(self) -> None:
        if not 1 <= self.tiers <= 3:
            raise ValueError("tiers must be in 1..3 (reference config.rs:9)")
        if self.strict_parity and self.tiers != 2:
            raise ValueError("strict_parity reproduces the reference snapshot, "
                             "which hardwires 2 tiers (filter.rs:20-21)")

    @property
    def shards(self) -> int:
        return self.throughput.shards

    @property
    def m0(self) -> int:
        return self.initial_capacity.m0

    @property
    def threshold(self) -> float:
        return self.accuracy.threshold

    def level_m(self, level: int) -> int:
        """Deterministic cascade geometry m_l = m0 · 2^l — the mergeable
        reformulation of the reference's in-place double-m rehash
        (/root/reference/src/filter.rs:256-259, 385-389)."""
        return self.m0 << level

    def level_k(self, level: int) -> int:
        m = self.level_m(level)
        return optimal_k(m, expected_n(m, self.threshold))

    def level_capacity(self, level: int) -> int:
        return expected_n(self.level_m(level), self.threshold)

    def per_level_fpr_bound(self) -> float:
        """FPR of one full level ≈ 0.6185^(bits/key) — the classic bound the
        survey derives from the reference's threshold semantics
        (filter.rs:373-375)."""
        return 0.6185 ** self.threshold
