"""sparksketch — a PySpark-native distributed sketch / approximate-aggregation library.

Brand-new engine (NOT a port) with the capabilities of the Rust reference
``WCM-CS/perfect_bloomfilter`` (read-only snapshot at /root/reference),
re-expressed Spark-first:

- :mod:`sparksketch.bloom` — the centerpiece: a hybrid dynamically-scalable
  cascading multidimensional Bloom filter as a *mergeable byte-array sketch*
  built with vectorized Arrow UDFs + ``treeReduce`` OR-merge.
- :mod:`sparksketch.hll`, :mod:`sparksketch.cms`, :mod:`sparksketch.tdigest`,
  :mod:`sparksketch.kll` — the same mergeable partial/final pattern for
  distinct-count, frequency, and quantiles.
- :mod:`sparksketch.webtext` — Common-Crawl-style webpage synthesis,
  byte-identical text extraction, key guards, skew salting.
- :mod:`sparksketch.dedup`, :mod:`sparksketch.similarity`,
  :mod:`sparksketch.textstats`, :mod:`sparksketch.multimodal` — the
  training-data-pipeline operators (dedup, ANN, text analysis, multimodal
  plumbing).
- :mod:`sparksketch.checkpoint` — per-partition sketch state with lineage so
  a killed build resumes without redoing completed partitions.

Everything is pure Python over pyspark.sql DataFrames; all kernels are
vectorized numpy over Arrow batches — no per-row Python anywhere.
"""

from sparksketch.config import Accuracy, BloomConfig, InitialCapacity, Throughput, WorkerCores
from sparksketch.bloom import BloomFilterState, build_bloom, with_membership

__all__ = [
    "Accuracy",
    "BloomConfig",
    "BloomFilterState",
    "InitialCapacity",
    "Throughput",
    "WorkerCores",
    "build_bloom",
    "with_membership",
]

__version__ = "0.1.0"
