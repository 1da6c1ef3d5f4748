"""Sequence packing — fixed-length training-chunk assignment.

GPT-style pretraining concatenates documents into one token stream and
cuts it at fixed ``capacity``-token boundaries; each document therefore
lands at a deterministic (sequence, offset) and may straddle a boundary.
This operator computes that layout WITHOUT materializing the stream: a
salted-md5 rank gives every document a deterministic position, a running
token cumsum over that order gives its start offset, and pure integer
division yields the sequence id — all exactly reproducible across engines,
partitionings, and reruns (the same rank-key pattern as
``decontam.uniform_sample_k`` / ``hash_split``).

Scale shape: the stream is sharded into ``n_buckets`` independent
sub-streams (standard practice — each trainer shard packs its own stream),
so the only shuffle is one window per bucket and no single reducer ever
sees more than ~1/n_buckets of the corpus.  At 10¹² docs you set
``n_buckets`` to O(total_tokens / executor_memory) and every bucket's
cumsum is an ordinary sorted window partition.

Columns appended:

- ``bucket``      — which independent sub-stream the doc packs into
- ``seq``         — 0-based sequence (training chunk) id within the bucket
- ``offset``      — the doc's first token's offset within that sequence
- ``straddles``   — True when the doc crosses a sequence boundary (its
  tokens continue into seq+1, …); the standard loss-masking signal
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def pack_sequences(df: DataFrame, token_col: str, key_col: str,
                   capacity: int, n_buckets: int = 64,
                   salt: str = "pack", bucket_expr=None) -> DataFrame:
    """Assign every document its (bucket, seq, offset, straddles) under
    concat-and-cut packing at ``capacity`` tokens per sequence.

    Deterministic given unique non-null ``key_col`` values (the order is
    ``md5(salt|key), key`` — same caveat as :func:`~sparksketch.decontam.
    uniform_sample_k`).  Rows with NULL or non-positive token counts are
    dropped (nothing to pack).  Pure JVM expressions: one hashed bucket,
    one window SUM per bucket, integer arithmetic — no Python anywhere.

    ``bucket_expr`` overrides the default ``pmod(xxhash64(key), n_buckets)``
    sub-stream assignment with any deterministic Column (e.g. an
    engine-portable ``pmod(key, n)`` for cross-engine comparisons).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    reserved = ({"bucket", "seq", "offset", "straddles", "_rk", "_first"}
                & set(df.columns))
    if reserved:
        raise ValueError(f"pack_sequences: input columns clash with "
                         f"{sorted(reserved)}")
    from sparksketch.hashing import rank_key_col
    rk = rank_key_col(key_col, salt)
    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                             F.lit(n_buckets))
    out = (df.filter(F.col(token_col).isNotNull() & (F.col(token_col) > 0)
                     & F.col(key_col).isNotNull())
             .withColumn("_rk", rk)
             .withColumn("bucket", bucket_expr.cast("int")))
    w = W.partitionBy("bucket").orderBy("_rk", key_col)
    cum = F.sum(F.col(token_col)).over(w)          # inclusive running tokens
    # `div` (exact integer division) not `/`+floor: long/long `/` is DOUBLE
    # in Spark and loses exactness past 2^53 cumulative tokens.  Operands
    # are non-negative here (tokens > 0, cumsum of positives), so truncating
    # div == floor and the layout stays bit-exact at any scale.
    out = (out.withColumn("_first", cum - F.col(token_col))
           .withColumn("seq", F.expr(f"_first div {int(capacity)}").cast("long"))
           .withColumn("offset", F.pmod(F.col("_first"), F.lit(capacity)).cast("long"))
           .withColumn("straddles",
                       F.expr(f"(_first + `{token_col}` - 1) div {int(capacity)}")
                       != F.col("seq"))
           .drop("_rk", "_first"))
    return out


def pack_sequences_sql(table: str, cols: str, token_col: str, key_col: str,
                       capacity: int, bucket_expr: str,
                       salt: str = "pack") -> str:
    """ANSI-SQL mirror of :func:`pack_sequences` for oracles.  The default
    bucket hash is Spark's ``xxhash64`` — not portable — so cross-engine
    comparisons pass the SAME portable ``bucket_expr`` to both sides (e.g.
    ``pmod(doc_id, 4)`` / ``doc_id % 4``)."""
    from sparksketch.hashing import rank_key_sql
    rk = rank_key_sql(key_col, salt)
    first = (f"sum({token_col}) OVER (PARTITION BY {bucket_expr} "
             f"ORDER BY {rk}, {key_col}) - {token_col}")
    # `//` mirrors Spark's `div` exactly on the non-negative BIGINT operands
    # here (both truncate==floor for x>=0) and stays integer-exact past 2^53
    return (
        f"SELECT {cols}, CAST({bucket_expr} AS INT) AS bucket, "
        f"CAST(({first}) // {capacity} AS BIGINT) AS seq, "
        f"CAST(({first}) % {capacity} AS BIGINT) AS offset, "
        f"(({first} + {token_col} - 1) // {capacity}) != "
        f"(({first}) // {capacity}) AS straddles "
        f"FROM {table} WHERE {token_col} IS NOT NULL AND {token_col} > 0 "
        f"AND {key_col} IS NOT NULL")
