"""Distributed BPE tokenizer training (Sennrich et al. 2016, ACL).

The corpus-scale part of BPE training is the word-frequency reduction —
one map-side-combined ``groupBy(word)`` over the whole crawl; everything
after operates on the (far smaller, but still potentially 100M-row)
distinct-word table, never on documents again.  Each merge step is:

1. adjacent-symbol-pair counts weighted by word count — a JVM ``transform``
   bigram explode (array indexing, O(len) per word) + one map-side-combined
   aggregation;
2. the arg-max pair with deterministic ``(−count, a, b)`` tie-break — a
   ``TakeOrdered(1)`` (the only driver-side scalar per step);
3. greedy leftmost merge of that pair in every word — one vectorized Arrow
   kernel pass over the word table (flattened symbol buffer + offsets; the
   only overlap case is ``left == right``, resolved per run by keeping
   alternate positions, which IS leftmost-greedy).

The evolving word table is ``localCheckpoint``-ed each step (the repo's
iterative-DataFrame lesson: the merge-kernel chain would otherwise grow the
logical plan linearly and re-run all prior steps per pair count).

Encoding reuses the same kernel: applying the learned merges in rank order
to the distinct-word table yields the word → subword-count map, and
per-document BPE token counts are a word-keyed join + sum — no per-document
iterative work, which is what makes the encode side 100-TB-shaped.

Reference parity: beyond the reference (``/root/reference/src/filter.rs``
is membership only); this is LLM-pipeline surface (tokenizer training and
exact packing-budget token counts under the learned vocabulary).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksketch.textstats import _bigrams_col, tokens_col


@dataclass(frozen=True)
class BpeModel:
    """Learned merge list (rank order) with per-step training evidence."""
    merges: tuple[tuple[str, str], ...]       # (left, right) by rank
    merge_counts: tuple[int, ...]             # weighted pair count at pick time
    init_symbols: int                         # Σ word_cnt · chars(word)
    n_words: int                              # distinct trained words


def word_counts(df: DataFrame, col: str = "text",
                min_count: int = 1) -> DataFrame:
    """``(word, cnt)`` — lowercased whitespace-token frequencies (the same
    tokenizer as every textstats operator), optionally pruned by
    ``min_count`` (the standard vocab-table cap for web corpora)."""
    toks = tokens_col(F.lower(F.col(col)))
    wc = (df.select(F.explode(toks).alias("word"))
          .groupBy("word").agg(F.count("*").cast("long").alias("cnt")))
    return wc.filter(F.col("cnt") >= min_count) if min_count > 1 else wc


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over a ``(syms, cnt)`` word table."""
    return (syms.select(F.explode(_bigrams_col(F.col("syms"))).alias("_bg"), "cnt")
            .groupBy(F.col("_bg.a").alias("a"), F.col("_bg.b").alias("b"))
            .agg(F.sum("cnt").cast("long").alias("c")))


def _merge_batch(batch: pa.RecordBatch, left: str, right: str) -> pa.RecordBatch:
    """Greedy-leftmost merge of (left, right) in every symbol list of one
    Arrow batch — flattened-buffer numpy, no per-row Python in the match."""
    lst = batch.column(0)
    cnt = batch.column(1)
    offsets = np.asarray(lst.offsets)
    # normalize away any slice: keep only this array's value window
    vals = lst.values.to_numpy(zero_copy_only=False)[offsets[0]:offsets[-1]]
    offsets = offsets - offsets[0]
    nrows = len(lst)
    lens = np.diff(offsets)
    if vals.size >= 2:
        row_id = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        match = (vals[:-1] == left) & (vals[1:] == right) \
            & (row_id[:-1] == row_id[1:])
        p = np.flatnonzero(match)
    else:
        row_id = np.zeros(vals.size, dtype=np.int64)
        p = np.empty(0, dtype=np.int64)
    if p.size and left == right:
        # runs of consecutive matches only happen when left == right;
        # leftmost-greedy keeps alternate positions within each run
        new_run = np.empty(p.size, dtype=bool)
        new_run[0] = True
        new_run[1:] = np.diff(p) != 1
        run_start = p[new_run][np.cumsum(new_run) - 1]
        p = p[((p - run_start) % 2) == 0]
    if p.size:
        out_vals = vals.copy()
        out_vals[p] = left + right
        keep = np.ones(vals.size, dtype=bool)
        keep[p + 1] = False
        out_vals = out_vals[keep]
        merged_per_row = np.bincount(row_id[p], minlength=nrows)
        new_lens = lens - merged_per_row
        new_offsets = np.concatenate(
            [[0], np.cumsum(new_lens)]).astype(offsets.dtype)
    else:
        out_vals = vals
        new_offsets = offsets
    arr = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()),
        pa.array(out_vals.tolist(), pa.string()))
    return pa.RecordBatch.from_arrays([arr, cnt], names=["syms", "cnt"])


def apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """One merge pass over a ``(syms array<string>, cnt long)`` table."""
    def fn(batches):
        for batch in batches:
            if batch.num_rows:
                yield _merge_batch(batch, left, right)
    return syms.mapInArrow(fn, "syms array<string>, cnt long")


def _symbol_table(words: DataFrame) -> DataFrame:
    return words.select(F.split("word", "").alias("syms"),
                        F.col("cnt").cast("long").alias("cnt"))


def bpe_train(df: DataFrame, col: str = "text", n_merges: int = 32,
              min_count: int = 2, min_word_count: int = 1) -> BpeModel:
    """Train ``n_merges`` BPE merges on a corpus (module docstring for the
    distributed shape).  Stops early when the best remaining pair's
    weighted count drops below ``min_count``.  Deterministic: the arg-max
    tie-break is ``(−count, left, right)`` with binary string order."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = word_counts(df, col, min_count=min_word_count)
    stats = words.agg(
        F.count("*").alias("nw"),
        F.sum(F.col("cnt") * F.length("word")).alias("tot")).first()
    n_words, init_symbols = int(stats.nw or 0), int(stats.tot or 0)
    syms = _symbol_table(words).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    counts: list[int] = []
    try:
        for _ in range(n_merges):
            best = (_pair_counts(syms)
                    .orderBy(F.desc("c"), "a", "b").limit(1).collect())
            if not best or int(best[0].c) < min_count:
                break
            left, right, c = best[0].a, best[0].b, int(best[0].c)
            merges.append((left, right))
            counts.append(c)
            nxt = apply_merge(syms, left, right).localCheckpoint(eager=True)
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return BpeModel(tuple(merges), tuple(counts), init_symbols, n_words)


def bpe_segment_words(words: DataFrame, model: BpeModel) -> DataFrame:
    """``(word, toks array<string>, cnt)`` — each distinct word segmented by
    applying the learned merges in rank order (per-word BPE merge order and
    rank-order application agree: a merge never splits a symbol, so steps
    commute across words).  k kernel passes over the WORD table only."""
    cur = _symbol_table(words).localCheckpoint(eager=True)
    for left, right in model.merges:
        nxt = apply_merge(cur, left, right).localCheckpoint(eager=True)
        cur.unpersist()
        cur = nxt
    # merges never split symbols, so concatenation recovers the word
    return cur.select(F.concat_ws("", "syms").alias("word"),
                      F.col("syms").alias("toks"), "cnt")


def bpe_token_counts(df: DataFrame, model: BpeModel, col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts under the learned vocabulary:
    ``(doc_id, n_bpe_tokens)`` — the exact packing-budget input.  Documents
    explode to ``(doc_id, word, n_occ)``, join the segmented-word map
    (word → subword count), and sum; words unseen at train time fall back
    to character count (every character is a base symbol)."""
    toks = tokens_col(F.lower(F.col(col)))
    doc_words = (df.select(F.col(id_col), F.explode(toks).alias("word"))
                 .groupBy(id_col, "word").agg(F.count("*").alias("n_occ")))
    words = doc_words.groupBy("word").agg(F.lit(1).alias("_one")) \
        .select("word", F.lit(1).cast("long").alias("cnt"))
    seg = bpe_segment_words(words, model) \
        .select("word", F.size("toks").cast("long").alias("n_toks"))
    per_doc = (doc_words.join(seg, "word", "left")
               .groupBy(id_col)
               .agg(F.sum(F.col("n_occ")
                          * F.coalesce("n_toks", F.length("word").cast("long")))
                    .cast("long").alias("n_bpe_tokens")))
    return (df.select(id_col).join(per_doc, [id_col], "left")
            .select(id_col, F.coalesce("n_bpe_tokens", F.lit(0))
                    .cast("long").alias("n_bpe_tokens")))
