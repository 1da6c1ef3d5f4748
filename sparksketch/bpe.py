"""Distributed BPE tokenizer training (Sennrich et al. 2016, ACL).

The corpus-scale part of BPE training is the word-frequency reduction —
one map-side-combined ``groupBy(word)`` over the whole crawl; everything
after operates on the (far smaller, but still potentially 100M-row)
distinct-word table, never on documents again.  Symbols are **int64 ids**
(initial symbols = Unicode codepoints via ``ascii()``; the rank-``s``
merge creates id ``0x110000 + s``), so every merge pass is pure vectorized
int64 numpy over the flattened Arrow buffer — strings only materialize in
one final decode pass.  Each merge step is:

1. adjacent-symbol-pair counts weighted by word count — a JVM ``transform``
   bigram explode (array indexing, O(len) per word) + one map-side-combined
   aggregation over two long keys;
2. the arg-max pair with deterministic ``(−count, left, right)`` STRING
   tie-break (Sennrich reference order): ONE ``TakeOrdered(4096)`` by
   ``(−c, a, b)`` whose tail row proves the max-count tie set is inside
   (an exact filter pass runs only for degenerate corpora with >4096 tied
   argmax pairs); the ties are decoded driver-side through the id→string
   table.  This is the only driver-side materialization per step;
3. greedy leftmost merge of that pair in every word — one vectorized Arrow
   kernel pass (the only overlap case is ``left == right``, resolved per
   run by keeping alternate positions, which IS leftmost-greedy).

The evolving word table is ``localCheckpoint``-ed each step (the repo's
iterative-DataFrame lesson: the merge-kernel chain would otherwise grow the
logical plan linearly and re-run all prior steps per pair count).

Encoding reuses the same kernel: applying the learned merges in rank order
to the distinct-word table yields the word → subword map, and per-document
BPE token counts are a word-keyed join + sum — no per-document iterative
work, which is what makes the encode side 100-TB-shaped.  Encode needs no
per-step synchronization, so ALL merges apply inside one ``mapInArrow``
pass (no job/checkpoint chain — training's per-step argmax is the only
iterative part).

Known limitation (documented): Spark's ``split(w, '')`` splits into UTF-16
code units, so astral-plane characters (≥ U+10000) become two surrogate
ids; training is still deterministic but such "chars" are not valid
standalone strings.  BMP text (and any real tokenizer corpus after NFC) is
unaffected.

Web-junk guard: tokens longer than ``max_word_chars`` (default 4096) are
chunked before training/encoding — see :func:`word_counts`.  Without it a
single MB-scale unbroken run (real crawls have them; the bench corpus
plants them) concentrates the whole symbol load into one row = one task.

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

from sparksketch.textstats import MAX_WORD_CHARS, tokens_col

MERGE_ID_BASE = 0x110000  # first id above any Unicode codepoint
_TIE_K = 4096  # per-step TakeOrdered width; ties beyond it trigger a 2nd pass


@dataclass(frozen=True)
class BpeModel:
    """Learned merge list (rank order) with per-step training evidence."""
    merges: tuple[tuple[str, str], ...]       # (left, right) strings by rank
    merge_counts: tuple[int, ...]             # weighted pair count at pick time
    init_symbols: int                         # Σ word_cnt · chars(word)
    n_words: int                              # distinct trained words
    merge_ids: tuple[tuple[int, int, int], ...] = ()  # (left, right, new) ids


def _chunk_expr(max_word_chars: int):
    """Array of ≤``max_word_chars`` pieces of ``word`` — a linear regex
    scan (NEVER a substring loop: Spark ``substring(w, i, k)`` re-scans
    from byte 0, O(len²) per word — the repo's round-5 lesson)."""
    return F.when(
        F.length("word") <= max_word_chars, F.array("word")).otherwise(
        F.expr("regexp_extract_all(word, "
               f"'(?s).{{1,{int(max_word_chars)}}}', 0)"))


def word_counts(df: DataFrame, col: str = "text", min_count: int = 1,
                max_word_chars: int = MAX_WORD_CHARS) -> DataFrame:
    """``(word, cnt)`` — lowercased whitespace-token frequencies (the same
    tokenizer as every textstats operator), optionally pruned by
    ``min_count`` (the standard vocab-table cap for web corpora).

    Tokens longer than ``max_word_chars`` are split into that many-char
    pieces first (the ``max_input_chars_per_word`` guard every production
    tokenizer applies): real crawls carry MB-scale unbroken runs, and one
    such "word" makes every merge step scan its full length in one task.
    Chunking only the post-aggregation DISTINCT-word table keeps the
    corpus pass untouched; the pair mass lost at chunk boundaries is
    ≤ 1/max_word_chars of an affected word's pairs (and exactly zero for
    any corpus whose words fit the cap, e.g. the test tables — documented
    deviation from unguarded BPE, standard practice).  ``None`` disables."""
    toks = tokens_col(F.lower(F.col(col)))
    wc = (df.select(F.explode(toks).alias("word"))
          .groupBy("word").agg(F.count("*").cast("long").alias("cnt")))
    if max_word_chars:
        wc = (wc.select(F.explode(_chunk_expr(max_word_chars)).alias("word"),
                        "cnt")
              .groupBy("word").agg(F.sum("cnt").cast("long").alias("cnt")))
    return wc.filter(F.col("cnt") >= min_count) if min_count > 1 else wc


def _id_symbol_table(words: DataFrame, keep_word: bool) -> DataFrame:
    syms = F.expr("transform(split(word, ''), c -> CAST(ascii(c) AS BIGINT))")
    cols = ([F.col("word")] if keep_word else []) + \
        [syms.alias("syms"), F.col("cnt").cast("long").alias("cnt")]
    return words.select(*cols)


_EMPTY_ID_PAIRS = "CAST(array() AS array<struct<a:bigint,b:bigint>>)"


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the id symbol table."""
    bg = F.when(
        F.size("syms") >= 2,
        F.transform(F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.element_at("syms", i + 1).alias("a"),
                        F.element_at("syms", i + 2).alias("b"))),
    ).otherwise(F.expr(_EMPTY_ID_PAIRS))
    return (syms.select(F.explode(bg).alias("_bg"), "cnt")
            .groupBy(F.col("_bg.a").alias("a"), F.col("_bg.b").alias("b"))
            .agg(F.sum("cnt").cast("long").alias("c")))


def _merge_arrays(lst: pa.Array, left: int, right: int,
                  new_id: int) -> pa.ListArray:
    """Greedy-leftmost merge of (left, right) in every id list — flattened
    int64 numpy, fully vectorized."""
    offsets = np.asarray(lst.offsets)
    vals = np.asarray(lst.values.to_numpy(zero_copy_only=False))
    vals = vals[offsets[0]:offsets[-1]]
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
        out_vals[p] = new_id
        keep = np.ones(vals.size, dtype=bool)
        keep[p + 1] = False
        out_vals = out_vals[keep]
        merged_per_row = np.bincount(row_id[p], minlength=nrows)
        new_offsets = np.concatenate(
            [[0], np.cumsum(lens - merged_per_row)]).astype(offsets.dtype)
    else:
        out_vals = vals
        new_offsets = offsets
    return pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), pa.array(out_vals, pa.int64()))


def _apply_merge(df: DataFrame, left: int, right: int,
                 new_id: int) -> DataFrame:
    """One merge pass; every non-``syms`` column passes through untouched
    (output schema == input schema, so callers chain freely)."""
    schema = df.schema
    idx = df.columns.index("syms")

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            cols = batch.columns
            cols[idx] = _merge_arrays(cols[idx], left, right, new_id)
            yield pa.RecordBatch.from_arrays(cols, names=batch.schema.names)

    return df.mapInArrow(fn, schema)


def _sym_str(i: int, created: dict[int, str]) -> str:
    return chr(i) if i < MERGE_ID_BASE else created[i]


def bpe_train(df: DataFrame, col: str = "text", n_merges: int = 32,
              min_count: int = 2, min_word_count: int = 1,
              max_word_chars: int = MAX_WORD_CHARS) -> BpeModel:
    """Train ``n_merges`` BPE merges on a corpus (module docstring for the
    distributed shape).  Stops early when the best remaining pair's
    weighted count drops below ``min_count``.  Deterministic: the arg-max
    tie-break is ``(−count, left, right)`` with binary string order, exactly
    the single-node Sennrich reference."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    # ONE corpus pass: everything below (stats, the id table, every merge
    # step) derives from the checkpointed distinct-word table
    words = word_counts(df, col, min_count=min_word_count,
                        max_word_chars=max_word_chars) \
        .localCheckpoint(eager=True)
    stats = words.agg(
        F.count("*").alias("nw"),
        F.sum(F.col("cnt") * F.length("word")).alias("tot")).first()
    n_words, init_symbols = int(stats.nw or 0), int(stats.tot or 0)
    syms = _id_symbol_table(words, keep_word=False) \
        .localCheckpoint(eager=True)
    words.unpersist()
    created: dict[int, str] = {}
    merges: list[tuple[str, str]] = []
    merge_ids: list[tuple[int, int, int]] = []
    counts: list[int] = []
    try:
        for step in range(n_merges):
            pc = _pair_counts(syms)
            # ONE TakeOrdered job normally: K rows bound the max-count tie
            # set unless the K-th row still sits at the max (degenerate
            # corpus) — then an exact filter pass collects every tie
            rows = (pc.orderBy(F.desc("c"), "a", "b").limit(_TIE_K)
                    .collect())
            if not rows or int(rows[0].c) < min_count:
                break
            c = int(rows[0].c)
            ties = [r for r in rows if int(r.c) == c]
            if len(rows) == _TIE_K and int(rows[-1].c) == c:
                ties = pc.filter(F.col("c") == c).select("a", "b").collect()
            left, right = min(
                ((int(r.a), int(r.b)) for r in ties),
                key=lambda ab: (_sym_str(ab[0], created),
                                _sym_str(ab[1], created)))
            new_id = MERGE_ID_BASE + step
            created[new_id] = _sym_str(left, created) + _sym_str(right, created)
            merges.append((_sym_str(left, created), _sym_str(right, created)))
            merge_ids.append((left, right, new_id))
            counts.append(c)
            nxt = _apply_merge(syms, left, right, new_id) \
                .localCheckpoint(eager=True)
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return BpeModel(tuple(merges), tuple(counts), init_symbols, n_words,
                    tuple(merge_ids))


def _segment_ids(words: DataFrame, model: BpeModel,
                 keep_word: bool) -> DataFrame:
    """Apply the learned merges in rank order over the word table; returns
    the id symbol table (optionally carrying the word string through).

    Unlike training (which must synchronize on a global argmax between
    steps), encoding applies ALL merges inside ONE ``mapInArrow`` pass —
    the kernel loops the rank-ordered merge list per batch, so there is no
    per-step job, shuffle, or checkpoint at all."""
    df = _id_symbol_table(words, keep_word=keep_word)
    merge_list = list(model.merge_ids)
    if not merge_list:
        return df
    schema = df.schema
    idx = df.columns.index("syms")

    def fn(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            cols = batch.columns
            arr = cols[idx]
            for left, right, new_id in merge_list:
                arr = _merge_arrays(arr, left, right, new_id)
            cols[idx] = arr
            yield pa.RecordBatch.from_arrays(cols, names=batch.schema.names)

    return df.mapInArrow(fn, schema)


def bpe_segment_words(words: DataFrame, model: BpeModel) -> DataFrame:
    """``(word, toks array<string>, cnt)`` — each distinct word segmented by
    applying the learned merges in rank order (per-word BPE merge order and
    rank-order application agree: a merge never splits a symbol, so steps
    commute across words).  ONE id-kernel pass over the WORD table (all
    merges loop inside the batch kernel — see :func:`_segment_ids`), then
    ONE decode pass (per-batch unique-id dictionary — the symbol alphabet
    is chars + merges, far smaller than the value buffer)."""
    ids = _segment_ids(words, model, keep_word=True)
    created = dict(zip((n for _, _, n in model.merge_ids),
                       (l + r for l, r in model.merges)))
    idx = ids.columns.index("syms")

    def decode(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            lst = batch.columns[idx]
            offsets = np.asarray(lst.offsets)
            vals = np.asarray(lst.values.to_numpy(zero_copy_only=False))
            vals = vals[offsets[0]:offsets[-1]]
            offsets = offsets - offsets[0]
            uniq = np.unique(vals)
            strs = pa.array([_sym_str(int(u), created) for u in uniq],
                            pa.string())
            codes = np.searchsorted(uniq, vals).astype(np.int32)
            flat = pa.DictionaryArray.from_arrays(
                pa.array(codes, pa.int32()), strs).cast(pa.string())
            arr = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), flat)
            cols = batch.columns
            cols[idx] = arr
            yield pa.RecordBatch.from_arrays(cols, names=batch.schema.names)

    dec = ids.mapInArrow(decode, "word string, syms array<string>, cnt long")
    return dec.select("word", F.col("syms").alias("toks"), "cnt")


def bpe_token_counts(df: DataFrame, model: BpeModel, col: str = "text",
                     id_col: str = "doc_id",
                     max_word_chars: int = MAX_WORD_CHARS) -> DataFrame:
    """Per-document token counts under the learned vocabulary:
    ``(doc_id, n_bpe_tokens)`` — the exact packing-budget input.  Documents
    explode to ``(doc_id, word, n_occ)``, join the segmented-word map
    (word → subword count — ids only, no string decode), and sum; words
    unseen at train time segment under the same merges (standard BPE
    encode behavior).  Over-long words chunk exactly as at train time
    (:func:`word_counts`): a word's token count is the sum over its
    chunks, and the merge kernel only ever sees ≤ ``max_word_chars``
    arrays — the distinct-CHUNK table it segments is also far smaller
    than the distinct-word table when long junk varies per document."""
    toks = tokens_col(F.lower(F.col(col)))
    doc_words = (df.select(F.col(id_col), F.explode(toks).alias("word"))
                 .groupBy(id_col, "word").agg(F.count("*").alias("n_occ")))
    words = doc_words.select("word").distinct()
    if max_word_chars:
        word_chunks = words.select(
            "word", F.explode(_chunk_expr(max_word_chars)).alias("chunk"))
        chunks = (word_chunks.select(F.col("chunk").alias("word")).distinct()
                  .withColumn("cnt", F.lit(1).cast("long")))
        seg = _segment_ids(chunks, model, keep_word=True) \
            .select(F.col("word").alias("chunk"),
                    F.size("syms").cast("long").alias("n_chunk_toks"))
        per_word = (word_chunks.join(seg, "chunk")
                    .groupBy("word")
                    .agg(F.sum("n_chunk_toks").cast("long").alias("n_toks")))
    else:
        per_word = _segment_ids(
            words.withColumn("cnt", F.lit(1).cast("long")), model,
            keep_word=True) \
            .select("word", F.size("syms").cast("long").alias("n_toks"))
    per_doc = (doc_words.join(per_word, "word", "left")
               .groupBy(id_col)
               .agg(F.sum(F.col("n_occ")
                          * F.coalesce("n_toks", F.length("word").cast("long")))
                    .cast("long").alias("n_bpe_tokens")))
    return (df.select(id_col).join(per_doc, [id_col], "left")
            .select(id_col, F.coalesce("n_bpe_tokens", F.lit(0))
                    .cast("long").alias("n_bpe_tokens")))
