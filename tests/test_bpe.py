"""Distributed BPE tokenizer training vs a single-node reference trainer."""

import random
import re
from collections import Counter

import pytest

from sparksketch.bpe import (
    BpeModel,
    bpe_segment_words,
    bpe_token_counts,
    bpe_train,
    word_counts,
)


def _brute_bpe(texts, n_merges, min_count=2, min_word_count=1):
    """The spec: Sennrich-style BPE with (-count, left, right) tie-break and
    greedy-leftmost merging."""
    words = Counter(
        w for t in texts
        for w in (re.split(r"\s+", t.strip().lower()) if t.strip() else []))
    words = Counter({w: c for w, c in words.items() if c >= min_word_count})
    syms = {w: list(w) for w in words}
    merges, counts = [], []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((left, right))
        counts.append(c)
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    init = sum(c * len(w) for w, c in words.items())
    return merges, counts, syms, words, init


def test_bpe_train_matches_reference(spark):
    rng = random.Random(3)
    texts = []
    for _ in range(40):
        n = rng.randint(1, 10)
        texts.append(" ".join(
            rng.choice(["low", "lower", "lowest", "new", "newer", "wider",
                        "aaaa", "aaab", "banana", "bandana"])
            for _ in range(n)))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    exp_merges, exp_counts, _, exp_words, exp_init = _brute_bpe(texts, 12)
    model = bpe_train(df, n_merges=12)
    assert list(model.merges) == exp_merges
    assert list(model.merge_counts) == exp_counts
    assert model.init_symbols == exp_init
    assert model.n_words == len(exp_words)


def test_bpe_overlap_left_equals_right(spark):
    # "aaaa" x5: pair (a,a) count 3*5=15 -> merge gives (aa)(aa): greedy
    df = spark.createDataFrame([(1, "aaaa " * 5)], "doc_id long, text string")
    model = bpe_train(df, n_merges=2, min_count=1)
    exp_merges, exp_counts, exp_syms, _, _ = _brute_bpe(["aaaa " * 5], 2,
                                                        min_count=1)
    assert list(model.merges) == exp_merges
    assert list(model.merge_counts) == exp_counts
    seg = {r.word: list(r.toks)
           for r in bpe_segment_words(word_counts(df), model).collect()}
    assert seg == exp_syms


def test_bpe_segment_and_token_counts(spark):
    texts = ["the cat sat on the mat", "the the the", "catcat mat", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    model = bpe_train(df, n_merges=6, min_count=1)
    _, _, exp_syms, _, _ = _brute_bpe(texts, 6, min_count=1)
    seg = {r.word: list(r.toks)
           for r in bpe_segment_words(word_counts(df), model).collect()}
    assert seg == exp_syms
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_counts(df, model).collect()}
    exp = {}
    for i, t in enumerate(texts):
        ws = re.split(r"\s+", t.strip().lower()) if t.strip() else []
        exp[i] = sum(len(exp_syms[w]) for w in ws)
    assert got == exp
    assert got[3] == 0  # empty doc present with zero


def test_bpe_early_stop_and_validation(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    # only one pair with count 1 < min_count=2 -> zero merges
    model = bpe_train(df, n_merges=5, min_count=2)
    assert model.merges == ()
    # exhausted pairs stop before n_merges
    model2 = bpe_train(df, n_merges=5, min_count=1)
    assert model2.merges == (("a", "b"),)
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


def test_bpe_encode_unseen_words(spark):
    train = spark.createDataFrame([(1, "hello hello world")],
                                  "doc_id long, text string")
    model = bpe_train(train, n_merges=3, min_count=1)
    score = spark.createDataFrame([(1, "hello zzz")], "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_counts(score, model).collect()}
    # "zzz" unseen: segmented by the same merges (no z merges -> 3 chars)
    _, _, syms, _, _ = _brute_bpe(["hello hello world"], 3, min_count=1)
    assert got == {1: len(syms["hello"]) + 3}


def test_bpe_long_word_chunk_guard(spark):
    # one 10k-char junk run (the web-crawl case): with max_word_chars=16
    # the distinct-word table carries only <=16-char chunks, init_symbols
    # is preserved exactly, and encode counts the word as the sum over its
    # chunks' segmentations
    junk = "z" * 10_000
    df = spark.createDataFrame(
        [(1, f"hi {junk} hi"), (2, junk)], "doc_id long, text string")
    wc = {r.word: r.cnt for r in word_counts(df, max_word_chars=16).collect()}
    assert wc == {"hi": 2, "z" * 16: 2 * 625}
    model = bpe_train(df, n_merges=3, min_count=1, max_word_chars=16)
    # pair (z,z): 15 per chunk * 1250 chunks; then (zz,zz), (zzzz,zzzz)
    assert model.merges[0] == ("z", "z")
    assert model.merge_counts[0] == 15 * 1250
    assert model.init_symbols == 2 * 2 + 2 * 10_000
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_counts(df, model, max_word_chars=16).collect()}
    # chunk "z"*16 under 3 z-doubling merges -> 16/8 = 2 tokens; "hi" -> 2
    # (h,i never merged: count 2 loses the (-count,left,right) argmax or
    # follows z merges; with n_merges=3 all picks are z pairs)
    assert got == {1: 2 * 2 + 625 * 2, 2: 625 * 2}
    # and the unguarded path on short words is identical to the guarded one
    short = spark.createDataFrame([(1, "abab abab ab")],
                                  "doc_id long, text string")
    m_g = bpe_train(short, n_merges=2, min_count=1, max_word_chars=16)
    m_u = bpe_train(short, n_merges=2, min_count=1, max_word_chars=None)
    assert m_g == m_u
