"""Text analysis: token counts, quality features, language ID, fingerprints."""

from pyspark.sql import functions as F

from sparksketch.textstats import (
    bpe_ish_token_count,
    fingerprint_md5,
    lang_id,
    quality_features,
    rolling_fingerprint,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  spaced   out  ",), ("",), ("single",), ("  ",)], "t string"
    )
    got = [r.n for r in df.select(token_count("t").alias("n")).collect()]
    assert got == [3, 2, 0, 1, 0]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world! x2",)], "t string")
    n = df.select(bpe_ish_token_count("t").alias("n")).collect()[0].n
    # hello , world ! x 2 → 6
    assert n == 6


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat on the mat and it was happy about that outcome."),
         (2, "000 111 222 333 444 555"),
         (3, "x")],
        "id long, text string",
    )
    rows = {r.id: r for r in quality_features(df).collect()}
    good, digits, tiny = rows[1], rows[2], rows[3]
    assert good.quality_score > 0.8
    assert digits.digit_ratio > 0.6
    assert digits.quality_score < 0.4
    assert tiny.n_tokens == 1
    assert tiny.quality_score < 0.6
    assert abs(good.alpha_ratio + good.space_ratio + good.punct_ratio
               + good.digit_ratio - 1.0) < 0.01


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog went to the park and it was good for them"),
         (2, "der hund und die katze sind nicht auf der wiese mit dem ball"),
         (3, "le chat est dans la maison et les enfants sont pour une fois pas la"),
         (4, "el perro y el gato que es una historia por la manana con amigos"),
         (5, "zzz qqq xxx www")],
        "id long, text string",
    )
    got = {r.id: r.lang_pred for r in lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "und"


def test_fingerprint_md5_matches_duckdb(spark):
    import duckdb
    vals = ["hello world", "", "κλεψύδρα", "a" * 100]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r.f for r in df.select(fingerprint_md5("t").alias("f")).collect()]
    want = [duckdb.sql(f"SELECT md5(?)", params=[v]).fetchone()[0] for v in vals]
    assert got == want


def test_rolling_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog repeatedly today"),
         (2, "the quick brown fox jumps over the lazy dog repeatedly today"),
         (3, "a totally different string of words goes here instead of that"),
         (4, "x")],  # shorter than the window
        "id long, text string",
    )
    got = {r.id: r.fingerprint for r in rolling_fingerprint(df, "text", "id").collect()}
    assert got[1] == got[2]          # identical content → identical fingerprint
    assert got[1] != got[3]
    assert got[4] == 0               # sub-window content → sentinel 0


def test_repetition_features_edges(spark):
    from sparksketch.textstats import repetition_features
    df = spark.createDataFrame(
        [(1, "nav bar\nnav bar\nbody text\nnav bar"),   # dup lines
         (2, "x y x y x"),                               # tied top 2-grams
         (3, ""),                                        # empty doc
         (4, "single"),                                  # no 2-grams
         (5, "  spaced   out   tokens   spaced   out ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(df).collect()}
    r1 = rows[1]
    assert r1.n_lines == 4
    assert r1.dup_line_ratio == round(1 - 2 / 4, 4)   # 2 distinct of 4 lines
    # tokens span newlines (\s+): "nav bar" x3 of 7 grams
    assert r1.top_2gram_count == 3 and r1.top_2gram_ratio == round(3 / 7, 4)
    r2 = rows[2]  # "x y" and "y x" both occur 2x of 4 grams; tie-break is stable
    assert r2.top_2gram_count == 2 and r2.top_2gram_ratio == 0.5
    r3 = rows[3]
    assert (r3.n_lines, r3.dup_line_ratio, r3.top_2gram_count, r3.top_2gram_ratio) == (
        1, 0.0, 0, 0.0)
    r4 = rows[4]
    assert (r4.top_2gram_count, r4.top_2gram_ratio) == (0, 0.0)
    r5 = rows[5]  # whitespace-run tokenization: 5 tokens → 4 grams, top = 2
    assert r5.top_2gram_count == 2 and r5.top_2gram_ratio == 0.5


def test_scrub_pii_edges_and_duckdb_parity(spark):
    import duckdb
    from sparksketch.textstats import scrub_pii, scrub_pii_sql
    vals = [
        "mail john.doe+spam@sub.example.co.uk now",
        "hosts 192.168.001.1 and 8.8.8.8 up",
        "call +1 (555) 010-1234 or 555-867-5309 today",
        "email with digits a1234567890@b.com stays one token",
        "room 1234 is fine",                    # short digit run untouched
        "date-like 2026-08-16 19 is redacted",  # documented over-match
        "",
        "no pii at all",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r.s for r in df.select(scrub_pii("t").alias("s")).collect()]
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "hosts <IP> and <IP> up"
    assert got[2] == "call <PHONE> or <PHONE> today"
    assert got[3] == "email with digits <EMAIL> stays one token"
    assert got[4] == "room 1234 is fine"
    assert "<PHONE>" in got[5]          # naive scrubber over-match, same in both engines
    assert got[6] == "" and got[7] == "no pii at all"
    want = [duckdb.sql(f"SELECT {scrub_pii_sql('?')} ", params=[v]).fetchone()[0]
            for v in vals]
    assert got == want


def test_top_terms(spark):
    from sparksketch.textstats import top_terms
    import math
    import pytest
    df = spark.createDataFrame(
        [(1, "apple apple banana shared shared shared"),
         (2, "banana cherry shared"),
         (3, "cherry cherry cherry shared x")],   # "x" dropped (len < 2)
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.rank): r for r in top_terms(df, k=2).collect()}
    # doc 1: apple tf=2 df=1 -> 2*4/2=4.0 beats shared tf=3 df=3 -> 3*4/4=3.0
    assert got[(1, 1)].term == "apple" and got[(1, 1)].score == 4.0
    assert got[(1, 2)].term == "shared" and got[(1, 2)].score == 3.0
    # doc 3: cherry tf=3 df=2 -> 3*4/3=4.0 beats shared 1.0
    assert got[(3, 1)].term == "cherry" and got[(3, 1)].score == 4.0
    # doc 2: all tf=1; banana df=2, cherry df=2 tie at 4/3 -> term tie-break
    assert got[(2, 1)].term == "banana" and got[(2, 2)].term == "cherry"
    # log variant ranks by textbook smooth idf
    lg = {(r.doc_id, r.rank): r for r in top_terms(df, k=1, idf="log").collect()}
    want = 2 * (math.log(4 / 2) + 1)
    assert lg[(1, 1)].term == "apple" and abs(lg[(1, 1)].score - round(want, 4)) < 1e-9
    with pytest.raises(ValueError, match="idf"):
        top_terms(df, idf="bm25")


def test_scrub_pii_linear_on_pathological_runs(spark):
    # a 1 MiB run of email-local-part chars with no '@' must scrub in linear
    # time: the \b anchor makes every in-run start position fail O(1)
    # (the unbounded pattern was O(len^2) ~ minutes per page on Java regex)
    import time
    from sparksketch.textstats import scrub_pii
    z = "word " + "z" * (1 << 20) + " end a@b.com +1 (555) 010-1234"
    df = spark.createDataFrame([(z,)] * 8, "t string")
    t0 = time.time()
    got = df.select(scrub_pii("t").alias("s")).collect()
    assert time.time() - t0 < 20          # was multi-minute per row before
    assert got[0].s.endswith(" end <EMAIL> <PHONE>")
    assert "z" * (1 << 20) in got[0].s     # the run itself is untouched


def test_bm25_matches_hand_computation(spark):
    from sparksketch.textstats import bm25_topk
    docs = [(0, "hash join hash"), (1, "vector scan"), (2, "join"),
            (3, "the quick fox"), (4, "hash hash hash hash")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.score for r in
           bm25_topk(df, ["hash", "join"], k=5).collect()}
    # reference computation in plain python (same ratio idf, k1/b defaults)
    n, lens = 5, [3, 2, 1, 3, 4]
    avg = sum(lens) / n
    tf = {"hash": [2, 0, 0, 0, 4], "join": [1, 0, 1, 0, 0]}
    dfreq = {"hash": 2, "join": 2}
    for d in range(5):
        want = 0.0
        for t in ("hash", "join"):
            w = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            x = float(tf[t][d])
            want += w * (x * 2.2 / (x + 1.2 * (0.25 + 0.75 * lens[d] / avg)))
        if d in got:
            assert abs(got[d] - round(want, 4)) < 1e-9
    # ranking: doc 4 (4x hash, short) beats doc 0 (2 hash + 1 join)?
    # both idfs equal here, so just assert the top doc is the true argmax
    best = max(range(5), key=lambda d: sum(
        (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
        * (tf[t][d] * 2.2 / (tf[t][d] + 1.2 * (0.25 + 0.75 * lens[d] / avg)))
        for t in ("hash", "join")))
    top = bm25_topk(df, ["hash", "join"], k=1).first()
    assert top.doc_id == best


def test_bm25_log_idf_and_validation(spark):
    import pytest as _pt
    from sparksketch.textstats import bm25_topk
    df = spark.createDataFrame(
        [(0, "rare term here"), (1, "common common"), (2, "common")],
        "doc_id long, text string")
    got = bm25_topk(df, ["rare"], k=3, idf="log").collect()
    assert got[0].doc_id == 0 and got[0].score > 0
    with _pt.raises(ValueError, match="at least one"):
        bm25_topk(df, [])
    with _pt.raises(ValueError, match="idf"):
        bm25_topk(df, ["x"], idf="bad")


def test_bm25_plan_is_jvm_only(spark):
    """Both passes stay in whole-stage codegen: zero Python evals, and the
    winner selection is a TakeOrdered, not a global sort."""
    from sparksketch.plans import plan_digest
    from sparksketch.textstats import bm25_topk
    df = spark.createDataFrame(
        [(i, "hash join scan") for i in range(64)], "doc_id long, text string")
    digest = plan_digest(bm25_topk(df, ["hash", "scan"], k=5))
    assert digest.n_python_evals == 0
    assert digest.has_take_ordered


# ---------------------------------------------------------------- bigram LM

def _brute_lm(rows, scale=1_000_000, train_rows=None):
    """Single-node spec: MLE bigram model, integer-floor cells."""
    import re
    from collections import Counter

    def bigrams(text):
        toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
        return list(zip(toks, toks[1:]))

    cab = Counter(bg for _, t in (train_rows or rows) for bg in bigrams(t))
    ca = Counter()
    for (a, _), c in cab.items():
        ca[a] += c
    out = {}
    for i, t in rows:
        bgs = bigrams(t)
        score = sum((scale * cab[bg]) // ca[bg[0]] if bg in cab else 0
                    for bg in bgs)
        out[i] = (len(bgs), score)
    return out


def test_lm_bigram_score_matches_bruteforce(spark):
    from sparksketch.textstats import lm_bigram_score
    import random
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
            for i in range(50)]
    rows += [(100, ""), (101, "  "), (102, "solo"), (103, "The  THE the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lm_score)
           for r in lm_bigram_score(df).collect()}
    assert got == _brute_lm(rows)
    # self-trained repeated bigram: "the the" appears twice; c(the,the)=2,
    # c_a(the) counts both positions → cell = 1e6 * 2 // c_a
    assert got[103][0] == 2
    # empty / single-token docs present with zeros
    assert got[100] == (0, 0) and got[102] == (0, 0)


def test_lm_bigram_score_external_train(spark):
    from sparksketch.textstats import lm_bigram_score
    train = [(0, "a b a b a c")]          # c(a,b)=2 c(b,a)=2 c(a,c)=1 → c_a(a)=3, c_a(b)=2
    score = [(1, "a b"), (2, "a c"), (3, "x y"), (4, "b a")]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lm_score)
           for r in lm_bigram_score(sdf, train_df=tdf).collect()}
    assert got == _brute_lm(score, train_rows=train)
    assert got[1] == (1, 2_000_000 // 3)   # p(b|a) = 2/3
    assert got[3] == (1, 0)                # fully OOV
    assert got[4] == (1, 1_000_000)        # p(a|b) = 2/2


def test_lm_bigram_score_rejects_bad_scale(spark):
    from sparksketch.textstats import lm_bigram_score
    import pytest as _pytest
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        lm_bigram_score(df, scale=0)


def test_bm25_index_equals_direct(spark, tmp_path):
    """The persisted inverted index reproduces the direct scorer's top-k
    row-for-row (shared _bm25_score_expr chain), including the absent-term
    and zero-fill tails."""
    from sparksketch.textstats import bm25_index_topk, bm25_topk, write_bm25_index
    docs = [(i, ["hash join scan", "vector index probe", "the quick fox",
                 "hash hash vector", "join", ""][i % 6] + f" tail{i % 7}")
            for i in range(120)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "idx")
    info = write_bm25_index(df, path, n_buckets=8)
    assert info["n"] == 120
    for terms, k in ((["hash", "join", "vector"], 10), (["absent"], 5),
                     (["tail3"], 30), (["the", "probe"], 120)):
        direct = [(r.doc_id, r.score) for r in bm25_topk(df, terms, k=k).collect()]
        via = [(r.doc_id, r.score) for r in
               bm25_index_topk(spark, path, terms, n_buckets=8, k=k).collect()]
        assert via == direct, terms


def test_bm25_index_log_idf_and_validation(spark, tmp_path):
    import pytest as _pt
    from sparksketch.textstats import bm25_index_topk, bm25_topk, write_bm25_index
    df = spark.createDataFrame(
        [(0, "rare term here"), (1, "common common"), (2, "common")],
        "doc_id long, text string")
    path = str(tmp_path / "idx")
    write_bm25_index(df, path, n_buckets=4)
    direct = [(r.doc_id, r.score) for r in bm25_topk(df, ["rare", "common"], k=3, idf="log").collect()]
    via = [(r.doc_id, r.score) for r in
           bm25_index_topk(spark, path, ["rare", "common"], n_buckets=4, k=3, idf="log").collect()]
    assert via == direct
    with _pt.raises(ValueError, match="at least one"):
        bm25_index_topk(spark, path, [], n_buckets=4)
    with _pt.raises(ValueError, match="idf"):
        bm25_index_topk(spark, path, ["x"], n_buckets=4, idf="bad")
    with _pt.raises(ValueError, match="n_buckets"):
        write_bm25_index(df, path, n_buckets=0)


def test_bm25_index_partition_pruning(spark, tmp_path):
    """bucket IN (...) reaches the scan as a PartitionFilter: only the query
    terms' buckets are listed/read — the I/O win that makes the index the
    repeated-query scale path."""
    import re
    from sparksketch.textstats import _read_postings, _term_bucket, write_bm25_index
    df = spark.createDataFrame(
        [(i, f"term{i % 50} filler common") for i in range(200)],
        "doc_id long, text string")
    path = str(tmp_path / "idx")
    write_bm25_index(df, path, n_buckets=16)
    post = _read_postings(spark, path, ["term3", "term17"], 16)
    plan = post._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*bucket", plan)
    assert "PushedFilters: " in plan and "term" in plan
    # and the bucket routing mirror matches the engine's pmod(xxhash64)
    from pyspark.sql import functions as F
    eng = {r.t: r.b for r in spark.createDataFrame(
        [("term3",), ("term17",), ("",), ("ünïcode",)], "t string").select(
        "t", F.pmod(F.xxhash64("t"), F.lit(16)).cast("int").alias("b")).collect()}
    for t, b in eng.items():
        assert _term_bucket(t, 16) == b


def test_pmi_top_pairs_hand_computation(spark):
    """Lift ratio vs a plain-python computation on a corpus with one
    planted collocation ('new york' always adjacent, its parts never
    elsewhere) that must rank first."""
    from sparksketch.textstats import pmi_top_pairs
    rows = [(i, "new york " + "the of the of" if i % 2 == 0
             else "the quick fox of the") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_top_pairs(df, k=5, min_count=3).collect()
    # exact reference
    from collections import Counter
    cab = Counter()
    for _, t in rows:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            cab[(a, b)] += 1
    T = sum(cab.values())
    ca = Counter(); cb = Counter()
    for (a, b), c in cab.items():
        ca[a] += c; cb[b] += c
    want = sorted(
        ((a, b, c, round((float(c) * float(T)) / (float(ca[a]) * float(cb[b])), 6))
         for (a, b), c in cab.items() if c >= 3),
        key=lambda r: (-r[3], r[0], r[1]))[:5]
    assert [(r.a, r.b, r.c_ab, r.lift) for r in got] == want
    assert (got[0].a, got[0].b) == ("new", "york")  # the planted collocation


def test_pmi_validation(spark):
    import pytest as _pt
    from sparksketch.textstats import pmi_top_pairs
    df = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    with _pt.raises(ValueError, match="k must"):
        pmi_top_pairs(df, k=0)
    with _pt.raises(ValueError, match="min_count"):
        pmi_top_pairs(df, min_count=0)
    # min_count filters: only pairs with >= min_count occurrences survive
    got = pmi_top_pairs(df, k=10, min_count=2).collect()
    assert [(r.a, r.b) for r in got] == [("a", "b")]
