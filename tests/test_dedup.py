"""Dedup operators: exact, MinHash+LSH recall/precision on engineered
near-dupes, SimHash Hamming candidates, exact n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from sparksketch.dedup import (
    exact_dedup,
    exact_dedup_ids,
    exact_jaccard,
    lsh_candidates,
    minhash_dedup_pairs,
    minhash_signatures,
    signature_jaccard,
    simhash,
    simhash_candidates,
)

BASE = [
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight",
    "a completely different document about spark distributed computing and sketch data structures",
    "numpy vectorized kernels make arrow batches fast while python loops make everything very slow",
    "web pages from common crawl contain html markup text content and many duplicated boilerplates",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    i = 0
    for b in BASE:
        for copy in range(3):  # 3 exact copies each
            rows.append((i, b))
            i += 1
        # near-dup: one word changed
        rows.append((i, b.replace("the", "a", 1)))
        i += 1
    # unrelated fillers
    for j in range(40):
        rows.append((i, f"filler document number {j} with unique tokens alpha{j} beta{j} gamma{j} delta{j} epsilon{j}"))
        i += 1
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, corpus):
    ids = exact_dedup_ids(corpus, "text", "doc_id")
    distinct_texts = corpus.select("text").distinct().count()
    assert ids.count() == distinct_texts
    full = exact_dedup(corpus, "text", "doc_id")
    assert full.count() == distinct_texts
    # representative is the min id of each duplicate group
    assert full.filter(F.col("doc_id") == 0).count() == 1
    assert full.filter(F.col("doc_id") == 1).count() == 0


def test_minhash_finds_near_dupes(spark, corpus):
    pairs = minhash_dedup_pairs(corpus, "text", "doc_id", threshold=0.5,
                                num_perm=64, bands=16, shingle=5).cache()
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every exact-copy pair within a 4-row group (0,1,2 copies; 3 = near-dup)
    for g in range(len(BASE)):
        base = g * 4
        for x in (0, 1, 2):
            for y in (x + 1, x + 2):
                if y <= 2:
                    assert (base + x, base + y) in got, f"exact pair {(base+x, base+y)}"
        # near-dup row should pair with at least one copy
        assert any((base + c, base + 3) in got for c in (0, 1, 2))
    # no cross-group false positives above threshold
    for (a, b) in got:
        assert a // 4 == b // 4 or max(a, b) >= len(BASE) * 4


def test_signature_jaccard_exact_copy_is_one(spark, corpus):
    sig = minhash_signatures(corpus, "text", "doc_id", num_perm=32, bands=8)
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    est = signature_jaccard(pairs, sig, "doc_id").collect()[0].est_jaccard
    assert est == 1.0


def test_exact_jaccard_on_candidates(spark, corpus):
    pairs = spark.createDataFrame([(0, 1), (0, 3), (0, 5)], "id_a long, id_b long")
    j = {(r.id_a, r.id_b): r.jaccard for r in
         exact_jaccard(pairs, corpus, "text", "doc_id").collect()}
    assert j[(0, 1)] == 1.0          # exact copies
    assert 0.5 < j[(0, 3)] < 1.0     # near-dup
    assert j[(0, 5)] < 0.2           # different documents


def test_simhash_candidates(spark):
    # long doc: a 1-token edit flips few of the 64 bits → inside the
    # 4-block pigeonhole guarantee (hamming ≤ 3 ⇒ some 16-bit block equal)
    words = [f"token{i}" for i in range(200)]
    long_doc = " ".join(words)
    edited = " ".join(["changed" if i == 50 else w for i, w in enumerate(words)])
    other = " ".join(f"unrelated{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, long_doc), (1, long_doc), (2, edited), (3, other)],
        "doc_id long, text string",
    )
    sh = simhash(df, "text", "doc_id", max_chars=8192).cache()
    sig = {r.doc_id: r.simhash for r in sh.collect()}
    assert sig[0] == sig[1]  # identical docs → identical signatures

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sig[0], sig[2]) < ham(sig[0], sig[3])
    cands = simhash_candidates(sh, "doc_id", max_hamming=3).cache()
    got = {(r.id_a, r.id_b): r.hamming for r in cands.collect()}
    assert got[(0, 1)] == 0
    assert (0, 2) in got  # near-dup within the hamming ball
    assert (0, 3) not in got  # unrelated doc far away


def test_simhash_bucket_truncation_guard(spark):
    # degenerate corpus: 100k signatures sharing every block value (all
    # identical) — uncapped this is ~5·10^9 pairs in one bucket per block;
    # capped it must complete with bounded work and emit ≤ C(cap, 2) pairs
    n = 100_000
    sh = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(-6148914691236517206).alias("simhash"))
    cands = simhash_candidates(sh, "doc_id", max_hamming=3, max_bucket=128)
    m = cands.count()
    assert 0 < m <= 128 * 127 / 2
    # the kept ids are the deterministic lowest ones
    top = cands.agg(F.max("id_b")).first()[0]
    assert top <= 127


def test_simhash_candidates_param_guards(spark):
    sh = spark.range(4).select(F.col("id").alias("doc_id"), F.col("id").alias("simhash"))
    with pytest.raises(ValueError):
        simhash_candidates(sh, "doc_id", max_hamming=4, n_blocks=4)
    with pytest.raises(ValueError):
        simhash_candidates(sh, "doc_id", n_blocks=5)


def test_simhash_candidates_wider_blocks(spark):
    # n_blocks=2 (32-bit blocks): pigeonhole covers max_hamming=1
    words = [f"tok{i}" for i in range(300)]
    df = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(words)),
         (2, " ".join(f"zq{i}" for i in range(300)))],
        "doc_id long, text string")
    sh = simhash(df, "text", "doc_id", max_chars=8192)
    got = {(r.id_a, r.id_b) for r in
           simhash_candidates(sh, "doc_id", max_hamming=1, n_blocks=2).collect()}
    assert (0, 1) in got and (0, 2) not in got


def test_lsh_bucket_truncation_guard(spark):
    # 600 identical docs → one bucket; pair blowup must be capped
    df = spark.createDataFrame([(i, "same text for everyone here") for i in range(600)],
                               "doc_id long, text string")
    sig = minhash_signatures(df, "text", "doc_id", num_perm=16, bands=4)
    pairs = lsh_candidates(sig, "doc_id", max_bucket=50)
    n = pairs.count()
    assert 0 < n <= 50 * 49 / 2


# ---------------- connected components ----------------

def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id of each component
    out = {}
    for v in range(n_nodes):
        r = find(v)
        out[v] = min(out.get(r, r), r)
    roots = {v: find(v) for v in range(n_nodes)}
    mins = {}
    for v in range(n_nodes):
        r = roots[v]
        mins[r] = min(mins.get(r, v), v)
    return {v: mins[roots[v]] for v in range(n_nodes)}


def test_connected_components_random_graph(spark):
    import random
    from sparksketch.dedup import connected_components
    rng = random.Random(17)
    n = 2000
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(1200)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _uf_components(n, edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.range(n).select(F.col("id"))
    got = {r.id: r.component for r in connected_components(pairs, nodes=nodes).collect()}
    assert got == want


def test_connected_components_shapes(spark):
    """Long chain (the O(diameter) killer), star, singleton, two cliques."""
    from sparksketch.dedup import connected_components
    chain = [(i, i + 1) for i in range(100, 200)]          # one 101-node chain
    star = [(500, 500 + i) for i in range(1, 30)]          # star centered high
    cliq = [(a, b) for a in range(900, 905) for b in range(a + 1, 905)]
    pairs = spark.createDataFrame(chain + star + cliq, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in
                                   list(range(100, 201)) + list(range(500, 530))
                                   + list(range(900, 905)) + [7777]], "id long")
    got = {r.id: r.component for r in connected_components(pairs, nodes=nodes).collect()}
    assert all(got[i] == 100 for i in range(100, 201))
    assert all(got[i] == 500 for i in range(500, 530))
    assert all(got[i] == 900 for i in range(900, 905))
    assert got[7777] == 7777  # isolated node → singleton


def test_dedup_representatives_end_to_end(spark):
    from sparksketch.dedup import dedup_representatives
    rows = [(i, f"doc {i // 3}") for i in range(30)]  # triples of identical text
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # pairs from exact-equality self-join (what minhash would emit at J=1)
    a = df.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = df.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    pairs = (a.join(b, F.col("ta") == F.col("tb")).filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
    kept = dedup_representatives(df, pairs, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [i for i in range(30) if i % 3 == 0]


def test_connected_components_max_iter_raises(spark):
    from sparksketch.dedup import connected_components
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(pairs, max_iter=0)


def test_paragraph_dedup(spark):
    from sparksketch.dedup import paragraph_dedup
    df = spark.createDataFrame(
        [(1, "unique one\nSHARED FOOTER\nunique two"),
         (2, "SHARED FOOTER\nother text"),
         (3, "SHARED FOOTER"),                       # fully deduped away
         (4, "repeat\nrepeat\nmiddle\nrepeat"),      # within-doc dups
         (5, "")],                                   # empty doc = one empty para
        "doc_id long, text string",
    ).repartition(5)
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert got[1].text_dedup == "unique one\nSHARED FOOTER\nunique two"
    assert (got[1].n_paras, got[1].n_removed) == (3, 0)
    assert got[2].text_dedup == "other text" and got[2].n_removed == 1
    assert got[3].text_dedup == "" and got[3].n_removed == 1
    assert got[4].text_dedup == "repeat\nmiddle" and got[4].n_removed == 2
    # doc 5's single empty paragraph is globally first '' -> kept
    assert got[5].text_dedup == "" and got[5].n_removed == 0
    # determinism under a different partitioning
    again = {r.doc_id: r.text_dedup for r in paragraph_dedup(df.coalesce(1)).collect()}
    assert again == {k: v.text_dedup for k, v in got.items()}


def test_simhash_candidates_no_self_pairs_on_duplicate_ids(spark):
    from sparksketch.dedup import simhash, simhash_candidates
    df = spark.createDataFrame(
        [(1, "the same text here"), (2, "the same text here")],
        "doc_id long, text string")
    sim = simhash(df, "text", "doc_id")
    dup = sim.union(sim)          # same ids twice
    got = simhash_candidates(dup, "doc_id", max_hamming=3).collect()
    assert all(r.id_a < r.id_b for r in got)
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}


def test_paragraph_dedup_plan_has_no_paragraph_window(spark):
    """Winners must come from a map-side-combined aggregation, never a
    row_number window over the paragraph hash (a corpus-wide hot footer
    would land on one reducer)."""
    from sparksketch.dedup import paragraph_dedup
    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = paragraph_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan    # map-side combine on the winner struct


# ====================================================================
# shared k-gram pairs (cross-document substring overlap)
# ====================================================================

def test_shared_kgram_hash_equals_exact_and_sound(spark):
    from sparksketch.dedup import shared_kgram_pairs
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ex = {(r.doc_a, r.doc_b, r.n_shared) for r in shared_kgram_pairs(
        docs, "text", "doc_id", k=24, gram_key="exact").collect()}
    hs = {(r.doc_a, r.doc_b, r.n_shared) for r in shared_kgram_pairs(
        docs, "text", "doc_id", k=24, gram_key="hash").collect()}
    assert ex == hs and len(ex) > 0          # scale path ≡ collision-free path
    # soundness spot-check: a reported pair really shares a 24-char gram
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for da, db, ns in sorted(ex)[:5]:
        a, b = texts[da], texts[db]
        grams_a = {a[i:i + 24] for i in range(len(a) - 23)}
        shared = {b[i:i + 24] for i in range(len(b) - 23)} & grams_a
        assert len(shared) > 0, (da, db)


def test_shared_kgram_hot_gram_cap_and_guards(spark):
    import pytest as _pytest

    from sparksketch.dedup import shared_kgram_pairs
    # 10 docs all sharing one 30-char boilerplate + 2 docs sharing a rare
    # passage: with the cap below 10 the boilerplate gram dies, the rare
    # pair survives
    boiler = "x" * 5 + "SHARED-BOILERPLATE-ACROSS-ALL-DOCS" + "y" * 5
    rare = "this rare passage appears exactly twice in all"
    rows = [(i, boiler + f" unique tail {i}") for i in range(10)]
    rows += [(100, "aa " + rare), (101, "bb " + rare)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = shared_kgram_pairs(df, "text", "doc_id", k=24, max_gram_docs=5)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)     # boilerplate pairs capped away
    uncapped = shared_kgram_pairs(df, "text", "doc_id", k=24, max_gram_docs=64)
    assert len(uncapped.collect()) == 45 + 1  # C(10,2) boiler pairs + rare
    with _pytest.raises(ValueError, match="k must be"):
        shared_kgram_pairs(df, "text", "doc_id", k=1)
    with _pytest.raises(ValueError, match="gram_key"):
        shared_kgram_pairs(df, "text", "doc_id", gram_key="nope")


def test_shared_kgram_plan_scale_safe(spark):
    from sparksketch.dedup import shared_kgram_pairs
    from sparksketch.plans import assert_scale_safe
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # equi-joins + map-side-combinable aggregates only — no cross product,
    # no global sort
    assert_scale_safe(shared_kgram_pairs(docs, "text", "doc_id"))


def test_kgram_dup_stats_matches_bruteforce(spark):
    from sparksketch.dedup import kgram_dup_stats
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.doc_id: r.text for r in docs.collect() if len(r.text) >= 24}
    # brute-force ground truth: per-gram winner = min doc_id
    win = {}
    per_doc = {}
    for did in sorted(rows):
        grams = {rows[did][i:i + 24] for i in range(len(rows[did]) - 23)}
        per_doc[did] = grams
        for g in grams:
            win.setdefault(g, did)
    expected = {did: (len(gs), sum(1 for g in gs if win[g] != did))
                for did, gs in per_doc.items()}
    got_exact = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in kgram_dup_stats(
        docs, "text", "doc_id", k=24, gram_key="exact").collect()}
    assert got_exact == expected
    # the vectorized byte-roll hash path agrees on this (ASCII) corpus
    got_hash = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in kgram_dup_stats(
        docs, "text", "doc_id", k=24, gram_key="hash").collect()}
    assert got_hash == expected
    assert any(d > 0 for _, d in expected.values())  # non-vacuous


def test_kgram_sample_mod_content_defined(spark):
    # content-defined sampling: the SAME grams are selected wherever the
    # shared run sits, so a long shared run is still detected at mod>1
    from sparksketch.dedup import kgram_dup_stats
    shared = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = [(1, "PREFIX-A " + shared), (2, "a completely different and much longer prefix " + shared)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.n_dup_grams for r in kgram_dup_stats(
        df, "text", "doc_id", k=24, gram_key="hash", sample_mod=8).collect()}
    assert out[2] > 0          # doc 2's shared-run grams lost to doc 1
    assert out[1] == 0         # doc 1 wins everything it contains
    # mod=1 on the same corpus: strictly more grams counted
    full = {r.doc_id: r.n_grams for r in kgram_dup_stats(
        df, "text", "doc_id", k=24, gram_key="hash").collect()}
    samp = {r.doc_id: r.n_grams for r in kgram_dup_stats(
        df, "text", "doc_id", k=24, gram_key="hash", sample_mod=8).collect()}
    assert all(samp[d] < full[d] for d in full)


def test_kgram_exact_mode_rejects_sampling(spark):
    import pytest as _pytest

    from sparksketch.dedup import kgram_dup_stats
    df = spark.createDataFrame([(1, "abcdefghij" * 10)], "doc_id long, text string")
    with _pytest.raises(ValueError, match="sample_mod > 1 requires"):
        kgram_dup_stats(df, "text", "doc_id", gram_key="exact", sample_mod=8)


# ---------------------------------------------------------------- set-sim join

def _brute_set_sim(rows, threshold):
    """All-pairs exact token-set Jaccard via Python sets (the spec)."""
    import re
    tau = round(threshold * 1000)
    sets = {}
    for i, text in rows:
        toks = set(re.split(r"\s+", text.strip().lower())) if text.strip() else set()
        if toks:
            sets[i] = toks
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            union = len(a | b)
            if inter * 1000 >= tau * union:
                out.add((ids[x], ids[y], inter, union))
    return out


def test_set_sim_pairs_matches_bruteforce(spark):
    from sparksketch.dedup import set_sim_pairs
    import random
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        k = rng.randint(1, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    rows += [(100, ""), (101, "   "),                      # empty sets drop
             (102, "alpha beta gamma"), (103, "Alpha  BETA gamma"),  # identical after norm
             (104, "alpha beta delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for tau in (0.5, 0.8, 1.0):
        got = {tuple(r) for r in set_sim_pairs(df, "text", "doc_id", tau).collect()}
        exp = _brute_set_sim(rows, tau)
        assert got == exp, f"tau={tau}: {len(got)} vs {len(exp)}"
    # the normalized-identical pair is found at tau=1.0
    got1 = {tuple(r)[:2] for r in set_sim_pairs(df, "text", "doc_id", 1.0).collect()}
    assert (102, 103) in got1


def test_set_sim_threshold_boundary_is_integer_exact(spark):
    # 3-of-5 tokens shared: J = 3/7 ≈ 0.42857 — in at τ=0.428, out at τ=0.429
    from sparksketch.dedup import set_sim_pairs
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y")], "doc_id long, text string")
    assert set_sim_pairs(df, threshold=0.428).count() == 1
    assert set_sim_pairs(df, threshold=0.429).count() == 0


def test_set_sim_doc_stats(spark):
    from sparksketch.dedup import set_sim_doc_stats
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b c d"), (4, "zz qq")],
        "doc_id long, text string")
    rows = {r["doc_id"]: (r["n_neighbors"], r["sum_inter"])
            for r in set_sim_doc_stats(df, threshold=0.7).collect()}
    # 1-2 identical (J=1), 1-3 and 2-3 J=3/4 ≥ 0.7; doc 4 isolated
    assert rows == {1: (2, 6), 2: (2, 6), 3: (2, 6)}


def test_set_sim_pairs_rejects_bad_threshold(spark):
    from sparksketch.dedup import set_sim_pairs
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        set_sim_pairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        set_sim_pairs(df, threshold=1.5)
