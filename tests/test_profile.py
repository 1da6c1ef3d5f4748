"""Table profiler: exact counters, HLL++ ndv band, edge cases."""

import pytest
from pyspark.sql import functions as F

from sparksketch.profile import profile_table

SF = "/root/testdata/sf0.01"


def test_profile_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cols = ["doc_id", "lang", "source", "n_chars"]
    prof = {r.column: r for r in profile_table(docs, cols, rsd=0.015).collect()}
    assert list(prof) == cols
    n = docs.count()
    for c in cols:
        exact_ndv = docs.filter(F.col(c).isNotNull()).select(c).distinct().count()
        exact_nulls = n - docs.filter(F.col(c).isNotNull()).count()
        r = prof[c]
        assert r.n_rows == n and r.n_nulls == exact_nulls
        assert abs(r.ndv_est - exact_ndv) <= max(4 * 0.015 * exact_ndv, 1)
        assert r.null_frac == exact_nulls / n
    # typed min/max stringified correctly
    assert prof["doc_id"].min == "0"
    assert prof["lang"].avg_len == 2.0


def test_profile_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (None, None)], "a long, b string")
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["b"].n_nulls == 3 and prof["b"].ndv_est == 0.0
    assert prof["b"].min is None and prof["b"].avg_len is None
    assert prof["a"].n_nulls == 1 and prof["a"].ndv_est == 2.0
    with pytest.raises(ValueError, match="no such"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="nothing"):
        profile_table(df, [])


def test_profile_map_column_does_not_abort(spark):
    df = spark.createDataFrame([(1, {"a": "b"}), (2, {"c": "d"})],
                               "id long, m map<string,string>")
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["id"].ndv_est == 2.0
    assert prof["m"].n_nulls == 0
    assert prof["m"].ndv_est is None and prof["m"].min is None


# -- chi-square drift ---------------------------------------------------

def _chi2_reference(pairs):
    """Plain-python contingency chi-square with the library's exact IEEE
    op order: e = (r*k)/t, contrib = ((o-e)*(o-e))/e."""
    from collections import Counter
    o = Counter(pairs)
    r = Counter(g for g, _ in pairs)
    k = Counter(c for _, c in pairs)
    t = float(len(pairs))
    out = {}
    for (g, c), n in o.items():
        e = (float(r[g]) * float(k[c])) / t
        d = float(n) - e
        out[(g, c)] = (n, e, (d * d) / e)
    return out


def test_chi2_cells_exact_parity(spark):
    from sparksketch.profile import chi2_cells
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = [(r.source, r.lang) for r in docs.select("source", "lang").collect()]
    ref = _chi2_reference(pairs)
    got = chi2_cells(docs, "source", "lang").collect()
    assert len(got) == len(ref)
    for row in got:
        o, e, contrib = ref[(row.source, row.lang)]
        # bit-exact doubles: the fixed-order IEEE chain is the contract
        assert row.o == o and row.e == e and row.contrib == contrib


def test_chi2_planted_drift_and_min_expected(spark):
    from sparksketch.profile import chi2_cells
    # uniform 4 groups x 3 cats, then plant a hot (g3, c2) cell
    rows = [(f"g{i % 4}", f"c{j}") for i in range(4) for j in range(3)
            for _ in range(10)]
    rows += [("g3", "c2")] * 50
    df = spark.createDataFrame(rows, "g string, c string")
    cells = chi2_cells(df, "g", "c").collect()
    top = max(cells, key=lambda r: r.contrib)
    assert (top.g, top.c) == ("g3", "c2")
    # min_expected drops low-expectation cells only
    kept = chi2_cells(df, "g", "c", min_expected=15.0).collect()
    assert 0 < len(kept) < len(cells)
    assert all(r.e >= 15.0 for r in kept)


def test_chi2_stat_independent_is_zero(spark):
    from sparksketch.profile import chi2_stat
    rows = [(f"g{i}", f"c{j}") for i in range(3) for j in range(4)
            for _ in range(7)]  # perfectly independent uniform table
    df = spark.createDataFrame(rows, "g string, c string")
    stat, dof = chi2_stat(df, "g", "c")
    assert stat == 0.0 and dof == (3 - 1) * (4 - 1)


def test_chi2_scans_corpus_once(spark):
    from sparksketch.profile import chi2_cells
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = chi2_cells(docs, "source", "lang")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_diversity_by_group_exact(spark):
    from collections import Counter

    from sparksketch.profile import diversity_by_group
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = [(r.source, r.lang)
             for r in docs.select("source", "lang").collect()]
    cnt = Counter(pairs)
    got = {r.source: r for r in
           diversity_by_group(docs, "source", "lang").collect()}
    groups = {g for g, _ in pairs}
    assert set(got) == groups
    for g in groups:
        cs = [v for (gg, _), v in cnt.items() if gg == g]
        n, sumsq = sum(cs), sum(c * c for c in cs)
        hhi = float(sumsq) / (float(n) * float(n))
        r = got[g]
        assert (r.n, r.sumsq) == (n, sumsq)
        assert r.hhi == hhi and r.gini == 1.0 - hhi  # bit-exact chain
    # single-category group has gini exactly 0
    one = spark.createDataFrame([("g", "x")] * 5, "g string, c string")
    row = diversity_by_group(one, "g", "c").first()
    assert row.gini == 0.0 and row.hhi == 1.0
