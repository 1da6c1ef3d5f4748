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
