"""Sketch cube + rollup: materialized per-cell sketch states whose rollups
are provably equivalent to direct builds over the matching fact slice.

The exactness claims under test:
- HLL / CMS / Theta merges are associative+commutative with a canonical
  serialization, so a rollup of per-(event_type, day) states is
  **byte-identical** to a sketch built directly on the filtered fact.
- t-digest rollups are not byte-stable (compression is order-dependent)
  but the quantile estimates stay within the sketch's band.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksketch.cms import CMS, CMS_SEEDS
from sparksketch.hll import HLL, HLL_SEED
from sparksketch.sketch import build_sketch, rollup_states, sketch_cube
from sparksketch.tdigest import TDigest
from sparksketch.theta import Theta, THETA_SEED

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events_day(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return ev.withColumn("day", F.to_date("ts").cast("string")).cache()


def _range(ev):
    return ev.filter(F.col("day").between("2024-01-05", "2024-01-14"))


def test_hll_cube_rollup_byte_identical(spark, events_day):
    hll = lambda pid: HLL(12)
    cube = sketch_cube(events_day, ["event_type", "day"], "user_id", hll,
                       seeds=(HLL_SEED,))
    rolled = rollup_states(_range(cube), ["event_type"], HLL, hll)
    got = {r.event_type: bytes(r.state) for r in rolled.collect()}
    for et, blob in got.items():
        direct = build_sketch(
            _range(events_day).filter(F.col("event_type") == et),
            "user_id", hll, seeds=(HLL_SEED,))
        assert blob == direct.to_bytes(), et
        exact = (_range(events_day).filter(F.col("event_type") == et)
                 .select("user_id").distinct().count())
        est = HLL.from_bytes(blob).estimate()
        assert abs(est - exact) <= 4 * HLL(12).rel_error() * exact + 2


def test_cms_and_theta_cube_rollup_byte_identical(spark, events_day):
    cms = lambda pid: CMS(d=4, w=1 << 12)
    cube = sketch_cube(events_day, ["event_type", "day"], "user_id", cms,
                       seeds=CMS_SEEDS)
    blob = rollup_states(_range(cube), [], CMS, cms).to_bytes()
    direct = build_sketch(_range(events_day), "user_id", cms, seeds=CMS_SEEDS)
    assert blob == direct.to_bytes()

    theta = lambda pid: Theta(k=256)
    tcube = sketch_cube(events_day, ["day"], "user_id", theta, seeds=(THETA_SEED,))
    tblob = rollup_states(_range(tcube), [], Theta, theta).to_bytes()
    tdirect = build_sketch(_range(events_day), "user_id", theta, seeds=(THETA_SEED,))
    assert tblob == tdirect.to_bytes()


def test_rollup_keeps_dim_types_and_all_cells(spark, events_day):
    hll = lambda pid: HLL(10)
    cube = sketch_cube(events_day, ["event_type", "day"], "user_id", hll,
                       seeds=(HLL_SEED,))
    assert [f.name for f in cube.schema] == ["event_type", "day", "state"]
    n_types = events_day.select("event_type").distinct().count()
    n_days = events_day.select("day").distinct().count()
    assert cube.count() == n_types * n_days  # synthetic events cover every cell
    rolled = rollup_states(cube, ["day"], HLL, hll)
    assert rolled.count() == n_days
    assert dict(rolled.dtypes)["day"] == "string"


def test_tdigest_cube_rollup_quantile_band(spark, events_day):
    td = lambda pid: TDigest(delta=200.0)
    cube = sketch_cube(events_day, ["day"], "value", td, numeric=True)
    sk = rollup_states(_range(cube), [], TDigest, td)
    vals = np.array([r.value for r in _range(events_day)
                    .select("value").dropna().collect()])
    for q in (0.1, 0.5, 0.9):
        est = sk.quantile(q)
        lo, hi = np.quantile(vals, max(0.0, q - 0.02)), np.quantile(vals, min(1.0, q + 0.02))
        assert lo - 1e-9 <= est <= hi + 1e-9, (q, est, lo, hi)


def test_cube_null_dims_dropped_and_validation(spark, events_day):
    with_null = events_day.withColumn(
        "day", F.when(F.col("event_type") == "click", None).otherwise(F.col("day")))
    hll = lambda pid: HLL(10)
    cube = sketch_cube(with_null, ["event_type", "day"], "user_id", hll,
                       seeds=(HLL_SEED,))
    assert cube.filter(F.col("event_type") == "click").count() == 0
    with pytest.raises(ValueError, match="at least one dim"):
        sketch_cube(events_day, [], "user_id", hll, seeds=(HLL_SEED,))
