"""Non-degeneracy sweep over every driver query (the r3
customers_without-orders lesson as a standing invariant): a certificate
that returns no rows, a FALSE ok, or all-zero positive evidence at any
checked SF is a vacuous pass and must fail loudly.

Default sweep SF is sf0.001 (fast, and historically where vacuity bites
first — the smallest corpus); set SPARKSKETCH_CERT_SFS to a
comma-separated list of sf dirs to widen (scripts/check_oracle.py applies
the same checker at whatever SF it is pointed at, so the sf0.01/sf0.1
gate runs cover the larger scales every round).
"""

import os

import pytest

from sparksketch.certify import degeneracy_problems

_SFS = os.environ.get(
    "SPARKSKETCH_CERT_SFS", "/root/testdata/sf0.001").split(",")


@pytest.mark.parametrize("sf", _SFS)
def test_every_query_is_non_degenerate(spark, sf):
    import __spark_entry__ as entry
    problems = []
    for name, fn in entry.queries().items():
        try:
            rows = [r.asDict() for r in fn(spark, sf).collect()]
        except Exception as e:  # noqa: BLE001 - collect into one report
            problems.append(f"{name}: raised {type(e).__name__}: {e}")
            continue
        problems += degeneracy_problems(name, rows)
    assert not problems, "\n".join(problems)


def test_degeneracy_checker_positive_controls():
    # the checker itself must fire on each degeneracy class
    assert degeneracy_problems("q", [])  # empty
    assert degeneracy_problems("q", [{"ok": False, "n_x": 3}])
    assert degeneracy_problems("q", [{"ok": True, "n_pairs": 0}])
    # suffixed certificate booleans (sound_ok/recall_ok/...) count too
    assert degeneracy_problems("q", [{"recall_ok": False, "n_x": 3}])
    assert degeneracy_problems("q", [{"descent_ok": True, "n_codes": 0}])
    # zero-by-design counters are exempt; healthy rows pass
    assert not degeneracy_problems(
        "q", [{"ok": True, "n_media": 5, "n_mismatch": 0,
               "false_negatives": 0}])
    # non-certificate results only need rows
    assert not degeneracy_problems("q", [{"a": 0}])
