"""Certificate non-degeneracy audit.

The r3 lesson (``customers_without_orders`` returned 0 rows at sf0.001, so
its "pass" proved nothing) generalized: a boolean certificate is only
evidence when the data it certifies is non-trivial.  This module is the
shared checker — the pytest sweep runs it over every ``queries()`` entry at
small SF, and ``scripts/check_oracle.py`` (the local stand-in for the
driver gate) applies it at whatever SF it is pointed at, so a certificate
that goes vacuous at ANY checked scale factor fails the gate, not just the
round that happened to look.

Conventions audited (the repo's certificate pattern, CLAUDE.md):
- every query must return at least one row;
- every certificate boolean — ``ok`` or any ``*_ok`` column (the
  multi-clause certificates: ``sound_ok``/``descent_ok``/``recall_ok``…)
  — must be TRUE on every row;
- in a certificate (a result carrying any such boolean), the
  positive-evidence columns (``n_*`` / ``num*`` / ``total*`` /
  ``count*``) must not be all ≤ 0 — EXCEPT counters whose very point is
  zero (mismatches, false negatives/positives, violations), which are
  skipped by name.
"""

from __future__ import annotations

import re

_NEGATIVE_EVIDENCE = re.compile(
    r"(mismatch|false_neg|false_pos|_fn\b|_fp\b|n_fn|n_fp|bad|viol|missing"
    r"|null)")  # null-counts are profiling facts, legitimately 0
_POSITIVE_EVIDENCE = re.compile(r"^(n_|num|total_?|count|cnt)")


def degeneracy_problems(name: str, rows: list[dict]) -> list[str]:
    """Empty list = healthy; else human-readable problem strings."""
    if not rows:
        return [f"{name}: empty result (vacuous at this SF)"]
    problems = []
    cols = list(rows[0].keys())
    ok_cols = [c for c in cols if c == "ok" or c.endswith("_ok")]
    if ok_cols:
        for oc in ok_cols:
            if not all(bool(r[oc]) for r in rows):
                problems.append(f"{name}: certificate {oc}=False")
        for c in cols:
            if not _POSITIVE_EVIDENCE.match(c) or _NEGATIVE_EVIDENCE.search(c):
                continue
            vals = [r[c] for r in rows
                    if isinstance(r[c], (int, float)) and not isinstance(r[c], bool)]
            if vals and all(v <= 0 for v in vals):
                problems.append(
                    f"{name}: evidence column {c!r} is degenerate (all <= 0)")
    return problems
