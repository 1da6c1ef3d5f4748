"""Plan auditing — the 100-TB design rules as executable assertions.

Every scale claim in this library reduces to a property of the physical
plan: the filter reached the scan, the join is broadcast not nested-loop,
the sample never global-sorts, the sketch build never shuffles rows.
The test suite asserts those properties ad hoc by grepping
``executedPlan().toString()``; ``plan_digest`` makes the same audit a
public, structured API so pipelines can install **plan regression guards**
in their own CI::

    d = plan_digest(df)
    assert d.n_exchanges <= 1 and not d.has_cross_product
    assert "IsNotNull" in str(d.pushed_filters)

The digest is parsed from the formatted physical plan (stringly, like
Spark's own ``explain``); it is a diagnostic surface, not a stable
compiler API — pin assertions to properties (counts, operator presence),
not to exact strings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_JOIN_OPS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
             "BroadcastNestedLoopJoin", "CartesianProduct")


@dataclass
class PlanDigest:
    n_exchanges: int = 0
    n_scans: int = 0
    joins: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_take_ordered: bool = False
    has_global_sort: bool = False          # rangepartitioning Exchange
    n_wholestage_spans: int = 0
    n_python_evals: int = 0                # Arrow/pandas UDF stages
    plan: str = ""                          # the raw text, for escalation

    @property
    def has_cross_product(self) -> bool:
        return any(j in ("BroadcastNestedLoopJoin", "CartesianProduct")
                   for j in self.joins)


def plan_digest(df: DataFrame) -> PlanDigest:
    """Digest the physical plan of ``df`` into the properties the scale
    rules care about.

    Before the DataFrame executes this is the **static** plan (AQE may
    still re-plan joins at runtime); after an action, the digest covers
    only the ``== Final Plan ==`` section — the initial-plan echo Spark
    appends post-execution is stripped so operators are never
    double-counted.  Classic (non-Connect) Spark only: the parser reads
    the JVM ``queryExecution`` seam."""
    try:
        qe = df._jdf.queryExecution()
    except AttributeError as e:  # Spark Connect DataFrames have no _jdf
        raise NotImplementedError(
            "plan_digest needs a classic-mode DataFrame (Spark Connect "
            "exposes no queryExecution seam)") from e
    plan = qe.executedPlan().toString()
    # post-execution, the TOP-LEVEL AdaptiveSparkPlan prints '== Final
    # Plan ==' followed by an unindented '+- == Initial Plan ==' echo —
    # strip only that (line-anchored, no leading spaces): nested AQE
    # subqueries print their own indented marker pairs INSIDE the final
    # section, and a flat split would truncate the plan at the first one
    plan_final = re.split(r"\n\+- == Initial Plan ==", plan)[0]
    d = PlanDigest(plan=plan)
    d.n_exchanges = len(re.findall(r"\bExchange\b", plan_final))
    d.n_scans = len(re.findall(r"\bFileScan\b|\bBatchScan\b", plan_final))
    for op in _JOIN_OPS:
        d.joins += [op] * len(re.findall(rf"\b{op}\b", plan_final))
    # Spark truncates long metadata at spark.sql.maxMetadataStringLength
    # (no closing bracket) — capture to the bracket OR the end of line
    d.pushed_filters = [m.rstrip() for m in re.findall(
        r"PushedFilters: \[([^\]\n]*)", plan_final)]
    d.read_schemas = re.findall(r"ReadSchema: (\S+)", plan_final)
    d.has_take_ordered = "TakeOrderedAndProject" in plan_final
    d.has_global_sort = "rangepartitioning" in plan_final
    # treeString renders codegen stages as '*(N) ' operator prefixes.
    # With AQE enabled (this library's default) they appear only AFTER
    # execution — the static pre-run plan is unannotated, so the field is
    # 0 until an action has run; with AQE disabled the static plan is
    # already annotated.  Stage ids restart per AdaptiveSparkPlan scope
    # (nested subqueries), so distinct ids are counted per scope.
    d.n_wholestage_spans = sum(
        len(set(re.findall(r"\*\((\d+)\)", seg)))
        for seg in plan_final.split("AdaptiveSparkPlan"))
    d.n_python_evals = len(re.findall(
        r"ArrowEvalPython|BatchEvalPython|MapInArrow|MapInPandas"
        r"|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"
        r"|AggregateInPandas|WindowInPandas", plan_final))
    return d


def assert_scale_safe(df: DataFrame, *, max_exchanges: int | None = None,
                      allow_cross_product: bool = False,
                      allow_global_sort: bool = False,
                      require_pushed: str | None = None) -> PlanDigest:
    """One-call plan regression guard: raises ``AssertionError`` naming the
    violated rule (with the offending plan attached) — drop it after any
    query you intend to run at scale."""
    d = plan_digest(df)
    problems = []
    if max_exchanges is not None and d.n_exchanges > max_exchanges:
        problems.append(f"{d.n_exchanges} Exchanges (allowed {max_exchanges})")
    if not allow_cross_product and d.has_cross_product:
        problems.append(f"cross-product join: {d.joins}")
    if not allow_global_sort and d.has_global_sort:
        problems.append("global sort (rangepartitioning Exchange)")
    if require_pushed is not None and not any(
            require_pushed in p for p in d.pushed_filters):
        problems.append(f"no pushed filter matching {require_pushed!r} "
                        f"(pushed: {d.pushed_filters})")
    if problems:
        raise AssertionError("plan not scale-safe: " + "; ".join(problems)
                             + "\n" + d.plan)
    return d


# --- forced-broadcast audit -------------------------------------------------
#
# An explicit broadcast hint OVERRIDES spark.sql.autoBroadcastJoinThreshold:
# Spark builds the broadcast relation no matter how large it turns out,
# so a hint on a table that grows with the data is a 100×-scale OOM wired
# into the plan (it looks fine at test SF — exactly how the bug hides).
# The safe envelope this library enforces on its own queries:
#   - bounded tables (nation=25, region=5 rows at EVERY scale factor): ok;
#   - COLLAPSING aggregates: ok — a global aggregate, or a grouping free
#     of table key columns (grouping on c_custkey etc. reproduces the
#     table's own cardinality and earns no credit; non-key groupings with
#     genuinely unbounded domains remain the caller's responsibility —
#     the audit is syntactic);
#   - narrow equality-filtered slices of part/supplier: ok only when an
#     equality Filter ON A COLUMN OF THAT TABLE sits inside the hinted
#     subtree (e.g. brand+size, ~1/300 of the table) — a fixed-FRACTION
#     filter (type-pattern, negation) or an equality on some OTHER joined
#     dim does NOT qualify, those still grow with SF;
#   - customer / orders / lineitem / documents / events / embeddings:
#     never — no filter credit, AQE picks the strategy at runtime.

# signature column → base table (the testdata schemas are fixed)
_TABLE_SIGNATURES = {
    "c_custkey": "customer", "o_orderkey": "orders", "l_orderkey": "lineitem",
    "s_suppkey": "supplier", "p_partkey": "part", "n_nationkey": "nation",
    "r_regionkey": "region", "doc_id": "documents", "event_id": "events",
    "emb_id": "embeddings",
}
_BOUNDED_TABLES = {"nation", "region"}
_NEVER_BROADCAST = {"customer", "orders", "lineitem", "documents", "events",
                    "embeddings"}
_FILTER_CREDIT = {"part", "supplier"}  # only with an equality filter in-tree


def _tree_indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


# TPC-H prefix convention — used to attribute equality-filter columns and
# aggregate grouping keys to their base table
_COL_PREFIX_TABLE = {"c_": "customer", "o_": "orders", "l_": "lineitem",
                     "s_": "supplier", "p_": "part", "n_": "nation",
                     "r_": "region"}
# grouping on a table key — primary OR a foreign key of an SF-proportional
# table — reproduces SF-proportional cardinality, so an Aggregate on these
# collapses nothing (bounded-domain foreign keys like *_nationkey are
# deliberately absent: 25 nations at every SF)
_KEY_COLUMNS = {"c_custkey", "o_orderkey", "l_orderkey", "s_suppkey",
                "p_partkey", "doc_id", "event_id", "emb_id", "media_id",
                "o_custkey", "l_partkey", "l_suppkey"}


def _strip_not_spans(s: str) -> str:
    """Remove every balanced ``NOT (...)`` span so a negation's inner ``=``
    never reads as an equality (``p_type != 'X'`` prints as
    ``NOT (p_type#4 = X)`` in analyzed plans)."""
    while True:
        i = s.find("NOT (")
        if i < 0:
            return s
        depth, j = 0, i + 4
        while j < len(s):
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        s = s[:i] + s[j + 1:]


def _cols_to_tables(names) -> set[str]:
    out = set()
    for n in names:
        for pre, t in _COL_PREFIX_TABLE.items():
            if n.startswith(pre):
                out.add(t)
    return out


def forced_broadcasts(df: DataFrame) -> list[dict]:
    """Every ``ResolvedHint (strategy=broadcast)`` subtree in the ANALYZED
    logical plan (hints are consumed by the planner, so the audit must run
    pre-optimization).  Each hint reports its ``tables`` plus one entry per
    base Relation with the credits found on THAT relation's ANCESTOR PATH
    inside the subtree — path-scoped on purpose: an Aggregate or Filter on
    a SIBLING branch (e.g. a nation aggregate cross-joined next to raw
    orders) collapses nothing about the other branch and must not launder
    it:

    - ``collapsed`` — a collapsing Aggregate (global, or grouping free of
      table PRIMARY/FOREIGN key columns; grouping on ``o_custkey`` has
      customer cardinality and earns no credit) sits between the hint and
      the relation;
    - ``eq_tables`` — tables owning a column compared with ``=`` in an
      ancestor Filter (``NOT (... = ...)`` spans are excised first, so a
      negation never reads as an equality slice).

    Classic-mode only (reads the JVM ``queryExecution`` seam)."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except AttributeError as e:
        raise NotImplementedError(
            "forced_broadcasts needs a classic-mode DataFrame") from e
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line.lower():
            continue
        base = _tree_indent(line)
        info = {"tables": set(), "relations": []}
        # ancestor stack of (indent, kind, payload) nodes within the subtree
        stack: list[tuple[int, str, object]] = []
        for sub in lines[i + 1:]:
            d = _tree_indent(sub)
            if d <= base:
                break
            while stack and stack[-1][0] >= d:
                stack.pop()
            kind, payload = "other", None
            am = re.search(r"\bAggregate \[([^\]]*)\](, \[)?", sub)
            if am:
                if am.group(2) is None:
                    kind = "agg_collapsing"  # global aggregate
                else:
                    keys = {c.split("#")[0].strip()
                            for c in am.group(1).split(",") if c.strip()}
                    kind = ("agg_keyed" if keys & _KEY_COLUMNS
                            else "agg_collapsing")
            elif "Filter" in sub:
                clean = _strip_not_spans(sub)
                eq_cols = re.findall(r"(\w+)#\d+L? = ", clean)
                eq_cols += re.findall(r" = (\w+)#\d+L?", clean)
                kind, payload = "filter", _cols_to_tables(eq_cols)
            m = re.search(r"Relation\s*\[([^\]]*)", sub)
            if m:
                cols = {c.split("#")[0] for c in m.group(1).split(",")}
                tables = {t for sig, t in _TABLE_SIGNATURES.items()
                          if sig in cols}
                info["tables"] |= tables
                rel = {"tables": tables,
                       "collapsed": any(k == "agg_collapsing"
                                        for _, k, _p in stack),
                       "eq_tables": set().union(*[p for _, k, p in stack
                                                  if k == "filter"] or [set()])}
                info["relations"].append(rel)
                continue
            stack.append((d, kind, payload))
        out.append(info)
    return out


def assert_broadcast_scale_safe(df: DataFrame) -> list[dict]:
    """Fail on any forced broadcast outside the documented envelope above —
    drop it after every query meant to run at scale (the relational suite's
    pytest walks them all through this).  Safety is judged PER RELATION:
    every SF-proportional base relation under the hint must be collapsed by
    an aggregate on its own path, or (part/supplier only) narrowed by an
    equality filter on its own columns on its own path."""
    hints = forced_broadcasts(df)
    problems = []
    for h in hints:
        for rel in h["relations"]:
            growing = rel["tables"] - _BOUNDED_TABLES
            if not growing or rel["collapsed"]:
                continue
            hard = growing & _NEVER_BROADCAST
            if hard:
                problems.append(
                    f"forced broadcast of SF-proportional {sorted(hard)} "
                    f"(no collapsing aggregate on its path)")
                continue
            if growing <= _FILTER_CREDIT and growing <= rel["eq_tables"]:
                continue  # narrow equality slice ON the growing table itself
            problems.append(
                f"forced broadcast of {sorted(growing)} without an equality "
                f"filter on the growing table on its path")
    if problems:
        raise AssertionError("broadcast hints not scale-safe: "
                             + "; ".join(problems))
    return hints
