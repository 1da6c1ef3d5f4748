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
