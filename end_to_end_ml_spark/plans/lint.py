"""Physical-plan linter: walk a DataFrame's executed plan and flag the
patterns that break at 100 TB — the same hazards the repo's own plan-audit
tests guard, exposed as a library so pipelines can gate on them in CI
(``assert not audit_plan(df)``) before a query ever reaches a cluster.

Hazards flagged:
- ``cartesian-product``: CartesianProduct — O(N·M) row pairing. (A
  *conditioned* BroadcastNestedLoopJoin is accepted: it's how Spark runs
  non-equi predicates against a small broadcast side.)
- ``python-row-udf``: BatchEvalPython (row-at-a-time Python) — the slow
  path; Arrow-batched nodes (ArrowEvalPython / MapInPandas / grouped
  pandas) are allowed.
- ``global-window``: an unpartitioned Window whose input is NOT an
  aggregation — funnels the full input through one task. A window over an
  aggregate's output is accepted (bounded input: distinct scores, deciles).
- ``global-sort-mid-plan``: a global Sort that is neither the query's
  final presentation ordering nor under a limit — a mid-plan total order
  rarely survives scale.

The linter inspects the PHYSICAL plan (post-Catalyst), so it sees what
would actually run — a filter Catalyst pushed into the scan no longer
shows as a stage. AQE is disabled for the snapshot so plan shapes are
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# nodes that merely wrap/relay rows: a Sort with only these above it is the
# final presentation ordering of the result
_TRANSPARENT_ABOVE_SORT = {
    "WholeStageCodegen",
    "InputAdapter",
    "Project",
    "ColumnarToRow",
    "AdaptiveSparkPlan",
    "ResultQueryStage",
    "CollectLimit",
}

_LIMIT_NODES = ("TakeOrderedAndProject", "GlobalLimit", "LocalLimit", "CollectLimit")


def _walk(node, ancestors):
    yield node, ancestors
    ch = node.children()
    nxt = ancestors + [node.nodeName().split(" (")[0]]
    for i in range(ch.size()):
        yield from _walk(ch.apply(i), nxt)


def _window_input_bounded(node) -> bool:
    """A global Window is acceptable when its input is provably bounded:
    an aggregation below it (distinct scores, deciles), or a
    WindowGroupLimit (Spark's rank-limit pushdown — each upstream
    partition forwards only rows that can still make the top-k)."""
    ch = node.children()
    for i in range(ch.size()):
        for d, _ in _walk(ch.apply(i), []):
            n = d.nodeName()
            if "Aggregate" in n or n.startswith("WindowGroupLimit"):
                return True
    return False


def audit_plan(df: DataFrame) -> list[str]:
    """Return human-readable hazard strings (empty = the plan is clean)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        root = df._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    hazards: list[str] = []
    for node, ancestors in _walk(root, []):
        name = node.nodeName().split(" (")[0]
        head = node.toString().splitlines()[0].strip()[:140]
        if name == "CartesianProduct":
            hazards.append(f"cartesian-product: {head}")
        elif name == "BatchEvalPython":
            hazards.append(f"python-row-udf: {head}")
        elif name == "Window" and node.partitionSpec().isEmpty():
            if not _window_input_bounded(node):
                hazards.append(
                    "global-window: unpartitioned Window over unbounded "
                    f"input — {head}"
                )
        elif name == "Sort" and ", true, " in head:
            under_limit = any(a in _LIMIT_NODES for a in ancestors)
            is_final = all(a in _TRANSPARENT_ABOVE_SORT for a in ancestors)
            # a global sort of an aggregate's output is bounded input —
            # e.g. the ordering Sort under a cumulative window over bins
            if not (under_limit or is_final or _window_input_bounded(node)):
                hazards.append(f"global-sort-mid-plan: {head}")
    return hazards
