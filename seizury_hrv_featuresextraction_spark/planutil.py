"""Plan-introspection helpers.

``spread()`` and ``plan_stats()`` want the input split count as a pure
plan-time metadata lookup. ``df.rdd.getNumPartitions()`` IS that lookup
for a narrow plan (scan + project/filter), but under AQE touching
``.rdd`` on a plan that contains exchanges finalizes the adaptive plan
and can eagerly execute upstream shuffle stages (ADVICE r4). The guard
here inspects the optimized LOGICAL plan (analysis only — never runs a
job) and refuses the probe unless every node is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# logical nodes that cannot introduce an exchange: file/in-memory scans
# plus per-row ops. Anything else (Join/Aggregate/Repartition/Sort/
# Window/Generate/FlatMap*/Limit/...) disqualifies the probe.
_NARROW_NODES = {
    "Relation",
    "LogicalRDD",
    "LocalRelation",
    "InMemoryRelation",
    "Project",
    "Filter",
    "SubqueryAlias",
    "View",
}


def scan_num_partitions(df: DataFrame) -> int | None:
    """Input split count of a narrow plan, or None when unknown.

    None means "the plan has wide operators (or introspection failed) —
    probing .rdd could trigger execution, so don't": callers fall back
    to their conservative default (spread() repartitions, plan_stats()
    reports 0 splits which selects the skew-safe chunked plan).
    """
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # pragma: no cover - introspection unavailable
        return None
    for line in plan.splitlines():
        node = line.lstrip(" :+-").split(" ", 1)[0].split("(", 1)[0]
        if node and node not in _NARROW_NODES:
            return None
    try:
        return df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        return None
