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
    "Range",
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
    lines = plan.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        stripped = line.lstrip(" :+-=")
        node = stripped.split(" ", 1)[0].split("(", 1)[0]
        indent = len(line) - len(stripped)
        if node == "InMemoryRelation":
            # a cache boundary: the relation's tree text embeds the
            # whole CACHED child plan (aggregates, exchanges, AQE
            # annotations), but to this query it is a leaf — the probe
            # reads the cached RDD's partition count. (On a cache that
            # was never materialized the probe may build it — callers
            # here always materialize before probing.) Skip its subtree.
            i += 1
            while i < len(lines):
                nxt = lines[i].lstrip(" :+-=")
                if nxt and len(lines[i]) - len(nxt) <= indent:
                    break
                i += 1
            continue
        if node and node not in _NARROW_NODES:
            return None
        i += 1
    try:
        return df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        return None
