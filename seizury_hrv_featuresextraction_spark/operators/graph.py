"""E67: deterministic fixed-point PageRank over the duplicate-pair
graph — "boilerplate hub" centrality.

Reference parity: none (the reference has no graph pass); this extends
the dedup family's connected components (operators/dedup.py:355-419,
E6) with the other canonical iterative graph primitive.  Curation use:
in the near-dup graph, a template/boilerplate page is a HUB — it
collides with many otherwise-unrelated pages — and centrality separates
hubs from ordinary pairwise duplicates far better than raw degree when
dup cliques chain (a hub linked to other hubs concentrates mass).

Determinism device (the value-hash gate needs bit-equality, floats
accumulate in shuffle order): ranks are int64 FIXED-POINT (scale 1e12)
and every step is integer arithmetic — contribution = rank div deg
(exact integer division, never floor(double) whose quotient can
misround near integers), damping = (num * sum) div den after the exact
integer sum.  Iteration order is engine-free, so a 3-iteration unrolled
DuckDB CTE twin reproduces Spark's ranks EXACTLY (the Lloyd-unroll twin
family).

Plan shape at scale: per iteration ONE join of ranks to edges on the
source key + ONE destination-key sum — both shuffles carry the sparse
EDGE table (dup pairs), never the corpus; ranks are eagerly
localCheckpoint'ed per round (the E6 lineage device) so the plan stays
flat across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixed_point(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PR_SCALE,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, deg, rank_fp) after ``iters`` rounds over the undirected
    graph of ``pairs``.  rank_fp is the fixed-point rank (scale 1e12);
    sum over nodes stays ~scale (mass conserved up to integer-division
    truncation, which both engines apply identically)."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()  # one bounded job; nodes of the SPARSE dup graph
    if n == 0:
        return deg.select("u", "deg", F.lit(0).cast("long").alias("rank_fp"))
    init = scale // n
    base = ((damping_den - damping_num) * init) // damping_den
    r = deg.select("u", "deg", F.lit(init).cast("long").alias("rank_fp"))
    for _ in range(iters):
        contrib = (
            edges.join(r, "u")
            .select(F.col("v").alias("u"), F.expr("rank_fp div deg").alias("c"))
            .groupBy("u")
            .agg(F.sum("c").alias("contrib"))
        )
        r = deg.join(contrib, "u", "left").select(
            "u",
            "deg",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(contrib, 0)) div {damping_den}")
            ).cast("long").alias("rank_fp"),
        )
        if checkpoint:
            r = r.localCheckpoint(eager=True)
    return r
