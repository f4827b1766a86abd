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
    # materialize the sparse symmetric edge set + degrees ONCE (r9):
    # without this every iteration's contrib join re-executes the
    # caller's full pair-derivation plan (e.g. the minhash-LSH banding
    # upstream of pagerank_dup_graph) — the same lineage discipline the
    # per-round ranks already follow when checkpoint=True.
    edges = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    if checkpoint:
        edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    if checkpoint:
        deg = deg.localCheckpoint(eager=True)
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


def triangle_counts(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(node, deg, n_tri) — per-node triangle participation counts over
    the undirected graph of ``pairs`` (self-loops and duplicate edges
    dropped; nodes in no triangle report n_tri = 0).

    Curation use: on the near-dup graph, triangle density separates a
    genuine duplicate CLIQUE (template family — every pair collides, so
    triangles abound) from a chain of borderline pairwise collisions
    (A~B~C with A!~C — zero triangles).  clustering-coefficient-style
    signals need exactly these counts.

    Scale device — degree-ordered edge orientation (the classic
    hub-safe wedge join): each edge is directed from its (deg, node)-
    SMALLER endpoint to the larger, so every out-degree is bounded by
    O(sqrt(m)) and the wedge self-join materializes sum(d_out^2) =
    O(m^1.5) candidate wedges instead of the sum(deg^2) of a naive
    neighbor join, which a single boilerplate hub turns quadratic.
    Each triangle is found EXACTLY once (as the wedge at its rank-
    lowest vertex, closed by the oriented edge between the other two),
    so no post-hoc dedup shuffle is needed.  All integer/count
    arithmetic — bit-exact in any engine, twin-able CTE for CTE.

    Shuffles: edge-key dedup + degree agg, one join of edges to
    degrees, the wedge self-join on the center key, the closing-edge
    semi join on (lo, hi), one explode+count — every one carries the
    SPARSE oriented edge list or its wedges, never the corpus.  The
    edge, degree and oriented tables are each referenced several times
    downstream, so they are eagerly localCheckpoint'ed (the E67/MMR
    materialization device) — without it every reference re-expands
    the whole candidate-generation plan back to the corpus scan.
    """
    e0 = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(F.col("u") != F.col("v"))
    # normalize to u < v so each undirected edge appears once
    norm = e0.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)
    sym = norm.unionByName(norm.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=True)
    # orient each edge from (deg, id)-smaller endpoint to larger
    da = deg.select(F.col("u").alias("_au"), F.col("deg").alias("deg_u"))
    db = deg.select(F.col("u").alias("_bu"), F.col("deg").alias("deg_v"))
    ed = norm.join(da, norm["u"] == da["_au"]).join(db, norm["v"] == db["_bu"])
    lo_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_b"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"), F.col("deg_b").alias("deg_x"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"), F.col("deg_b").alias("deg_y"))
    wedges = o1.join(o2, "a").where(F.col("x") < F.col("y"))
    x_first = (F.col("deg_x") < F.col("deg_y")) | (
        (F.col("deg_x") == F.col("deg_y")) & (F.col("x") < F.col("y"))
    )
    w = wedges.select(
        "a",
        "x",
        "y",
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("lo"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("hi"),
    )
    closing = oriented.select(F.col("a").alias("lo"), F.col("b").alias("hi"))
    tris = w.join(closing, ["lo", "hi"], "leftsemi").select("a", "x", "y")
    per_node = (
        tris.select(F.explode(F.array("a", "x", "y")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.join(per_node, "u", "left")
        .select(
            F.col("u").alias("node"),
            F.col("deg").cast("long").alias("deg"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
        )
    )
