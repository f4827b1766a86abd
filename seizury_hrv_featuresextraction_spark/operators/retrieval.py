"""Sparse lexical retrieval (BM25) over the documents corpus — the
inverted-index workhorse of a training-data pipeline (RAG corpus search,
query-driven curation, eval-set mining).

Spark-first plan shape (E53):

1. ``dl`` (document length) is a scan-stage expression — no shuffle.
2. The explode is PRE-FILTERED to the union of query terms while still
   an array (``F.filter`` before ``explode``), so the only rows that
   ever leave the scan stage are (doc, query-term) hits.  At 100 TB the
   exploded stream is bounded by |query vocab| x corpus hit-rate, never
   by corpus token count.
3. Term frequencies aggregate with a map-side combine on
   (doc_id, term); document frequency folds out of the SAME tf table
   (one extra bounded agg) — the corpus is scanned once for the index.
4. Global N / avgdl come from a 1-row aggregate broadcast via a
   nested-loop cross join (a scalar, not a shuffle).
5. Scoring joins the tf table to the BROADCAST literal query table and
   the BROADCAST per-term df table; the final per-(query, doc) sum and
   top-k window shuffle only scored hits.

Scoring is Lucene-flavoured BM25:

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d)  = sum_t idf(t) * tf * (k1 + 1)
                   / (tf + k1 * (1 - b + b * dl / avgdl))

All arithmetic is double-precision with a final round(6) so the DuckDB
twin value-hashes bit-identically; ranking ties break on doc_id.

Reference parity: the reference engine has no text retrieval — this is
part of the §2.12 LLM-pipeline extension surface (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import words
from .dedup import spread


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k documents per query.

    ``queries`` is a small driver-side list of (query_id, [terms]) — it
    becomes a broadcast literal table (the E40 plan-literal device), so
    the corpus side never waits on a second scan.
    Returns (query_id, rank, doc_id, score) with rank 1..k per query.
    """
    spark = docs.sparkSession
    qrows = [
        (int(qid), t.lower())
        for qid, terms in queries
        for t in dict.fromkeys(terms)  # de-dup, keep order
    ]
    qdf = spark.createDataFrame(qrows, "query_id long, term string")
    all_terms = sorted({t for _, t in qrows})

    # NULL text scores as an empty doc (it still counts toward N/avgdl,
    # matching the twin) — size(split(NULL)) would otherwise yield -1
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(words(txt)).cast("double").alias("dl"),
        F.filter(words(txt), lambda w: w.isin(all_terms)).alias("hits"),
    )

    tf = (
        base.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    # df folds out of the tf table — (doc_id, term) is already distinct,
    # so count(*) over a term window IS the document frequency. A window
    # (one bounded exchange over the hits stream) instead of a groupBy
    # branch: a branch would recompute tf from the raw corpus (Catalyst
    # does not share subplans without an explicit materialization), i.e.
    # a second 100 TB scan for a table of a few thousand rows.
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term")).cast("double")
    )
    # the only other corpus touch: one columnar scan for the two scalars
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    scored = (
        tf.crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdf), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def dense_hash_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 20,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense retrieval leg over the E45 signed-feature-hash embedding:
    corpus and the (tiny, broadcast) literal queries are embedded by the
    SAME deterministic hash, scored by exact cosine, ranked per query
    with the (score DESC, doc_id) tiebreak. Docs with no words are
    excluded (they embed to the zero vector — undefined cosine, and
    unretrievable by construction).

    Scale shape: the embedding lives in the scan stage; queries are a
    |queries|-row broadcast; the only exchange is the per-query rank
    window (queries are few — for a large query set use the IVF path
    instead). Returns (query_id, rank, doc_id, score)."""
    from ..functions.vectors import cosine, hash_embed, hash_embed_udf

    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(int(qid), qtext) for qid, qtext in queries], "query_id long, qtext string"
    ).select("query_id", hash_embed(F.col("qtext"), dim=dim).alias("qv"))
    # corpus side: the Arrow scatter kernel (bit-identical to the
    # expression form by pytest, O(n_words + dim) per row vs the expr
    # form's O(dim^2 x n_words) wrapper cost — see hash_embed docstring)
    emb = spread(docs).filter(F.size(words(F.coalesce(F.col(text_col), F.lit("")))) > 0).select(
        F.col(id_col).alias("doc_id"), hash_embed_udf(dim)(F.col(text_col)).alias("dv")
    )
    scored = emb.join(F.broadcast(qdf), F.lit(True)).select(
        "query_id", "doc_id", cosine(F.col("qv"), F.col("dv")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def rrf_fuse(legs: list[DataFrame], k: int = 10, rrf_k: int = 60) -> DataFrame:
    """E97: reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the
    standard hybrid-search combiner: each leg's ranked list contributes
    1/(rrf_k + rank) per (query, doc); docs absent from a leg simply
    contribute nothing (no score normalization needed, the whole point
    of RRF — BM25 scores and cosines are not commensurable). Ranks are
    integers, each contribution one IEEE division, the two-leg sum
    commutative-exact, so the fused score value-twins at round 6.

    Scale shape: legs are already top-leg_k per query (bounded), so
    fusion runs entirely on |queries| x leg_k x n_legs rows — one tiny
    union + keyed aggregate + rank window. Returns
    (query_id, rank, doc_id, rrf_score)."""
    from functools import reduce

    contribs = [
        leg.select(
            "query_id", "doc_id", (1.0 / (F.lit(rrf_k) + F.col("rank"))).alias("__c")
        )
        for leg in legs
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), contribs)
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("__c"), 6).alias("rrf_score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_score")
    )


def mmr_rerank(
    cands: DataFrame,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """E102: maximal-marginal-relevance re-ranking (Carbonell/Goldstein
    1998) — greedily pick the candidate maximizing
    lam*rel - (1-lam)*max_sim_to_already_selected, the diversification
    pass that stops a retrieval page (or a RAG context window) from
    filling with near-duplicates of one hit. Expects columns
    (query_id, doc_id, rel, dv): rel a round-6 relevance, dv the E45
    hash-embedding vector; candidate-candidate similarity is exact
    cosine. Scores re-round(6) each round and ties break on doc_id, so
    the greedy trajectory is engine-reproducible. NOTE: lam must be an
    exactly-representable binary fraction (0.5, 0.25, 0.75) — 1-lam is
    computed driver-side and must equal the twin's literal bit-for-bit.

    Scale shape: candidates are already bounded per query (top-leg_k
    from retrieval), so the k greedy rounds run on |queries| x leg_k
    rows — k bounded window+join rounds over tiny tables, nothing
    corpus-scale. Returns (query_id, rank, doc_id, mmr_score)."""
    from ..functions.vectors import cosine

    mu = float(1.0 - lam)
    # the candidate set is bounded (|queries| x leg_k rows), so eagerly
    # materialize it once and re-materialize each round: without this
    # the greedy loop's lineage re-derives the ENTIRE upstream
    # (retrieval + embedding, a corpus scan) once per round per branch —
    # the r8 plan audit measured 93 scans / 186 exchanges for k=5
    # before this checkpoint, 1 scan after (the E52 BPE-loop device)
    rem = cands.select(
        "query_id", "doc_id", "rel", "dv", F.lit(0.0).alias("maxsim")
    ).localCheckpoint(eager=True)
    picks = []
    for i in range(1, k + 1):
        w = Window.partitionBy("query_id").orderBy(F.desc("__score"), F.asc("doc_id"))
        scored = rem.withColumn(
            "__score",
            F.round(F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("maxsim"), 6),
        ).withColumn("__rn", F.row_number().over(w)).localCheckpoint(eager=True)
        pick = scored.filter(F.col("__rn") == 1).select(
            "query_id",
            F.lit(i).cast("long").alias("rank"),
            "doc_id",
            F.col("__score").alias("mmr_score"),
            F.col("dv").alias("__sel_dv"),
        )
        picks.append(pick.drop("__sel_dv"))
        if i < k:
            rem = (
                scored.filter(F.col("__rn") > 1)
                .join(
                    pick.select("query_id", "__sel_dv"),
                    "query_id",
                )
                .select(
                    "query_id",
                    "doc_id",
                    "rel",
                    "dv",
                    F.greatest(
                        F.col("maxsim"), cosine(F.col("dv"), F.col("__sel_dv"))
                    ).alias("maxsim"),
                )
            )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), picks)
