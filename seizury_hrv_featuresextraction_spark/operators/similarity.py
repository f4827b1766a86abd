"""Approximate-nearest-neighbor search over embedding columns.

- ``brute_force_topk``: exact cosine top-k of queries against a corpus —
  broadcast the (small) query set, native zip_with/aggregate dot
  products, rank with a window. The correctness baseline.
- ``ivf_topk``: IVF-style two-stage search — k-means-lite centroids
  (deterministic seeded init + a few Lloyd iterations, computed WITH
  DataFrame aggs, no driver loops over rows), assign corpus rows to their
  nearest centroid (one shuffle-free map), probe only the closest
  ``n_probe`` lists per query. The 100 TB path: scan cost drops by
  ~n_lists/n_probe, and the centroid table is tiny and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, norm, to_double
from .dedup import spread


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (small side)."""
    c = spread(corpus).select(F.col(id_col).alias("corpus_id"), to_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), to_double(F.col(vec_col)).alias("qv"))
    joined = c.join(F.broadcast(q), F.lit(True))
    if not include_self:
        joined = joined.filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "corpus_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cos")
    )


def _assign_nearest(df: DataFrame, cent: DataFrame, vec: str, out: str) -> DataFrame:
    """Add the id of the nearest (max-cosine) centroid — zero corpus-side
    shuffle.

    The centroid table is collapsed to ONE row holding an
    array<struct<cid, cvec>> and broadcast; the nearest id is then a
    native higher-order argmax (``array_max`` over struct<cos, -cid>,
    lexicographic struct ordering = max cosine, ties to the smallest cid).
    No row amplification, no window, no Exchange on the corpus — the
    round-1 variant cross-joined corpus x centroids and shuffled the
    n_lists-fold amplified set through a row_number window per Lloyd
    iteration."""
    cents = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("__cents")
    )
    scored = df.join(F.broadcast(cents), F.lit(True))
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                cosine(F.col(vec), c["cvec"]).alias("cs"),
                (-c["cid"]).alias("ncid"),
            ),
        )
    )
    return scored.withColumn(out, (-best["ncid"]).cast("int")).drop("__cents")


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_lists: int = 16,
    iters: int = 3,
    train_cap: int = 65536,
) -> DataFrame:
    """k-means-lite: deterministic seeding (hash-ordered sample) + Lloyd
    iterations done as groupBy-avg over the elementwise-exploded vectors.
    Returns (cid, cvec).

    Lloyd runs on a deterministic hash-ordered sample of at most
    ``train_cap`` rows (TakeOrdered, no full shuffle), so training cost is
    bounded regardless of corpus size — at 100 TB only the FINAL
    assignment touches every row, and that assignment is shuffle-free
    (broadcast argmax). Inputs smaller than the cap train on everything,
    so small-scale results are unchanged."""
    base = corpus.select(F.col(id_col).alias("id"), to_double(F.col(vec_col)).alias("v"))
    # md5-based deterministic order (not xxhash64): reproducible on ANY
    # engine, which lets the DuckDB twin replay the seeding + Lloyd loop
    # exactly ('0x'||substr(md5(id),1,15) in SQL == this expression)
    hashed = base.withColumn(
        "__h", F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10).cast("long")
    )
    cent = (
        hashed.orderBy("__h")
        .limit(n_lists)
        .select(F.row_number().over(Window.orderBy("__h")).alias("cid"), F.col("v").alias("cvec"))
    )
    train = hashed.orderBy("__h").limit(train_cap).drop("__h")
    for _ in range(iters):
        assigned = _assign_nearest(train, cent, "v", "cid")
        # mean vector per cluster: posexplode -> avg per (cid, pos) -> re-assemble
        cent = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["mx"]).alias("cvec"))
        )
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    kernel: str = "expr",
) -> DataFrame:
    """IVF search: restrict each query to its n_probe nearest inverted
    lists, then exact cosine within them.

    ``kernel`` picks the scoring engine:

    - ``"expr"`` (default, the ORACLE path): native zip_with/aggregate
      cosine — a strict left-to-right fold, bit-identical to the DuckDB
      twin's list_aggregate, so ranks value-twin exactly. Interpreted
      HOFs cost ~10-20 us per 64-dim pair: fine for gate-scale inputs.
    - ``"arrow"`` (the 100 TB path): ONE mapInPandas pass over the
      corpus fusing centroid assignment, probe filtering, scoring and
      per-partition top-k as numpy GEMMs (~0.1 us/pair, BLAS batch).
      Scores differ from the fold only in float summation order
      (~1e-15), which can flip the rank of two near-equal candidates —
      why this kernel is the bench/production path and not the oracle
      path (the integer E59/E80 ladders are where exact-and-fast
      coexist). Zero corpus exchange either way."""
    cent = centroids if centroids is not None else train_centroids(corpus, vec_col, id_col, n_lists)
    if kernel == "arrow":
        return _ivf_topk_arrow(corpus, queries, cent, vec_col, id_col, k, n_probe)
    c = corpus.select(F.col(id_col).alias("corpus_id"), to_double(F.col(vec_col)).alias("cv"))
    c = _assign_nearest(c, cent, "cv", "list_id")

    q = queries.select(F.col(id_col).alias("query_id"), to_double(F.col(vec_col)).alias("qv"))
    q_scored = q.join(F.broadcast(cent), F.lit(True)).withColumn(
        "__cs", cosine(F.col("qv"), F.col("cvec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__cs"), F.asc("cid"))
    q_lists = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "qv", F.col("cid").alias("list_id"))
    )

    joined = c.join(F.broadcast(q_lists), "list_id").filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select("query_id", "corpus_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    # map-local top-k BEFORE any exchange (r7 verdict item 6): the old
    # plan shuffled EVERY candidate row into a per-query row_number
    # window — the measured wall at sf1.0 (21-89 s vs 6 s brute) was
    # that window, and at 100 TB the exchange would carry
    # corpus*n_probe/n_lists rows. Scores stay exact (computed once by
    # the codegen'd cosine above; the Arrow kernel only SELECTS on
    # (cos desc, corpus_id asc), the same total order as the final
    # rank); the exchange then carries <= partitions x queries x k rows
    # and the window sorts a trivially small set.
    local = _topk_map_local(scored, k)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cos")
    )


def _ivf_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    cent: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    n_probe: int,
) -> DataFrame:
    """Arrow/GEMM IVF kernel: centroids and the per-list probing-query
    sets are bounded and ride the closure (the E59 bounded-collect
    family); each corpus partition is assigned (one GEMM against the
    normalized centroid matrix), grouped by list, scored against that
    list's probing queries (one GEMM per list) and locally top-k'd —
    the only exchange is the final <= partitions x queries x k rank."""
    import numpy as np

    cent_rows = sorted(cent.collect(), key=lambda r: r["cid"])
    C = np.array([r["cvec"] for r in cent_rows], dtype=np.float64)
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), to_double(F.col(vec_col)).alias("qv")
    ).collect()
    Q = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    # each query's n_probe nearest lists (cos desc, cid asc — same rule
    # as the expression path's window)
    qc = Qn @ Cn.T
    probes: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        order = sorted(range(len(cids)), key=lambda j: (-qc[qi, j], cids[j]))
        for j in order[:n_probe]:
            probes.setdefault(int(cids[j]), []).append(qi)

    out_schema = "query_id long, corpus_id long, cos double"

    def gen(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(pdf["__v"].tolist(), dtype=np.float64)
            ids = pdf["__id"].to_numpy()
            xn = np.linalg.norm(X, axis=1)
            Xn = X / np.maximum(xn[:, None], 1e-300)
            assign = cids[np.argmax(Xn @ Cn.T, axis=1)]
            frames = []
            for lid, qidx in probes.items():
                m = assign == lid
                if not m.any():
                    continue
                S = Xn[m] @ Qn[qidx].T  # (rows-in-list, probing-queries)
                rid = ids[m]
                for col, qi in enumerate(qidx):
                    s = S[:, col]
                    keep = rid != qids[qi]
                    cand_ids, cand_s = rid[keep], s[keep]
                    if len(cand_ids) > k:
                        # top-k under (cos desc, id asc)
                        sel = np.lexsort((cand_ids, -cand_s))[:k]
                        cand_ids, cand_s = cand_ids[sel], cand_s[sel]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(len(cand_ids), qids[qi]),
                                "corpus_id": cand_ids,
                                "cos": cand_s,
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    base = corpus.select(
        F.col(id_col).cast("long").alias("__id"), to_double(F.col(vec_col)).alias("__v")
    )
    local = base.mapInPandas(gen, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "cos")
    )


def _topk_map_local(scored: DataFrame, k: int) -> DataFrame:
    """Per-PARTITION top-k per query over (query_id, corpus_id, cos):
    an Arrow kernel that concatenates the partition's batches, keeps
    the k best rows per query under (cos desc, corpus_id asc) and
    emits <= n_queries*k rows — the map-side combine a top-k aggregate
    needs but collect_list-based aggs can't do (their partial state is
    the untruncated list). No shuffle: a narrow mapInPandas stage."""

    def kernel(it):
        import pandas as pd

        parts = [b for b in it]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(
            ["query_id", "cos", "corpus_id"], ascending=[True, False, True]
        )
        yield pdf.groupby("query_id", sort=False).head(k)

    return scored.mapInPandas(kernel, scored.schema)


def semantic_dedup(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    tau: float = 0.9,
    with_cluster: bool = False,
    salt: int = 8,
) -> DataFrame:
    """E49: SemDeDup (Abbas et al. 2023) — semantic near-dup REMOVAL over
    an embedding column: cluster the corpus (broadcast-argmax assignment,
    zero corpus shuffle), compare pairs only WITHIN a cluster, and drop
    every row with a same-cluster neighbor at cosine >= tau that has a
    smaller id (so exactly one representative — the smallest id — of
    each tau-ball survives). The cluster bound is the whole point at
    100 TB: the quadratic is corpus^2/n_clusters^2 per cluster instead
    of corpus^2, the same device the paper uses to make semantic dedup
    tractable on LAION/C4 scale.

    Determinism: assignment ties break to the lowest cid (lexicographic
    struct argmax), the drop rule is a pure predicate (no rank windows),
    and the pair predicate is a dot of once-normalized unit vectors —
    numerically within ~1e-15 of any sane cosine formulation, so an
    external engine replaying the same rules reproduces survivors
    exactly whenever pair cosines keep a margin from tau (the
    registered corpus: >= 0.099). CONTRACT:
    ``id_col`` must be unique — the drop rule is a strict well-ordering
    on ids, and two rows sharing an id are never compared with each
    other (nor collapsed), so duplicate-id corpora give
    engine-dependent results.

    Scale shape: the pair self-join shuffles on (cluster, salt) — the
    x side hashes ids into ``salt`` buckets, the y side replicates into
    every bucket, so each cluster's quadratic splits into ``salt``
    independent tasks. Without the salt the join key is the bare
    cluster id and parallelism is capped at n_clusters with the whole
    hot cluster in one task — a CPU-skew straggler AQE's skew-join
    never splits (its thresholds are shuffle BYTES; the pair blow-up is
    compute, not input size). Replication costs salt x the unit-vector
    shuffle on the y side only. Then a distinct on dropped ids and a
    short-key anti-join back to the corpus. Returns the surviving
    corpus rows unchanged (``with_cluster=True`` instead returns
    (id_col, cluster) survivors — the assignment audit view)."""
    c = spread(corpus).select(F.col(id_col).alias("id"), to_double(F.col(vec_col)).alias("v"))
    a = _assign_nearest(c, centroids, "v", "cluster")
    # pre-normalize ONCE per row so the quadratic pair stage is a single
    # dot fold instead of cosine's dot + two norm folds (~3x on the
    # dominant stage); the norm is materialized as a column FIRST — a
    # norm expression inside transform() re-evaluates the fold per
    # element (the measured hash_embed O(dim^2) trap). Zero-norm rows
    # keep cosine's 0.0 contract via an all-zero unit vector. The pair
    # shuffle carries only (id, cluster, unit vector) — v is dropped.
    au = (
        a.withColumn("__nrm", norm(F.col("v")))
        .withColumn(
            "u",
            F.when(
                F.col("__nrm") > 0, F.transform("v", lambda x: x / F.col("__nrm"))
            ).otherwise(F.transform("v", lambda x: x * F.lit(0.0))),
        )
        .select("id", "cluster", "u")
    )
    sx = au.withColumn("__s", F.pmod(F.xxhash64("id"), F.lit(salt)))
    sy = au.withColumn("__s", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    dropped = (
        sx.alias("x")
        .join(
            sy.alias("y"),
            (F.col("x.cluster") == F.col("y.cluster"))
            & (F.col("x.__s") == F.col("y.__s"))
            & (F.col("y.id") < F.col("x.id")),
        )
        .filter(dot(F.col("x.u"), F.col("y.u")) >= tau)
        .select(F.col("x.id").alias(id_col))
        .distinct()
    )
    if with_cluster:
        keep = a.select(F.col("id").alias(id_col), F.col("cluster").cast("long").alias("cluster"))
        return keep.join(dropped, id_col, "left_anti")
    return corpus.join(dropped, id_col, "left_anti")


def cluster_profile(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """E57: per-cluster per-dimension profile of an ANN index — the
    drift/balance diagnostics a maintained IVF index needs (list sizes,
    per-dimension mean and population variance vs the trained
    centroids): broadcast-argmax assignment (zero corpus-side shuffle,
    the E7 device), then posexplode + aggregate.

    Scale shape: the posexplode's dim-fold row amplification is
    MAP-LOCAL — partial aggregation reduces each task to at most
    |clusters| x dim rows before the exchange, so the shuffle is bounded
    by clusters x dim x tasks no matter the corpus size; the per-value
    CPU is irreducible (every component must be touched to profile it).

    Returns (cluster_id, dim, n, mean, var) — dim 0-based, doubles
    rounded to 6 for the cross-engine gate, var = E[x^2] - E[x]^2
    population form.
    """
    asg = _assign_nearest(
        spread(corpus).select(
            F.col(id_col).alias("id"), to_double(F.col(vec_col)).alias("v")
        ),
        centroids,
        "v",
        "cluster_id",
    )
    ex = asg.select("cluster_id", F.posexplode("v").alias("dim", "val"))
    return ex.groupBy("cluster_id", F.col("dim").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("val"), 6).alias("mean"),
        F.round(
            F.sum(F.col("val") * F.col("val")) / F.count(F.lit(1))
            - F.avg("val") * F.avg("val"),
            6,
        ).alias("var"),
    )


def quantization_scales(
    corpus: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> list[float]:
    """E59 pass 1: per-dimension symmetric int8 scales — max |x| over
    the corpus divided by 127 (1.0 where a dimension is all-zero).

    The posexplode amplification is map-local (partial agg bounds the
    exchange at dim x tasks, the E57 device); the collect is dim rows —
    the documented bounded-collect family. Scales are plain IEEE
    doubles, so replaying the same formula in any engine reproduces
    them bit-exactly (inputs are float32 values, exact as doubles).
    """
    rows = (
        corpus.select(F.posexplode(to_double(F.col(vec_col))).alias("d", "x"))
        .groupBy("d")
        .agg(F.max(F.abs(F.col("x"))).alias("mx"))
        .collect()
    )
    # validate the declared dim against what the data actually holds: a
    # longer vector would otherwise IndexError opaquely, a shorter one
    # would silently hand the missing dimensions scale 1.0 (r7 advice)
    if rows:
        observed = max(r["d"] for r in rows) + 1
        if observed != dim:
            raise ValueError(
                f"quantization_scales: dim={dim} declared but corpus "
                f"vectors have {observed} dimensions"
            )
    mx = [0.0] * dim
    for r in rows:
        mx[r["d"]] = r["mx"]
    return [m / 127.0 if m > 0.0 else 1.0 for m in mx]


def quantize_vec(vec: Column, scales: list[float]) -> Column:
    """Symmetric int8 code for ``vec``: floor(x / s_d + 0.5) clamped to
    [-127, 127] (floor-plus-half instead of round() because its
    half-up-toward-+inf tie rule is identical IEEE arithmetic in every
    engine, the repo's integer-threshold device). Returns array<long> —
    values fit int8; the at-rest form packs to a 64-byte binary, 4x
    smaller than float32 and 16x smaller than the doubles the exact
    path scores with."""
    sl = F.lit(scales)
    return F.transform(
        F.sequence(F.lit(1), F.lit(len(scales))),
        lambda i: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(F.element_at(vec, i.cast("int")) / F.element_at(sl, i.cast("int")) + F.lit(0.5)),
            ),
        ),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    dim: int = 64,
    scales: list[float] | None = None,
    include_self: bool = False,
) -> DataFrame:
    """E59: cosine top-k over int8-quantized embeddings — the 4x-memory
    ANN path (Jegou et al.'s SQ baseline; what FAISS calls SQ8).

    Same plan shape as ``brute_force_topk`` (broadcast queries, scored
    scan, one rank-window exchange on the k-bounded stream) but every
    dot product is EXACT int64 arithmetic over int8 codes: qcos =
    dot(qa, qb) / (sqrt(|qa|^2) * sqrt(|qb|^2)) — integers into
    correctly-rounded IEEE sqrt/divide, so the score (and therefore the
    ranking) is bit-reproducible in any engine, which is what makes a
    full-value DuckDB twin possible for an ANN operator. Recall vs the
    float path is a measured property (tests + BENCH), not a promise.
    """
    if scales is None:
        scales = quantization_scales(corpus, vec_col, dim)
    c = spread(corpus).select(
        F.col(id_col).alias("corpus_id"),
        quantize_vec(to_double(F.col(vec_col)), scales).alias("cq"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize_vec(to_double(F.col(vec_col)), scales).alias("qq"),
    )
    joined = c.join(F.broadcast(q), F.lit(True))
    if not include_self:
        joined = joined.filter(F.col("corpus_id") != F.col("query_id"))
    idot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inorm = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    scored = joined.select(
        "query_id",
        "corpus_id",
        (idot / (F.sqrt(inorm(F.col("qq"))) * F.sqrt(inorm(F.col("cq"))))).alias("qcos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "qcos")
    )


def cluster_profile_raw(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """E62 building block: the MERGEABLE form of the E57 index profile —
    per (cluster_id, dim) raw sufficient statistics (n, s = sum x,
    s2 = sum x^2) instead of finalized mean/var. Same plan as E57
    (broadcast-argmax assignment, map-local posexplode, exchange
    bounded at clusters x dim x tasks); keeping raw sums is what makes
    the profile a MAINTAINED table: merging increments is a sum, not a
    rescan."""
    asg = _assign_nearest(
        spread(corpus).select(
            F.col(id_col).alias("id"), to_double(F.col(vec_col)).alias("v")
        ),
        centroids,
        "v",
        "cluster_id",
    )
    ex = asg.select("cluster_id", F.posexplode("v").alias("dim", "val"))
    return ex.groupBy("cluster_id", F.col("dim").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("s"),
        F.sum(F.col("val") * F.col("val")).alias("s2"),
    )


def merge_cluster_profiles(*profiles: DataFrame) -> DataFrame:
    """E62: fold any number of raw profiles (the maintained table +
    new-batch profiles) into one — union + a (cluster, dim)-key sum,
    exchange bounded at clusters x dim regardless of how much corpus
    the inputs summarize. The 100 TB shape: each ingest batch profiles
    ONLY its own rows; the accumulated corpus is never rescanned (the
    E47/E50c maintained-table pattern, applied to the ANN index)."""
    it = iter(profiles)
    u = next(it)
    for p in it:
        u = u.unionByName(p)
    return u.groupBy("cluster_id", "dim").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("s2").alias("s2")
    )


def finalize_cluster_profile(raw: DataFrame) -> DataFrame:
    """Finalize a raw profile to the E57 report shape: (cluster_id,
    dim, n, mean, var) with round-6 doubles, var in population form."""
    return raw.select(
        "cluster_id",
        "dim",
        "n",
        F.round(F.col("s") / F.col("n"), 6).alias("mean"),
        F.round(
            F.col("s2") / F.col("n") - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
            6,
        ).alias("var"),
    )


# ---------------------------------------------------------------------------
# E71: deterministic top principal component over int8-quantized
# embeddings — the drift/variance-axis diagnostic for a maintained
# embedding index (complements E57/E62's per-cluster moments with the
# cross-dimension structure they cannot see).  Float PCA is shuffle-
# order-dependent (covariance sums) and library-dependent (eigensolver
# sign/convergence); instead everything is integer:
#   * int8 codes from the E59 scales (bit-reproducible),
#   * centered Gram via the sufficient-statistics identity
#     G[i,j] = n*S_ij - S_i*S_j — exact int64 at tested scales (the
#     at-rest form for >~1e10 rows is decimal(38), same identity),
#   * fixed-point power iteration with sign-split magnitude division
#     (sign(w) * (|w| div d)) so truncation is identical in Python,
#     Spark and DuckDB (// floors, Spark div truncates — only agree
#     on non-negatives),
#   * sign canonicalized: loading at the smallest nonzero index > 0.
# The corpus-sized work (code + Gram stats) is distributed with
# map-side combine (exchange bounded at dim^2 rows per task); the
# dim x dim iteration is driver-side pure-int (bounded-collect family,
# like the CMS fold).  The twin recomputes stats AND the unrolled
# iteration entirely in SQL — an independent integer-for-integer replay.
# ---------------------------------------------------------------------------

PCA_V_SCALE = 1 << 20
PCA_G_SHIFT = 30


def _pca_div(w: int, d: int) -> int:
    """sign-split magnitude division — floor/trunc-agnostic."""
    return -((-w) // d) if w < 0 else w // d


def quantized_gram(
    corpus: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", dim: int = 64
) -> tuple:
    """Distributed sufficient statistics: (n, S[dim], G[dim][dim]) with
    G the centered integer Gram n*S_ij - S_i*S_j.

    Codes use ONE GLOBAL scale (corpus maxabs / 127), not E59's per-dim
    scales: per-dim scaling variance-normalizes every dimension, which
    erases exactly the variance structure PCA exists to find (measured:
    a planted dominant axis drops from cos 0.9999 to cos 0.008 under
    per-dim scales on modular-noise data)."""
    stats = corpus.select(
        F.max(F.array_max(F.transform(to_double(F.col(vec_col)), F.abs))).alias("m"),
        F.min(F.size(vec_col)).alias("lo"),
        F.max(F.size(vec_col)).alias("hi"),
    ).collect()[0]
    m = stats["m"]
    # dim validation rides the same bounded collect: a longer vector
    # would be silently truncated by quantize_vec, a shorter one would
    # quantize its missing dimensions to NULL codes (r7 advice)
    if stats["hi"] is not None and (stats["lo"] != dim or stats["hi"] != dim):
        raise ValueError(
            f"quantized_gram: dim={dim} declared but corpus vector sizes "
            f"span [{stats['lo']}, {stats['hi']}]"
        )
    gscale = m / 127.0 if m and m > 0.0 else 1.0
    scales = [gscale] * dim
    codes = corpus.select(quantize_vec(to_double(F.col(vec_col)), scales).alias("c"))
    # materialize codes ONCE: the double posexplode below otherwise
    # re-inlines the 64-element quantize transform into every (i, j)
    # pair row (the r7 lambda re-inline finding — measured 40x here),
    # and the si/sij jobs share the materialization; at rest codes are
    # 16x smaller than the float input
    codes = codes.localCheckpoint(eager=True)
    ex = codes.select(F.posexplode("c").alias("i", "ci"), F.col("c"))
    sij = (
        ex.select("i", "ci", F.posexplode("c").alias("j", "cj"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("ci") * F.col("cj")).alias("s"))
        .collect()
    )
    si_rows = ex.groupBy("i").agg(
        F.sum("ci").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()
    n = si_rows[0]["n"] if si_rows else 0
    s = [0] * dim
    for r in si_rows:
        s[r["i"]] = r["s"]  # posexplode is 0-based
    g = [[0] * dim for _ in range(dim)]
    for r in sij:
        g[r["i"]][r["j"]] = n * r["s"] - s[r["i"]] * s[r["j"]]
    return n, s, g


def pca_top_component(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    iters: int = 3,
) -> DataFrame:
    """(d 1-based, loading_fp) — the dominant variance axis of the
    quantized corpus as fixed-point integers (scale 2^20), bit-equal
    in any engine."""
    spark = corpus.sparkSession
    n, s, g = quantized_gram(corpus, vec_col, id_col, dim)
    if n == 0:
        return spark.createDataFrame([], "d long, loading_fp long")
    gmax = max((abs(x) for row in g for x in row), default=0)
    gd = max(1, gmax >> PCA_G_SHIFT)
    gn = [[_pca_div(x, gd) for x in row] for row in g]
    v = [PCA_V_SCALE] * dim
    for _ in range(iters):
        w = [sum(gn[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        wmax = max(abs(x) for x in w)
        wd = max(1, wmax >> 20)
        v = [_pca_div(x, wd) for x in w]
    flip = next((x for x in v if x != 0), 1)
    if flip < 0:
        v = [-x for x in v]
    return spark.createDataFrame(
        [(i + 1, v[i]) for i in range(dim)], "d long, loading_fp long"
    )


def sign_bits(vec: Column, dim: int = 64) -> list[Column]:
    """E80 codes: 1-bit sign quantization of ``vec`` packed into TWO
    long columns of 32 bits each (lo = dims 1..32, hi = dims 33..64 —
    1-based element_at). Two half-words instead of one 64-bit word so
    the packing is pure non-overflowing integer arithmetic in ANY
    engine (a signed-long bit 63 wraps in Spark's non-ANSI mode but
    ERRORS in engines with checked arithmetic — the repo's
    cross-engine-exactness device)."""
    half = dim // 2

    def pack(off: int) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(half)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(F.element_at(vec, (i + off).cast("int")) > 0, 1).otherwise(0),
        )

    return [pack(0).alias("code_lo"), pack(half).alias("code_hi")]


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    dim: int = 64,
) -> DataFrame:
    """E80: binary-quantized Hamming top-k — the 1-bit companion to the
    E59 int8 path (the modern vector-store ladder: float -> int8 ->
    sign bits). Sign agreement preserves cosine NEIGHBORHOOD order for
    mean-centered embeddings (P[sign flip] grows with angle — the
    SimHash/hyperplane-LSH fact, E4's own device applied as a code
    instead of a bucket), at 32x smaller than float32: at rest a
    64-dim vector is two longs, and distance is two XOR+popcount
    instructions.

    Exactness: codes are integer, distance is integer, ties break on
    corpus_id — the whole ranking is bit-reproducible in any engine
    (no float enters after quantization). Scale shape: corpus codes
    are scan-stage expressions; queries broadcast as one collected
    array (bounded, the E59 device); per-partition Arrow top-k before
    the only exchange (the _topk_map_local device), final rank window
    over <= partitions x queries x k rows."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        *sign_bits(to_double(F.col(vec_col)), dim),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *sign_bits(to_double(F.col(vec_col)), dim),
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("query_id", "code_lo", "code_hi"))
        ).alias("__qs")
    )
    scored = (
        c.join(F.broadcast(q), F.lit(True))
        .select(
            "corpus_id",
            F.explode("__qs").alias("__q"),
            F.col("code_lo"),
            F.col("code_hi"),
        )
        .filter(F.col("__q.query_id") != F.col("corpus_id"))
        .select(
            F.col("__q.query_id").alias("query_id"),
            F.col("corpus_id"),
            (
                F.bit_count(F.col("code_lo").bitwiseXOR(F.col("__q.code_lo")))
                + F.bit_count(F.col("code_hi").bitwiseXOR(F.col("__q.code_hi")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    # map-local top-k: same kernel as IVF, ascending distance
    def kernel(it):
        import pandas as pd

        parts = [b for b in it]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(
            ["query_id", "hamming", "corpus_id"], ascending=[True, True, True]
        )
        yield pdf.groupby("query_id", sort=False).head(k)

    local = scored.mapInPandas(kernel, scored.schema)
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("corpus_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "corpus_id", "hamming")
    )


def jl_signs(dim: int, out_dim: int, seed: str = "jl") -> list[list[int]]:
    """E84: the ±1 Johnson-Lindenstrauss projection matrix (Achlioptas
    2003's database-friendly form) as a PURE FUNCTION of (seed, row,
    col): sign = parity of the first 8 md5 hex chars of "seed:j:d" —
    the repo's hex-substring device, so any engine regenerates the
    identical matrix without shipping it."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1
            for d in range(dim)
        ]
        for j in range(out_dim)
    ]


def jl_sign_projection(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_dim: int,
    dim: int = 64,
    scales: list[float] | None = None,
    seed: str = "jl",
) -> DataFrame:
    """E84: random-projection sketch of the embedding corpus — dim→
    out_dim with a deterministic ±1 matrix over the E59 int8 codes, so
    every projected coordinate is an EXACT int64 (|p_j| <= 127*dim) and
    the whole sketch is bit-reproducible cross-engine. The missing rung
    of the vector ladder between float (exact), int8 (E59) and sign
    bits (E80): JL preserves pairwise L2 in expectation
    (E||Px||^2 = out_dim * ||x||^2), giving a distance-faithful
    pre-filter at out_dim/dim the scan cost that Hamming's 1-bit codes
    cannot provide.

    Scale shape: quantize + out_dim fold expressions + posexplode are
    ALL in-row — zero exchanges, zero joins, zero Python; the projection
    of a 10^12-vector corpus is one scan-stage pass. The matrix rides
    the plan as out_dim literal arrays (data-independent), never a
    broadcast table.

    Returns long-format (vec_id, j, p) so the sketch value-twins
    row-for-row.
    """
    if scales is None:
        scales = quantization_scales(df, vec_col, dim)
    signs = jl_signs(dim, out_dim, seed)
    q = quantize_vec(to_double(F.col(vec_col)), scales)
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(F.col("__q"), F.lit(signs[j]), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for j in range(out_dim)
        ]
    )
    return (
        df.select(F.col(id_col).alias("vec_id"), q.alias("__q"))
        .select("vec_id", F.posexplode(proj).alias("j", "p"))
        .select("vec_id", F.col("j").cast("long").alias("j"), "p")
    )
