"""Sketch-based corpus statistics: count-min heavy-hitter n-grams.

Reference parity: the reference's histogram/statistics passes
(hrv_pipeline.py:193-254 label histogram, triangular-index bin counts)
count EXACTLY, which is fine at single-recording scale.  At 100 TB an
exact global n-gram count must shuffle every distinct n-gram — billions
of keys, the classic web-corpus wall.  The classic answer (Cormode &
Muthukrishnan 2005) is a count-min sketch: a depth x width counter grid
whose per-key estimate NEVER underestimates, so "estimate >= threshold"
admits every true heavy hitter and only hash-collision false positives,
which an exact pass over the (tiny) surviving occurrence stream then
kills.  Output is therefore EXACTLY the true heavy-hitter set with
exact counts — the sketch only bounds what shuffles.

Plan shape (pinned by tests/test_sketches.py):
  pass 1 (sketch build): scan -> scan-stage n-gram explode -> depth
    bucket ids per occurrence -> groupBy (row, bucket).  Partial
    aggregation bounds the exchange at depth*width cells per map task
    REGARDLESS of corpus size (the E57 bounded-amplification device).
  driver: collect depth*width cells (the documented bounded-collect
    family — class weights, IVF centroids) and fold them into ONE
    plan-literal long array (depth*width elements; 128 KiB at 4x4096).
    At production widths (2^20+ buckets) switch to a broadcast join on
    bucket id instead of a literal — the estimate expression is the
    only thing that changes.
  pass 2 (verify): re-scan -> same scan-stage buckets -> estimate =
    least(element_at(sketch, r*width+b_r)) -> filter est >= min_count
    (keeps ONLY heavy-hitter occurrences + collision noise) -> exact
    groupBy(ngram).count -> filter exact >= min_count.  The final
    exchange carries heavy occurrences only; no distinct-ngram shuffle
    exists anywhere in the plan, and there are ZERO joins.

Estimates are per-ngram constants (same gram -> same buckets), so an
n-gram's occurrences survive the filter all-or-none — survivors' exact
counts are true GLOBAL counts, which is what makes the independent
exact-count DuckDB twin (no sketch replication) a valid gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import _safe_range, words


def ngram_stream(text: Column, n: int) -> Column:
    """All n-word grams of ``text`` in order, duplicates KEPT (frequency
    semantics — contrast word_shingles' distinct set semantics).

    PERF: pass a pre-materialized word-array COLUMN through
    ``ngram_stream_words`` in hot paths — referencing the words()
    expression inside the transform lambda re-inlines the regex split
    into the per-ELEMENT body (measured 10x on the sf1.0 explode:
    46.3 s -> 4.7 s)."""
    return ngram_stream_words(words(text), n)


def ngram_stream_words(ws: Column, n: int) -> Column:
    """``ngram_stream`` over an already-computed word array.

    Per-gram element_at lookups instead of slice(ws, i, n) — slice
    allocates an n-element array per lambda call just to concat it
    (same r9 device as functions.text.word_shingles_of; values
    identical)."""
    return F.transform(
        _safe_range(F.size(ws) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
    )


def _digest(gram: Column) -> Column:
    """One md5 per occurrence; every sketch row slices ITS OWN 28 bits
    out of this single digest (disjoint 7-hex substrings — the
    split-digest device), so depth-4 hashing costs ONE hash, not four.
    The r6-flagged slow path computed a seeded md5 PER ROW: 8 md5s per
    occurrence across build+estimate, ~4x this form's wall at sf1.0."""
    return F.md5(F.concat(F.lit("cms:"), gram))


def _bucket(digest: Column, row: int, width: int) -> Column:
    """Row ``row``'s bucket: 28-bit slice row*7+1..+7 of the shared
    digest, mod width (md5 is 32 hex chars: depth <= 4)."""
    h = F.conv(F.substring(digest, 1 + 7 * row, 7), 16, 10).cast("long")
    return h % F.lit(width)


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    depth: int = 4,
    width: int = 4096,
) -> list[int]:
    """Pass 1: build the sketch and return it as one flattened
    row-major list of depth*width counts (driver-side, bounded)."""
    if not 1 <= depth <= 4:
        raise ValueError("depth must be 1..4 (one md5 digest = four 28-bit slices)")
    occ = (
        df.select(words(F.col(text_col)).alias("ws"))
        .select(F.explode(ngram_stream_words(F.col("ws"), n)).alias("g"))
        .select(_digest(F.col("g")).alias("dg"))
    )
    cells = (
        occ.select(
            F.posexplode(
                F.array(*[_bucket(F.col("dg"), r, width) for r in range(depth)])
            ).alias("r", "b")
        )
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    sketch = [0] * (depth * width)
    for row in cells:
        sketch[row["r"] * width + row["b"]] = row["c"]
    return sketch


def cms_estimate(gram: Column, sketch: list[int], depth: int, width: int) -> Column:
    """Point estimate for ``gram``: min over depth rows of the sketch
    cell its bucket hashes to.  Never below the true count."""
    from ..planutil import literal_array

    # ONE parsed SQL literal, not F.lit(16k-element list): the py4j
    # per-element conversion cost ~6 s of driver wall per query build
    # (r9 measurement) — it dominated this operator's whole wall
    lit = literal_array(sketch, "BIGINT")
    dg = _digest(gram)
    cells = [
        F.element_at(lit, (F.lit(r * width) + _bucket(dg, r, width) + 1).cast("int"))
        for r in range(depth)
    ]
    return cells[0] if depth == 1 else F.least(*cells)


# ---------------------------------------------------------------------------
# E64: HyperLogLog distinct sketch (Flajolet et al. 2007).  The exact
# "distinct shingles per source" data-card stat shuffles every distinct
# shingle — billions of keys at 100 TB, same wall the CMS above dodges
# for counts.  HLL reduces the shuffle to groups x 256 register rows
# REGARDLESS of corpus size, and the register update is a plain MAX, so
# Spark's native map-side partial aggregation does the whole reduction
# tree for free (contrast KMV-style sketches, which need a custom
# bottom-k combiner).
#
# Cross-engine determinism (the repo's value-hash gate needs bit-equal
# floats, not allclose):
#   * register  = first 2 hex chars of md5('hll:' || item)  (p=8, m=256)
#   * rho       = leading-zero count + 1 of the next 15 hex chars (60
#     bits), computed as 61 - length(minimal binary string); Spark
#     conv(hex,16,2) and DuckDB bin(int) both emit minimal-length
#     binary, and the zero tail ("0", length 1 -> 60) is swallowed by
#     the cap below.
#   * rho is CAPPED at 40, so every indicator term 2^(40-rho) is an
#     int64 and the per-group Z sum stays < 2^49 — exactly computed in
#     ANY order by both engines (dyadic-sum device; the cap costs
#     P(rho>40) = 2^-39 per item, far below the 6.5% sketch error).
#   * estimate  = HLL_EST_NUM / Z: one IEEE division of a shared
#     decimal literal by an exactly-represented integer — bit-identical
#     across engines.  No alpha bias correction branches, no ln().
# Raw-HLL contract: below ~2.5*m (= 640) distinct items the classical
# recipe switches to linear counting (needs ln, engine-libm-dependent);
# this operator reports the raw estimator plus n_registers_hit so a
# caller CAN apply it, and the accuracy pytest covers the >= 2.5*m
# regime the operator is for.
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P
HLL_RHO_CAP = 40
# alpha_256 * m^2 * 2^RHO_CAP with alpha_m = 0.7213/(1 + 1.079/m); the
# SAME shortest-roundtrip decimal literal is emitted into the Spark plan
# and the DuckDB twin (both parse correctly-rounded)
HLL_EST_NUM = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * (1 << HLL_RHO_CAP)


def hll_register_table(df: DataFrame, item_col: str, group_col: str) -> DataFrame:
    """(g, reg, rho): per-group HLL registers over one row per item
    OCCURRENCE (max is idempotent — pre-distincting buys nothing).
    Shuffle is bounded at groups * 256 rows per map task."""
    dg = df.select(
        F.col(group_col).alias("g"),
        F.md5(F.concat(F.lit("hll:"), F.col(item_col))).alias("dg"),
    )
    binstr = F.conv(F.substring("dg", 3, 15), 16, 2)
    return (
        dg.select(
            "g",
            F.conv(F.substring("dg", 1, 2), 16, 10).cast("int").alias("reg"),
            F.least(F.lit(61) - F.length(binstr), F.lit(HLL_RHO_CAP))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union HLL sketches: registers merge by max — the property that
    makes per-shard / per-day sketches composable without re-scanning."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("g", "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, group_name: str = "g") -> DataFrame:
    """(group, n_registers_hit, z_scaled, est_distinct) from a register
    table.  z_scaled = sum over ALL 256 registers of 2^(RHO_CAP - M_j)
    (absent registers contribute 2^RHO_CAP), an exact int64."""
    term = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        (F.lit(HLL_RHO_CAP) - F.col("rho")).cast("int"),
    )
    return (
        registers.groupBy(F.col("g").alias(group_name))
        .agg(
            F.count(F.lit(1)).alias("n_registers_hit"),
            F.sum(term).alias("z_hit"),
        )
        .select(
            group_name,
            "n_registers_hit",
            (
                F.col("z_hit")
                + (F.lit(HLL_M) - F.col("n_registers_hit"))
                * F.lit(1 << HLL_RHO_CAP)
            ).alias("z_scaled"),
        )
        .withColumn(
            "est_distinct", F.lit(HLL_EST_NUM) / F.col("z_scaled").cast("double")
        )
    )


def hll_distinct_shingles(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_words: int = 3,
) -> DataFrame:
    """Approximate distinct n-word shingles per group — the data-card
    vocabulary-diversity stat, with a shuffle bounded at groups * 256
    rows however large the corpus.  Standard error 1.04/sqrt(256) =
    6.5%."""
    from ..functions.text import word_shingles_of

    occ = df.select(
        F.col(group_col).alias("g"), words(F.col(text_col)).alias("__ws")
    ).select("g", F.explode(word_shingles_of(F.col("__ws"), shingle_words)).alias("it"))
    return hll_estimate(hll_register_table(occ, "it", "g"), group_name=group_col)


# ---------------------------------------------------------------------------
# E65: cross-source overlap matrix via a sketch-calibrated uniform
# hash-sample (the theta-sketch fixed-threshold view of KMV/MinHash).
# "Which sources duplicate each other" exactly needs the full distinct
# (source, shingle) shuffle AND a shingle-level self-join — both corpus-
# sized.  Instead: hashing the shingle universe uniformly means the set
# {h < t} is an unbiased sample of EVERY source's distinct-shingle set
# with the SAME inclusion rule, so Jaccard/containment computed on the
# sampled sets estimates the true values.  The threshold is calibrated
# from the E64 HLL estimate (target_k * oversample samples for the
# LARGEST source), so the filter is a scan-stage predicate and the only
# exchanges in the plan carry sampled rows — the corpus itself never
# shuffles and never joins.  All pair statistics are exact integer
# counts over the samples; the one float column is a single division of
# two exact integers (bit-identical cross-engine).
# ---------------------------------------------------------------------------

KMV_SEED = "kmv:"


def overlap_sample_threshold(n_max_est: float, target_k: int = 64, oversample: int = 4) -> int:
    """Integer hash threshold t: keep h < t where h is uniform on
    [0, 2^60).  p = min(1, target_k*oversample / n_max_est) — the twin
    mirrors this exact double expression, so t is cross-engine
    deterministic."""
    p = min(1.0, float(target_k * oversample) / n_max_est)
    return int(p * float(1 << 60))  # p*2^60 exact at p=1; floor via int()


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_words: int = 3,
    target_k: int = 64,
    oversample: int = 4,
) -> DataFrame:
    """(source_a < source_b, n_a, n_b, n_shared, n_union, jaccard_est)
    for every source pair sharing at least one sampled shingle.

    Two passes, neither shuffling the corpus: pass 1 is the E64 HLL
    (exchange bounded at sources x 256), whose max estimate calibrates
    the sample rate; pass 2 filters shingle hashes at scan stage and
    distincts/joins ONLY the sampled rows (expected target_k*oversample
    per source at the largest source, proportionally fewer below)."""
    from ..functions.text import word_shingles_of

    ests = hll_distinct_shingles(df, text_col, group_col, shingle_words).collect()
    n_max = max(r["est_distinct"] for r in ests)  # bounded: one row per source
    t = overlap_sample_threshold(n_max, target_k, oversample)

    occ = df.select(
        F.col(group_col).alias("g"), words(F.col(text_col)).alias("__ws")
    ).select("g", F.explode(word_shingles_of(F.col("__ws"), shingle_words)).alias("it"))
    h = F.conv(F.substring(F.md5(F.concat(F.lit(KMV_SEED), F.col("it"))), 1, 15), 16, 10).cast(
        "long"
    )
    samp = occ.select("g", h.alias("h")).where(F.col("h") < F.lit(t)).distinct()
    # the sampled set feeds three consumers (sizes + both join sides);
    # Catalyst shares no subplans, so without this the CORPUS is
    # re-scanned per consumer — checkpointing the tiny sample caps the
    # whole operator at two corpus reads (HLL pass + sample pass)
    samp = samp.localCheckpoint(eager=True)
    sizes = samp.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        samp.alias("a")
        .join(samp.alias("b"), on="h")
        .where(F.col("a.g") < F.col("b.g"))
        .groupBy(F.col("a.g").alias("source_a"), F.col("b.g").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(
            F.broadcast(sizes.select(F.col("g").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("g").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_shared"))
        .withColumn(
            "jaccard_est",
            F.col("n_shared").cast("double") / F.col("n_union").cast("double"),
        )
    )
    return out.select(
        "source_a", "source_b", "n_a", "n_b", "n_shared", "n_union", "jaccard_est"
    )


# ---------------------------------------------------------------------------
# E68: HDR-histogram quantile sketch.  Exact per-group quantiles of a
# positive integer metric (doc length, token count) need a per-group
# sort — at 100 TB a range exchange over the corpus.  An HDR-style
# log-bucketed histogram (Tene's HdrHistogram; same family as DDSketch,
# Charron-Bost 2019) reduces the shuffle to groups x O(4*log2(max))
# bucket rows with a GUARANTEED relative error: each bucket spans
# [sub << s, (sub+1) << s) with sub in [4, 8), so any quantile's true
# value lies within +25% of the reported bucket lower bound.  The whole
# sketch is integer shift/compare arithmetic — histograms merge by
# bucket-count addition, rank thresholds are exact ceil-division
# integers, and the twin replays everything bit-for-bit.
# ---------------------------------------------------------------------------


def hdr_bucket(v: Column) -> Column:
    """Bucket id of a non-negative int64: identity below 8, else
    (bitlen-3)*4 + (v >> (bitlen-3)) + 4 — two mantissa bits per
    octave.  bitlen via minimal-binary length (the E64 device)."""
    lng = v.cast("long")
    bl = F.length(F.conv(lng.cast("string"), 10, 2))
    sub4 = F.call_function("shiftright", lng, (bl - 3).cast("int"))
    return F.when(lng < 8, lng).otherwise((bl - F.lit(3)) * 4 + sub4 + 4).cast("int")


def hdr_bucket_lower(bucket: Column) -> Column:
    """Exact lower bound of a bucket id (its reported quantile value):
    identity below 8, else (4 + (k-8) % 4) << ((k-8) div 4)."""
    shift = F.floor((bucket - 8) / 4).cast("int")
    sub4 = (bucket - 8) % 4 + 4
    return F.when(bucket < 8, bucket.cast("long")).otherwise(
        F.call_function("shiftleft", sub4.cast("long"), shift)
    )


def hdr_quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantiles: tuple = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """(group, n, q<num>_<den>_lb ...) — per-group quantile lower
    bounds at ranks ceil(q*n), each within +25% of the true order
    statistic.  One (group, bucket) exchange (map-side combined) + one
    tiny window over <= 4*log2(max) buckets per group."""
    from pyspark.sql import Window

    hist = (
        df.select(F.col(group_col).alias("g"), hdr_bucket(F.col(value_col)).alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("g").orderBy("b")
    cum = hist.select(
        "g",
        "b",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
        hdr_bucket_lower(F.col("b")).alias("lb"),
    )
    aggs = [F.max("n").alias("n")]
    for num, den in quantiles:
        thr = F.expr(f"({num} * n + {den} - 1) div {den}")
        aggs.append(
            F.min(F.when(F.col("cum") >= thr, F.col("lb"))).alias(f"q{num}_{den}_lb")
        )
    return cum.groupBy(F.col("g").alias(group_col)).agg(*aggs)


def source_novelty_vs_reference(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_words: int = 3,
    target_k: int = 64,
    oversample: int = 4,
) -> DataFrame:
    """E74: per-source NOVELTY of a new crawl against a reference
    corpus — (source, n_samp, n_seen, n_novel, novelty_est) where
    novelty is the fraction of the source's distinct shingles NOT
    present in the reference.  The per-doc dedup family (E47/E50c)
    answers "which documents are copies"; this answers the
    mixture-planning question "how much NEW text is this source
    actually contributing", which exact computation prices at a full
    distinct-shingle shuffle of BOTH corpora.

    Same inclusion rule as E65: one hash threshold t (calibrated from
    the new side's E64 HLL max estimate) samples BOTH corpora's
    shingle universes uniformly, so |samp \\ ref_samp| / |samp| is an
    unbiased novelty estimate — both sides filter at scan stage, only
    sampled rows reach the anti-join, and every output stat is an
    exact integer (the one float a single division)."""
    from ..functions.text import word_shingles_of

    ests = hll_distinct_shingles(new_df, text_col, group_col, shingle_words).collect()
    n_max = max(r["est_distinct"] for r in ests)
    t = overlap_sample_threshold(n_max, target_k, oversample)

    def _samp(df: DataFrame, keep_group: bool) -> DataFrame:
        cols = [F.col(group_col).alias("g")] if keep_group else []
        occ = df.select(*cols, words(F.col(text_col)).alias("__ws")).select(
            *(["g"] if keep_group else []),
            F.explode(word_shingles_of(F.col("__ws"), shingle_words)).alias("it"),
        )
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(KMV_SEED), F.col("it"))), 1, 15), 16, 10
        ).cast("long")
        keep = occ.select(*(["g"] if keep_group else []), h.alias("h")).where(
            F.col("h") < F.lit(t)
        )
        return keep.distinct()

    samp = _samp(new_df, True).localCheckpoint(eager=True)
    ref = _samp(ref_df, False)
    novel = samp.join(ref, "h", "left_anti")
    sizes = samp.groupBy("g").agg(F.count(F.lit(1)).alias("n_samp"))
    novel_n = novel.groupBy("g").agg(F.count(F.lit(1)).alias("n_novel"))
    return (
        sizes.join(novel_n, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_samp",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        )
        .withColumn("n_seen", F.col("n_samp") - F.col("n_novel"))
        .withColumn(
            "novelty_est",
            F.col("n_novel").cast("double") / F.col("n_samp").cast("double"),
        )
        .select(group_col, "n_samp", "n_seen", "n_novel", "novelty_est")
    )


def cms_heavy_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 50,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Exact global heavy-hitter n-grams (count >= min_count) via a
    count-min candidate filter + exact verification of survivors.

    Returns (ngram string, cnt bigint) — exactly the rows an exact
    global count would return, with none of its shuffle."""
    sketch = cms_build(df, text_col=text_col, n=n, depth=depth, width=width)
    occ = df.select(words(F.col(text_col)).alias("ws")).select(
        F.explode(ngram_stream_words(F.col("ws"), n)).alias("ngram")
    )
    surv = occ.where(
        cms_estimate(F.col("ngram"), sketch, depth, width) >= F.lit(min_count)
    )
    return (
        surv.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(min_count))
    )
