"""E58 count-min heavy hitters: dict-replay of the sketch math
(estimate >= exact, everywhere), exactness of the final output under
forced hash collisions, edge docs, and plan shape (zero joins, two
bounded exchanges).  E64 HyperLogLog: register dict-replay, estimate
accuracy in the raw-estimator regime, merge property, and plan shape
(zero joins, two bounded exchanges)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from seizury_hrv_featuresextraction_spark.operators.sketches import (
    HLL_EST_NUM,
    HLL_M,
    HLL_RHO_CAP,
    cms_build,
    cms_estimate,
    cms_heavy_ngrams,
    hll_distinct_shingles,
    hll_estimate,
    hll_merge,
    hll_register_table,
    ngram_stream,
)

DOCS = [
    (0, "the cat sat on the mat the cat sat on the mat"),
    (1, "the cat sat on a hat and the cat ran"),
    (2, "a dog ran fast a dog ran fast a dog ran"),
    (3, ""),  # empty
    (4, None),  # NULL text
    (5, "two words"),  # shorter than n=3
    (6, "the cat sat quietly"),
]


def _ref_ngrams(text: str | None, n: int = 3) -> list[str]:
    ws = [w for w in (text or "").lower().split() if w]
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def _ref_bucket(gram: str, row: int, width: int) -> int:
    dg = hashlib.md5(f"cms:{gram}".encode()).hexdigest()
    return int(dg[7 * row : 7 * row + 7], 16) % width


def _ref_counts(docs, n=3) -> Counter:
    c: Counter = Counter()
    for _, text in docs:
        c.update(_ref_ngrams(text, n))
    return c


def _ref_sketch(counts: Counter, depth: int, width: int) -> list[int]:
    sk = [0] * (depth * width)
    for g, cnt in counts.items():
        for r in range(depth):
            sk[r * width + _ref_bucket(g, r, width)] += cnt
    return sk


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_sketch_matches_dict_replay(spark, docs_df):
    depth, width = 3, 64
    counts = _ref_counts(DOCS)
    assert cms_build(docs_df, "text", n=3, depth=depth, width=width) == _ref_sketch(
        counts, depth, width
    )


def test_estimate_never_underestimates(spark, docs_df):
    depth, width = 2, 8  # tiny width -> guaranteed collisions
    counts = _ref_counts(DOCS)
    sk = cms_build(docs_df, "text", n=3, depth=depth, width=width)
    est = {
        r["g"]: r["est"]
        for r in docs_df.select(
            F.explode(ngram_stream(F.col("text"), 3)).alias("g")
        )
        .select("g", cms_estimate(F.col("g"), sk, depth, width).alias("est"))
        .distinct()
        .collect()
    }
    assert set(est) == set(counts)
    for g, cnt in counts.items():
        assert est[g] >= cnt, g
    # the tiny sketch must actually overestimate somewhere, or the
    # collision-handling assertions below prove nothing
    assert any(est[g] > cnt for g, cnt in counts.items())


def test_output_exact_despite_collisions(spark, docs_df):
    # depth=1, width=2: nearly every gram collides; the estimate filter
    # admits light grams, the exact verify pass must still kill them
    counts = _ref_counts(DOCS)
    want = {(g, c) for g, c in counts.items() if c >= 3}
    got = {
        (r.ngram, r.cnt)
        for r in cms_heavy_ngrams(
            docs_df, "text", n=3, min_count=3, depth=1, width=2
        ).collect()
    }
    assert got == want
    # sanity: the filter really did admit non-heavy grams (collisions)
    sk = cms_build(docs_df, "text", n=3, depth=1, width=2)
    light_admitted = [
        g
        for g, c in counts.items()
        if c < 3 and sk[_ref_bucket(g, 0, 2)] >= 3
    ]
    assert light_admitted


def test_output_exact_normal_sizing(spark, docs_df):
    counts = _ref_counts(DOCS)
    for mc in (2, 3, 4):
        want = {(g, c) for g, c in counts.items() if c >= mc}
        got = {
            (r.ngram, r.cnt)
            for r in cms_heavy_ngrams(
                docs_df, "text", n=3, min_count=mc, depth=4, width=256
            ).collect()
        }
        assert got == want, mc


# ---------------------------------------------------------------------------
# E64 HyperLogLog
# ---------------------------------------------------------------------------


def _ref_hll_registers(rows) -> dict:
    """Dict replay of the register math: reg = first 2 hex of the
    seeded md5, rho = 61 - minimal-binary length of the 60-bit tail,
    capped."""
    ref: dict = {}
    for g, it in rows:
        d = hashlib.md5(f"hll:{it}".encode()).hexdigest()
        reg = int(d[:2], 16)
        tail = int(d[2:17], 16)
        rho = min(61 - len(bin(tail)[2:]), HLL_RHO_CAP)  # bin(0) -> '0', len 1
        ref[(g, reg)] = max(ref.get((g, reg), 0), rho)
    return ref


def test_hll_registers_match_dict_replay(spark):
    rows = [("A", f"x{i % 700}") for i in range(1500)] + [
        ("B", f"y{i}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, it string")
    got = {(r.g, r.reg): r.rho for r in hll_register_table(df, "it", "g").collect()}
    assert got == _ref_hll_registers(rows)


def test_hll_estimate_formula_and_accuracy(spark):
    # 5000 and 2000 distinct items: both in the raw-estimator regime
    # (>= 2.5 * m = 640); standard error is 1.04/sqrt(256) = 6.5%, so
    # 20% is a > 3-sigma bound
    rows = [("A", f"a{i % 5000}") for i in range(12000)] + [
        ("B", f"b{i % 2000}") for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, it string")
    regs = hll_register_table(df, "it", "g")
    out = {r.g: r for r in hll_estimate(regs).collect()}
    for g, true_n in (("A", 5000), ("B", 2000)):
        row = out[g]
        # the estimate is EXACTLY the documented closed form over the
        # integer Z (bit-equal is the cross-engine contract)
        assert row.est_distinct == HLL_EST_NUM / float(row.z_scaled)
        assert abs(row.est_distinct / true_n - 1) < 0.20, (g, row.est_distinct)
        # Z accounting: absent registers contribute exactly 2^cap each
        assert row.z_scaled >= (HLL_M - row.n_registers_hit) * (1 << HLL_RHO_CAP)


def test_hll_merge_equals_full(spark):
    rows = [("A", f"m{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, it string")
    full = {(r.g, r.reg): r.rho for r in hll_register_table(df, "it", "g").collect()}
    h1 = hll_register_table(df.filter(F.xxhash64("it") % 2 == 0), "it", "g")
    h2 = hll_register_table(df.filter(F.xxhash64("it") % 2 != 0), "it", "g")
    merged = {(r.g, r.reg): r.rho for r in hll_merge(h1, h2).collect()}
    assert merged == full


def test_hll_shingles_edge_docs(spark, docs_df):
    # NULL / empty / sub-n docs contribute nothing; groups with no
    # shingles are absent (both engines agree — the twin's WHERE clause)
    out = hll_distinct_shingles(
        docs_df.withColumn("source", F.concat(F.lit("s"), F.col("doc_id") % 2)),
        "text",
        "source",
    ).collect()
    assert {r.source for r in out} == {"s0", "s1"}
    truth = Counter()
    for doc_id, text in DOCS:
        for g in set(_ref_ngrams(text, 3)):
            truth[(f"s{doc_id % 2}", g)] = 1
    # tiny-cardinality draw: registers-hit can never exceed distinct items
    per_g = Counter(g for g, _ in truth)
    for r in out:
        assert r.n_registers_hit <= per_g[r.source]


def test_hll_plan_zero_joins_two_exchanges(spark, docs_df):
    out = hll_distinct_shingles(docs_df.withColumn("source", F.lit("s")), "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # register reduction + per-group estimate: two bounded exchanges,
    # both map-side combined (partial max / partial sum)
    assert plan.count("Exchange") == 2


# ---------------------------------------------------------------------------
# E68 HDR quantile sketch
# ---------------------------------------------------------------------------


def _ref_hdr_bucket(v: int) -> int:
    if v < 8:
        return v
    bl = v.bit_length()
    return (bl - 3) * 4 + (v >> (bl - 3)) + 4


def _ref_hdr_lower(k: int) -> int:
    if k < 8:
        return k
    return (4 + (k - 8) % 4) << ((k - 8) // 4)


def test_hdr_bucket_replay_and_bounds(spark):
    import math

    vals = list(range(0, 200)) + [255, 256, 1000, 4095, 4096, 10**6, 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        hdr_bucket,
        hdr_bucket_lower,
    )

    rows = df.select(
        "v", hdr_bucket(F.col("v")).alias("b"),
        hdr_bucket_lower(hdr_bucket(F.col("v"))).alias("lb"),
    ).collect()
    for r in rows:
        assert r.b == _ref_hdr_bucket(r.v), r.v
        assert r.lb == _ref_hdr_lower(r.b), r.v
        # the defining guarantee: lb <= v < 1.25*lb (+1 below 8)
        assert r.lb <= r.v
        if r.v >= 8:
            assert r.v < r.lb * 1.25, r.v
    # bucket ids monotone in v
    bs = [r.b for r in sorted(rows, key=lambda r: r.v)]
    assert bs == sorted(bs)


def test_hdr_quantiles_within_bound(spark):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        hdr_quantile_sketch,
    )

    # deterministic skewed draw: lengths 10..~15000, two groups
    rows = [("A", 10 + (i * i * 7) % 15000) for i in range(3000)] + [
        ("B", 50 + (i * 13) % 900) for i in range(800)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in hdr_quantile_sketch(df, "v", "g").collect()}
    import math

    for g in ("A", "B"):
        vals = sorted(v for gg, v in rows if gg == g)
        n = len(vals)
        assert out[g].n == n
        for (num, den), col in (
            ((1, 2), "q1_2_lb"),
            ((9, 10), "q9_10_lb"),
            ((99, 100), "q99_100_lb"),
        ):
            exact = vals[math.ceil(num * n / den) - 1]
            lb = out[g][col]
            assert lb <= exact < max(lb * 1.25, lb + 1), (g, col, lb, exact)


def test_hdr_histogram_merges_by_addition(spark):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        hdr_quantile_sketch,
    )

    rows = [("A", 10 + (i * 31) % 5000) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v long")
    whole = hdr_quantile_sketch(df, "v", "g").collect()
    # shard, sketch each, union raw rows: same result (the histogram is
    # a sum, so sketching the union == sketching shards and adding)
    h1 = df.filter(F.col("v") % 2 == 0)
    h2 = df.filter(F.col("v") % 2 != 0)
    merged = hdr_quantile_sketch(h1.unionByName(h2), "v", "g").collect()
    assert whole == merged


def test_hdr_plan_two_exchanges_no_join(spark):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        hdr_quantile_sketch,
    )

    df = spark.createDataFrame([("A", 10)], "g string, v long")
    plan = (
        hdr_quantile_sketch(df, "v", "g")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    # (g, bucket) partial-agg exchange + the per-group window/final agg
    assert plan.count("Exchange") == 2


# ---------------------------------------------------------------------------
# E65 source-overlap matrix (sketch-calibrated hash sample)
# ---------------------------------------------------------------------------


def _overlap_docs(spark, n_a=1000, n_b=1000, shared=500):
    # one unique 3-word shingle per doc: source A holds items
    # [0, n_a), source B holds [n_a - shared, n_a - shared + n_b)
    rows = [("A", f"x{i} y{i} z{i}") for i in range(n_a)] + [
        ("B", f"x{i} y{i} z{i}") for i in range(n_a - shared, n_a - shared + n_b)
    ]
    return spark.createDataFrame(rows, "source string, text string"), rows


def test_overlap_sampled_estimate_accuracy(spark):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        source_overlap_matrix,
    )

    df, rows = _overlap_docs(spark)
    true_j = 500 / 1500
    out = source_overlap_matrix(df, target_k=64, oversample=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("A", "B")
    # genuinely sampled (p < 1): far fewer sampled shingles than docs
    assert r.n_a < 700 and r.n_b < 700
    assert abs(r.jaccard_est - true_j) < 0.10
    assert r.jaccard_est == r.n_shared / r.n_union  # exact integer ratio
    # deterministic: hash sample, not RNG
    again = source_overlap_matrix(df, target_k=64, oversample=4).collect()[0]
    assert again == r


def test_overlap_full_sample_is_exact(spark):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        source_overlap_matrix,
    )

    df, rows = _overlap_docs(spark, n_a=300, n_b=200, shared=100)
    sets: dict = {}
    for g, text in rows:
        sets.setdefault(g, set()).add(text)
    true_j = len(sets["A"] & sets["B"]) / len(sets["A"] | sets["B"])
    # target_k large enough that p = 1: the sample is the full universe
    r = source_overlap_matrix(df, target_k=4096, oversample=4).collect()[0]
    assert (r.n_a, r.n_b, r.n_shared) == (300, 200, 100)
    assert r.jaccard_est == true_j


def test_overlap_plan_no_cartesian_no_corpus_join(spark):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        source_overlap_matrix,
    )

    df, _ = _overlap_docs(spark, n_a=50, n_b=50, shared=10)
    out = source_overlap_matrix(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only non-broadcast join is sampled-vs-sampled on h; the size
    # lookups broadcast
    assert plan.count("BroadcastHashJoin") == 2


def test_plan_zero_joins_two_exchanges(spark, docs_df):
    sk = cms_build(docs_df, "text", n=3, depth=4, width=256)
    occ = docs_df.select(F.explode(ngram_stream(F.col("text"), 3)).alias("ngram"))
    out = (
        occ.where(cms_estimate(F.col("ngram"), sk, 4, 256) >= F.lit(3))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(3))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # verify pass: one exchange (the survivor group-count); the sketch
    # build's exchange happened in cms_build and is bounded at
    # depth*width cells per map task
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# E74 source novelty vs reference
# ---------------------------------------------------------------------------


def test_novelty_full_sample_exact_and_bounds(spark):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        source_novelty_vs_reference,
    )

    # source A: half its shingle set appears in the reference; source B
    # entirely novel; source C entirely covered
    new_rows = (
        [("A", f"a{i} b{i} c{i}") for i in range(400)]
        + [("B", f"x{i} y{i} z{i}") for i in range(300)]
        + [("C", f"r{i} s{i} t{i}") for i in range(200)]
    )
    ref_rows = [(f"a{i} b{i} c{i}",) for i in range(200)] + [
        (f"r{i} s{i} t{i}",) for i in range(200)
    ]
    new = spark.createDataFrame(new_rows, "source string, text string")
    ref = spark.createDataFrame(ref_rows, "text string").withColumn(
        "source", F.lit("ref")
    )
    # target_k large enough for p=1: exact set arithmetic
    out = {
        r.source: r
        for r in source_novelty_vs_reference(new, ref, target_k=4096).collect()
    }
    assert (out["A"].n_samp, out["A"].n_novel, out["A"].n_seen) == (400, 200, 200)
    assert out["A"].novelty_est == 0.5
    assert out["B"].novelty_est == 1.0 and out["B"].n_seen == 0
    assert out["C"].novelty_est == 0.0 and out["C"].n_novel == 0

    # sampled regime: unbiasedness within tolerance
    est = {
        r.source: r.novelty_est
        for r in source_novelty_vs_reference(new, ref, target_k=64).collect()
    }
    assert abs(est["A"] - 0.5) < 0.15
    assert est["B"] == 1.0  # novel side can't produce false seen
    assert est["C"] == 0.0  # covered side can't produce false novel
