"""Round-8 operator semantics: E76 fuzzy pairs, E77 link graph,
E79 span-corruption plan, E80 Hamming top-k (twin parity is separately
gated by tools/check_queries.py; these pin planted-case behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fuzzy_dup_pairs_finds_typo_pair_and_respects_blocking(spark):
    """A 1-character typo pair must be found (edit distance 1 kills
    every crossing shingle, so the set-similarity family misses it);
    a pair whose FIRST word differs must be missed (the documented
    blocking contract); block_cap drops boilerplate blocks."""
    from seizury_hrv_featuresextraction_spark.operators.dedup import fuzzy_dup_pairs

    rows = [
        (1, "quarterly report for the acme corporation fiscal year twenty four"),
        (2, "quarterly reprot for the acme corporation fiscal year twenty four"),  # typo
        (3, "annual report for the acme corporation fiscal year twenty four"),  # first word differs
        (4, "completely different text with no relation to anything else here"),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_dup_pairs(df, "text", "doc_id", prefix_words=8, max_dist=5).collect()
    }
    assert got.get((1, 2)) == 2  # 'report' -> 'reprot': a transposition = 2 plain edits
    assert (1, 3) not in got and (2, 3) not in got  # blocked away (first word)
    assert all(a != 4 and b != 4 for a, b in got)

    # block_cap: a boilerplate block bigger than the cap emits nothing
    boiler = [(100 + i, f"login page for site number {i} please enter password") for i in range(12)]
    bdf = spark.createDataFrame(boiler, "doc_id long, text string")
    capped = fuzzy_dup_pairs(bdf, "text", "doc_id", prefix_words=8, max_dist=8, block_cap=8)
    uncapped = fuzzy_dup_pairs(bdf, "text", "doc_id", prefix_words=8, max_dist=8)
    assert uncapped.count() > 0
    assert capped.count() == 0


def test_domain_link_graph_extraction_semantics(spark):
    """Multiplicity kept in n_links, deduped in n_docs; self-loops and
    non-http(s) schemes dropped; port kept as part of the origin."""
    from seizury_hrv_featuresextraction_spark.operators.curation import (
        domain_link_graph,
        extract_links,
    )

    rows = [
        (1, "a.com", '<a href="http://b.com/x">1</a> <a href="http://b.com/y">2</a> <a href="ftp://c.com/z">no</a>'),
        (2, "a.com", '<a href="http://b.com/z">3</a> <a href="https://a.com/self">self</a>'),
        (3, "b.com", '<a href="https://a.com:8080/p">ported</a>'),
        (4, "c.com", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src_domain string, html string")
    links = extract_links(df, "html", "doc_id")
    assert links.count() == 5  # the ftp anchor never matches the https? pattern
    g = {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_docs"])
        for r in domain_link_graph(df, "html", "doc_id").collect()
    }
    assert g[("a.com", "b.com")] == (3, 2)  # 3 links from 2 docs
    assert g[("b.com", "a.com:8080")] == (1, 1)  # port distinguishes the origin
    assert ("a.com", "a.com") not in g  # self-loop dropped
    assert all(src != "c.com" for src, _ in g)  # NULL html -> nothing


def test_span_corruption_plan_invariants(spark):
    """Spans in-bounds, pairwise non-overlapping, count = the density
    formula, short docs emit nothing, and the plan is a pure function
    of (id, n_tokens) — partitioning-invariant."""
    from seizury_hrv_featuresextraction_spark.operators.curation import (
        span_corruption_plan,
    )

    rows = [(i, 2 + 7 * i) for i in range(60)]  # n_tokens 2..415
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = span_corruption_plan(df, "n_tokens", "doc_id", density=0.15, span_len=3)
    pdf = out.toPandas()
    n_of = dict(rows)
    for did, grp in pdf.groupby("doc_id"):
        n = n_of[did]
        k = max(1, int(n * 0.15 / 3))
        assert len(grp) == k, (did, n)
        spans = sorted(zip(grp["start"], grp["length"]))
        for (s, ln) in spans:
            assert 0 <= s and s + ln <= n, (did, s, ln, n)
        for (s1, l1), (s2, _) in zip(spans, spans[1:]):
            assert s1 + l1 <= s2, (did, spans)
    # docs too short for one span emit nothing
    assert set(pdf["doc_id"]) == {i for i, n in rows if n >= 3}

    # partitioning invariance
    again = span_corruption_plan(
        df.repartition(13), "n_tokens", "doc_id", density=0.15, span_len=3
    ).toPandas()
    a = pdf.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    b = again.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_hamming_topk_planted_neighbor_and_integer_ranking(spark):
    """A sign-identical vector has Hamming 0 and must rank first; a
    sign-flipped vector ranks last among candidates; ranking is fully
    integer so repartitioning cannot change it."""
    import numpy as np

    from seizury_hrv_featuresextraction_spark.operators.similarity import hamming_topk

    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    rows = [(0, [float(x) for x in base])]
    rows.append((1, [float(x * 2.0) for x in base]))          # same signs -> hamming 0
    rows.append((2, [float(-x) for x in base]))               # all signs flipped -> 64
    for i in range(3, 40):
        rows.append((i, [float(x) for x in rng.standard_normal(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hamming_topk(df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id", k=39)
    got = {r["rank"]: (r["corpus_id"], r["hamming"]) for r in out.collect()}
    assert got[1] == (1, 0)
    assert got[39][0] == 2 and got[39][1] == 64
    again = hamming_topk(
        df.repartition(11), df.filter(F.col("vec_id") == 0), "embedding", "vec_id", k=39
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def test_epoch_shard_plan_slices_equal_per_epoch_shuffles(spark):
    """E78: epoch e's slice of the one-scan multi-epoch plan must equal
    an independent shuffle_shards run with seed '0:e' — same shards,
    same positions — and epochs must be DIFFERENT permutations."""
    from seizury_hrv_featuresextraction_spark.operators.stats import (
        epoch_shard_plan,
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    plan = epoch_shard_plan(df, "doc_id", n_shards=4, n_epochs=3, seed=0).toPandas()
    orders = {}
    for e in range(3):
        mine = {
            r.doc_id: (r.shard, r.pos)
            for r in plan[plan["epoch"] == e].itertuples(index=False)
        }
        ref = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shuffle_shards(df, "doc_id", n_shards=4, seed=f"0:{e}").collect()
        }
        assert mine == ref, e
        orders[e] = tuple(sorted(mine.items()))
    assert orders[0] != orders[1] and orders[1] != orders[2]


def test_ivf_arrow_kernel_matches_expression_path(spark):
    """The Arrow/GEMM IVF kernel must produce the same top-k sets as
    the oracle expression path (identical assignment + probe + rank
    rules; scores differ only in float summation order, so rank tuples
    are compared with a >= 0.95 overlap bound and the planted exact
    neighbor must be rank 1 in both)."""
    import numpy as np

    from seizury_hrv_featuresextraction_spark.operators.similarity import (
        ivf_topk,
        train_centroids,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(400)]
    rows.append((1000, [float(x * 3.0) for x in rows[0][1]]))  # exact direction of q0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.filter(F.col("vec_id") < 4)
    cent = train_centroids(df, "embedding", "vec_id", n_lists=8).cache()
    cent.count()
    e = ivf_topk(df, qs, "embedding", "vec_id", k=5, n_lists=8, n_probe=3, centroids=cent)
    a = ivf_topk(
        df, qs, "embedding", "vec_id", k=5, n_lists=8, n_probe=3, centroids=cent, kernel="arrow"
    )
    se = {(r["query_id"], r["rank"], r["corpus_id"]) for r in e.collect()}
    sa = {(r["query_id"], r["rank"], r["corpus_id"]) for r in a.collect()}
    assert len(se & sa) >= 0.95 * len(se), (len(se & sa), len(se))
    first_a = {r["query_id"]: r["corpus_id"] for r in a.collect() if r["rank"] == 1}
    first_e = {r["query_id"]: r["corpus_id"] for r in e.collect() if r["rank"] == 1}
    assert first_a[0] == 1000 and first_e[0] == 1000


def test_resample_interpolate_hand_computed_grid(spark):
    """E81: grid placement, linear interpolation, exact-grid-hit,
    duplicate-time collapse, tail forward-fill and sub-step spans,
    all against hand arithmetic."""
    from seizury_hrv_featuresextraction_spark.operators.windows import resample_interpolate

    rows = [
        ("A", 5.0, 10.0), ("A", 25.0, 30.0), ("A", 34.0, 50.0),
        ("B", 10.0, 1.0), ("B", 20.0, 2.0),       # obs exactly on grid
        ("C", 10.0, 1.0), ("C", 10.0, 3.0), ("C", 21.0, 3.0),  # dup time -> max
        ("D", 5.0, 7.0),                            # span < step: no grid
    ]
    df = spark.createDataFrame(rows, "k string, e double, v double")
    out = {
        (r["k"], r["e"]): (r["v"], r["tail_fill"])
        for r in resample_interpolate(df, on="e", by="k", value_col="v", step=10.0).collect()
    }
    # A: grid 10, 20, 30
    assert out[("A", 10.0)][0] == 10.0 + 20.0 * 5.0 / 20.0          # 15
    assert out[("A", 20.0)][0] == 10.0 + 20.0 * 15.0 / 20.0         # 25
    assert abs(out[("A", 30.0)][0] - (30.0 + 20.0 * 5.0 / 9.0)) < 1e-12
    assert not out[("A", 30.0)][1]                                   # next obs at 34 exists
    # B: obs exactly on both grid points; right edge forward-fills
    assert out[("B", 10.0)] == (1.0, False)
    assert out[("B", 20.0)] == (2.0, True)
    # C: duplicate t=10 collapses to max(v)=3
    assert out[("C", 10.0)] == (3.0, False)
    assert out[("C", 20.0)][0] == 3.0                                # flat segment
    # D: no grid point inside [5, 5]
    assert not any(k == "D" for k, _ in out)
    assert len(out) == 7


def test_resample_interpolate_partitioning_invariance(spark):
    """Output is a pure function of the data, not of its layout."""
    from seizury_hrv_featuresextraction_spark.operators.windows import resample_interpolate

    rows = [(f"k{i % 7}", float(3 * i % 101) + i / 7.0, float(i * i % 53)) for i in range(300)]
    df = spark.createDataFrame(rows, "k string, e double, v double")
    a = resample_interpolate(df.repartition(1), "e", "k", "v", 10.0)
    b = resample_interpolate(df.repartition(17, "v"), "e", "k", "v", 10.0)
    pa = sorted(map(tuple, a.collect()))
    pb = sorted(map(tuple, b.collect()))
    assert pa == pb and len(pa) > 0


def test_pit_leakage_audit_counts(spark):
    """E82: a user whose labels keep arriving after observations shows
    future-label counts + horizon; a clean user scores zeros; a user
    with no labels at all scores zeros with a NULL horizon."""
    from seizury_hrv_featuresextraction_spark.operators.evaluation import pit_leakage_audit

    obs = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 10.0), (2, 20.0), (3, 15.0)],
        "user_id long, e double",
    )
    labels = spark.createDataFrame(
        [(1, 5.0, 1.0), (1, 15.0, 2.0), (1, 30.0, 9.0), (2, 1.0, 5.0)],
        "user_id long, e double, lab double",
    )
    got = {
        r["user_id"]: r
        for r in pit_leakage_audit(obs, labels, on="e", by="user_id", label_col="lab").collect()
    }
    r1 = got[1]
    assert r1["n_obs"] == 2
    assert r1["n_future_label"] == 2          # naive label (t=30) is future for both obs
    assert r1["n_value_mismatch"] == 2        # naive 9.0 vs as-of 1.0 / 2.0
    assert r1["max_leak_horizon"] == 20.0     # 30 - 10
    r2 = got[2]
    assert (r2["n_future_label"], r2["n_value_mismatch"]) == (0, 0)
    assert r2["max_leak_horizon"] is None
    r3 = got[3]
    assert (r3["n_obs"], r3["n_future_label"], r3["n_value_mismatch"]) == (1, 0, 0)
    assert r3["max_leak_horizon"] is None


def test_correlation_matrix_planted_relationships(spark):
    """E83: perfectly correlated, anti-correlated, independent and
    constant features against hand arithmetic; null rows drop."""
    from seizury_hrv_featuresextraction_spark.operators.stats import correlation_matrix

    rows = [
        (0.0, 3.0, 0.0, 7.0, 0.0),
        (1.0, 5.0, -1.0, 7.0, 1.0),
        (2.0, 7.0, -2.0, 7.0, 1.0),
        (3.0, 9.0, -3.0, 7.0, 0.0),
        (None, 1.0, 1.0, 1.0, 1.0),   # dropped: null x
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double, v double")
    out = {
        (r["feat_i"], r["feat_j"]): r
        for r in correlation_matrix(
            df, [("x", 1), ("y", 1), ("z", 1), ("c", 1), ("v", 1)]
        ).collect()
    }
    assert len(out) == 10
    assert all(r["n"] == 4 for r in out.values())
    assert out[("x", "y")]["corr"] == 1.0      # y = 2x + 3
    assert out[("x", "z")]["corr"] == -1.0     # z = -x
    assert out[("x", "c")]["corr"] is None     # constant: zero variance
    assert out[("x", "v")]["corr"] == 0.0      # cov = 4*3 - 6*2 = 0
    r = out[("x", "y")]
    assert (r["sum_i"], r["sum_j"], r["sum_ij"]) == (6, 24, 46)  # 0*3+1*5+2*7+3*9


def test_jl_projection_numpy_replay_and_distance_preservation(spark):
    """E84: projected coordinates replay BIT-EXACTLY in NumPy from the
    same md5 matrix + E59 quantization; identical vectors project
    identically; average pairwise L2 ratio ||P(x-y)||^2 /
    (out_dim * ||xq-yq||^2) sits in the JL expectation band."""
    import numpy as np

    from seizury_hrv_featuresextraction_spark.operators.similarity import (
        jl_sign_projection,
        jl_signs,
        quantization_scales,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype(np.float32)
    vecs[1] = vecs[0]  # planted identical pair
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out_dim = 16
    got = jl_sign_projection(df, "embedding", "vec_id", out_dim=out_dim, dim=64).collect()
    P = np.zeros((len(vecs), out_dim), dtype=np.int64)
    for r in got:
        P[r["vec_id"], r["j"]] = r["p"]

    # NumPy replay: same scales, same quantization rule, same signs
    scales = np.array(quantization_scales(df, "embedding", 64))
    q = np.clip(np.floor(vecs.astype(np.float64) / scales + 0.5), -127, 127).astype(np.int64)
    S = np.array(jl_signs(64, out_dim), dtype=np.int64)  # (out_dim, 64)
    assert np.array_equal(P, q @ S.T)

    assert np.array_equal(P[0], P[1])  # identical in -> identical out

    # JL expectation: E||P(x-y)||^2 = out_dim * ||x-y||^2 for +-1 rows
    ratios = []
    for a in range(0, 30, 3):
        for b in range(a + 2, 30, 5):
            dq = (q[a] - q[b]).astype(np.float64)
            if (dq**2).sum() == 0:
                continue
            dp = (P[a] - P[b]).astype(np.float64)
            ratios.append((dp**2).sum() / (out_dim * (dq**2).sum()))
    m = float(np.mean(ratios))
    assert 0.7 < m < 1.3, m


def test_drift_psi_planted_shift_and_replay(spark):
    """E85: PSI terms replay exactly in pure Python from the counts; a
    planted distribution shift yields PSI > 0.25 while self-vs-self
    stays ~2e-4 (Laplace floor); empty bins are defined (no NULL/inf)."""
    import math

    from seizury_hrv_featuresextraction_spark.operators.stats import drift_psi

    ref_vals = [float(i % 10) * 10.0 + 1.0 for i in range(400)]       # uniform 1..91
    cur_vals = [float(i % 3) * 10.0 + 61.0 for i in range(300)]       # shifted 61..81
    ref = spark.createDataFrame([(v,) for v in ref_vals], "value double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "value double")

    out = drift_psi(ref, cur, "value", bin_width=10.0, n_bins=12).collect()
    assert len(out) == 12                                             # every bin present
    assert all(r["psi_term"] is not None for r in out)                # empty bins defined

    # pure-Python replay of smoothing + ln term from the exact counts
    n_ref = sum(r["cnt_ref"] for r in out)
    n_cur = sum(r["cnt_cur"] for r in out)
    assert (n_ref, n_cur) == (400, 300)
    psi = 0.0
    for r in out:
        p_r = (r["cnt_ref"] + 1) / (n_ref + 12)
        p_c = (r["cnt_cur"] + 1) / (n_cur + 12)
        assert r["p_ref"] == round(p_r, 6)
        assert r["p_cur"] == round(p_c, 6)
        assert r["psi_term"] == round((p_c - p_r) * math.log(p_c / p_r), 6)
        psi += r["psi_term"]
    assert psi > 0.25                                                 # planted shift detected

    # self-vs-self: only the Laplace floor remains
    out2 = drift_psi(ref, ref, "value", bin_width=10.0, n_bins=12).collect()
    assert abs(sum(r["psi_term"] for r in out2)) < 1e-3


def test_drift_psi_clamps_out_of_range(spark):
    """Values below 0 and beyond the last edge land in the boundary
    bins rather than vanishing — total counts are conserved."""
    from seizury_hrv_featuresextraction_spark.operators.stats import drift_psi

    ref = spark.createDataFrame([(-5.0,), (3.0,), (999.0,)], "value double")
    cur = spark.createDataFrame([(1.0,)], "value double")
    out = {r["bin"]: r for r in drift_psi(ref, cur, "value", 10.0, 4).collect()}
    assert out[0]["cnt_ref"] == 2      # -5 clamped into bin 0, 3.0 natural
    assert out[3]["cnt_ref"] == 1      # 999 clamped into last bin
    assert sum(r["cnt_ref"] for r in out.values()) == 3


def test_target_encode_loo_excludes_own_row_and_replays(spark):
    """E86: hand-computed LOO encodings match; the planted outlier's own
    target does NOT enter its encoding; singleton group falls back
    toward the prior; m=0 rejected."""
    import pytest

    from seizury_hrv_featuresextraction_spark.operators.stats import target_encode_loo

    rows = [
        (0, "a", 10.0), (1, "a", 20.0), (2, "a", 90.0),   # outlier in group a
        (3, "b", 30.0), (4, "b", 50.0),
        (5, "c", 70.0),                                    # singleton
    ]
    df = spark.createDataFrame(rows, "id long, cat string, t double")
    out = {r["id"]: r["te_cat"] for r in target_encode_loo(df, "cat", "t", m=2).collect()}

    prior = 270.0 / 6.0  # 45
    def loo(sum_g, t_i, cnt_g):
        return round(((sum_g - t_i) + 2.0 * prior) / (cnt_g - 1 + 2), 6)

    assert out[2] == loo(120.0, 90.0, 3)       # own 90 excluded -> pulled DOWN
    assert out[0] == loo(120.0, 10.0, 3)
    assert out[0] > out[2]                     # outlier's encoding is the smallest in-group
    assert out[3] == loo(80.0, 30.0, 2)
    assert out[5] == loo(70.0, 70.0, 1) == round(prior, 6)  # singleton -> pure prior

    with pytest.raises(ValueError):
        target_encode_loo(df, "cat", "t", m=0)


def test_ks_statistic_exact_vs_scipy_formula(spark):
    """E87: KS replays exactly against a pure-Python sup-distance over
    pooled distinct values (ties included); identical samples give 0;
    disjoint supports give 1; one-sided keys are dropped."""
    from seizury_hrv_featuresextraction_spark.operators.stats import ks_statistic

    ref_rows = [("k1", v) for v in [1.0, 2.0, 2.0, 3.0, 5.0]] + [("k2", 1.0), ("k2", 2.0)]
    cur_rows = [("k1", v) for v in [2.0, 4.0, 4.0, 6.0]] + [("k3", 9.0)]
    ref = spark.createDataFrame(ref_rows, "k string, v double")
    cur = spark.createDataFrame(cur_rows, "k string, v double")

    out = {r["k"]: r for r in ks_statistic(ref, cur, "v", ["k"]).collect()}
    assert set(out) == {"k1"}  # k2/k3 one-sided -> dropped

    # pure-Python replay for k1
    rv = sorted([1.0, 2.0, 2.0, 3.0, 5.0])
    cv = sorted([2.0, 4.0, 4.0, 6.0])
    pooled = sorted(set(rv + cv))
    d_num = max(
        abs(sum(1 for x in rv if x <= t) * len(cv) - sum(1 for x in cv if x <= t) * len(rv))
        for t in pooled
    )
    r = out["k1"]
    assert (r["n_ref"], r["n_cur"], r["d_num"]) == (5, 4, d_num)
    assert r["ks"] == round(d_num / (5 * 4), 6)

    same = ks_statistic(ref, ref, "v", ["k"]).collect()
    assert all(r["ks"] == 0.0 for r in same)

    lo = spark.createDataFrame([("k", float(i)) for i in range(5)], "k string, v double")
    hi = spark.createDataFrame([("k", float(i + 100)) for i in range(5)], "k string, v double")
    assert ks_statistic(lo, hi, "v", ["k"]).collect()[0]["ks"] == 1.0


def test_decay_features_hand_computed_and_head_normalization(spark):
    """E88: EWMA values match a hand-rolled truncated-decay fold; the
    first row equals its own value (weights renormalized, no warm-up
    bias); keys are independent."""
    from seizury_hrv_featuresextraction_spark.operators.windows import decay_features

    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
            ("a", 4, 40.0), ("a", 5, 50.0), ("a", 6, 60.0),
            ("b", 1, 7.0)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    out = {(r["k"], r["t"]): r["ewma"]
           for r in decay_features(df, ["k"], ["t"], "x", alpha=0.5, n_lags=4).collect()}

    xs = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]
    for i in range(6):
        num, den = xs[i], 1.0
        for j in range(1, 5):
            if i - j >= 0:
                num += (0.5 ** j) * xs[i - j]
                den += 0.5 ** j
        assert out[("a", i + 1)] == round(num / den, 6), i

    assert out[("b", 1)] == 7.0     # head row: pure own value
    assert out[("a", 1)] == 10.0    # key b never leaks into key a


def test_calibration_bins_perfect_and_miscalibrated(spark):
    """E90: a perfectly calibrated feed yields gap ~= Laplace-free exact
    0 per bin; a systematically overconfident feed shows the gap; ECE
    terms replay in pure Python and sum to n-weighted mean gap."""
    from seizury_hrv_featuresextraction_spark.operators.evaluation import (
        calibration_bins,
    )

    # perfectly calibrated: in the 0.25-bin, exactly 25% positives
    rows = []
    for i in range(200):
        p = 0.25 if i < 100 else 0.75
        y = 1 if (i % 4 == 0 if i < 100 else i % 4 != 0) else 0
        rows.append((p, y))
    df = spark.createDataFrame(rows, "prob double, y long")
    out = {r["bin"]: r for r in calibration_bins(df, "prob", "y", 10).collect()}
    assert set(out) == {2, 7}
    assert out[2]["mean_conf"] == 0.25 and out[2]["accuracy"] == 0.25
    assert out[2]["gap"] == 0.0 and out[7]["gap"] == 0.0

    # overconfident: prob 0.9 but only 50% positives
    bad = spark.createDataFrame([(0.9, i % 2) for i in range(100)], "prob double, y long")
    r = calibration_bins(bad, "prob", "y", 10).collect()[0]
    assert r["bin"] == 9 and r["n"] == 100 and r["n_pos"] == 50
    assert r["mean_conf"] == 0.9 and r["accuracy"] == 0.5
    assert r["gap"] == 0.4 and r["ece_term"] == 0.4  # single bin: n/N = 1

    # prob exactly 1.0 clamps into the last bin
    edge = spark.createDataFrame([(1.0, 1)], "prob double, y long")
    assert calibration_bins(edge, "prob", "y", 10).collect()[0]["bin"] == 9


def test_auc_by_group_matches_sklearn_formula_with_ties(spark):
    """E91: AUC matches a pure-Python pairwise count (ties = 1/2 credit)
    on a tied sample; perfect ranking gives 1.0, inverted 0.0, constant
    scores 0.5; single-class groups are dropped."""
    from seizury_hrv_featuresextraction_spark.operators.evaluation import auc_by_group

    scores = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 5.0]
    labels = [0, 0, 1, 0, 1, 1, 0, 1]
    rows = [("g", s, y) for s, y in zip(scores, labels)]
    rows += [("perfect", float(i), 1 if i >= 5 else 0) for i in range(10)]
    rows += [("inverted", float(i), 1 if i < 5 else 0) for i in range(10)]
    rows += [("const", 7.0, i % 2) for i in range(10)]
    rows += [("onesided", 1.0, 1), ("onesided", 2.0, 1)]
    df = spark.createDataFrame(rows, "k string, s double, y long")
    out = {r["k"]: r for r in auc_by_group(df, "s", "y", ["k"]).collect()}

    # pure-Python pairwise AUC for the tied group
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    num = sum(1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg)
    assert out["g"]["auc"] == round(num / (len(pos) * len(neg)), 6)
    assert (out["g"]["n_pos"], out["g"]["n_neg"]) == (4, 4)

    assert out["perfect"]["auc"] == 1.0
    assert out["inverted"]["auc"] == 0.0
    assert out["const"]["auc"] == 0.5
    assert "onesided" not in out


def test_vocab_growth_hand_corpus(spark):
    """E92: first-bucket attribution is exact on a hand corpus; the
    cumulative vocab equals brute-force distinct counts over nested
    prefixes; token totals conserve."""
    import hashlib

    from seizury_hrv_featuresextraction_spark.operators.curation import vocab_growth

    texts = {
        0: "alpha beta gamma",
        1: "alpha beta delta",
        2: "alpha epsilon",
        3: "zeta",
        4: None,
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = vocab_growth(df, "text", "doc_id", n_buckets=4, seed="t:").collect()

    def bkt(i):
        return int(hashlib.md5(f"t:{i}".encode()).hexdigest()[:8], 16) % 4

    # brute-force replay
    from collections import defaultdict
    first = {}
    tok = defaultdict(int)
    for i, t in texts.items():
        for w in (t or "").split():
            b = bkt(i)
            tok[b] += 1
            first[w] = min(first.get(w, 99), b)
    exp_new = defaultdict(int)
    for w, b in first.items():
        exp_new[b] += 1

    got = {r["bucket"]: r for r in out}
    assert {b: r["new_words"] for b, r in got.items()} == dict(exp_new)
    cum = 0
    for b in sorted(got):
        cum += exp_new[b]
        assert got[b]["cum_vocab"] == cum
        assert got[b]["n_tokens"] == tok[b]
    assert cum == len(first)  # total vocab = distinct words overall


def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_negative_samples_replay_and_contract(spark):
    """E93: full pure-Python replay of pool draw + per-anchor hash
    ranking must match the Spark plan row-for-row; negatives never the
    anchor itself nor the anchor's own group; draw invariant to input
    partitioning (resume-stability contract)."""
    from seizury_hrv_featuresextraction_spark.operators.stats import negative_samples

    rows = [(i, f"s{i % 5}") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        (r["anchor_id"], r["rank"]): (r["neg_id"], r["neg_source"])
        for r in negative_samples(df, k=3, pool_size=8, n_buckets=4, seed="t:").collect()
    }

    # pure-Python replay
    pool: dict[int, list[tuple[int, str]]] = {b: [] for b in range(4)}
    cand = sorted(rows, key=lambda r: (_md5_60(f"t:o:{r[0]}"), r[0]))
    for cid, cg in cand:
        b = _md5_60(f"t:b:{cid}") % 4
        if len(pool[b]) < 8:
            pool[b].append((cid, cg))
    want = {}
    for aid, ag in rows:
        p = _md5_60(f"t:p:{aid}") % 4
        cs = [(c, g) for c, g in pool[p] if c != aid and g != ag]
        cs.sort(key=lambda cg_: (_md5_60(f"t:r:{aid}:{cg_[0]}"), cg_[0]))
        for rk, (c, g) in enumerate(cs[:3], 1):
            want[(aid, rk)] = (c, g)
    assert got == want
    assert all(nid != aid for (aid, _), (nid, _) in got.items())
    src = dict(rows)
    assert all(g != src[aid] for (aid, _), (_, g) in got.items())

    # partitioning invariance
    got2 = {
        (r["anchor_id"], r["rank"]): (r["neg_id"], r["neg_source"])
        for r in negative_samples(
            df.repartition(7, "source"), k=3, pool_size=8, n_buckets=4, seed="t:"
        ).collect()
    }
    assert got2 == got


def test_logodds_keyness_planted_word_and_replay(spark):
    """E94: a word frequent in one group and absent elsewhere must top
    that group's keyness ranking; z-scores replay against the
    Monroe et al. informed-Dirichlet formula in pure Python."""
    import math

    from seizury_hrv_featuresextraction_spark.operators.curation import logodds_keyness

    filler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{filler} zebra zebra", "a") for i in range(10)] + [
        (100 + i, filler, "b") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = logodds_keyness(df, "text", "source", alpha0=10.0, min_count=3, k=5).collect()
    top_a = next(r for r in out if r["source"] == "a" and r["rank"] == 1)
    assert top_a["word"] == "zebra"
    assert top_a["n_in_group"] == 20 and top_a["n_corpus"] == 20
    assert top_a["zscore"] > 0

    # replay every emitted z against the formula
    from collections import Counter

    cnt: Counter = Counter()
    for _, text, g in rows:
        for w in text.lower().split():
            cnt[(g, w)] += 1
    yw = Counter()
    ni = Counter()
    for (g, w), c in cnt.items():
        yw[w] += c
        ni[g] += c
    n = sum(ni.values())
    for r in out:
        c = cnt[(r["source"], r["word"])]
        a_w = 10.0 * yw[r["word"]] / n
        rest = yw[r["word"]] - c
        delta = math.log((c + a_w) / (ni[r["source"]] + 10.0 - c - a_w)) - math.log(
            (rest + a_w) / (n - ni[r["source"]] + 10.0 - rest - a_w)
        )
        z = delta / math.sqrt(1.0 / (c + a_w) + 1.0 / (rest + a_w))
        assert abs(r["zscore"] - round(z, 6)) < 2e-6, r


def test_funnel_conversion_ordering_and_horizon(spark):
    """E95: step k counts only events strictly AFTER the step k-1 anchor
    and within the horizon; pre-view clicks and out-of-horizon clicks
    don't convert; users without the first step vanish entirely."""
    from datetime import datetime, timedelta

    from seizury_hrv_featuresextraction_spark.operators.behavior import funnel_conversion

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    h = timedelta(hours=1)
    rows = [
        # user 1: full funnel inside a 1h-per-hop horizon
        (1, t0, "view"), (1, t0 + h / 2, "click"), (1, t0 + h, "purchase"),
        # user 2: click BEFORE the first view -> stalls at step 1
        (2, t0 + h / 2, "click"), (2, t0 + h, "view"),
        # user 3: click outside the horizon -> stalls at step 1
        (3, t0, "view"), (3, t0 + 3 * h, "click"),
        # user 4: no view at all -> excluded
        (4, t0, "click"), (4, t0 + h / 2, "purchase"),
        # user 5: view+click ok, purchase exactly AT the anchor (not after) -> step 2
        (5, t0, "view"), (5, t0 + h / 2, "click"), (5, t0 + h / 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel_conversion(df, steps=("view", "click", "purchase"), horizon_s=3600).collect()
    assert len(out) == 1  # everyone's first view lands on the same day
    r = out[0]
    assert (r["n_step1"], r["n_step2"], r["n_step3"]) == (4, 2, 1)
    assert r["conv_1_2"] == 0.5 and r["conv_2_3"] == 0.5


def test_cohort_retention_triangle(spark):
    """E96: hand-built two-cohort triangle — week-0 size anchors the
    rate; a user active in weeks {0,2} counts in ages 0 and 2 only."""
    from datetime import datetime, timedelta

    from seizury_hrv_featuresextraction_spark.operators.behavior import cohort_retention

    wk = timedelta(weeks=1)
    # epoch-aligned Thursday so events sit cleanly inside epoch weeks
    w0 = datetime(2024, 1, 4, 12, 0, 0)
    rows = [
        (1, w0), (1, w0 + wk), (1, w0 + 2 * wk),   # cohort A, ages 0,1,2
        (2, w0), (2, w0 + 2 * wk),                 # cohort A, ages 0,2
        (3, w0 + wk), (3, w0 + 2 * wk),            # cohort B, ages 0,1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"] - min(x["cohort_week"] for x in out), r["age_week"]): (
            r["n_active"], r["cohort_size"], r["retention"],
        )
        for out in [cohort_retention(df).collect()]
        for r in out
    }
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)
    assert got[(0, 2)] == (2, 2, 1.0)
    assert got[(1, 0)] == (1, 1, 1.0)
    assert got[(1, 1)] == (1, 1, 1.0)
    assert len(got) == 5


def test_key_skew_report_uniform_and_degenerate(spark):
    """E98: all-equal key counts -> gini 0, max_to_mean 1; one dominant
    key -> gini = (n-1)/n * (1 - n/rows ... ) checked against the exact
    closed form; exact percentiles from the count-of-counts cumulative."""
    from seizury_hrv_featuresextraction_spark.operators.stats import key_skew_report

    # uniform: 10 keys x 4 rows
    rows = [(k,) for k in range(10) for _ in range(4)]
    df = spark.createDataFrame(rows, "k long")
    r = key_skew_report(df, ["k"]).collect()[0]
    assert (r["n_keys"], r["n_rows"], r["max_cnt"]) == (10, 40, 4)
    assert r["gini"] == 0.0 and r["max_to_mean"] == 1.0
    assert r["p50_cnt"] == r["p99_cnt"] == 4

    # skewed: 9 keys x 1 row + 1 key x 91 rows
    rows = [(k,) for k in range(9)] + [(99,)] * 91
    df = spark.createDataFrame(rows, "k long")
    r = key_skew_report(df, ["k"]).collect()[0]
    assert (r["n_keys"], r["n_rows"], r["max_cnt"]) == (10, 100, 91)
    assert r["top1_share"] == 0.91
    assert r["max_to_mean"] == 9.1
    assert r["p50_cnt"] == 1 and r["p99_cnt"] == 91
    # exact Gini: sorted counts [1]*9 + [91]; S1 = sum i*x_i = 45 + 10*91
    s1 = sum((i + 1) * x for i, x in enumerate(sorted([1] * 9 + [91])))
    want = round(2 * s1 / (10 * 100) - 11 / 10, 6)
    assert r["gini"] == want


def test_grouped_mad_outliers_exact_medians_and_flags(spark):
    """E100: exact lower-median rule, per-group independence, the
    planted spike flags, the tight cluster doesn't; MAD=0 group flags
    any nonzero deviation."""
    from seizury_hrv_featuresextraction_spark.operators.filters import (
        grouped_mad_outliers,
    )

    rows = (
        # group a: tight cluster around 10 + one spike
        [("a", i, 10.0 + 0.1 * (i % 3)) for i in range(9)]
        + [("a", 99, 1000.0)]
        # group b: all identical except one -> MAD=0 path
        + [("b", i, 5.0) for i in range(5)]
        + [("b", 50, 7.0)]
    )
    df = spark.createDataFrame(rows, "g string, id long, value double")
    out = grouped_mad_outliers(df, "value", ["g"], "id", z_thresh=3.5).collect()
    got = {(r["g"], r["id"]): r for r in out}
    assert ("a", 99) in got
    assert got[("a", 99)]["med"] == 10.1  # lower median of the 10 values
    assert all(k == ("a", 99) for k in got if k[0] == "a")
    # MAD=0 group: the single deviating row flags, rz is NULL
    assert ("b", 50) in got and got[("b", 50)]["rz"] is None
    assert len([k for k in got if k[0] == "b"]) == 1

    # partitioning invariance
    out2 = grouped_mad_outliers(
        df.repartition(5), "value", ["g"], "id", z_thresh=3.5
    ).collect()
    assert {(r["g"], r["id"]) for r in out2} == set(got)


def test_quantile_normalize_replay_and_properties(spark):
    """E101: target = smallest global value whose global CDF >= the
    group CDF, replayed in pure Python; a uniform group maps onto the
    global spread; max of every group maps to the global max."""
    from collections import Counter

    from seizury_hrv_featuresextraction_spark.operators.stats import quantile_normalize

    rows = (
        [("a", v) for v in [1, 1, 2, 3, 10]]
        + [("b", v) for v in [100, 200, 200, 300]]
        + [("c", v) for v in [5]]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = quantile_normalize(df, "v", "g").collect()
    got = {(r["g"], r["v"]): (r["n"], r["cdf"], r["target"]) for r in out}

    # pure-Python replay
    per_g: dict[str, Counter] = {}
    for g, v in rows:
        per_g.setdefault(g, Counter())[v] += 1
    glob = Counter(v for _, v in rows)
    gvals = sorted(glob)
    N = sum(glob.values())
    want = {}
    for g, cnt in per_g.items():
        ns = sum(cnt.values())
        cum = 0
        for v in sorted(cnt):
            cum += cnt[v]
            q = cum / ns
            cg = 0
            target = None
            for gv in gvals:
                cg += glob[gv]
                if cg / N >= q:
                    target = gv
                    break
            want[(g, v)] = (cnt[v], round(q, 6), target)
    assert got == want
    # every group's max value maps to the global max
    assert got[("a", 10)][2] == 300
    assert got[("b", 300)][2] == 300
    assert got[("c", 5)][2] == 300  # single row: CDF 1.0


def test_rollup_and_pivot_consistency(spark):
    """E105/E106: rollup level sums are conserved (leaf -> source ->
    grand total); pivot row sums equal per-source doc counts."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    roll = e.queries()["rollup_corpus_stats"](spark, sf).collect()
    leafs = [r for r in roll if r["gid"] == 0]
    mids = {r["source"]: r for r in roll if r["gid"] == 1}
    total = [r for r in roll if r["gid"] == 3]
    assert len(total) == 1 and total[0]["source"] == "__all__"
    assert total[0]["n_docs"] == sum(r["n_docs"] for r in leafs)
    for s, m in mids.items():
        assert m["n_docs"] == sum(r["n_docs"] for r in leafs if r["source"] == s)
        assert m["total_chars"] == sum(
            r["total_chars"] for r in leafs if r["source"] == s
        )

    piv = e.queries()["pivot_lang_by_source"](spark, sf).collect()
    for r in piv:
        row_sum = r["en"] + r["de"] + r["fr"] + r["es"] + r["other"]
        assert row_sum == mids[r["source"]]["n_docs"]


def test_skew_join_equals_plain_join_and_salts_hot_keys(spark):
    """E108: hot/cold salted join is row-for-row (incl. multiplicity)
    equal to the plain join, with duplicate right keys, cold-only keys,
    hot-only keys, and a left key absent from the right."""
    from seizury_hrv_featuresextraction_spark.operators.skew import skew_join

    left = spark.createDataFrame(
        [(i, 1 if i < 50 else (2 if i < 55 else 3)) for i in range(60)],
        "id long, k long",
    )
    # right: key 1 twice (multiplicity), key 2 once, key 4 unmatched
    right = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (4, "d")], "k long, v string"
    )
    got = sorted(
        (r["id"], r["k"], r["v"])
        for r in skew_join(
            left, right, on="k", left_id_col="id", hot_threshold=10, n_salts=4
        ).collect()
    )
    want = sorted(
        (r["id"], r["k"], r["v"]) for r in left.join(right, "k").collect()
    )
    assert got == want
    assert len(got) == 50 * 2 + 5  # key1 x2 rights, key2 x1, key3 dropped

    # all-cold fast path (no hot keys) is the plain join
    got2 = sorted(
        (r["id"], r["k"], r["v"])
        for r in skew_join(
            left, right, on="k", left_id_col="id", hot_threshold=1000, n_salts=4
        ).collect()
    )
    assert got2 == want

    # max_hot_keys guard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skew_join(
            left, right, on="k", left_id_col="id",
            hot_threshold=0, n_salts=2, max_hot_keys=1,
        )


def test_contrastive_pipeline_stage_contracts_compose(spark):
    """E109: the closure's negatives are drawn only from kept+good
    docs — no negative may be a dropped duplicate or a quality reject."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    pairs = e.queries()["contrastive_pipeline"](spark, sf).collect()
    assert pairs, "pipeline should emit pairs at sf0.001"

    from seizury_hrv_featuresextraction_spark.operators.curation import (
        hashed_linear_classifier,
        md5_feature_weights,
    )
    from seizury_hrv_featuresextraction_spark.operators.dedup import dedup_exact_keep
    from seizury_hrv_featuresextraction_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf, "documents").select("doc_id", "text", "source")
    kept = dedup_exact_keep(docs, "text", "doc_id")
    good = {
        r["doc_id"]
        for r in hashed_linear_classifier(
            kept, md5_feature_weights(1024), bias=0.0, threshold=0.0,
            score_round=6, extra_cols=("source",),
        )
        .filter(F.col("keep"))
        .collect()
    }
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    for r in pairs:
        assert r["anchor_id"] in good and r["neg_id"] in good
        assert src[r["anchor_id"]] != r["neg_source"]
        assert 1 <= r["rank"] <= 4


def test_target_encode_loo_keeps_null_category_rows(spark):
    """r8 review fix: NULL-category rows must survive the encoding
    transform (encoded as their own category), not vanish through a
    non-null-safe join."""
    from seizury_hrv_featuresextraction_spark.operators.stats import target_encode_loo

    rows = [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = target_encode_loo(df, "cat", "y", m=1).collect()
    assert len(out) == len(rows)  # nothing dropped
    nulls = [r for r in out if r["cat"] is None]
    assert len(nulls) == 2
    # LOO within the NULL group: prior = 39/5; enc(10) = ((30-10)+1*7.8)/((2-1)+1)
    prior = 39.0 / 5.0
    want_10 = round(((30.0 - 10.0) + prior) / 2.0, 6)
    got_10 = next(r["te_cat"] for r in nulls if r["y"] == 10.0)
    assert got_10 == want_10


def test_null_handling_review_fixes(spark):
    """r8 review: NULL-content SCD2 runs stay contiguous; NULL-group
    anchors still draw negatives; NULL values neither rank in the MAD
    median nor poison flags."""
    from seizury_hrv_featuresextraction_spark.operators.filters import (
        grouped_mad_outliers,
    )
    from seizury_hrv_featuresextraction_spark.operators.merge import scd2_history
    from seizury_hrv_featuresextraction_spark.operators.stats import negative_samples

    # SCD2: NULL content across v1-v3 = ONE run; NULL<->'a' transitions split
    rows = [(1, 1, None), (1, 2, None), (1, 3, None), (2, 1, "a"), (2, 2, None), (2, 3, "a")]
    df = spark.createDataFrame(rows, "k long, version long, content string")
    got = {
        (r["k"], r["valid_from"]): (r["content"], r["valid_to"])
        for r in scd2_history(df, "k", "content", "version", 3).collect()
    }
    assert got == {
        (1, 1): (None, 3),
        (2, 1): ("a", 1),
        (2, 2): (None, 2),
        (2, 3): ("a", 3),
    }

    # negative sampling: NULL-group anchor pairs with every group
    rows = [(i, f"s{i % 3}") for i in range(20)] + [(100, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = negative_samples(df, k=2, pool_size=8, n_buckets=2, seed="n:").collect()
    anchors = {r["anchor_id"] for r in out}
    assert 100 in anchors  # NULL-group anchor not erased
    assert all(r["neg_source"] is not None for r in out if r["anchor_id"] == 100)
    # and NULL-group candidates are valid negatives for non-NULL anchors
    # (no assertion needed on presence — pool is hash-drawn — just that
    # nothing crashed and non-NULL anchors still emit)
    assert len(anchors) > 10

    # grouped MAD: NULLs don't shift the median or suppress flags
    rows = [("g", i, v) for i, v in enumerate([None, None, None, 5.0, 5.1, 4.9, 1000.0])]
    df = spark.createDataFrame(rows, "g string, id long, value double")
    out = grouped_mad_outliers(df, "value", ["g"], "id", z_thresh=3.5).collect()
    assert [r["id"] for r in out] == [6]  # the 1000.0 spike, nothing else
    assert out[0]["med"] == 5.0


# --- E123: Theil-Sen robust trend -----------------------------------------

def test_theil_sen_matches_replay_and_resists_outlier(spark):
    from seizury_hrv_featuresextraction_spark.operators.stats import theil_sen_slope

    # key 1: clean slope 3 line with ONE corrupted day (OLS would bend,
    # the pairwise-slope median must not); key 2: single day dropped;
    # duplicate (k, t) collapses by max; NULL rows dropped
    rows = (
        [(1, t, 3 * t + 10) for t in range(8)]
        + [(1, 4, 1000), (2, 5, 7), (1, None, 5), (1, 3, None)]
    )
    df = spark.createDataFrame(rows, "k long, t long, y long")
    got = {r.k: (r.n_t, r.n_pairs, r.slope_ts) for r in
           theil_sen_slope(df, "k", "t", "y").collect()}
    assert set(got) == {1}  # key 2 has one point -> no slope
    n_t, n_pairs, slope = got[1]
    assert n_t == 8 and n_pairs == 28
    # replay: dup day 4 keeps max(22, 1000) = 1000, lower median of the
    # 28 pairwise slopes
    pts = {t: 3 * t + 10 for t in range(8)}
    pts[4] = 1000
    slopes = sorted(
        (pts[t2] - pts[t1]) / (t2 - t1)
        for t1 in pts for t2 in pts if t1 < t2
    )
    assert slope == round(slopes[(28 + 1) // 2 - 1], 6)
    # robustness: the corrupted day leaves the median slope at the
    # clean value 3.0 (7 of 8 points are colinear)
    assert slope == 3.0


# --- E125: Benford first-digit audit --------------------------------------

def test_benford_audit_digits_and_chi2(spark):
    from seizury_hrv_featuresextraction_spark.operators.stats import (
        BENFORD_P,
        benford_audit,
    )
    import math

    # the literal table IS log10(1 + 1/d)
    for d in range(1, 10):
        assert abs(BENFORD_P[d - 1] - math.log10(1 + 1 / d)) < 1e-15

    # digit extraction: sub-1 values, exact powers, zeros/NULLs dropped
    rows = [
        ("a", 123.0), ("a", 0.052), ("a", 20.1), ("a", 0.9), ("a", 9000.0),
        ("a", 0.0), ("a", None),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = benford_audit(df, "g", "v").collect()[0]
    assert r.n_values == 5
    assert (r.c1, r.c2, r.c5, r.c9) == (1, 1, 1, 2)
    # chi2 replay in the same fixed fold order
    cs = [r.c1, r.c2, r.c3, r.c4, r.c5, r.c6, r.c7, r.c8, r.c9]
    chi2 = 0.0
    for k in range(9):
        e = r.n_values * BENFORD_P[k]
        chi2 += (cs[k] - e) * (cs[k] - e) / e
    assert r.chi2 == round(chi2, 6)


def test_benford_separates_conforming_from_uniform(spark):
    from seizury_hrv_featuresextraction_spark.operators.stats import benford_audit

    import math

    # group "ok": approximately Benford via a geometric ramp 10^(i/200);
    # group "bad": uniform first digits 1..9 repeated
    ok = [("ok", float(10 ** (i / 200))) for i in range(600)]
    bad = [("bad", float(d)) for d in range(1, 10)] * 67
    df = spark.createDataFrame(ok + bad, "g string, v double")
    got = {r.g: r.chi2 for r in benford_audit(df, "g", "v").collect()}
    assert got["bad"] > 10 * max(got["ok"], 1.0)


# --- E126: exact Shapley attribution --------------------------------------

def test_shapley_matches_brute_force_and_is_efficient(spark):
    from seizury_hrv_featuresextraction_spark.operators.stats import (
        shapley_attribution,
    )
    import itertools
    import math

    # 3 channels; conversion only when A and B are both present
    rows = []
    for mask in range(8):
        n = 10 + mask
        conv = n // 2 if (mask & 1 and mask & 2) else 0
        rows += [(mask, 1)] * conv + [(mask, 0)] * (n - conv)
    df = spark.createDataFrame(rows, "mask long, conv long")
    got = {r.channel: r.shapley for r in
           shapley_attribution(df, "mask", "conv", ["A", "B", "C"]).collect()}

    by = {}
    for mask, c in rows:
        n0, c0 = by.get(mask, (0, 0))
        by[mask] = (n0 + 1, c0 + c)
    v = {m: (by[m][1] / by[m][0] if by.get(m, (0, 0))[0] else 0.0) for m in range(8)}
    k = 3
    want = {}
    for i, name in enumerate(["A", "B", "C"]):
        phi = 0.0
        for s in range(8):
            if s & (1 << i):
                continue
            w = math.factorial(bin(s).count("1")) * math.factorial(k - bin(s).count("1") - 1)
            phi += w * (v[s | (1 << i)] - v[s])
        want[name] = phi / math.factorial(k)
    for name in want:
        assert abs(got[name] - want[name]) < 1e-6
    # efficiency: shares sum to v(full) - v(empty); symmetry: A == B by
    # construction; null player: C contributes ~0
    assert abs(sum(got.values()) - (v[7] - v[0])) < 1e-5
    assert abs(got["A"] - got["B"]) < 1e-9
    assert abs(got["C"]) < 0.02

    import pytest

    with pytest.raises(ValueError):
        shapley_attribution(df, "mask", "conv", ["a"] * 9)
