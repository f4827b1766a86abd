"""E115 Fellegi-Sunter linkage: exact float replay of the fixed-order
likelihood-ratio product, degenerate-field clamping, and planted-truth
recovery on the customer clone query."""

from __future__ import annotations

from seizury_hrv_featuresextraction_spark.operators.linkage import fellegi_sunter_scores

AGREE = {"g1": (19, 20), "g2": (9, 10)}


def _round_half_up(x, d):
    # Spark and DuckDB both round HALF_UP (0.03125 -> 0.0313); Python's
    # built-in round banker's-rounds, so the replay must not use it
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-d), rounding=decimal.ROUND_HALF_UP
        )
    )


def _replay(rows, agreements):
    n = len(rows)
    cs = {}
    for i, g in enumerate(agreements):
        c = sum(1 for r in rows if r[i])
        cs[g] = max(1, min(c, n - 1))
    out = []
    for r in rows:
        lr = 1.0
        for i, (g, (mn, md)) in enumerate(agreements.items()):
            c = cs[g]
            if r[i]:
                lr = lr * ((mn * n) / (md * c))
            else:
                lr = lr * (((md - mn) * n) / (md * (n - c)))
        out.append(_round_half_up(lr, 4))
    return out


def test_fs_scores_match_float_replay(spark):
    rows = [(True, True), (True, False), (False, True), (False, False), (True, True)]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "pid long, g1 boolean, g2 boolean"
    )
    got = {r.pid: r.lr for r in fellegi_sunter_scores(df, AGREE).collect()}
    want = _replay(rows, AGREE)
    assert got == {i: want[i] for i in range(len(rows))}


def test_fs_degenerate_fields_stay_finite(spark):
    # g1 agrees everywhere (u would be 1), g2 nowhere (u would be 0):
    # the [1, n-1] clamp keeps both factors finite and non-zero
    df = spark.createDataFrame(
        [(0, True, False), (1, True, False), (2, True, False)],
        "pid long, g1 boolean, g2 boolean",
    )
    import math

    for r in fellegi_sunter_scores(df, AGREE).collect():
        assert math.isfinite(r.lr) and r.lr > 0


def test_fs_null_agreement_counts_as_disagreement(spark):
    df = spark.createDataFrame(
        [(0, True, None), (1, True, True), (2, False, True)],
        "pid long, g1 boolean, g2 boolean",
    )
    got = {r.pid: r.lr for r in fellegi_sunter_scores(df, AGREE).collect()}
    # NULL g2 scored exactly like an explicit False with the same counts
    want = _replay([(True, False), (True, True), (False, True)], AGREE)
    assert got == {i: want[i] for i in range(3)}


def test_fs_customer_query_recovers_planted_matches(spark):
    from seizury_hrv_featuresextraction_spark.plans.driver_queries import QUERIES

    rows = QUERIES["record_linkage_customers"](spark, "/root/testdata/sf0.001").collect()
    true_pairs = [r for r in rows if r.id_a == r.id_b]
    false_pairs = [r for r in rows if r.id_a != r.id_b]
    matched = [r for r in rows if r.is_match]
    assert len(true_pairs) > 0 and len(false_pairs) > 0
    # the ratio RANKS perfectly at this SF: every planted identity —
    # including name-corrupted ones — outscores every false pair
    assert min(r.lr for r in true_pairs) > max(r.lr for r in false_pairs)
    # at the natural lr >= 1 decision point: perfect precision, and
    # recall only loses part of the corrupted tail (contaminated-u
    # compression at tiny SF squeezes magnitudes, not the ordering)
    assert matched and all(r.id_a == r.id_b for r in matched)
    assert sum(1 for r in true_pairs if r.is_match) / len(true_pairs) >= 0.7


def test_golden_record_survivorship_recovers_clean_fields(spark):
    from seizury_hrv_featuresextraction_spark.plans.driver_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["golden_record_customers"](spark, sf).collect()
    cust = {
        r.c_custkey: r
        for r in spark.read.parquet(f"{sf}/customer.parquet").collect()
    }
    # total records conserved across entities
    assert sum(r.n_records for r in rows) == 2 * len(cust)
    merged = [r for r in rows if r.n_records > 1]
    assert merged
    for r in merged:
        # a merged entity is exactly the clean+dirty pair of one custkey
        # (perfect precision at this SF): comp = min node = 2 * custkey
        assert r.n_records == 2 and r.entity % 2 == 0
        ck = r.entity // 2
        c = cust[ck]
        # survivorship recovers the clean name against BOTH corruptions
        # and never surfaces the wiped segment
        assert r.name == c.c_name
        assert r.mktsegment == c.c_mktsegment
        assert r.acctbal == c.c_acctbal  # min(bal, bal + 1.5) = clean
    # singletons keep their own (possibly dirty) fields; b-side wiped
    # segments survive only there
    singles = [r for r in rows if r.n_records == 1]
    assert all(r.mktsegment == "UNKNOWN" for r in singles
               if r.entity % 2 == 1 and (r.entity - 1) // 2 % 11 == 0)


def test_fs_all_null_column_clamps_to_one_agreement(spark):
    # an entirely-NULL agreement column must behave exactly like an
    # entirely-False one (c clamped to 1), not inflate ratios ~n-fold
    # via least() skipping the NULL count
    rows_null = [(i, True, None) for i in range(5)]
    rows_false = [(i, True, False) for i in range(5)]
    a = {r.pid: r.lr for r in fellegi_sunter_scores(
        spark.createDataFrame(rows_null, "pid long, g1 boolean, g2 boolean"), AGREE
    ).collect()}
    b = {r.pid: r.lr for r in fellegi_sunter_scores(
        spark.createDataFrame(rows_false, "pid long, g1 boolean, g2 boolean"), AGREE
    ).collect()}
    assert a == b


def test_fs_single_pair_stays_finite(spark):
    import math

    df = spark.createDataFrame([(0, False, True)], "pid long, g1 boolean, g2 boolean")
    rows = fellegi_sunter_scores(df, AGREE).collect()
    assert len(rows) == 1 and math.isfinite(rows[0].lr) and rows[0].lr > 0
