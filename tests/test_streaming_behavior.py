"""E96-S streaming cohort retention: drained per-(user, week) activity
state + the shared batch tail == batch cohort_retention exactly, under
multi-trigger delivery with a LATE earlier event that reassigns a
user's cohort mid-stream."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.operators.behavior import (
    cohort_retention,
    cohort_triangle,
)
from seizury_hrv_featuresextraction_spark.streaming.behavior_stream import (
    streaming_user_week_activity,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

W0 = datetime(2024, 1, 4, 12, 0, 0)  # mid-epoch-week anchor
WK = timedelta(weeks=1)

# trigger 1: user 1 looks like a week-1 cohort member; user 2 week 0
BATCH1 = [(1, W0 + WK), (1, W0 + 2 * WK), (2, W0), (2, W0 + WK)]
# trigger 2: user 1's LATE week-0 event arrives -> cohort reassigned;
# user 3 appears fresh in week 2
BATCH2 = [(1, W0), (3, W0 + 2 * WK), (2, W0)]


def test_streaming_cohort_matches_batch_after_late_reassignment(spark, tmp_path):
    src = str(tmp_path / "ev_src")
    spark.createDataFrame(BATCH1, SCHEMA).write.parquet(src + "/f1")
    spark.createDataFrame(BATCH2, SCHEMA).write.parquet(src + "/f2")

    stream_in = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        streaming_user_week_activity(stream_in)
        .writeStream.format("memory")
        .queryName("uw_activity")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert q.recentProgress and len(q.recentProgress) >= 2  # multi-trigger

    prog = [p for p in q.recentProgress if p.stateOperators]
    assert prog, "expected a stateful aggregation in the streaming plan"

    drained_pairs = spark.sql(
        "select distinct user_id, __wk from uw_activity"
    )
    got = {
        (r["cohort_week"], r["age_week"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in cohort_triangle(drained_pairs).collect()
    }

    batch_df = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {
        (r["cohort_week"], r["age_week"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in cohort_retention(batch_df).collect()
    }
    assert got == want

    # the late event really did reassign: user 1 is a week-0 cohort
    # member in the final triangle (ages 0,1,2 present for cohort 0)
    w0 = min(k[0] for k in want)
    assert (w0, 2) in want

    # counts are idempotent under re-delivery (user 2's (week 0) pair
    # arrived in BOTH triggers -> still one active user per cell)
    assert want[(w0, 0)][0] == 2  # users 1 and 2


EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
    ]
)

H = timedelta(hours=1)

# trigger 1 (out of order): user 1's click+purchase arrive BEFORE their
# view; user 2 converts fully; user 3 clicks with no view (stalls)
F_BATCH1 = [
    (1, W0 + H, "click"),
    (1, W0 + 2 * H, "purchase"),
    (2, W0, "view"),
    (2, W0 + H / 2, "click"),
    (2, W0 + H, "purchase"),
    (3, W0 + H, "click"),
]
# trigger 2: user 1's LATE view lands before the click -> full funnel
# now completes; user 2 gets an even EARLIER view, which pushes their
# first click OUT of the 1h horizon (conversion must be revoked)
F_BATCH2 = [
    (1, W0 + H / 2, "view"),
    (2, W0 - 2 * H, "view"),
]


def test_streaming_funnel_matches_batch_with_late_anchor_shifts(spark, tmp_path):
    from seizury_hrv_featuresextraction_spark.operators.behavior import (
        funnel_conversion,
        funnel_rollup,
    )
    from seizury_hrv_featuresextraction_spark.streaming.behavior_stream import (
        streaming_funnel_anchors,
    )

    src = str(tmp_path / "fe_src")
    spark.createDataFrame(F_BATCH1, EV_SCHEMA).write.parquet(src + "/f1")
    spark.createDataFrame(F_BATCH2, EV_SCHEMA).write.parquet(src + "/f2")

    stream_in = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        streaming_funnel_anchors(stream_in, horizon_s=3600)
        .writeStream.format("memory")
        .queryName("funnel_anchors")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert q.recentProgress and len(q.recentProgress) >= 2
    assert [p for p in q.recentProgress if p.stateOperators]

    latest = spark.sql(
        """
        select user_id, __a0, __a1, __a2 from (
          select *, row_number() over (partition by user_id order by version desc) rn
          from funnel_anchors) where rn = 1
        """
    )
    got = {
        r["cohort_day"]: (r["n_step1"], r["n_step2"], r["n_step3"])
        for r in funnel_rollup(latest, n_steps=3).collect()
    }
    batch = spark.createDataFrame(F_BATCH1 + F_BATCH2, EV_SCHEMA)
    want = {
        r["cohort_day"]: (r["n_step1"], r["n_step2"], r["n_step3"])
        for r in funnel_conversion(batch, horizon_s=3600).collect()
    }
    assert got == want

    # the revocation really happened: user 2's final anchors stall at
    # step 1 (their click is 2.5h after the late earlier view)
    rows = {r["user_id"]: r for r in latest.collect()}
    assert rows[2]["__a1"] is None
    # and user 1's late view completed the funnel
    assert rows[1]["__a2"] is not None
    # user 3 never viewed -> no step-1 anchor
    assert rows[3]["__a0"] is None
