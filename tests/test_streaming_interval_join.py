"""E72 stream-stream interval join: the SAME interval_join expression
tree, run as a genuine watermarked stream-stream join — drained output
== batch on identical rows, across multiple real triggers, with both
sides watermarked (bounded join state, the Structured Streaming
stream-stream join contract)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.operators.asof import interval_join

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
    ]
)

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _rows(ids_offsets):
    return [(i, T0 + timedelta(seconds=s), u) for (i, s, u) in ids_offsets]


# purchases (left) and clicks (right); window = [0, 600] s after purchase
PURCHASES = _rows([(1, 0, 7), (2, 1000, 7), (3, 50, 9)])
CLICKS = _rows(
    [
        (101, 300, 7),   # matches purchase 1 (lag 300)
        (102, 601, 7),   # outside purchase 1's window; before purchase 2
        (103, 1599, 7),  # matches purchase 2 (lag 599)
        (104, 40, 9),    # BEFORE purchase 3 -> no match (lower bound 0)
        (105, 50, 9),    # exact boundary: lag 0 matches
        (106, 2400, 11), # no purchase for this user
    ]
)


def _batch_expected(spark):
    p = spark.createDataFrame(PURCHASES, SCHEMA)
    c = spark.createDataFrame(CLICKS, SCHEMA)
    out = interval_join(p, c, "user_id", "ts", "ts", 0, 600).select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    return {(r.purchase_id, r.click_id) for r in out.collect()}


def test_batch_semantics(spark):
    assert _batch_expected(spark) == {(1, 101), (2, 103), (3, 105)}


def test_stream_stream_join_matches_batch(spark, tmp_path):
    want = _batch_expected(spark)

    psrc, csrc = str(tmp_path / "p"), str(tmp_path / "c")
    # two files per side -> maxFilesPerTrigger=1 forces real multi-
    # trigger incremental joining with buffered state on both sides
    spark.createDataFrame(PURCHASES[:2], SCHEMA).write.parquet(psrc + "/f1")
    spark.createDataFrame(PURCHASES[2:], SCHEMA).write.parquet(psrc + "/f2")
    spark.createDataFrame(CLICKS[:3], SCHEMA).write.parquet(csrc + "/f1")
    spark.createDataFrame(CLICKS[3:], SCHEMA).write.parquet(csrc + "/f2")

    p_stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(psrc + "/f*")
        .withWatermark("ts", "30 minutes")
    )
    c_stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(csrc + "/f*")
        .withWatermark("ts", "30 minutes")
    )
    joined = interval_join(p_stream, c_stream, "user_id", "ts", "ts", 0, 600).select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("select * from ssj").collect()
    }
    assert got == want
    assert q.recentProgress and len(q.recentProgress) >= 2
    # the join really ran stateful stream-stream (both sides buffered)
    ops = [
        op
        for pr in q.recentProgress
        for op in (pr.stateOperators or [])
    ]
    assert ops, "expected stateful symmetric-hash join operators"
