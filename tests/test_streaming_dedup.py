"""Streaming exact-dedup across microbatches: Spark's built-in
dropDuplicatesWithinWatermark keyed on the engine's content fingerprint
(functions/text.py doc_fingerprint) — the streaming twin of
operators/dedup.dedup_exact_keep. Duplicates arriving in LATER
microbatches (within the watermark) are dropped by state, not by an
in-batch shuffle."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.functions.text import doc_fingerprint

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


@pytest.mark.timeout(300)
def test_streaming_dedup_within_watermark(spark, tmp_path):
    base = datetime(2026, 1, 1)
    texts = [f"document body {i % 6}" for i in range(24)]  # 6 distinct texts
    pdf = pd.DataFrame(
        {
            "doc_id": range(24),
            "ts": [base + timedelta(seconds=i) for i in range(24)],
            "text": texts,
        }
    )
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(pdf.iloc[:12], schema=SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(pdf.iloc[12:], schema=SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream_in = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("fp", doc_fingerprint(F.col("text")))
        .withWatermark("ts", "10 minutes")
    )
    out = stream_in.dropDuplicatesWithinWatermark(["fp"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = spark.sql("select * from dedup_stream").toPandas()
    # exactly one survivor per distinct fingerprint, even though 18 of
    # the 24 duplicates arrived in a LATER microbatch than the original
    assert len(got) == 6
    assert got["fp"].is_unique
    assert sorted(got["text"].unique()) == sorted(set(texts))
