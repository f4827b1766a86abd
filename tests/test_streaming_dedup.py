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


@pytest.mark.timeout(300)
def test_streaming_dedup_against_reference_matches_batch(spark, tmp_path):
    """E47b streaming leg: a document stream anti-joined against the
    maintained reference table. The per-doc decision is stateless, so
    drained output must equal batch dedup_against_reference EXACTLY
    under any microbatch split — including the NULL-text and
    no-shingle edges (both survive the band stage, as in batch)."""
    from seizury_hrv_featuresextraction_spark.operators.dedup import (
        corpus_reference_keys,
        dedup_against_reference,
    )
    from seizury_hrv_featuresextraction_spark.streaming.curation_stream import (
        streaming_dedup_against_reference,
    )

    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "spark catalyst optimizer rewrites logical plans fast"),
        ],
        "doc_id long, text string",
    )
    ref_keys = corpus_reference_keys(ref, "text", "doc_id").cache()
    ref_keys.count()

    new_rows = [
        (10, "The Quick  brown fox jumps over the lazy dog tonight"),  # exact (normalized)
        (11, "spark catalyst optimizer rewrites logical plans slowly"),  # near-dup (bands)
        (12, "completely novel content about entirely different things"),
        (13, None),                                                      # NULL text
        (14, "two words"),                                               # no 3-shingles
        (15, "the quick brown fox jumps over the lazy dog tonight"),     # exact
        (16, "novel again with plenty of fresh words to keep around"),
    ]
    crawl_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    new_df = spark.createDataFrame(new_rows, crawl_schema)
    expected = sorted(
        r["doc_id"]
        for r in dedup_against_reference(new_df, ref_keys, "text", "doc_id").collect()
    )
    assert expected == [12, 13, 14, 16]  # sanity: exact+near dropped, edges kept

    src = str(tmp_path / "crawl_src")
    spark.createDataFrame(new_rows[:3], crawl_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(new_rows[3:], crawl_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream_in = spark.readStream.schema(crawl_schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_dedup_against_reference(stream_in, ref_keys, "text", "doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ref_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(r["doc_id"] for r in spark.sql("select * from ref_dedup_stream").collect())
    assert got == expected
